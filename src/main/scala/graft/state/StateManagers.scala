package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.StateStore

/** Pluggable state backends (SURVEY §2.5; reference
  * `yamlpipe/utils/state_manager.py:38-125`). The state is
  * `{processed_items: {id -> fingerprint}, last_run_timestamp}`; backends
  * persist it as a JSON file, a parquet state table, Redis, or memory.
  *
  * All backends speak DataFrames (`item_id, fingerprint, updated_at` — the
  * [[StateStore]] schema) so the pipeline's change-detection anti-join is
  * identical regardless of backend. The JSON/Redis/memory backends
  * materialize through the driver and suit reference-sized state (thousands
  * of items); the TABLE backend never leaves the cluster and is the 100 TB
  * path — fingerprint upserts and anti-joins stay distributed.
  */
trait StateManager {
  /** Load the state table; missing/corrupt -> empty (reference recovery
    * semantics, `state_manager.py:59-61`).
    */
  def load(spark: SparkSession): DataFrame

  /** Persist the full state table (called only after a successful sink —
    * `core/pipeline.py:96-98` at-least-once semantics).
    */
  def save(state: DataFrame): Unit
}

object StateManager {
  private[state] def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StateStore.schema)

  private[state] def fromPairs(spark: SparkSession,
                               items: Seq[(String, String)],
                               lastRun: Option[java.sql.Timestamp]): DataFrame = {
    import spark.implicits._
    val itemRows = items.map { case (id, fp) =>
      (id, fp, null.asInstanceOf[java.sql.Timestamp])
    }
    val wmRows = lastRun.toSeq.map(ts => (StateStore.WatermarkKey, null.asInstanceOf[String], ts))
    (itemRows ++ wmRows).toDF("item_id", "fingerprint", "updated_at")
  }

  /** Above this many state rows the JSON/Redis backends LOG a warning
    * recommending the table backend; above [[MaxDriverStateRows]] they
    * refuse outright. The factory default backend is `json` to match the
    * reference, so a scale-up user who never chose a backend gets told —
    * loudly, before the driver OOMs — that the small-state backends
    * materialize everything driver-side and `table` is the 100 TB path.
    */
  val WarnDriverStateRows: Int = 100000
  val MaxDriverStateRows: Int = 1000000

  private lazy val log = org.slf4j.LoggerFactory.getLogger(StateManager.getClass)

  /** Serialize a state frame to the reference's JSON shape. Driver-side:
    * only for the small-state backends. The collect is CAPPED at
    * `maxDriverRows + 1` rows so an oversized state fails loudly without
    * first pulling the whole table onto the driver.
    */
  private[state] def toJson(state: DataFrame,
                            maxDriverRows: Int = MaxDriverStateRows): String = {
    val rows = state.limit(maxDriverRows + 1).collect()
    if (rows.length > maxDriverRows)
      throw new IllegalStateException(
        s"state has more than $maxDriverRows rows; the json/redis backends " +
          "serialize the whole state on the driver and are sized for " +
          "reference-scale state (thousands of items). Switch to the " +
          "'table' backend (TableStateManager) — state stays a distributed " +
          "parquet table and never leaves the cluster.")
    if (rows.length > WarnDriverStateRows)
      log.warn(s"state has ${rows.length} rows — the json/redis backends " +
        "collect all of it to the driver per save; consider the 'table' " +
        s"backend (warning above $WarnDriverStateRows, hard stop above " +
        s"$maxDriverRows rows)")
    val items = rows.filter(r => r.getString(0) != StateStore.WatermarkKey)
    val wm = rows.find(_.getString(0) == StateStore.WatermarkKey)
      .flatMap(r => Option(r.getTimestamp(2)))
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val itemsJson = items.map { r =>
      s""""${esc(r.getString(0))}": "${esc(Option(r.getString(1)).getOrElse(""))}""""
    }.mkString("{", ", ", "}")
    val wmJson = wm.map(ts => s""""${ts.toInstant.toString}"""").getOrElse("null")
    s"""{"processed_items": $itemsJson, "last_run_timestamp": $wmJson}"""
  }

  /** Parse the reference JSON shape back into a state frame; any parse
    * failure -> empty state (corrupt-file recovery).
    */
  private[state] def fromJson(spark: SparkSession, json: String): DataFrame =
    try {
      val root = new org.yaml.snakeyaml.Yaml().load[Any](json) // YAML superset of JSON
      root match {
        case m: java.util.Map[_, _] =>
          val sm = m.asInstanceOf[java.util.Map[String, Any]]
          val items = Option(sm.get("processed_items")) match {
            case Some(im: java.util.Map[_, _]) =>
              import scala.jdk.CollectionConverters._
              im.asScala.toSeq.map { case (k, v) => (String.valueOf(k), String.valueOf(v)) }
            case _ => Seq.empty
          }
          val wm = Option(sm.get("last_run_timestamp")).collect {
            case s: String => java.sql.Timestamp.from(java.time.Instant.parse(s))
          }
          fromPairs(spark, items, wm)
        case _ => emptyState(spark)
      }
    } catch { case _: Exception => emptyState(spark) }
}

/** T4 — JSON-file backend (`state_manager.py:38-71`): the whole state in one
  * JSON document; corrupt or missing file -> fresh state; atomic
  * write-temp-then-rename save. `maxDriverItems` caps the driver-side
  * materialization (see [[StateManager.MaxDriverStateRows]]).
  */
final case class JsonStateManager(path: String,
                                  maxDriverItems: Int = StateManager.MaxDriverStateRows)
  extends StateManager {
  override def load(spark: SparkSession): DataFrame = {
    val p = Paths.get(path)
    if (!Files.exists(p)) StateManager.emptyState(spark)
    else StateManager.fromJson(spark,
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  override def save(state: DataFrame): Unit = {
    val json = StateManager.toJson(state, maxDriverItems)
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Parquet-table backend — the scale path: state stays a distributed table,
  * saves are atomic via [[StateStore.save]]'s write-temp-then-rename.
  */
final case class TableStateManager(path: String) extends StateManager {
  override def load(spark: SparkSession): DataFrame = StateStore.load(spark, path)
  override def save(state: DataFrame): Unit = StateStore.save(state, path)
}

/** In-memory backend (tests / ephemeral runs). */
final class MemoryStateManager extends StateManager {
  @volatile private var snapshot: Option[Array[Row]] = None
  override def load(spark: SparkSession): DataFrame = snapshot match {
    case Some(rows) =>
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), StateStore.schema)
    case None => StateManager.emptyState(spark)
  }
  override def save(state: DataFrame): Unit = { snapshot = Some(state.collect()) }
}

/** T5 — Redis backend (`state_manager.py:74-125`): same JSON document under
  * one key. The client is a minimal RESP2 implementation over a plain
  * socket (GET/SET/PING) — no driver dependency needed.
  */
final case class RedisStateManager(host: String, port: Int = 6379,
                                   key: String = "graft:pipeline_state",
                                   maxDriverItems: Int = StateManager.MaxDriverStateRows)
  extends StateManager {

  private def withConn[T](f: (java.io.DataOutputStream, java.io.DataInputStream) => T): T = {
    val sock = new java.net.Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), 5000)
    sock.setSoTimeout(5000)
    try {
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
      f(out, in)
    } finally sock.close()
  }

  private def writeCommand(out: java.io.DataOutputStream, args: Seq[String]): Unit = {
    out.write(s"*${args.length}\r\n".getBytes(StandardCharsets.UTF_8))
    args.foreach { a =>
      val b = a.getBytes(StandardCharsets.UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(StandardCharsets.UTF_8))
      out.write(b); out.write("\r\n".getBytes(StandardCharsets.UTF_8))
    }
    out.flush()
  }

  private def readLine(in: java.io.DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
    in.read() // \n
    sb.toString
  }

  private def readReply(in: java.io.DataInputStream): Option[String] = {
    val line = readLine(in)
    line.headOption match {
      case Some('+') => Some(line.tail)
      case Some('-') => throw new IllegalStateException(s"redis error: ${line.tail}")
      case Some(':') => Some(line.tail)
      case Some('$') =>
        val n = line.tail.toInt
        if (n < 0) None
        else {
          val buf = new Array[Byte](n)
          in.readFully(buf); in.read(); in.read() // trailing \r\n
          Some(new String(buf, StandardCharsets.UTF_8))
        }
      case _ => throw new IllegalStateException(s"unexpected redis reply: $line")
    }
  }

  def ping(): Unit = withConn { (out, in) =>
    writeCommand(out, Seq("PING"))
    val r = readReply(in)
    if (!r.contains("PONG")) throw new IllegalStateException(s"redis PING -> $r")
  }

  override def load(spark: SparkSession): DataFrame = withConn { (out, in) =>
    writeCommand(out, Seq("GET", key))
    readReply(in) match {
      case Some(json) => StateManager.fromJson(spark, json)
      case None => StateManager.emptyState(spark)
    }
  }

  override def save(state: DataFrame): Unit = {
    val json = StateManager.toJson(state, maxDriverItems)
    withConn { (out, in) =>
      writeCommand(out, Seq("SET", key, json))
      readReply(in)
    }
  }
}
