package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StateStore
import graft.state.{JsonStateManager, MemoryStateManager, RedisStateManager, TableStateManager}

/** State backends T1–T5 (reference `yamlpipe/utils/state_manager.py`). */
class StateManagersSpec extends AnyFunSuite with SparkTestBase {

  private def sampleState() = {
    import spark.implicits._
    val items = Seq(("doc1", "fp1"), ("doc2", "fp2"))
      .map { case (i, f) => (i, f, null.asInstanceOf[java.sql.Timestamp]) }
    val wm = Seq((StateStore.WatermarkKey, null.asInstanceOf[String],
      java.sql.Timestamp.valueOf("2024-05-01 12:00:00")))
    (items ++ wm).toDF("item_id", "fingerprint", "updated_at")
  }

  private def itemMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().filter(_.getString(0) != StateStore.WatermarkKey)
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("json backend roundtrips items + watermark; corrupt file -> fresh state") {
    val dir = tempDir("graft-state")
    val path = dir.resolve("state.json").toString
    val mgr = JsonStateManager(path)
    assert(mgr.load(spark).count() == 0) // missing -> empty
    mgr.save(sampleState())
    val loaded = mgr.load(spark)
    assert(itemMap(loaded) == Map("doc1" -> "fp1", "doc2" -> "fp2"))
    assert(StateStore.lastRunTimestamp(loaded).get ==
      java.sql.Timestamp.valueOf("2024-05-01 12:00:00"))
    Files.writeString(java.nio.file.Paths.get(path), "{not json!!")
    assert(mgr.load(spark).count() == 0) // corrupt -> fresh (state_manager.py:59-61)
  }

  test("bucketed state: upsert rewrites ONLY the touched buckets and " +
      "keeps upsert's merge semantics") {
    import spark.implicits._
    val dir = tempDir("graft-bucketed-state").resolve("state").toString
    val base = (1 to 40)
      .map(i => (s"doc$i", s"fp$i", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("item_id", "fingerprint", "updated_at")
    StateStore.saveBucketed(base, dir, numBuckets = 8)
    assert(itemMap(StateStore.loadBucketed(spark, dir)) ==
      (1 to 40).map(i => s"doc$i" -> s"fp$i").toMap)
    // Byte-level fingerprint of every bucket directory's parquet files.
    def fileHashes(): Map[String, Seq[(String, Int)]] = {
      val root = new java.io.File(dir)
      root.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .sortBy(_.getName)
            .map(f => f.getName -> java.util.Arrays.hashCode(
              java.nio.file.Files.readAllBytes(f.toPath))).toSeq
        }.toMap
    }
    val before = fileHashes()
    assert(before.size > 2, s"fixture too small to prove pruning: $before")
    val updates = Seq(("doc3", "fp3-new"), ("doc999", "fp999"))
      .toDF("item_id", "fingerprint")
    StateStore.upsertBucketed(spark, dir, updates, numBuckets = 8)
    val after = fileHashes()
    val touched = updates
      .select(StateStore.stateBucket($"item_id", 8).as("b"))
      .distinct().collect().map(r => s"bucket=${r.getInt(0)}").toSet
    // Merge semantics identical to upsert(): newest fingerprint wins,
    // unseen ids append, everything else survives.
    val m = itemMap(StateStore.loadBucketed(spark, dir))
    assert(m("doc3") == "fp3-new")
    assert(m("doc999") == "fp999")
    assert(m("doc1") == "fp1")
    assert(m.size == 41)
    // Untouched buckets: byte-identical files (merge-on-read claim).
    before.foreach { case (b, files) =>
      if (!touched.contains(b))
        assert(after(b) == files, s"untouched bucket $b was rewritten")
    }
    // Touched buckets really were replaced.
    assert(touched.exists(b => before.get(b) != after.get(b)),
      s"no touched bucket changed: $touched")
  }

  test("rebucket: row-identical state at the new bucket count; " +
      "duplicate batch ids collapse deterministically") {
    import spark.implicits._
    val dir = tempDir("graft-rebucket").resolve("state").toString
    val base = (1 to 40)
      .map(i => (s"doc$i", s"fp$i", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("item_id", "fingerprint", "updated_at")
    StateStore.saveBucketed(base, dir, numBuckets = 4)
    // A batch carrying the same id twice writes ONE row, max(fingerprint)
    // (r12 advice: the scaladoc's one-row-per-id promise).
    val dupBatch = Seq(("doc1", "fpA"), ("doc1", "fpZ"), ("doc41", "fp41"))
      .toDF("item_id", "fingerprint")
    StateStore.upsertBucketed(spark, dir, dupBatch, numBuckets = 4)
    val m = itemMap(StateStore.loadBucketed(spark, dir))
    assert(m("doc1") == "fpZ" && m("doc41") == "fp41" && m.size == 41)
    assert(StateStore.loadBucketed(spark, dir)
      .filter($"item_id" === "doc1").count() == 1)
    // Growth escape hatch: 4 -> 16 buckets, same rows, new layout.
    StateStore.rebucket(spark, dir, 16)
    assert(itemMap(StateStore.loadBucketed(spark, dir)) == m)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toInt)
    assert(bucketDirs.nonEmpty && bucketDirs.max > 3,
      s"rebucket did not widen the layout: ${bucketDirs.sorted.toSeq}")
    // Post-rebucket upserts keep working at the new count.
    StateStore.upsertBucketed(spark, dir,
      Seq(("doc2", "fp2-new")).toDF("item_id", "fingerprint"),
      numBuckets = 16)
    assert(itemMap(StateStore.loadBucketed(spark, dir))("doc2") == "fp2-new")
    // The plain-upsert twin collapses duplicates the same way.
    val plain = StateStore.upsert(base, dupBatch)
    assert(plain.filter($"item_id" === "doc1").count() == 1)
    assert(itemMap(plain)("doc1") == "fpZ")
  }

  test("changedBucketed: row-identical to changed() on the same state, " +
      "partition-pruned scan, fresh-state and empty-batch contracts") {
    import spark.implicits._
    val dir = tempDir("graft-changed-bucketed").resolve("state").toString
    val state = (1 to 40)
      .map(i => (s"doc$i", s"fp$i", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("item_id", "fingerprint", "updated_at")
    StateStore.saveBucketed(state, dir, numBuckets = 8)
    val incoming = Seq(
      ("doc3", "fp3"),       // unchanged -> not emitted
      ("doc4", "fp4-new"),   // changed
      ("doc99", "fp99"),     // new id
      ("doc5", null))        // null fingerprint -> treated unchanged
      .toDF("item_id", "fingerprint")
    val viaBucketed = StateStore
      .changedBucketed(spark, dir, incoming, numBuckets = 8)
    val viaBroadcast = StateStore
      .changed(incoming, StateStore.loadBucketed(spark, dir))
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("item_id", "fingerprint").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys(viaBucketed) == Set("doc4" -> "fp4-new", "doc99" -> "fp99"))
    assert(keys(viaBucketed) == keys(viaBroadcast))
    // The state scan is partition-pruned to the batch's buckets — the
    // read-path scale contract (never a full-table read).
    val plan = viaBucketed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("bucket"),
      plan.take(800))
    // Missing table: everything with a non-null fingerprint is new.
    assert(keys(StateStore.changedBucketed(spark, dir + "-missing",
      incoming, 8)) ==
      Set("doc3" -> "fp3", "doc4" -> "fp4-new", "doc99" -> "fp99"))
    // Empty batch: no touched buckets, no crash, empty result.
    assert(StateStore.changedBucketed(spark, dir,
      incoming.filter($"item_id" === "nope"), 8).count() == 0)
  }

  test("bucketed paths fail loudly on a flat save() table; an empty " +
      "bootstrapped bucketed table still reads as fresh state") {
    import spark.implicits._
    val root = tempDir("graft-layout-guard")
    val flat = root.resolve("flat-state").toString
    val state = Seq(("doc1", "fp1", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("item_id", "fingerprint", "updated_at")
    StateStore.save(state, flat)
    val incoming = Seq(("doc1", "fp1-new")).toDF("item_id", "fingerprint")
    // r13 advice: a flat table read through the bucketed path prunes ALL
    // state away and silently reports everything changed — must throw.
    val e1 = intercept[IllegalStateException] {
      StateStore.changedBucketed(spark, flat, incoming, numBuckets = 8)
    }
    assert(e1.getMessage.contains("not a bucketed state table"))
    val e2 = intercept[IllegalStateException] {
      StateStore.upsertBucketed(spark, flat, incoming, numBuckets = 8)
    }
    assert(e2.getMessage.contains("not a bucketed state table"))
    // Flat table is untouched by the refused upsert.
    assert(itemMap(StateStore.load(spark, flat)) == Map("doc1" -> "fp1"))
    // An EMPTY bootstrapped bucketed table (metadata only, no bucket
    // dirs) is legitimate: everything incoming is new.
    val empty = root.resolve("empty-state").toString
    StateStore.saveBucketed(state.limit(0), empty, numBuckets = 8)
    val out = StateStore.changedBucketed(spark, empty, incoming, 8)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set("doc1" -> "fp1-new"))
    StateStore.upsertBucketed(spark, empty, incoming, numBuckets = 8)
    assert(itemMap(StateStore.loadBucketed(spark, empty)) ==
      Map("doc1" -> "fp1-new"))
  }

  test("dense-batch advisory fires on a bucket-striding batch and stays " +
      "silent on a sparse one (r13 verdict #4)") {
    import spark.implicits._
    val dir = tempDir("graft-density").resolve("state").toString
    val base = (1 to 64)
      .map(i => (s"doc$i", s"fp$i", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("item_id", "fingerprint", "updated_at")
    StateStore.saveBucketed(base, dir, numBuckets = 8)
    // Dense: 64 ids stride all 8 buckets -> advisory, naming rebucket.
    StateStore.upsertBucketed(spark, dir,
      (1 to 64).map(i => (s"doc$i", s"fp$i-v2")).toDF("item_id", "fingerprint"),
      numBuckets = 8)
    val dense = StateStore.lastDensityAdvisory.get()
    assert(dense.exists(m => m.contains("upsertBucketed") &&
      m.contains("8/8") && m.contains("rebucket")), dense.toString)
    // Sparse: one id -> no advisory (the steady-state incremental batch).
    StateStore.upsertBucketed(spark, dir,
      Seq(("doc1", "fp1-v3")).toDF("item_id", "fingerprint"), numBuckets = 8)
    assert(StateStore.lastDensityAdvisory.get().isEmpty)
    // The read path prices density the same way.
    StateStore.changedBucketed(spark, dir,
      (1 to 64).map(i => (s"doc$i", s"fpX$i")).toDF("item_id", "fingerprint"),
      numBuckets = 8).count()
    assert(StateStore.lastDensityAdvisory.get()
      .exists(_.contains("changedBucketed")))
    StateStore.changedBucketed(spark, dir,
      Seq(("doc1", "fpY")).toDF("item_id", "fingerprint"),
      numBuckets = 8).count()
    assert(StateStore.lastDensityAdvisory.get().isEmpty)
  }

  test("json backend refuses state past the driver-materialization cap") {
    // r6 verdict #7: the factory default backend is json (reference
    // fidelity) and collects the whole state per save — a scale-up user
    // must be told, loudly, before the driver OOMs. The refusal must fire
    // from a CAPPED collect (limit cap+1), never after pulling everything.
    import org.apache.spark.sql.functions.{col, concat, lit}
    val big = spark.range(0, 50)
      .select(concat(lit("doc"), col("id")).as("item_id"),
        lit("fp").as("fingerprint"),
        lit(null).cast("timestamp").as("updated_at"))
    val dir = tempDir("graft-state-cap")
    val mgr = JsonStateManager(dir.resolve("state.json").toString, maxDriverItems = 10)
    val e = intercept[IllegalStateException] { mgr.save(big) }
    assert(e.getMessage.contains("table"), e.getMessage)
    assert(e.getMessage.contains("10"), e.getMessage)
    // under the cap the same manager saves fine
    mgr.save(sampleState())
    assert(itemMap(mgr.load(spark)) == Map("doc1" -> "fp1", "doc2" -> "fp2"))
  }

  test("table backend roundtrips distributed state") {
    val dir = tempDir("graft-tstate")
    val mgr = TableStateManager(dir.resolve("state_table").toString)
    assert(mgr.load(spark).count() == 0)
    mgr.save(sampleState())
    assert(itemMap(mgr.load(spark)) == Map("doc1" -> "fp1", "doc2" -> "fp2"))
  }

  test("memory backend roundtrips") {
    val mgr = new MemoryStateManager
    assert(mgr.load(spark).count() == 0)
    mgr.save(sampleState())
    assert(itemMap(mgr.load(spark)) == Map("doc1" -> "fp1", "doc2" -> "fp2"))
  }

  test("redis backend speaks RESP2 against a live socket") {
    // Minimal single-key fake redis: enough of RESP2 for PING/GET/SET.
    val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val server = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val worker = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
        val out = sock.getOutputStream
        def line(): String = {
          val sb = new StringBuilder
          var c = in.read()
          while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
          in.read(); sb.toString
        }
        try {
          val nArgs = line().drop(1).toInt
          val args = (1 to nArgs).map { _ =>
            val len = line().drop(1).toInt
            val buf = new Array[Byte](len)
            in.readFully(buf); in.read(); in.read()
            new String(buf, "UTF-8")
          }
          args.head.toUpperCase match {
            case "PING" => out.write("+PONG\r\n".getBytes)
            case "SET" => store.put(args(1), args(2)); out.write("+OK\r\n".getBytes)
            case "GET" =>
              Option(store.get(args(1))) match {
                case Some(v) =>
                  val b = v.getBytes("UTF-8")
                  out.write(s"$$${b.length}\r\n".getBytes); out.write(b); out.write("\r\n".getBytes)
                case None => out.write("$-1\r\n".getBytes)
              }
            case _ => out.write("-ERR unknown\r\n".getBytes)
          }
          out.flush()
        } finally sock.close()
      } catch { case _: Exception => () }
    })
    worker.setDaemon(true); worker.start()
    try {
      val mgr = RedisStateManager("127.0.0.1", server.getLocalPort)
      mgr.ping()
      assert(mgr.load(spark).count() == 0) // nil key -> empty
      mgr.save(sampleState())
      assert(itemMap(mgr.load(spark)) == Map("doc1" -> "fp1", "doc2" -> "fp2"))
    } finally server.close()
  }

  test("changed/upsert semantics: anti-join change detection + latest-fp-wins") {
    import spark.implicits._
    val state = Seq(("a", "fp_a", null.asInstanceOf[java.sql.Timestamp]),
      ("b", "fp_b_old", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("item_id", "fingerprint", "updated_at")
    val incoming = Seq(("a", "fp_a"), ("b", "fp_b_new"), ("c", "fp_c"),
      ("d", null.asInstanceOf[String]))
      .toDF("item_id", "fingerprint")
    val changed = StateStore.changed(incoming, state).collect().map(_.getString(0)).sorted
    // a unchanged; b changed; c new; d null-fingerprint treated unchanged
    // (state_manager.py:167-170)
    assert(changed.toSeq == Seq("b", "c"))
    val upserted = StateStore.upsert(state,
      Seq(("b", "fp_b_new"), ("c", "fp_c")).toDF("item_id", "fingerprint"))
    val m = upserted.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("a" -> "fp_a", "b" -> "fp_b_new", "c" -> "fp_c"))
  }

  test("corpusDiff classifies added/removed/changed; unchanged opt-in") {
    import spark.implicits._
    val oldSnap = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("id", "fp")
    val newSnap = Seq(("b", "2"), ("c", "9"), ("d", "4")).toDF("id", "fp")
    val diff = StateStore.corpusDiff(oldSnap, newSnap, "id", "fp")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(diff == Map("a" -> "removed", "c" -> "changed", "d" -> "added"))
    val all = StateStore.corpusDiff(oldSnap, newSnap, "id", "fp",
      includeUnchanged = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(all("b") == "unchanged" && all.size == 4)
  }

  test("corpusDiff: null fingerprints mean changed-vs-value, unchanged-vs-null, never added/removed") {
    import spark.implicits._
    val oldSnap = Seq(("a", None), ("b", None), ("c", Some("3")))
      .toDF("id", "fp")
    val newSnap = Seq(("a", Some("1")), ("b", None), ("c", None))
      .toDF("id", "fp")
    val diff = StateStore.corpusDiff(oldSnap, newSnap, "id", "fp",
      includeUnchanged = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(diff == Map("a" -> "changed", "b" -> "unchanged", "c" -> "changed"))
  }

  test("scd2Apply: full document lifecycle across four versions") {
    import spark.implicits._
    def snap(rows: (Long, String)*) = rows.toDF("id", "fp")
    def apply(h: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.DataFrame,
              v: Long) = StateStore.scd2Apply(h, s, "id", "fp", v)
    val empty = StateStore.scd2Empty(spark, "id", "fp")
    // v1: a,b appear. v2: a changes, b unchanged, c appears. v3: a removed.
    // v4: a re-appears with a fresh fp.
    val h4 = apply(apply(apply(apply(empty,
      snap(1L -> "a1", 2L -> "b1"), 1),
      snap(1L -> "a2", 2L -> "b1", 3L -> "c1"), 2),
      snap(2L -> "b1", 3L -> "c1"), 3),
      snap(1L -> "a3", 2L -> "b1", 3L -> "c1"), 4)
    val rows = h4.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("fp"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        r.getAs[Boolean]("is_current"))).toSet
    assert(rows == Set(
      (1L, "a1", 1L, Some(2L), false),   // first fp closed when it changed
      (1L, "a2", 2L, Some(3L), false),   // second fp closed when doc vanished
      (1L, "a3", 4L, None, true),        // re-appearance opens a fresh row
      (2L, "b1", 1L, None, true),        // never changed: original interval
      (3L, "c1", 2L, None, true)))       // late arrival keeps its birth version
    // History is append-only: each apply only adds rows.
    assert(h4.count() == 5)
  }

  test("scd2Lookup: as-of answers across the full lifecycle, gaps null") {
    import spark.implicits._
    def snap(rows: (Long, String)*) = rows.toDF("id", "fp")
    def apply(h: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.DataFrame,
              v: Long) = StateStore.scd2Apply(h, s, "id", "fp", v)
    val h4 = apply(apply(apply(apply(StateStore.scd2Empty(spark, "id", "fp"),
      snap(1L -> "a1", 2L -> "b1"), 1),
      snap(1L -> "a2", 2L -> "b1", 3L -> "c1"), 2),
      snap(2L -> "b1", 3L -> "c1"), 3),
      snap(1L -> "a3", 2L -> "b1", 3L -> "c1"), 4)
    val probes = (for (id <- 1L to 3L; v <- 1L to 4L) yield (id, v))
      .toDF("id", "v")
    val got = StateStore.scd2Lookup(h4, probes, "id", "v")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("v")) ->
        Option(r.getAs[String]("fp"))).toMap
    // doc 1: a1 at v1, a2 at v2, GONE at v3 (removed), a3 at v4
    assert(got((1L, 1L)).contains("a1"))
    assert(got((1L, 2L)).contains("a2"))
    assert(got((1L, 3L)).isEmpty)
    assert(got((1L, 4L)).contains("a3"))
    // doc 2: b1 throughout; doc 3: null before birth at v2
    assert((1L to 4L).forall(v => got((2L, v)).contains("b1")))
    assert(got((3L, 1L)).isEmpty && got((3L, 2L)).contains("c1"))
    // left join: every probe row present exactly once
    assert(got.size == 12)
  }

  test("cdcApply: last op wins, deletes drop keys, resurrection flagged") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    // key 1: upsert, delete, upsert (resurrected, survives at 3.00)
    // key 2: upsert, delete (gone)
    // key 3: single upsert
    val log = Seq(
      (1L, 10L, 1L, 1.00, "u"), (1L, 20L, 2L, 0.0, "d"),
      (1L, 30L, 3L, 3.00, "u"),
      (2L, 10L, 4L, 2.00, "u"), (2L, 20L, 5L, 0.0, "d"),
      (3L, 5L, 6L, 7.50, "u")).toDF("k", "tsu", "id", "value", "op")
    val got = graft.operators.StateStore
      .cdcApply(log, "k", "tsu", "id", "value", col("op") === "d")
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, 3.0, 30L, 3L, 2L, 1L, true),
      (3L, 7.5, 5L, 1L, 1L, 0L, false)))
  }

  test("cdcApply is incremental: collapsed halves == one-shot, as state") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    val ops = Seq(
      (1L, 10L, 1L, 1.0, "u"), (1L, 20L, 2L, 0.0, "d"),
      (2L, 15L, 3L, 4.0, "u"), (1L, 30L, 4L, 9.0, "u"),
      (2L, 40L, 5L, 0.0, "d"), (3L, 50L, 6L, 2.0, "u"))
    def apply(rows: Seq[(Long, Long, Long, Double, String)]) =
      graft.operators.StateStore.cdcApply(
        rows.toDF("k", "tsu", "id", "value", "op"),
        "k", "tsu", "id", "value", col("op") === "d")
    val oneShot = apply(ops).select("key", "value", "last_ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    // re-feed half 1's collapsed state as upserts, then half 2
    val half1 = apply(ops.take(3)).collect()
      .map(r => (r.getLong(0), r.getLong(2), 0L, r.getDouble(1), "u"))
    val twoPhase = apply(half1.toSeq ++ ops.drop(3))
      .select("key", "value", "last_ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(oneShot == twoPhase)
  }
}
