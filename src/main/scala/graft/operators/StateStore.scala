package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental-processing state, re-expressed as a small parquet state table
  * instead of the reference's driver-side JSON/Redis dict
  * (`yamlpipe/utils/state_manager.py:38-125`, shape
  * `{"processed_items": {id -> sha256|etag}, "last_run_timestamp": iso}`).
  *
  * Schema: `item_id string, fingerprint string, updated_at timestamp`, plus a
  * single watermark row keyed `__last_run__`. The state table is tiny
  * relative to the corpus, so every join against it is a broadcast join —
  * change detection costs one scan of the incoming batch at any scale.
  *
  * Semantics preserved:
  *  - new-or-changed = fingerprint differs or id unseen
  *    (`state_manager.py:155-178`) -> left_anti join on (item_id, fingerprint)
  *  - hash failure treated as unchanged (`state_manager.py:167-170`) -> rows
  *    with null fingerprint are excluded from the "changed" set
  *  - upsert keeps the latest fingerprint per id (`state_manager.py:180-196`)
  *  - corrupt/missing state -> fresh empty state (`state_manager.py:59-61`)
  *  - state persisted only after a successful sink (`core/pipeline.py:96-98`)
  *    -> callers invoke [[save]] after the sink action returns
  */
object StateStore {

  val WatermarkKey = "__last_run__"

  def schema: StructType = StructType(Seq(
    StructField("item_id", StringType),
    StructField("fingerprint", StringType),
    StructField("updated_at", TimestampType)))

  /** Load the state table; missing or unreadable -> empty state (the
    * reference's corrupt-file recovery, `state_manager.py:59-61`).
    */
  def load(spark: SparkSession, path: String): DataFrame =
    try {
      val df = spark.read.schema(schema).parquet(path)
      df.select("item_id", "fingerprint", "updated_at")
    } catch {
      case _: Throwable =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Rows of `incoming` that are new or changed w.r.t. the state: anti-join
    * on (item_id, fingerprint). Null fingerprints are treated as unchanged.
    * The state side is broadcast (it is orders of magnitude smaller than the
    * incoming corpus).
    */
  def changed(incoming: DataFrame, state: DataFrame,
              idCol: String = "item_id", fpCol: String = "fingerprint"): DataFrame = {
    val st = broadcast(
      state.filter(col("item_id") =!= WatermarkKey)
        .select(col("item_id").as("__st_id"), col("fingerprint").as("__st_fp")))
    incoming
      .filter(col(fpCol).isNotNull)
      .join(st, col(idCol) === col("__st_id") && col(fpCol) === col("__st_fp"), "left_anti")
  }

  /** Full snapshot diff between two corpus versions — the dataset-iteration
    * report (what did this crawl/curation pass add, drop, or rewrite?):
    * `(id, status)` with status `added` (id only in `newDf`), `removed`
    * (only in `oldDf`), or `changed` (both, fingerprints differ);
    * unchanged rows are included only when `includeUnchanged`.
    *
    * One full-outer shuffle join on the id — both sides are corpus-scale,
    * so unlike [[changed]] nothing broadcasts; at 100 TB this is the one
    * unavoidable co-partitioning of the two snapshots (bucket both by id
    * to eliminate it entirely).
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: String, fpCol: String,
                 includeUnchanged: Boolean = false): DataFrame = {
    // Presence comes from explicit marker columns, NOT fingerprint
    // nullability — a legitimately null fingerprint must not turn an
    // existing row into 'added'/'removed'. Fingerprint comparison is
    // null-safe (<=>): null vs value = changed, null vs null = unchanged.
    val o = oldDf.select(col(idCol).as("__id"), col(fpCol).as("__old_fp"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol).as("__id"), col(fpCol).as("__new_fp"),
      lit(true).as("__in_new"))
    val joined = o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__old_fp") <=> col("__new_fp")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
    if (includeUnchanged) joined else joined.filter(col("status") =!= "unchanged")
  }

  /** Merge new fingerprints into the state, keeping the newest per item. */
  def upsert(state: DataFrame, updates: DataFrame,
             idCol: String = "item_id", fpCol: String = "fingerprint"): DataFrame = {
    val newRows = updates.select(
      col(idCol).cast("string").as("item_id"),
      col(fpCol).cast("string").as("fingerprint"),
      current_timestamp().as("updated_at"))
    // Prefer the update side on id collision: old rows are anti-joined away.
    val kept = state.join(newRows.select("item_id"), Seq("item_id"), "left_anti")
    kept.unionByName(newRows)
  }

  /** Read the run watermark (the reference's `last_run_timestamp`,
    * `state_manager.py:198-202`); None when never set.
    */
  def lastRunTimestamp(state: DataFrame): Option[java.sql.Timestamp] =
    state.filter(col("item_id") === WatermarkKey)
      .select("updated_at").collect()
      .headOption.map(_.getTimestamp(0))

  /** Set the run watermark to now. */
  def touchWatermark(state: DataFrame): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    val wm = Seq(WatermarkKey).toDF("item_id")
      .withColumn("fingerprint", lit(null).cast("string"))
      .withColumn("updated_at", current_timestamp())
    state.filter(col("item_id") =!= WatermarkKey).unionByName(wm)
  }

  /** Atomically persist state: write to a temp dir then rename over the old
    * table (the reference overwrites its JSON file in place,
    * `state_manager.py:63-67`; a rename avoids the torn-write window).
    */
  def save(state: DataFrame, path: String): Unit = {
    val spark = state.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val dst = new org.apache.hadoop.fs.Path(path)
    // State tables are tiny: coalesce(1) keeps them a single file.
    state.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }
}
