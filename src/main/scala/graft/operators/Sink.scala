package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-store sinks re-expressed as partitioned parquet tables with
  * delete-by-source upsert semantics.
  *
  * The reference sinks (`yamlpipe/components/sinks.py:33-162`) implement
  * idempotent re-ingest as "DELETE WHERE source IN (incoming sources), then
  * append". At Spark scale the equivalent is DYNAMIC PARTITION OVERWRITE:
  * the table is partitioned by a bucket of `source` and a write with
  * `partitionOverwriteMode=dynamic` replaces exactly the partitions present
  * in the incoming batch, leaving all others untouched — no full-table
  * rewrite, no driver-side delete loop.
  *
  * Because `source` is an arbitrary string (path/url/dsn), we partition on
  * `source_bucket = pmod(hash(source), numBuckets)` and pair every read with
  * a re-filter on the real `source` value. A bucket collision means a few
  * extra sources are rewritten with identical content (idempotent), never
  * lost.
  *
  * Record projection matches the reference sink schema
  * (`yamlpipe/utils/dynamic_schemas.py:44-51`): fixed `text` + `vector(dim)`
  * plus promoted metadata columns; `uuid()` ids mirror the Chroma sink
  * (`sinks.py:143`).
  */
object Sink {

  val DefaultBuckets = 64

  /** Per-table write locks: concurrent upserts from ONE JVM (the usual
    * single-driver deployment) serialize instead of racing the shared
    * `_temporary` committer dir and each other's partition overwrites.
    * Cross-JVM concurrent writers need a transactional table format
    * (Delta/Iceberg) — out of scope for a parquet sink, documented here.
    */
  private val pathLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[graft] def lockFor(path: String): Object =
    pathLocks.computeIfAbsent(path, _ => new Object)

  /** Reap leftover survivor-staging dirs from crashed upserts: the UUID
    * names make them unidentifiable to their (dead) writer, so any
    * `<table>.survivors-*` whose LAST WRITE is older than the reap age is
    * treated as garbage. Staleness is judged by the newest mtime found in a
    * bounded-depth recursive scan of the dir, not the dir's creation time —
    * an in-flight Spark write lands task output nested under
    * `_temporary/<job>/_temporary/<task>/part-…` (direct children only
    * appear at job commit), so a live writer in ANOTHER JVM (the table lock
    * is JVM-local) refreshes the signal through its deepest in-progress
    * files. Residual cross-JVM hazard, documented: a writer that finished
    * writing >reap-age ago but is still in its read-back phase could still
    * lose its dir — tune `graft.sink.stagingReapAgeMs` (Spark conf, default
    * 24h) above the slowest expected migration, or use a transactional
    * table format for true multi-writer deployments.
    */
  private[graft] def reapStaleStaging(spark: SparkSession, path: String): Unit = {
    val maxAgeMs = spark.conf.getOption("graft.sink.stagingReapAgeMs")
      .map(_.toLong).getOrElse(24L * 3600 * 1000)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = p.getParent
    if (parent != null && fs.exists(parent)) {
      // survivors- from upserts; migrate-/old- from schema migrations
      // (full-table-sized — a kill -9 between write and promote would
      // otherwise leak 1-2x the table size permanently).
      val prefixes = Seq(".survivors-", ".migrate-", ".old-").map(p.getName + _)
      val cutoff = System.currentTimeMillis() - maxAgeMs
      // Depth 5 reaches <staging>/_temporary/<job>/_temporary/<task>/part-…
      // (the FileOutputCommitter layout while a write is in flight).
      def newestMtime(st: org.apache.hadoop.fs.FileStatus, depth: Int): Long = {
        val self = st.getModificationTime
        if (depth <= 0 || !st.isDirectory) self
        else {
          val kids =
            try fs.listStatus(st.getPath)
            catch { case _: java.io.IOException => Array.empty[org.apache.hadoop.fs.FileStatus] }
          (self +: kids.map(newestMtime(_, depth - 1)).toSeq).max
        }
      }
      fs.listStatus(parent).foreach { st =>
        if (prefixes.exists(st.getPath.getName.startsWith)) {
          if (newestMtime(st, depth = 5) < cutoff) fs.delete(st.getPath, true)
        }
      }
    }
  }

  /** Project the canonical chunk frame into the sink schema. */
  def project(df: DataFrame, textCol: String = "chunk", vecCol: String = "embedding",
              sourceCol: String = "source"): DataFrame = {
    val metaCols = df.columns
      .filter(c => c != textCol && c != vecCol && c != sourceCol)
      .map(col).toSeq
    df.select(
      Seq(
        expr("uuid()").as("id"),
        col(textCol).as("text"),
        col(vecCol).as("vector"),
        col(sourceCol).as("source")) ++ metaCols: _*)
  }

  /** Upsert `df` into the table at `path`: source buckets present in `df`
    * are overwritten, everything else is untouched. This is the scale-safe
    * version of the reference's delete-by-source + append (`sinks.py:66-93`).
    *
    * Bucket-collision safety: overwriting a bucket must not drop UNCHANGED
    * sources that merely hash into it. Survivors — rows in affected buckets
    * whose source is not in the incoming batch — are read back (a
    * partition-PRUNED scan of only the affected buckets, never the whole
    * table) and carried through the rewrite. They are staged to a temp dir
    * first because Spark cannot overwrite a path it is simultaneously
    * reading; survivor volume is bounded by the collision rate, not table
    * size.
    */
  def upsertBySource(df: DataFrame, path: String, sourceCol: String = "source",
                     numBuckets: Int = DefaultBuckets): Unit = lockFor(path).synchronized {
    val spark = df.sparkSession
    reapStaleStaging(spark, path)
    val withBucket = df.withColumn("source_bucket",
      pmod(hash(col(sourceCol)), lit(numBuckets)))
    val existing =
      try Some(spark.read.parquet(path)) catch { case _: Exception => None }
    val toWrite = existing match {
      case Some(old) =>
        val incomingBuckets = withBucket.select("source_bucket").distinct()
        val incomingSources = df.select(col(sourceCol).as("__in_src")).distinct()
        val survivors = old
          .join(broadcast(incomingBuckets), Seq("source_bucket"), "left_semi")
          .join(broadcast(incomingSources),
            col(sourceCol) === col("__in_src"), "left_anti")
        if (survivors.isEmpty) (withBucket, None)
        else {
          // Unique staging dir per invocation: a fixed path would let two
          // concurrent upserts to the same table overwrite each other's
          // staged survivors or delete a dir the other is still reading.
          val tmp = path + ".survivors-" + java.util.UUID.randomUUID().toString
          survivors.write.mode("overwrite").parquet(tmp)
          (withBucket.unionByName(spark.read.parquet(tmp)), Some(tmp))
        }
      case None => (withBucket, None)
    }
    val (out, staging) = toWrite
    // try/finally: a failed overwrite must not leak its staging dir (the
    // UUID name would make it unreapable by anything but the age-based
    // sweep above).
    try {
      out.write
        .partitionBy("source_bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    } finally {
      staging.foreach { tmp =>
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
    }
  }

  /** Read the sink table back. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compacting, clustering write — the 100 TB answer to the small-files
    * problem and its mirror image (one giant unsplittable file per task):
    * range-repartition on `clusterCols` into `numFiles` partitions, sort
    * rows within each, and write with `maxRecordsPerFile` as the overflow
    * valve. Range partitioning + in-file ordering give every parquet
    * column chunk tight min/max bounds on the cluster key, so downstream
    * scans filtering on it prune at BOTH the file and row-group level —
    * poor-man's z-ordering for the 1-key case, at the cost of one range
    * shuffle (sampled boundaries, skew-tolerant).
    */
  def compactWrite(df: DataFrame, path: String, clusterCols: Seq[String],
                   numFiles: Int, maxRecordsPerFile: Long = 5000000L): Unit = {
    require(clusterCols.nonEmpty, "graft.Sink.compactWrite: clusterCols is empty")
    val keys = clusterCols.map(col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** The distinct incoming sources that scope an upsert — the reference's
    * `set(doc.metadata["source"])` (`sinks.py:66-72,129-135`).
    */
  def distinctSources(df: DataFrame, sourceCol: String = "source"): DataFrame =
    df.select(sourceCol).distinct()
}
