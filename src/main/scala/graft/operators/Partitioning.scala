package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for compute-bound operators.
  *
  * A scan's task count is bounded by parquet row-group granularity, not by
  * file size: a table written as one row group is read by ONE task no matter
  * how many cores exist, and every narrow transform downstream (chunking,
  * embedding, hashing UDFs) inherits that. On a production table (thousands
  * of row groups across many files) scans parallelize naturally and
  * [[ensureParallelism]] is a no-op; on under-partitioned input it pays one
  * round-robin shuffle to unlock the cluster for the expensive stage that
  * follows — the classic "repartition before the heavy map" pattern.
  */
object Partitioning {

  /** Repartition `df` up to the cluster's default parallelism iff its
    * current plan yields fewer partitions; never coalesces.
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    // Streaming frames can't be inspected via .rdd (and micro-batch
    // parallelism is governed by the source anyway) — pass through.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Shuffle width for an ITERATIVE operator, from the measured row count
    * of its per-round working set: a loop over a tiny table must not pay
    * (session-width tasks) x (stages/round) x rounds of scheduling
    * overhead, while a cluster-scale working set keeps full width.
    * ~4M (long, long) rows ≈ 64 MB per task, the usual shuffle sweet spot.
    */
  def iterationWidth(spark: org.apache.spark.sql.SparkSession, rows: Long,
                     rowsPerPartition: Long = 4L * 1000 * 1000): Int = {
    val defaultParts = spark.sessionState.conf.numShufflePartitions
    math.max(1L, math.min(defaultParts.toLong, rows / rowsPerPartition + 1)).toInt
  }

  /** Cache `df` co-partitioned on `key` at a width measured from its own
    * row count (see [[iterationWidth]]): repartition at session width,
    * persist, count (the cache-populating pass), and — when the measured
    * width is narrower — re-layout once FROM the cache and swap the persist.
    * Returns (cached frame, width); the CALLER owns the unpersist and
    * should hold it in a try/finally so a mid-loop failure doesn't leak the
    * cache.
    */
  def measuredCoPartition(df: DataFrame,
                          key: org.apache.spark.sql.Column): (DataFrame, Int) = {
    val spark = df.sparkSession
    val wide = df.repartition(key).persist()
    try {
      val rows = wide.count()
      val n = iterationWidth(spark, rows)
      if (n == spark.sessionState.conf.numShufflePartitions) (wide, n)
      else {
        val narrow = wide.repartition(n, key).persist()
        narrow.count()
        wide.unpersist()
        (narrow, n)
      }
    } catch {
      case e: Throwable => wide.unpersist(); throw e
    }
  }

  /** Run `f` with `spark.sql.shuffle.partitions` pinned to `n`, restoring
    * the previous value after. Spark sizes every exchange from that conf,
    * so an eagerly-executed iteration loop is the one place a temporary
    * session-conf mutation is the right tool; the caller must ensure the
    * loop owns the session while it runs (Bench/Verify run queries
    * sequentially) and return only checkpointed leaves.
    */
  def withShuffleWidth[T](spark: org.apache.spark.sql.SparkSession, n: Int)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
