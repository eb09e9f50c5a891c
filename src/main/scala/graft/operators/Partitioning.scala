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
}
