package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * Two tables bucketed by the same key into the same bucket count join
  * WITHOUT a shuffle: each task reads matching bucket files from both
  * sides. At 100 TB this removes the dominant cost of repeated fact-to-fact
  * joins (e.g. chunks-to-embeddings, corpus-to-state) — the shuffle is paid
  * once at write time and amortized over every subsequent join.
  */
object Bucketing {

  /** Persist `df` as a bucketed (+ sorted, for sort-merge-ready reads)
    * parquet table in the session catalog.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int = 64): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key — plans with
    * zero Exchange operators when bucket specs line up.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True if the physical plan of `df` contains no shuffle exchange —
    * the assertion that bucketing actually removed the shuffle. Broadcast
    * exchanges don't count: a broadcast is a replication, not a shuffle.
    *
    * Walks the executed plan for `ShuffleExchangeLike` nodes (their
    * `nodeName` renders as "Exchange", so string-matching "ShuffleExchange"
    * would never fire) including those hidden inside AQE's
    * `AdaptiveSparkPlanExec` wrapper.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // AQE materializes exchanges as QueryStageExec leaves (and reuses them
    // via ReusedExchangeExec), so a plain collectFirst over the tree never
    // reaches the ShuffleExchangeLike wrapped inside — recurse into both.
    def hasShuffle(p: SparkPlan): Boolean = p.collectFirst {
      case _: ShuffleExchangeLike => true
      case a: AdaptiveSparkPlanExec if hasShuffle(a.executedPlan) => true
      case q: QueryStageExec if hasShuffle(q.plan) => true
      case r: ReusedExchangeExec if hasShuffle(r.child) => true
    }.isDefined
    !hasShuffle(df.queryExecution.executedPlan)
  }
}
