package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins: key salting.
  *
  * A hash-partitioned join sends every row of a hot key to ONE reducer; at
  * 100 TB a single pathological key (empty source, default id, null-ish
  * sentinel) turns the whole stage into one straggler task. Salting splits
  * each fact-side key into `numSalts` sub-keys and replicates the matching
  * dimension rows across all sub-keys — the hot key's work spreads over
  * `numSalts` tasks while join RESULTS are exactly those of the plain join.
  *
  * This is the static complement to AQE's skew-join splitting (which only
  * kicks in for sort-merge joins above size thresholds); salting also works
  * for aggregations ([[saltedCount]]) where AQE cannot help because the
  * skew is in the group key itself.
  */
object Skew {

  /** Equi-join `fact` with `dim` on `key`, salted `numSalts` ways.
    * Result is identical to `fact.join(dim, key)` (inner). The fact side's
    * salt is derived from a hash of the whole row so it is deterministic
    * and uniform; the dim side is replicated `numSalts` times — keep `dim`
    * small relative to `fact` (the usual skew shape).
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     numSalts: Int = 16): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val factCols = fact.columns.map(col).toIndexedSeq
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols: _*), lit(numSalts)).cast("int"))
    val dimExploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(dimExploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe count per key: pre-aggregate on (key, salt), then combine.
    * Two small shuffles instead of one skewed one; result identical to
    * `df.groupBy(key).count()`.
    */
  def saltedCount(df: DataFrame, key: String, numSalts: Int = 16): DataFrame = {
    val cols = df.columns.map(col).toIndexedSeq
    df.withColumn("__salt", pmod(xxhash64(cols: _*), lit(numSalts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))
  }
}
