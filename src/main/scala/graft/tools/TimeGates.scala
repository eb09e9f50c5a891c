package graft.tools

import org.apache.spark.sql.SparkSession

/** Committed dev tool (like [[VerifyOne]]): time a subset of gates N times
  * each within ONE session, so JIT/classload warm-up is visible as rep-1
  * and the warm steady-state as the later reps — the fast way to tell a
  * real per-gate regression from run-order noise without a full Bench
  * sweep (used to diagnose the r7 dsir_weights / similarity_ivf swings).
  * Usage: runMain graft.tools.TimeGates <gate[,gate...]> <sfDir> <reps>
  */
object TimeGates {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, repsS) = args
    val reps = repsS.toInt
    // Mirror Bench's session sizing exactly (CPU-count parallelism + the
    // AQE coalesce floor) — timings are only diagnostic against Bench
    // numbers if the plans match.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")) // mirror Bench (r17)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names.split(',').toSeq; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[time] $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
    }
    spark.stop()
  }
}
