package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time a subset of gates N times each within one session
  * (JIT-warm), for diagnosing run-to-run variance. Deleted after use.
  * Usage: runMain graft.tools.TimeGates <gate[,gate...]> <sfDir> <reps>
  */
object TimeGates {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, repsS) = args
    val reps = repsS.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
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
