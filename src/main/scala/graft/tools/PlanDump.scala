package graft.tools

import org.apache.spark.sql.SparkSession

/** Committed dev tool: write `explain("formatted")` for the named gates to
  * a directory — the optimization rounds' before/after plan evidence
  * (`plans/r16/<gate>_{before,after}.txt`). Runs each gate's action first
  * so the dumped plan is the AQE-final runtime plan (the Bench discipline).
  * Usage: runMain graft.tools.PlanDump <gate[,gate...]> <sfDir> <outDir> <suffix>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir, suffix) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")) // mirror Bench (r17)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect() // execute so the plan below is the AQE-final one
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(
        new java.io.File(dir, s"${n}_$suffix.txt"), "UTF-8")
      try w.write(formatted) finally w.close()
      println(s"[plandump] wrote ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
