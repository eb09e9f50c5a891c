package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Committed dev tool (the [[TimeGates]] family): per-gate STAGE
  * attribution for the optimization rounds. For each named gate it runs
  * `df.count()` twice (rep 1 = warm-up, rep 2 = measured) and prints, for
  * the measured rep, every stage's task count, summed executor run time,
  * and max single-task time — the direct probe for the two local-mode
  * killers the optimization guide names: a SERIAL stage (1 task carrying
  * the whole gate's CPU on a 32-core box, §2.5 unsplittable input) and a
  * skewed stage (max-task >> sum/tasks, §2.5 hot keys).
  * Usage: runMain graft.tools.ProfileGates <gate[,gate...]> <sfDir>
  */
object ProfileGates {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")) // mirror Bench (r17)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // (stageId -> (name, numTasks, sumTaskMs, maxTaskMs))
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long, Long, Long)]
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)] // sum, max, gc
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (collecting) {
        val m = Option(e.taskMetrics)
        val ms = m.map(_.executorRunTime).getOrElse(0L)
        val gc = m.map(_.jvmGCTime).getOrElse(0L)
        taskMs.merge(e.stageId, (ms, ms, gc),
          (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (collecting) {
        val info = e.stageInfo
        val (sum, max, gc) = Option(taskMs.get(info.stageId)).getOrElse((0L, 0L, 0L))
        stages.put(info.stageId,
          (info.name.takeWhile(_ != '\n').take(90), info.numTasks, sum, max, gc))
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect() // session warm-up
    for (n <- names.split(',').toSeq) {
      val fn = graft.SparkEntry.queries(n)
      spark.catalog.clearCache(); System.gc()
      val tw0 = System.nanoTime()
      fn(spark, sfDir).count() // warm-up rep
      val warmS = (System.nanoTime() - tw0) / 1e9
      spark.catalog.clearCache(); System.gc()
      stages.clear(); taskMs.clear(); collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      // listener bus is async; give stage-completed events a moment
      Thread.sleep(300)
      val snap = stages.asInstanceOf[java.util.Map[Int, (String, Int, Long, Long, Long)]]
      val rows = new java.util.ArrayList(snap.entrySet()).toArray
        .map(_.asInstanceOf[java.util.Map.Entry[Int, (String, Int, Long, Long, Long)]])
        .map(e => (e.getKey, e.getValue)).toSeq.sortBy(-_._2._3)
      val totalTaskMs = rows.map(_._2._3).sum
      val totalGcMs = rows.map(_._2._5).sum
      println(f"[prof] === $n wall=$wall%.2f s (warm-up rep $warmS%.2f s) " +
        f"stages=${rows.size} taskTimeSum=${totalTaskMs / 1000.0}%.2f s gcSum=${totalGcMs / 1000.0}%.2f s ===")
      rows.take(12).foreach { case (id, (nm, nt, sum, max, gc)) =>
        println(f"[prof]   stage $id%4d tasks=$nt%3d sum=${sum / 1000.0}%7.2f s max=${max / 1000.0}%7.2f s gc=${gc / 1000.0}%5.2f s  $nm")
      }
    }
    spark.stop()
  }
}
