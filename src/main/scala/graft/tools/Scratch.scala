package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val ids = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    val e1 = ids.filter(col("doc_id") % 7 < 3)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
    val e2 = ids.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
    val edges = e1.union(e2)
      .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")

    (1 to 3).foreach { rep =>
      spark.catalog.clearCache(); System.gc()
      time(s"components rep$rep") {
        graft.operators.Components.connectedComponents(edges, "src", "dst").count()
      }
      println(s"[scratch] shuffle.partitions after: " +
        spark.conf.get("spark.sql.shuffle.partitions"))
    }
    spark.stop()
  }
}
