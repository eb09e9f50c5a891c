package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Committed dev tool (the [[TimeGates]] pattern): measure the
  * broadcast-vs-indexed percolation crossover at REGISTRY scale — the
  * r11 verdict asked for a number on `percolateIndexed`'s "work scales
  * with Σ df(rarest term)" claim beyond the 5-query gate fixture.
  *
  * Registry generation is deterministic (no RNG): query i pairs the
  * `(i % V)`-th and `(i * 7 % V)`-th tokens of the corpus vocabulary in
  * frequency order, plus a per-query unique rare term for one third of
  * queries — mixed-selectivity conjunctive queries, the percolator
  * workload shape. Both regimes run the SAME registry; the broadcast
  * regime's `maxRegistry` bound (100k) is respected.
  *
  * Usage: runMain graft.tools.PercolateBench <sfDir> <sizes,comma-sep>
  * e.g. runMain graft.tools.PercolateBench /root/testdata/sf0.1 1000,10000,50000
  */
object PercolateBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sizesS) = args
    val sizes = sizesS.split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")) // mirror Bench (r17)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // Vocabulary in descending-frequency order — the registry mixes
    // common terms (heavy postings) with unique rare terms (df 0/1).
    val vocab = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok"))
      .limit(2000)
      .collect().map(_.getString(0))
    val v = vocab.length
    for (n <- sizes) {
      val registry: Seq[(String, Seq[String])] = (0 until n).map { i =>
        val base = Seq(vocab(i % v), vocab((i * 7 + 13) % v)).distinct
        val terms =
          if (i % 3 == 0) base :+ s"zz_rare_term_$i" // df-0 rarest term
          else base
        (s"q$i", terms)
      }
      import spark.implicits._
      val regDf = registry.toDF("query_id", "terms")
      def time(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        println(f"[percolate-bench] n=$n%6d $label%-10s " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$rows")
      }
      time("indexed") {
        graft.operators.Search
          .percolateIndexed(docs, "text", "doc_id", regDf).count()
      }
      time("broadcast") {
        graft.operators.Search
          .percolate(docs, "text", "doc_id", registry).count()
      }
    }
    spark.stop()
  }
}
