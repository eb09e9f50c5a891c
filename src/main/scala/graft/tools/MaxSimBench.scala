package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MaxSim

/** Committed dev tool (the [[PercolateBench]] pattern): measure the
  * full-corpus MaxSim rerank against the two-stage (pooled-cosine recall →
  * MaxSim on survivors) deployment shape at corpus scale — the number
  * behind `maxsim_two_stage`'s claim that the single-vector stage bounds
  * the late-interaction work without losing the head of the ranking.
  *
  * Doc/query construction is deterministic (no RNG): the embeddings
  * table's vectors are regrouped by `vec_id / tokensPerDoc` into synthetic
  * multi-token documents; queries are every `queryStride`-th document's
  * first 2 tokens. Reported per configuration: wall time of both shapes
  * and top-k agreement (fraction of per-query top-k sets shared —
  * recall@k of the two-stage against the exact full rerank).
  *
  * Usage: runMain graft.tools.MaxSimBench <sfDir> <tokensPerDoc> <shortlist,comma-sep>
  * e.g. runMain graft.tools.MaxSimBench /root/testdata/sf0.1 10 10,25,50
  */
object MaxSimBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, tokensPerDocS, shortlistsS) = args
    val tokensPerDoc = tokensPerDocS.toInt
    val shortlists = shortlistsS.split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val gid = (col("vec_id") / tokensPerDoc).cast("long")
    val docs = MaxSim.tokenMatrix(emb, gid, "vec_id", "embedding", tokensPerDoc)
      .select(col("id").as("doc_id"), col("toks").as("d_tokens"),
        MaxSim.meanPool(col("toks")).as("d_pool")).cache()
    // integer group id BEFORE the modulo — the double form (vec_id/10 % 10)
    // only kept vec_id % 100 == 0 rows, shrinking queries to one token
    val queries = MaxSim.tokenMatrix(emb.filter(gid % 10 === 0),
        gid, "vec_id", "embedding", 2)
      .select(col("id").as("q_id"), col("toks").as("q_tokens"),
        MaxSim.meanPool(col("toks")).as("q_pool")).cache()
    val nDocs = docs.count(); val nQ = queries.count()
    println(s"[maxsim-bench] docs=$nDocs queries=$nQ tokensPerDoc=$tokensPerDoc")

    val k = 10
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def topSets(df: DataFrame): Map[Long, Set[Long]] = df
      .select(col("q_id").cast("long"), col("doc_id").cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val (full, tFull) = time {
      topSets(MaxSim.rerank(queries, "q_id", "q_tokens",
        docs, "doc_id", "d_tokens", k))
    }
    println(f"[maxsim-bench] full rerank: $tFull%.2f s")

    for (shortlist <- shortlists) {
      val (two, tTwo) = time {
        val stage1 = docs.crossJoin(broadcast(queries))
          .withColumn("s1", round(
            graft.functions.VectorFunctions.cosineSimilarity(col("q_pool"), col("d_pool")), 6))
          .withColumn("r1", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
              .orderBy(col("s1").desc, col("doc_id").asc)))
          .filter(col("r1") <= shortlist)
        topSets(MaxSim.rerankPairs(stage1, "q_id", "q_tokens",
          "doc_id", "d_tokens", k))
      }
      val agree = full.keys.toSeq.map { q =>
        val f = full(q); val t = two.getOrElse(q, Set.empty)
        (f intersect t).size.toDouble / math.max(1, f.size)
      }
      val recall = agree.sum / math.max(1, agree.size)
      println(f"[maxsim-bench] shortlist=$shortlist%4d: $tTwo%.2f s, recall@$k=$recall%.4f")
    }
    spark.stop()
  }
}
