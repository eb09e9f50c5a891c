package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge list — the link-graph
  * quality signal web-crawl curation uses to weight documents (harmonic/
  * PageRank centrality is a standard CommonCrawl-derived feature). This is
  * the UNNORMALIZED variant (initial rank 1.0, update
  * `rank = (1 - d) + d * sum(rank_src / outdeg_src)`, dangling mass not
  * redistributed) — the formulation GraphX's reference implementation uses;
  * with a fixed iteration count it is fully deterministic and therefore
  * oracle-checkable.
  *
  * Scale shape (same iterative pattern as [[Components]]):
  *   - the edge list is joined once to out-degrees, pre-partitioned on the
  *     per-round join key (src) and persisted — every round's
  *     ranks-to-edges join reuses that layout and moves only the
  *     (node, rank) table;
  *   - iteration width scales with the MEASURED edge count
  *     ([[Partitioning.iterationWidth]]): a small graph runs each round in
  *     a couple of tasks, a cluster-scale graph keeps full width;
  *   - each round is two shuffles (contribution aggregation + the
  *     node-table left join), `localCheckpoint`ed to stop lineage growth.
  */
object PageRank {

  /** Rank per node: `(id, pagerank)` (rounded to 6 decimals). Nodes are
    * everything appearing as source or destination; parallel edges count
    * multiply, self-loops are legal.
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "PageRank needs at least one iteration")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val (eP, nParts) = Partitioning.measuredCoPartition(e, col("src"))
    var linked: DataFrame = null
    try Partitioning.withShuffleWidth(spark, nParts) {
      val outDeg = eP.groupBy(col("src")).agg(count(lit(1)).as("__outdeg"))
      // (src, dst, outdeg) co-partitioned on src for the per-round join
      linked = eP.join(outDeg, "src").repartition(nParts, col("src")).persist()
      linked.count()
      val nodes = eP.select(col("src").as("id"))
        .union(eP.select(col("dst").as("id")))
        .distinct()
        .localCheckpoint()
      var ranks = nodes.withColumn("rank", lit(1.0)).localCheckpoint()
      var i = 0
      while (i < iterations) {
        val contribs = linked.join(ranks, linked("src") === ranks("id"))
          .select(col("dst").as("id"), (col("rank") / col("__outdeg")).as("__c"))
          .groupBy(col("id")).agg(sum(col("__c")).as("__csum"))
        ranks = nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(1.0 - damping) + lit(damping) * coalesce(col("__csum"), lit(0.0)))
              .as("rank"))
          .localCheckpoint()
        i += 1
      }
      ranks.select(col("id"), round(col("rank"), 6).as("pagerank"))
    } finally {
      eP.unpersist()
      if (linked != null) linked.unpersist()
    }
  }
}
