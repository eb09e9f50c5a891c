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

  /** Fixed-iteration PERSONALIZED PageRank (random walk with restart):
    * the teleport mass returns only to `seeds`, so scores measure
    * closeness to the seed set along link structure — the standard
    * seed-expansion move in corpus curation ("find more pages like these
    * trusted ones") and the graph-side complement of
    * [[graft.operators.Dsir]]'s content-side reweighting. Update:
    * `rank = (1 − d)·seed + d·Σ(rank_src/outdeg_src)` with initial rank
    * equal to the seed indicator; fixed iterations → deterministic →
    * oracle-checkable. Non-seed nodes with no inbound paths from seeds
    * stay at exactly 0.0 — a clean "unreachable" signal.
    *
    * Scale shape identical to [[ranks]]: edge list co-partitioned once on
    * the per-round join key and persisted, measured iteration width,
    * per-round `localCheckpoint`, seed indicator carried as a column of
    * the node table (one broadcast-sized left join at setup, nothing
    * per-round).
    */
  def personalized(edges: DataFrame, seeds: DataFrame, srcCol: String,
                   dstCol: String, seedCol: String, iterations: Int = 3,
                   damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "personalized PageRank needs at least one iteration")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val (eP, nParts) = Partitioning.measuredCoPartition(e, col("src"))
    var linked: DataFrame = null
    try Partitioning.withShuffleWidth(spark, nParts) {
      val outDeg = eP.groupBy(col("src")).agg(count(lit(1)).as("__outdeg"))
      linked = eP.join(outDeg, "src").repartition(nParts, col("src")).persist()
      linked.count()
      val nodes = eP.select(col("src").as("id"))
        .union(eP.select(col("dst").as("id")))
        .distinct()
      val seeded = nodes
        .join(seeds.select(col(seedCol).as("id")).distinct()
          .withColumn("__seed", lit(1.0)), Seq("id"), "left")
        .select(col("id"), coalesce(col("__seed"), lit(0.0)).as("__s0"))
        .localCheckpoint()
      var ranks = seeded.select(col("id"), col("__s0").as("rank"))
        .localCheckpoint()
      var i = 0
      while (i < iterations) {
        val contribs = linked.join(ranks, linked("src") === ranks("id"))
          .select(col("dst").as("id"), (col("rank") / col("__outdeg")).as("__c"))
          .groupBy(col("id")).agg(sum(col("__c")).as("__csum"))
        ranks = seeded.join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(1.0 - damping) * col("__s0") +
              lit(damping) * coalesce(col("__csum"), lit(0.0))).as("rank"))
          .localCheckpoint()
        i += 1
      }
      ranks.select(col("id"), round(col("rank"), 6).as("ppr"))
    } finally {
      eP.unpersist()
      if (linked != null) linked.unpersist()
    }
  }

  /** Fixed-iteration HITS (Kleinberg 1999): mutually recursive hub and
    * authority scores over a directed edge list — the complement of
    * [[ranks]] for link-graph curation (PageRank finds globally endorsed
    * pages; HITS separates directories-of-links (hubs) from
    * frequently-linked content (authorities), the split that matters when
    * scoring crawl link farms vs genuinely cited documents).
    *
    * Per iteration: `auth(v) = sum of hub(u) over in-edges`, normalized;
    * then `hub(u) = sum of auth(v) over out-edges`, normalized. Each side
    * normalizes by its MAX (top score = 1.0), not the usual L2 norm: max
    * is addition-order-independent, so the result is deterministic under
    * any partitioning and therefore oracle-checkable — an L2 norm would
    * float-sum thousands of doubles in engine-dependent order. With a
    * fixed iteration count the output is exact: `(id, hub, authority)`,
    * 6-dp rounded. Nodes missing in-edges score authority 0; missing
    * out-edges, hub 0.
    *
    * Scale shape, same pattern as [[ranks]]: the edge list is
    * co-partitioned once and persisted, each round is two
    * aggregate+left-join pairs at measured width, `localCheckpoint` stops
    * lineage growth, and the per-round normalizer is a broadcast 1-row max.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "HITS needs at least one iteration")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val (eP, nParts) = Partitioning.measuredCoPartition(e, col("src"))
    try Partitioning.withShuffleWidth(spark, nParts) {
      val nodes = eP.select(col("src").as("id"))
        .union(eP.select(col("dst").as("id")))
        .distinct()
        .localCheckpoint()
      var hubs = nodes.withColumn("h", lit(1.0)).localCheckpoint()
      var auths: DataFrame = null
      var i = 0
      while (i < iterations) {
        val aRaw = eP.join(hubs, eP("src") === hubs("id"))
          .select(col("dst").as("id"), col("h"))
          .groupBy(col("id")).agg(sum(col("h")).as("__s"))
        val aMax = aRaw.agg(max(col("__s")).as("__m"))
        auths = nodes.join(aRaw, Seq("id"), "left")
          .crossJoin(broadcast(aMax))
          .select(col("id"), coalesce(col("__s") / col("__m"), lit(0.0)).as("a"))
          .localCheckpoint()
        val hRaw = eP.join(auths, eP("dst") === auths("id"))
          .select(col("src").as("id"), col("a"))
          .groupBy(col("id")).agg(sum(col("a")).as("__s"))
        val hMax = hRaw.agg(max(col("__s")).as("__m"))
        hubs = nodes.join(hRaw, Seq("id"), "left")
          .crossJoin(broadcast(hMax))
          .select(col("id"), coalesce(col("__s") / col("__m"), lit(0.0)).as("h"))
          .localCheckpoint()
        i += 1
      }
      hubs.join(auths, Seq("id"))
        .select(col("id"), round(col("h"), 6).as("hub"),
          round(col("a"), 6).as("authority"))
    } finally eP.unpersist()
  }
}
