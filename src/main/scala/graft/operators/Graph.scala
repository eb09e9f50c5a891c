package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficients over an edge list —
  * the link-graph cohesion signals crawl curation uses alongside
  * [[PageRank]]: a page whose neighborhood is densely inter-linked (high
  * clustering) sits in a genuine community; link-farm spam rings show up as
  * anomalously high triangle density, isolated doorway pages as zero.
  *
  * Algorithm: the degree-ordered node-iterator ("compact-forward").
  * Edges are first canonicalized to undirected form (self-loops dropped,
  * parallel/reverse duplicates collapsed), then each undirected edge is
  * oriented from its LOWER-(degree, id) endpoint to its higher one. Every
  * triangle {a,b,c} then has exactly one wedge (a→b, a→c) centered at its
  * smallest endpoint whose closing edge (b→c) is also oriented — so one
  * wedge self-join plus one semi-join against the oriented edge set counts
  * each triangle exactly once.
  *
  * Why this survives 100 TB: the naive wedge join explodes on hub nodes —
  * Σ d(v)² wedges, quadratic in the max degree (a 10M-degree hub alone
  * generates 10¹⁴ wedges). Orienting by degree bounds the out-degree of
  * every node by O(√|E|) (a node of degree d only keeps edges to
  * HIGHER-degree neighbors, and there can be at most 2|E|/d of those), so
  * the wedge count is O(|E|^1.5) worst-case regardless of skew — the
  * standard bound (Latapy 2008; Suri & Vassilvitskii's MapReduce variant).
  * All three joins shuffle on node keys; nothing is ever collected.
  */
object Graph {

  /** Canonical undirected edge set: `(u, v)` with `u < v`, self-loops
    * dropped, duplicates (including reversed duplicates) collapsed.
    */
  def undirected(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()

  /** Per-node triangle participation and local clustering coefficient:
    * `(id, degree, triangles, clustering)` for every node of the
    * undirected projection, `clustering = 2·T(v) / (d(v)·(d(v)−1))`
    * (0.0 for degree-1 nodes), rounded to 6 decimals. Deterministic —
    * exact counts, no sampling — so fully oracle-checkable.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).cast("long").as("degree"))

    // Orient each undirected edge from its lower-(degree, id) endpoint to
    // the higher one: (degree, id) is a total order, so orientation is
    // deterministic and acyclic.
    val du = deg.select(col("id").as("u"), col("degree").as("__du"))
    val dv = deg.select(col("id").as("v"), col("degree").as("__dv"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(col("__du") < col("__dv") ||
            (col("__du") === col("__dv") && col("u") < col("v")),
          struct(col("u").as("lo"), col("v").as("hi")))
          .otherwise(struct(col("v").as("lo"), col("u").as("hi")))
          .as("__e"))
      .select(col("__e.lo").as("lo"), col("__e.hi").as("hi"))

    // Wedges centered at the orientation-minimal endpoint; b < c pins each
    // unordered neighbor pair once. Closing edge must exist in EITHER
    // orientation between b and c — membership in the undirected set is
    // the cheapest check (u < v canonical).
    val wedges = oriented.select(col("lo").as("a"), col("hi").as("b"))
      .join(oriented.select(col("lo").as("a"), col("hi").as("c")), "a")
      .filter(col("b") < col("c"))
    val triangles = wedges.join(und,
      wedges("b") === und("u") && wedges("c") === und("v"), "left_semi")

    // Each triangle credits all three corners.
    val perNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).cast("long").as("triangles"))

    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") > 1,
          round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("degree") * (col("degree") - lit(1L))), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** k-core decomposition by synchronous peeling: repeatedly remove every
    * node whose degree in the SURVIVING graph is below `k`. The k-core is
    * the classic link-graph noise filter — doorway pages, dangling chains,
    * and one-shot spam hang off the graph as low-degree tendrils and peel
    * away in a few rounds, while genuinely interconnected content (the
    * 2-core and up) survives. Runs a FIXED `rounds` of peeling, so the
    * output is deterministic and oracle-checkable; a long path can take
    * ~length/2 rounds to fully dissolve, so callers wanting the exact
    * fixpoint compare round r with r+1 (the [[GraphSpec]] convergence
    * probe) or size `rounds` to the graph's peel depth. Returns the
    * surviving nodes with their residual degree.
    *
    * Scale shape: each round is one degree aggregation (partial,
    * map-side) plus two semi-joins of the edge list against the
    * still-qualified node set — all shuffles on node keys, work strictly
    * shrinking per round; `localCheckpoint` truncates the per-round
    * lineage exactly like [[Components]]' closure loop.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    val spark = edges.sparkSession
    // Iteration width from the MEASURED edge count (the PageRank loop
    // discipline): a small graph peels each round in a couple of tasks
    // instead of paying session-width shuffles six times over.
    val (eP, nParts) = Partitioning.measuredCoPartition(
      undirected(edges, srcCol, dstCol), col("u"))
    try Partitioning.withShuffleWidth(spark, nParts) {
      var e = eP
      var i = 0
      while (i < rounds) {
        val deg = e.select(col("u").as("id"))
          .union(e.select(col("v").as("id")))
          .groupBy("id").agg(count(lit(1)).as("degree"))
        // Anti-join on the DISQUALIFIED set: after the first round the
        // peel frontier is small (only nodes whose neighbors just
        // vanished can newly fall below k), so the broadcast side shrinks
        // every round — cheaper than semi-joining against the large
        // surviving set. Round 1 is the exception: on a sparse graph the
        // initial sub-k set can be a large fraction of ALL nodes, so the
        // hint is deferred to later rounds and AQE picks round 1's
        // strategy from the measured size.
        val bad = deg.filter(col("degree") < k).select(col("id"))
        def side(name: String): DataFrame = {
          val b = bad.withColumnRenamed("id", name)
          if (i == 0) b else broadcast(b)
        }
        e = e
          .join(side("u"), Seq("u"), "left_anti")
          .join(side("v"), Seq("v"), "left_anti")
          // The per-round EAGER checkpoint is load-bearing, not an
          // optimization: each round's plan references the previous
          // round's edges THREE times (both degree branches + the filter
          // input), so an un-truncated lineage re-expands 3^rounds copies
          // of the base scan — the iterative-algorithm trap the PageRank
          // loop documents.
          .localCheckpoint()
        i += 1
      }
      e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).cast("long").as("core_degree"))
    } finally eP.unpersist()
  }

  /** Anchor-text aggregation per link target — the web-graph enrichment
    * classic: the text OTHER pages use to link to a URL describes it
    * better than its own title (the signal behind anchor-text indexing in
    * web search). Per target: in-link count, distinct linking sources,
    * and the sorted distinct anchor texts joined with `" | "` (sorted set,
    * so the string is deterministic and oracle-checkable regardless of
    * partitioning).
    *
    * Scale shape: one partial-aggregating shuffle on the target key;
    * anchor sets are bounded with `slice(..., maxAnchors)` AFTER the sort
    * so a mega-degree target cannot blow the aggregation buffer past the
    * cap (the collect_set still holds distinct anchors for the group —
    * cap anchor cardinality upstream if distinct anchors themselves are
    * unbounded).
    */
  def anchorTexts(links: DataFrame, targetCol: String, anchorCol: String,
                  sourceCol: String, maxAnchors: Int = 20): DataFrame = {
    require(maxAnchors >= 1, "maxAnchors must be >= 1")
    links
      .filter(col(targetCol).isNotNull)
      .groupBy(col(targetCol).as("target"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col(sourceCol)).as("n_sources"),
        array_join(
          slice(array_sort(collect_set(col(anchorCol))), 1, maxAnchors),
          " | ").as("anchors"))
  }

  /** Whole-graph summary: `(n_nodes, n_edges, n_triangles,
    * global_clustering)` where global clustering is the transitivity ratio
    * `3·triangles / open+closed wedges` (0.0 on wedge-free graphs).
    */
  def triangleSummary(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val per = triangleCounts(edges, srcCol, dstCol)
    per.agg(
        count(lit(1)).as("n_nodes"),
        (sum(col("degree")) / 2).cast("long").as("n_edges"),
        (sum(col("triangles")) / 3).cast("long").as("n_triangles"),
        sum(col("degree") * (col("degree") - lit(1L)) / 2).as("__wedges"),
        sum(col("triangles")).as("__closed"))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        when(col("__wedges") > 0,
          round(col("__closed") / col("__wedges").cast("double"), 6))
          .otherwise(lit(0.0)).as("global_clustering"))
  }

  /** One-row directed-graph health report: node/edge counts, reciprocity
    * (fraction of edges whose reverse also exists — near 0 for a crawl's
    * citation structure, near 1 for a social graph; a sudden shift means
    * the extractor or the corpus changed character), and degree
    * assortativity (Pearson of endpoint TOTAL degrees over edges —
    * negative means hubs link to leaves, the usual web shape).
    *
    * Exact arithmetic: counts and degree moment sums are BIGINTs; the
    * assortativity combination runs the fixed double shape of
    * [[Profile.pearsonByGroup]]; degenerate degree variance yields null.
    *
    * Scale shape: distinct edges, a degree aggregate (node-bounded), one
    * self-semi-join on the reversed edge (keyed), two degree joins, one
    * 1-row contraction. Self-loops count as reciprocal by definition.
    */
  def healthStats(edges: DataFrame, srcCol: String,
                  dstCol: String): DataFrame = {
    val e = edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("s"), col(dstCol).as("d")).distinct()
    val nodes = e.select(col("s").as("v"))
      .unionByName(e.select(col("d").as("v"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val deg = e.select(col("s").as("v"))
      .unionByName(e.select(col("d").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val rev = e.select(col("d").as("s"), col("s").as("d"))
    val recip = e.join(rev, Seq("s", "d"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal"))
    val m = e
      .join(deg.select(col("v").as("s"), col("deg").as("__x")), Seq("s"))
      .join(deg.select(col("v").as("d"), col("deg").as("__y")), Seq("d"))
      .agg(count(lit(1)).as("n_edges"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val vx = col("n_edges").cast("double") * col("__sxx") -
      col("__sx").cast("double") * col("__sx")
    val vy = col("n_edges").cast("double") * col("__syy") -
      col("__sy").cast("double") * col("__sy")
    val cov = col("n_edges").cast("double") * col("__sxy") -
      col("__sx").cast("double") * col("__sy")
    m.crossJoin(broadcast(nodes)).crossJoin(broadcast(recip))
      .select(col("n_nodes"), col("n_edges"), col("n_reciprocal"),
        round(col("n_reciprocal").cast("double") / col("n_edges"), 6)
          .as("reciprocity"),
        when(vx > 0 && vy > 0, round(cov / (sqrt(vx) * sqrt(vy)), 6))
          .otherwise(lit(null).cast("double")).as("assortativity"))
  }
}
