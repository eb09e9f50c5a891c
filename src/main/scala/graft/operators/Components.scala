package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns pairwise
  * near-dup output ([[Dedup.minhashLshPairs]] / [[Dedup.simhashPairs]] /
  * [[Dedup.cosinePairs]]) into duplicate CLUSTERS, and clusters into a
  * keep-list (one representative per cluster). Without it, A~B and B~C
  * pairs leave all three documents in the corpus; the closure keeps one.
  *
  * Algorithm: iterative hash-to-min label propagation with path doubling —
  * every node starts labeled with itself; each round takes the min label
  * across neighbors (one join + min-agg over the edge list), then jumps to
  * its label's label (self-join on the label table). The doubling step
  * halves label-chain depth each round, so convergence is O(log diameter)
  * rounds, not O(diameter) — the label table is (node, long) rows only,
  * never adjacency lists, so a giant duplicate cluster costs rows, not
  * task heap. (Same contraction family as the small-star/large-star
  * MapReduce algorithm.)
  *
  * Each round is two shuffles over (id, comp) pairs. Iteration state is
  * `localCheckpoint`ed: the doubling self-join references the round's plan
  * twice, so without truncation the LOGICAL plan doubles per round and
  * analysis cost explodes exponentially — checkpointing cuts each round to
  * a leaf. (Local checkpoints live in executor storage; a production
  * cluster run that must survive executor loss should set a reliable
  * `sparkContext.setCheckpointDir` and swap to `checkpoint()` — same
  * algorithm.) Non-convergence within `maxIterations` fails loudly rather
  * than returning partial components.
  */
object Components {

  /** Component label (= min reachable node id) for every node that appears
    * in `edges`: output `(id, component)`. Edges are treated as undirected;
    * self-loops and duplicate pairs are fine.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIterations: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    // Pre-partition the (big) edge list on the per-round join key and
    // persist: InMemoryRelation keeps the cached plan's outputPartitioning,
    // so every round's edges-to-labels join reuses this layout instead of
    // re-shuffling the edge list — only the (node, comp) label table moves
    // per round. Persisted BEFORE the eager initial-labels checkpoint so
    // that first pass also populates the cache.
    // Iteration width scales with the MEASURED edge list, not the session
    // default: a closure over a tiny near-dup pair graph must not pay
    // (session-width tasks) x (stages/round) x (log-diameter rounds) of
    // scheduling overhead, while a 100 TB pair graph keeps full cluster
    // width.
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val (symP, nParts) = Partitioning.measuredCoPartition(sym, col("dst"))
    // Per-round joins/aggregations run at the chosen width; the returned
    // DataFrame is a checkpointed leaf, so nothing downstream re-executes
    // under the temporarily mutated conf.
    try Partitioning.withShuffleWidth(spark, nParts) {
      var labels = symP.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint()
      // Convergence via the label-sum invariant: every node's label is
      // non-increasing round over round (one-hop min includes self; doubling
      // follows label(x) <= x), so the exact sum strictly decreases iff ANY
      // label changed — one agg over the just-checkpointed table replaces a
      // join against the previous round (one fewer shuffle per round).
      // decimal(38,0) keeps the sum exact for any graph that fits in longs.
      def labelSum(d: DataFrame): java.math.BigDecimal = {
        // empty labeling sums to NULL -> zero (converges on the first round)
        val s = d.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
        if (s == null) java.math.BigDecimal.ZERO else s
      }
      var prevSum = labelSum(labels)

      var converged = false
      var i = 0
      while (!converged && i < maxIterations) {
        // 1-hop: min label over self + neighbors
        val viaNeighbors = symP.join(labels, symP("dst") === labels("id"))
          .select(symP("src").as("id"), col("comp"))
        val oneHop = labels.select("id", "comp").union(viaNeighbors)
          .groupBy("id").agg(min("comp").as("comp"))
        // path doubling: follow the label's own label (comp is a node id, so
        // it always has a row in oneHop)
        val hops = oneHop.select(col("id").as("cid"), col("comp").as("ccomp"))
        val next = oneHop.join(hops, oneHop("comp") === hops("cid"))
          .select(oneHop("id"), col("ccomp").as("comp"))
          .localCheckpoint() // truncate lineage; superseded rounds are
                             // released by the ContextCleaner
        val nextSum = labelSum(next)
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        i += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"graft.Components: no convergence after $maxIterations rounds " +
            "(pathological graph?) — raise maxIterations")
      labels.select(col("id"), col("comp").as("component"))
    } finally symP.unpersist()
  }

  /** Apply a component labeling as a dedup: drop every row whose id is a
    * NON-representative member (id != component min) of some cluster; rows
    * absent from `components` (singletons) pass through. One left-anti
    * join against the (small) non-representative id set.
    */
  def dropDuplicates(df: DataFrame, idCol: String, components: DataFrame): DataFrame =
    df.join(
      components.filter(col("id") =!= col("component"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Keep ONE representative per duplicate cluster chosen by `orderBy`
    * (e.g. quality desc) instead of [[dropDuplicates]]'s min-id default —
    * the curation-aware variant: of N near-identical pages, keep the
    * highest-quality one. Ties (and the final tiebreak) fall back to the
    * ascending id so the choice is deterministic.
    *
    * Scale shape: ONE pass over `df` — left-join the (small, AQE-broadcast)
    * component table, then a single row_number window partitioned by
    * `coalesce(component, id)`. Singletons are their own size-1 window
    * partitions (trivially rank 1), so no branch re-reads the corpus and
    * any expensive computed column in `df` (e.g. a ~40-op quality score)
    * is evaluated exactly once per row. The window exchange moves only the
    * columns `df` projects — callers should `select` down to the output
    * schema first so the corpus-wide shuffle stays narrow. (Key safety:
    * a cluster's `component` is the min MEMBER id, and singleton ids are
    * by definition non-members, so the coalesced key never collides
    * across groups.)
    */
  /** INCREMENTAL closure: fold a new batch of duplicate pairs into an
    * existing component assignment without re-walking the accumulated pair
    * graph. The previous assignment is lossless for connectivity — each
    * old cluster collapses to a STAR (member → component edges), so the
    * closure over (stars ∪ new pairs) equals the closure over (all old
    * pairs ∪ new pairs), but the old side's size is one edge per member
    * instead of one per historical pair, and its diameter is 1, so the
    * path-doubling rounds are driven by the NEW batch's structure alone.
    * Labels stay canonical (min reachable id): merging two old clusters
    * through a new pair relabels both to the smaller min — exactly what a
    * full recompute would produce, which is what makes the incremental
    * path oracle-checkable against the full-graph truth.
    *
    * The daily-dedup companion of
    * [[graft.operators.Dedup.minhashLshIncrementalPairs]]: that finds the
    * batch's pairs, this folds them into the standing clusters.
    */
  def incrementalComponents(prevAssign: DataFrame, newPairs: DataFrame,
                            srcCol: String, dstCol: String,
                            maxIterations: Int = 25): DataFrame = {
    require(Seq("id", "component").forall(prevAssign.columns.contains),
      "prevAssign needs columns (id, component) — a connectedComponents output")
    val stars = prevAssign.select(col("id").as("src"),
      col("component").as("dst"))
    val np = newPairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    connectedComponents(stars.unionByName(np), "src", "dst", maxIterations)
  }

  def keepBest(df: DataFrame, idCol: String, components: DataFrame,
               orderBy: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val comp = components.select(col("id").as(idCol), col("component"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(coalesce(col("component"), col(idCol)))
      .orderBy(orderBy :+ col(idCol).asc: _*)
    df.join(comp, Seq(idCol), "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "component")
  }

  /** SOFT dedup: instead of dropping duplicates, keep every row and attach a
    * sampling/loss weight `cluster_size^(-alpha)` (singletons weigh 1.0) —
    * the soft-deduplication idea (SoftDedup, He et al. 2024; and the
    * repeat-discounting view of Muennighoff et al. 2023's data-constrained
    * scaling): duplicated content still contributes, just not N times. At
    * `alpha = 1` a cluster's TOTAL weight is 1.0 regardless of its size
    * (copies split one document's mass); `alpha = 0` degrades to no dedup.
    *
    * Scale shape: cluster sizes come from a groupBy on the (members-only,
    * corpus-fraction-sized) component table; the weighted size table is
    * AQE-broadcast into one left join against the corpus — the corpus
    * itself is never shuffled.
    */
  def softDedupWeights(df: DataFrame, idCol: String, components: DataFrame,
                       alpha: Double = 1.0): DataFrame = {
    val sizes = components.groupBy(col("component"))
      .agg(count(lit(1)).as("__csize"))
    val weighted = components.select(col("id").as(idCol), col("component"))
      .join(sizes, Seq("component"))
      .select(col(idCol), pow(col("__csize"), lit(-alpha)).as("__w"))
    df.join(weighted, Seq(idCol), "left")
      .withColumn("weight", coalesce(col("__w"), lit(1.0)))
      .drop("__w")
  }
}
