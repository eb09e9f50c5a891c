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
    // persist BEFORE the eager initial-labels checkpoint so that first pass
    // over the edge list also populates the cache (instead of computing the
    // union twice)
    val symP = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist()
    var labels = symP.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

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
      val changed = next.as("n")
        .join(labels.as("p"), "id")
        .filter(col("n.comp") =!= col("p.comp"))
        .count()
      labels = next
      converged = changed == 0
      i += 1
    }
    symP.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"graft.Components: no convergence after $maxIterations rounds " +
          "(pathological graph?) — raise maxIterations")
    labels.select(col("id"), col("comp").as("component"))
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
}
