package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous, deterministic label propagation over the document link
  * graph — the semi-supervised cousin of
  * [[Components.connectedComponents]]: a small seeded subset carries
  * class labels (domain, topic, quality tier) and the graph structure
  * spreads them to unlabeled neighbors. The classic use in a training-data
  * pipeline is cheap corpus annotation: hand-label (or classifier-label) a
  * sliver, propagate along the duplicate/link/citation graph, and get
  * majority-vote labels for the connected neighborhood without scoring
  * every document.
  *
  * Semantics (chosen for determinism — classic async LPA is order
  * dependent and useless as a gate):
  *   - the graph is treated as UNDIRECTED (edges are mirrored);
  *   - seeds are immutable: a seeded node always reports its seed label;
  *   - each round, every node with >= 1 labeled neighbor takes the
  *     MAJORITY label among neighbor labels (counting each neighbor once
  *     per edge), ties broken by SMALLEST label;
  *   - nodes with no labeled neighbor keep their previous label (null
  *     until first reached);
  *   - rounds are synchronous: round k reads only round k-1 labels.
  *
  * Scale: each round is one shuffle on dst (vote count) plus one window
  * per (node) over at most |distinct neighbor labels| rows — vote rows
  * are bounded by |edges|, never |V|^2. Label state is (id, label) longs.
  * Rounds are a fixed small constant (label spread saturates in a few
  * hops), so lineage stays shallow without checkpointing.
  */
object LabelProp {

  /** Propagate seed labels for `rounds` synchronous rounds.
    *
    * @param edges  (srcCol, dstCol) edge list; mirrored internally.
    * @param seeds  (idCol, labelCol) immutable seed labels.
    * @return (id, label, seeded) for every node in the graph or seed set;
    *         label is null for nodes never reached.
    */
  def propagate(edges: DataFrame, seeds: DataFrame,
                srcCol: String, dstCol: String,
                idCol: String, labelCol: String,
                rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = edges.sparkSession
    val und0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    // Same iteration-width discipline as Components.connectedComponents:
    // pre-partition + persist the edge list on the per-round join key and
    // size every round's exchange from the MEASURED edge count — a small
    // label graph must not pay session-width scheduling overhead times
    // (stages/round) x rounds, while a huge one keeps full width. Rounds
    // are eagerly localCheckpoint'ed so every exchange executes under the
    // pinned width and the returned frame is a flat leaf.
    val (und, nParts) = Partitioning.measuredCoPartition(und0, col("src"))
    try Partitioning.withShuffleWidth(spark, nParts) {
      val nodes = und.select(col("src").as("id"))
        .union(seeds.select(col(idCol).as("id")))
        .distinct()
      val seed = seeds.select(col(idCol).as("id"), col(labelCol).as("seed_label"))
      // state: (id, label nullable) for all nodes; seeds pinned.
      var state = nodes.join(seed, Seq("id"), "left")
        .select(col("id"), col("seed_label").as("label"))
        .localCheckpoint()
      val win = Window.partitionBy(col("id"))
        .orderBy(col("__c").desc, col("label").asc)
      (1 to rounds).foreach { _ =>
        val votes = und
          .join(state.filter(col("label").isNotNull)
            .select(col("id").as("src"), col("label")), Seq("src"))
          .groupBy(col("dst").as("id"), col("label"))
          .agg(count(lit(1)).as("__c"))
        val winner = votes
          .withColumn("__rn", row_number().over(win))
          .filter(col("__rn") === 1)
          .select(col("id"), col("label").as("vote_label"))
        state = state.join(winner, Seq("id"), "left")
          .join(seed, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("seed_label"), col("vote_label"), col("label"))
              .as("label"))
          .localCheckpoint()
      }
      state.join(seed, Seq("id"), "left")
        .select(col("id"), col("label"),
          col("seed_label").isNotNull.as("seeded"))
        .localCheckpoint()
    } finally und.unpersist()
  }
}
