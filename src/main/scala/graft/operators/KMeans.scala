package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * primitive behind semantic dedup (SemDeDup-style: cluster, then near-dup
  * within clusters) and IVF index training.
  *
  * Reference scope: the reference delegates vector organisation to its
  * vector stores (`yamlpipe/components/sinks.py:33-162`); a training-data
  * pipeline at 100 TB needs the clustering step itself to be distributed.
  *
  * Every step is deterministic and mirrorable by an ANSI-SQL oracle:
  *   - init: the `k` vectors with the lowest id, in id order, cluster ids
  *     `0..k-1` (no RNG — reproducible across engines and runs);
  *   - assignment: argmin over squared L2, computed as a LEFT-TO-RIGHT
  *     double summation of `(v(i)-c(i))^2` (matches DuckDB's
  *     `list_dot_product(diff, diff)` on the same values bit-for-bit);
  *     distance ties break to the lowest cluster id;
  *   - re-centroid: per-(cluster, dimension) mean ROUNDED to `roundDp`
  *     decimals. The rounding is load-bearing: Spark's partial aggregation
  *     and an oracle's sequential sum differ by ulps, and an unrounded
  *     centroid would propagate that drift into the next assignment's
  *     argmin. Rounding makes the centroids bit-identical across engines,
  *     so every downstream distance is too.
  *   - a cluster that loses all members keeps its previous centroid.
  *
  * Scale shape (pinned in KMeansSpec / PlanQualitySpec):
  *   - centroids are `k x dim` doubles — they live on the driver and ride
  *     to executors in the assignment closure (the MLlib/FAISS pattern;
  *     bounded, independent of corpus size);
  *   - assignment is one NARROW pass (no shuffle);
  *   - re-centroid explodes to (cluster, dim, value) rows but the groupBy
  *     partial-aggregates map-side: only `k x dim x partitions` partial
  *     sums move per iteration, never the corpus.
  */
object KMeans {

  /** Squared L2 between a row vector and a centroid, summed left-to-right
    * in double — the one distance definition both assignment passes and the
    * SQL oracle mirror.
    */
  private def dist2(v: Array[Double], c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
    acc
  }

  /** Index of the nearest centroid (ties -> lowest index). Ragged input
    * fails loudly — a shorter vector would otherwise read past its end
    * (or silently zero-pad, worse).
    */
  private def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    if (v.length != cs(0).length)
      throw new IllegalArgumentException(
        s"graft.KMeans: vector length ${v.length} != centroid dim ${cs(0).length}")
    var best = 0
    var bestD = dist2(v, cs(0))
    var j = 1
    while (j < cs.length) {
      val d = dist2(v, cs(j))
      if (d < bestD) { best = j; bestD = d }
      j += 1
    }
    best
  }

  /** Train centroids: `iterations` Lloyd rounds from the lowest-id seeds.
    * Null vectors are dropped. Returns the `k x dim` centroid matrix
    * (row index = cluster id).
    */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int,
          iterations: Int, roundDp: Int = 6): Array[Array[Double]] = {
    require(k > 0, "k must be positive")
    require(iterations >= 0, "iterations must be >= 0")
    val vecs = df
      .select(col(idCol).as("__id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"))
      .filter(col("__v").isNotNull)
      .persist()
    try {
      // Seeds: the k lowest-id vectors in id order (TakeOrdered — no full
      // sort). Float->double widening is exact, so no rounding here.
      val seeds = vecs.orderBy(col("__id")).limit(k).collect()
      require(seeds.length == k,
        s"graft.KMeans: need at least $k non-null vectors, got ${seeds.length}")
      var centroids = seeds.map(_.getSeq[Double](1).toArray)
      // All k seeds must agree on one dimension BEFORE the Lloyd loop:
      // nearest() only checks each vector against centroid 0, so a short
      // seed would otherwise silently sum over its own prefix and bias the
      // argmin toward itself instead of failing loudly (r7 advice fix).
      require(centroids.forall(_.length == centroids(0).length),
        s"graft.KMeans: ragged seed vectors — dims ${centroids.map(_.length).distinct.mkString(",")}")
      var it = 0
      while (it < iterations) {
        val cs = centroids // stable reference for the closure
        val assignUdf = udf((v: Seq[Double]) => nearest(v.toArray, cs))
        // (cluster, dim, mean) — map-side partial agg; k*dim rows survive.
        val means = vecs
          .select(assignUdf(col("__v")).as("__cluster"),
            posexplode(col("__v")).as(Seq("__d", "__x")))
          .groupBy(col("__cluster"), col("__d"))
          .agg(round(avg(col("__x")), roundDp).as("__m"))
          .collect()
        // Start from the previous centroids and overwrite every
        // (cluster, dim) mean that has members — a fully-empty cluster
        // keeps its centroid (the SQL oracle's LEFT JOIN + coalesce).
        val next = Array.tabulate(k)(j => centroids(j).clone())
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        centroids = next
        it += 1
      }
      centroids
    } finally vecs.unpersist()
  }

  /** Assign every row to its nearest centroid: `(id, cluster, dist2)` with
    * the distance rounded to `roundDp`. One narrow pass.
    */
  def assignFrame(df: DataFrame, vecCol: String, idCol: String,
                  centroids: Array[Array[Double]],
                  roundDp: Int = 6): DataFrame = {
    val cs = centroids
    // Tuple-returning typed UDF -> struct<_1, _2>; one distance scan yields
    // both the argmin and its distance.
    val assignUdf = udf((v: Seq[Double]) => {
      val arr = v.toArray
      val j = nearest(arr, cs)
      (j, dist2(arr, cs(j)))
    })
    df.select(col(idCol),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"))
      .filter(col("__v").isNotNull)
      .select(col(idCol), assignUdf(col("__v")).as("__a"))
      .select(col(idCol), col("__a._1").as("cluster"),
        round(col("__a._2"), roundDp).as("dist2"))
  }

  /** Fit + assign in one call (the gate entry point). */
  def fitAssign(df: DataFrame, vecCol: String, idCol: String, k: Int,
                iterations: Int, roundDp: Int = 6): DataFrame =
    assignFrame(df, vecCol, idCol, fit(df, vecCol, idCol, k, iterations, roundDp),
      roundDp)

  /** Simplified-silhouette clustering audit: per point,
    * `a` = Euclidean distance to the OWN centroid, `b` = distance to the
    * nearest OTHER centroid, `s = (b − a) / max(a, b)` (1 = crisp, 0 =
    * boundary, negative = likely misassigned). The centroid-based variant
    * (Hruschka et al.) — O(n·k) instead of the pairwise O(n²) silhouette,
    * which is the only formulation that survives 100 TB, and exact given
    * the centroids, hence oracle-checkable. One row per cluster:
    * population, mean a/b, mean silhouette, and the misassigned count
    * (s < 0). The drop-a-cluster / split-a-cluster decision input for the
    * SemDeDup blocking above.
    *
    * Scale shape: one narrow pass with the broadcast centroid matrix (the
    * [[assignFrame]] discipline — both distances come from the same k-way
    * scan), then a partial-aggregating shuffle to k rows.
    */
  def silhouetteFrame(df: DataFrame, vecCol: String, idCol: String, k: Int,
                      iterations: Int, roundDp: Int = 6): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2 clusters, got k=$k")
    val cs = fit(df, vecCol, idCol, k, iterations, roundDp)
    // With one EFFECTIVE centroid (degenerate fit on tiny input) there is
    // no "nearest other cluster": secondD would stay at Double.MaxValue and
    // every point would report a crisp ~1.0 silhouette — fail loudly
    // instead of emitting a confident nonsense audit.
    require(cs.length >= 2,
      s"silhouette undefined: k-means fit collapsed to ${cs.length} centroid(s)")
    // one scan over the k centroids yields (argmin, d1, second-best d2)
    val bothUdf = udf((v: Seq[Double]) => {
      val arr = v.toArray
      var best = 0
      var bestD = dist2(arr, cs(0))
      var secondD = Double.MaxValue
      var j = 1
      while (j < cs.length) {
        val d = dist2(arr, cs(j))
        if (d < bestD) { secondD = bestD; best = j; bestD = d }
        else if (d < secondD) { secondD = d }
        j += 1
      }
      (best, bestD, secondD)
    })
    df.select(col(idCol),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"))
      .filter(col("__v").isNotNull)
      .select(bothUdf(col("__v")).as("__t"))
      .select(col("__t._1").as("cluster"), sqrt(col("__t._2")).as("__a"),
        sqrt(col("__t._3")).as("__b"))
      .withColumn("__s",
        when(greatest(col("__a"), col("__b")) > 0,
          (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .otherwise(lit(0.0)))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__a")), roundDp).as("mean_a"),
        round(avg(col("__b")), roundDp).as("mean_b"),
        round(avg(col("__s")), roundDp).as("mean_silhouette"),
        sum((col("__s") < 0).cast("long")).as("n_misassigned"))
  }


  /** SemDeDup-style semantic dedup: cluster with k-means, then inside each
    * cluster drop every row whose cosine similarity to a LOWER-id row of the
    * same cluster reaches `minCosine` (greedy keep-first — the standard
    * SemDeDup policy, and expressible as an EXISTS for the oracle). Returns
    * the SURVIVORS `(id, cluster)`.
    *
    * The pairwise pass reuses [[Dedup.cosinePairs]]'s per-block kernel:
    * vectors unbox once per task and only the (cluster)-blocked pairs are
    * ever considered — O(sum block^2) work bounded by cluster sizes, never
    * corpus^2. At 100 TB, k scales with corpus size so blocks stay
    * task-sized (SemDeDup's own design: k ~ sqrt(n) or larger).
    */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String, k: Int,
                    iterations: Int, minCosine: Double): DataFrame = {
    val assigned = fitAssign(df, vecCol, idCol, k, iterations)
    val withCluster = df.select(col(idCol), col(vecCol))
      .join(assigned.select(col(idCol), col("cluster")), Seq(idCol))
    val pairs = Dedup.cosinePairs(withCluster, vecCol, idCol,
      blockCol = "cluster", minCosine = minCosine)
    val drops = pairs.select(col("id_b").as(idCol)).distinct()
    assigned.select(col(idCol), col("cluster"))
      .join(drops, Seq(idCol), "left_anti")
  }

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal, the
    * 2-approximation): pick the lowest-id vector as seed, then `k-1` times
    * add the point FARTHEST from everything selected so far. The
    * diversity-sampling step of an annotation/eval budget — where k-means
    * summarizes mass, k-center guarantees COVERAGE (every corpus vector
    * within the returned radius of some selected center).
    *
    * Returns one row per selected center, in selection order:
    * `(rank, id, d2)` — squared L2 distance to the nearest EARLIER center
    * (0.0 for the seed; the ranks' d2 values are non-increasing, the
    * classic coverage curve) — plus `coverage_d2`, the k-center objective
    * after all `k` selections, repeated on every row.
    *
    * Determinism: each pairwise d2 is the one fixed-shape zip-fold
    * ([[graft.functions.VectorFunctions.l2DistanceSq]]) rounded to
    * `roundDp` BEFORE the running `least`, so argmax ordering
    * (d2 DESC, id) and the final maxima compare identical doubles on any
    * engine.
    *
    * Scale shape: `k` bounded driver rounds (the [[fit]] / BPE
    * discipline), each ONE distributed `TakeOrderedAndProject` argmax over
    * a narrow codegen'd pass. The running min-distance frame is EAGERLY
    * `localCheckpoint`ed every round (the Components/Graph/BPE posture):
    * without it the stacked `least` projections recompute every earlier
    * round's distance pass — O(k²·n·dim) total work plus a growing codegen
    * compile per round — where the checkpointed shape is flat O(k·n·dim)
    * and each round's plan starts from `Scan ExistingRDD`. Superseded
    * round frames become unreferenced as soon as the next one
    * materializes and their blocks are released by the ContextCleaner
    * (the same lifecycle as the BPE/Components round frames —
    * `Dataset.unpersist` does not reach localCheckpoint blocks, so GC is
    * the release mechanism; peak usage is bounded by the cleaner's lag,
    * not by k).
    */
  def kCenter(df: DataFrame, vecCol: String, idCol: String, k: Int,
              roundDp: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val cur = df
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"))
      .filter(col("__id").isNotNull && col("__v").isNotNull)
      .persist()
    try {
      val seedRow = cur.orderBy(col("__id")).limit(1).collect()
      require(seedRow.nonEmpty, "graft.kCenter: no non-null input vectors")
      def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
        r.getSeq[Double](1).toArray
      val selected = scala.collection.mutable.ArrayBuffer(
        (1L, seedRow(0).getLong(0), 0.0))
      def d2To(c: Array[Double]) = round(
        graft.functions.VectorFunctions.l2DistanceSq(col("__v"), lit(c)),
        roundDp)
      var frame = cur.withColumn("__dm", d2To(vecOf(seedRow(0))))
        .localCheckpoint() // eager: each round folds ONE least() over the
                           // previous round's materialized rows, never the
                           // whole selection history
      var r = 2
      var sinceCkpt = 0
      while (r <= k) {
        val top = frame.orderBy(col("__dm").desc, col("__id")).limit(1)
          .collect()(0)
        selected += ((r.toLong, top.getLong(0), top.getDouble(2)))
        // The superseded frame's checkpoint blocks are ContextCleaner-
        // released once this reference drops (Dataset.unpersist cannot
        // reach localCheckpoint blocks — it only uncaches persist()ed
        // plans). Checkpointing every OTHER round halves the live block
        // sets the cleaner must chase under GC lag (r10 advice) at the
        // cost of one extra narrow least() in the off-round argmax;
        // lineage depth stays <= 2, never the selection history.
        frame = frame.withColumn("__dm",
          least(col("__dm"), d2To(vecOf(top))))
        sinceCkpt += 1
        if (sinceCkpt >= 2) {
          frame = frame.localCheckpoint()
          sinceCkpt = 0
        }
        // Large k can still outrun a lazy driver GC (superseded
        // checkpoint blocks free only when their RDD reference is
        // COLLECTED); the supported bound is Spark's own periodic-GC
        // cleaner nudge — set spark.cleaner.periodicGC.interval (default
        // 30min) low in sessions running very large k, rather than a
        // hand-rolled System.gc() here (a JVM-wide stop-the-world pause,
        // and a silent no-op under -XX:+DisableExplicitGC).
        r += 1
      }
      val coverage = frame.agg(max(col("__dm"))).collect()(0).getDouble(0)
      selected.toSeq.toDF("rank", "id", "d2")
        .withColumn("coverage_d2", lit(coverage))
    } finally cur.unpersist()
  }
}
