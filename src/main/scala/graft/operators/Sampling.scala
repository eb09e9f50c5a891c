package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent on partitioning and engine-specific —
  * useless for reproducible corpus subsets or cross-engine checks. These
  * operators instead hash a stable key to a uniform value and compare
  * against a threshold, so membership is a pure function of (key, salt,
  * fraction): stable under repartitioning, re-runs, engine changes, and
  * incremental appends (a row's fate never changes as the corpus grows —
  * exactly what train/holdout splits need).
  *
  * The uniform value is the first `HexDigits` hex chars of md5(key || salt)
  * compared LEXICOGRAPHICALLY against a hex threshold — md5 hex output is
  * identical everywhere, so the same predicate runs verbatim in any SQL
  * engine. Granularity is 16^-HexDigits (1/65536 at the default 4).
  */
object Sampling {

  /** Greedy maximum-coverage document selection: `k` rounds, each picking
    * the document covering the most NOT-YET-COVERED vocabulary (ties by
    * id) — the classic (1 - 1/e)-approximation, and the standard recipe
    * for building a small eval/annotation set that still exercises the
    * corpus's whole vocabulary. One row per selection, in order:
    * `(rank, id, n_new_terms, n_covered_total)`.
    *
    * Scale shape: `k` bounded driver rounds (the k-center/BPE
    * discipline); each round is one distributed argmax
    * (TakeOrderedAndProject) over per-doc counts of uncovered DISTINCT
    * tokens, with the covered set carried as a broadcast literal —
    * bounded by the vocabulary, never rows.
    */
  def greedySetCover(df: org.apache.spark.sql.DataFrame, textCol: String,
                     idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    // One exploded (id, term) table, cached; each round is a broadcast
    // anti-join against the (small, vocabulary-bounded) covered set plus
    // one TakeOrdered argmax. A growing literal-array alternative paid a
    // full codegen compile per round (measured 6.4 s for 5 rounds at
    // sf0.1; this shape runs in ~1 s). r16: ensureParallelism before the
    // tokenize+explode (an unsplittable single-file input serialized the
    // cache-building pass on one task — 3.2 s of the gate's 5.1 s, guide
    // §2.5), then measuredCoPartition on the id so the per-round argmax
    // aggregates WITHOUT an exchange at a width sized to the measured
    // working set — a k-round loop over a tiny table must not pay
    // session-width scheduling per round (Partitioning.iterationWidth),
    // while a cluster-scale corpus keeps full width.
    val exploded = Partitioning.ensureParallelism(df)
      .select(col(idCol).cast("long").as("__id"),
        explode(array_distinct(TextAnalysis.toks(col(textCol)))).as("__t"))
      .filter(col("__id").isNotNull)
    val (terms, _) = Partitioning.measuredCoPartition(exploded, col("__id"))
    try {
      var covered = Set.empty[String]
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var r = 1
      while (r <= k) {
        val coveredDf = broadcast(covered.toSeq.sorted.toDF("__t"))
        // ONE job per round: the TakeOrdered argmax row carries its own
        // uncovered-term list (bounded by a single document's vocabulary).
        val top = terms.join(coveredDf, Seq("__t"), "left_anti")
          .groupBy(col("__id"))
          .agg(count(lit(1)).as("__gain"), collect_list(col("__t")).as("__ts"))
          .orderBy(col("__gain").desc, col("__id"))
          .limit(1).collect()
        if (top.isEmpty) r = k + 1
        else {
          val id = top(0).getLong(0)
          val newTerms = top(0).getSeq[String](2).toSet -- covered
          covered = covered ++ newTerms
          picked += ((r.toLong, id, newTerms.size.toLong,
            covered.size.toLong))
          r += 1
        }
      }
      picked.toSeq.toDF("rank", "id", "n_new_terms", "n_covered_total")
    } finally terms.unpersist()
  }

  val HexDigits = 4

  /** Hex threshold string for `fraction`: rows with hash prefix < threshold
    * are kept. fraction=0.1 -> "1999" (6553/65536 ~ 9.999%).
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val buckets = 1 << (4 * HexDigits)
    val cut = math.floor(fraction * buckets).toLong
    // fraction 1.0 must admit every prefix, including "ffff"; "g" sorts
    // above every hex digit, while the 5-char "10000" would sort BELOW most
    // 4-char prefixes lexicographically.
    if (cut >= buckets) "g" else f"%%0${HexDigits}x".format(cut)
  }

  /** The sampling predicate: md5-prefix(key||salt) < hexThreshold(fraction). */
  def keepRow(key: Column, fraction: Double, salt: String = "graft"): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, HexDigits) <
      lit(hexThreshold(fraction))

  /** Deterministic Bernoulli sample: keep ~`fraction` of rows, membership a
    * pure function of the key. The predicate is a plain comparison over a
    * codegen'd hash — it pushes into scans wherever md5 does.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(keepRow(col(keyCol), fraction, salt))

  /** Deterministic stratified sample: per-stratum fractions (missing strata
    * keep `defaultFraction`). One narrow filter pass — no groupBy, no
    * sampleBy RNG, no driver state.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       salt: String = "graft"): DataFrame = {
    val threshold = fractions.foldLeft(lit(hexThreshold(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, HexDigits) < threshold)
  }

  /** Disjoint deterministic split (e.g. train/validation/holdout): assigns
    * each row the first label whose cumulative fraction exceeds its hash
    * position. Fractions must sum to <= 1; rows beyond the sum get NULL
    * (dropped by the caller or kept as "rest").
    */
  def splitColumn(key: Column, splits: Seq[(String, Double)],
                  salt: String = "graft"): Column = {
    // Snap near-1.0 accumulations to exactly 1.0: (0.6, 0.3, 0.1) sums to
    // 0.9999999999999999 in double, which would yield threshold "ffff"
    // instead of "g" and silently NULL rows whose md5 prefix is "ffff".
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => if (math.abs(c - 1.0) < 1e-9) 1.0 else c)
    require(cum.last <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val prefix = substring(md5(concat(key.cast("string"), lit(salt))), 1, HexDigits)
    splits.map(_._1).zip(cum).foldRight(lit(null).cast("string")) {
      case ((label, upper), acc) =>
        when(prefix < lit(hexThreshold(upper)), lit(label)).otherwise(acc)
    }
  }

  /** EXACT-count stratified split: within each stratum, rows rank by the
    * salted md5 hash and the first `ceil(cum_fraction * n)` ranks take
    * each label in order — per-stratum counts are exact, where the
    * Bernoulli hash predicate ([[splitColumn]]) fluctuates ~sqrt(n). For
    * small strata the fluctuation IS the stratum: a 50-doc language at a
    * 10% validation fraction can draw 0 or 12 validation docs under the
    * predicate, exactly 5 here. Deterministic given (stratum contents,
    * salt) but NOT append-stable — adding rows shifts ranks — so use
    * [[splitColumn]] for incrementally-growing corpora and this for
    * frozen-corpus exact splits.
    *
    * Scale shape: one rank window per stratum (hash-partitioned on the
    * stratum key). A skewed mega-stratum pays its sort on one partition —
    * the same cost class as CCNet's exact ntile banding, with the same
    * sampled-cutpoint escape hatch if a stratum outgrows an executor.
    */
  def exactStratifiedSplit(df: DataFrame, strataCol: String, keyCol: String,
                           splits: Seq[(String, Double)],
                           salt: String = "graft"): DataFrame = {
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => if (math.abs(c - 1.0) < 1e-9) 1.0 else c)
    require(cum.last <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val strata = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val hash = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val rn = row_number().over(strata.orderBy(hash, col(keyCol)))
    val n = count(lit(1)).over(strata)
    val label = splits.map(_._1).zip(cum).foldRight(lit(null).cast("string")) {
      case ((lbl, c), acc) =>
        when(rn <= ceil(lit(c) * n).cast("long"), lit(lbl)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Deterministic epoch shuffle: assign every row its 0-based position
    * `shuffle_pos` in the training order `md5(keyCols || salt)` — change
    * the salt, get an independent permutation; keep it, get the identical
    * order on every run, engine, and partitioning. This is the
    * reproducible replacement for `orderBy(rand(seed))` (whose output
    * depends on partition layout).
    *
    * Positions come from [[SequencePack.assignments]] over a unit-token
    * stream — one range shuffle on the hash key plus two narrow passes
    * (per-partition counts broadcast as offsets). No global
    * single-partition window at any size; writing the shuffled corpus is
    * then a `repartitionByRange(shuffle_pos)` + sortWithinPartitions away.
    */
  def deterministicShuffle(df: DataFrame, keyCols: Seq[String],
                           salt: String = "graft"): DataFrame = {
    require(keyCols.nonEmpty, "graft.Sampling: keyCols must be non-empty")
    val sk = md5(concat_ws(" ", keyCols.map(c => col(c).cast("string")) :+ lit(salt): _*))
    val keyed = df.withColumn("__sk", sk).withColumn("__one", lit(1L))
    // seqLen=1 makes start_token the row's 0-based position in key order;
    // keyCols break md5 ties (astronomically unlikely, determinism cheap).
    SequencePack.assignments(keyed, "__one", seqLen = 1L,
        orderBy = col("__sk") +: keyCols.map(col))
      .withColumnRenamed("start_token", "shuffle_pos")
      .drop("__one", "__sk", "seq_id", "offset_in_seq", "n_seqs")
  }

  /** Curriculum training order: easy-to-hard WITHIN each stratum, strata
    * interleaved round-robin — rank-1 docs of every source come first
    * (ordered by stratum name), then every rank-2 doc, and so on. This is
    * the deterministic curriculum-learning layout: difficulty ramps up
    * globally while every training window still sees the full source mix
    * (a plain global sort by difficulty would front-load whichever source
    * skews easy).
    *
    * Scale shape: the per-stratum rank is a window PARTITIONED by stratum
    * (parallel across strata); the global 0-based `curriculum_pos` reuses
    * [[deterministicShuffle]]'s machinery — [[SequencePack.assignments]]
    * over a unit-token stream on (rank, stratum, id) — so there is no
    * single-partition window at any size. Ties inside a stratum break by
    * id: append-stable and engine-identical.
    */
  def curriculumOrder(df: DataFrame, strataCol: String, difficultyCol: String,
                      idCol: String): DataFrame = {
    val rank = row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
        .orderBy(col(difficultyCol).asc, col(idCol).asc))
    val ranked = df.withColumn("__rank", rank.cast("long"))
      .withColumn("__one", lit(1L))
    SequencePack.assignments(ranked, "__one", seqLen = 1L,
        orderBy = Seq(col("__rank"), col(strataCol), col(idCol)))
      .withColumnRenamed("start_token", "curriculum_pos")
      .withColumnRenamed("__rank", "stratum_rank")
      .drop("__one", "seq_id", "offset_in_seq", "n_seqs")
  }

  /** Leakage-safe train/val/test split: rows in the same duplicate CLUSTER
    * always land in the same split. Splitting by row id leaks — a document
    * and its near-duplicate can straddle train/test, and the model is then
    * evaluated on (a copy of) its own training data (the Lee et al. 2021
    * "Deduplicating Training Data" eval-contamination failure). Here the
    * split key is `coalesce(component, id)`: cluster members share their
    * component id (from [[Components.connectedComponents]] over near-dup
    * pairs) and singletons fall back to their own id — the same null-safe
    * key trick as [[Components.keepBest]], collision-free because a
    * component id is the min MEMBER id and singleton ids are non-members.
    *
    * Scale shape: one left join against the (cluster-members-only, orders
    * of magnitude smaller than the corpus — AQE broadcasts it) component
    * table, then the same narrow md5-prefix predicate as [[splitColumn]].
    * Membership stays a pure function of (cluster, salt): stable under
    * repartitioning, re-runs, and corpus growth — appending documents
    * never moves an existing cluster across splits.
    */
  def splitByComponent(df: DataFrame, idCol: String, components: DataFrame,
                       splits: Seq[(String, Double)],
                       salt: String = "graft"): DataFrame = {
    val comp = components.select(col("id").as(idCol), col("component"))
    df.join(comp, Seq(idCol), "left")
      .withColumn("split",
        splitColumn(coalesce(col("component"), col(idCol)), splits, salt))
      .drop("component")
  }

  /** Deterministic shard id in `[0, shards)` from the md5 hex prefix —
    * the export-sharding counterpart of [[keepRow]]: a pure function of
    * (key, salt), stable under repartitioning and appends, identical in
    * any engine that has md5. `shards` must be a power of 16 (each hex
    * digit contributes one factor), so the prefix IS the shard id — no
    * modulo, no bias.
    */
  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis A-ES): each row gets priority `u^(1/w)` where `u ∈ (0,1]`
    * derives from the md5 hex prefix of (key ‖ salt) and `w` is the row's
    * weight; the k highest-priority rows ARE a weighted sample without
    * replacement. Replaces `rand()`-based weighted picks with a pure
    * function of (key, salt, weight): identical on every run, engine, and
    * partitioning. Non-positive-weight rows are ineligible. Exact-equal
    * priorities (same hash prefix AND same weight) tie-break by key, so
    * the selected SET is engine-stable even at the md5-grain resolution.
    *
    * Scale shape: a narrow per-row expression, then top-k via
    * `TakeOrderedAndProject` (per-partition heaps, one k-row merge) — no
    * global sort, no shuffle of the corpus.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, salt: String = "graft"): DataFrame = {
    require(k >= 1, "graft.Sampling: k must be >= 1")
    val buckets = (1 << (4 * HexDigits)).toDouble
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"), lit(salt))),
      1, HexDigits), 16, 10).cast("double") + 1.0) / buckets
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("__pr", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__pr").desc, col(keyCol))
      .limit(k)
      .drop("__pr")
  }

  /** Deterministic per-group "reservoir": the k rows of each group whose
    * md5(key ‖ salt) hashes sort lowest — a uniform pseudo-random k-subset
    * per group that is a pure function of (keys, salt). Unlike the
    * fraction-based [[stratifiedSample]], the output size per group is
    * EXACTLY min(k, |group|) — the contract eval-set construction needs
    * ("20 docs per language", never 19 or 23). Appends can displace
    * earlier picks (inherent to fixed-k); use [[stratifiedSample]] when
    * append-stability matters more than exact counts.
    *
    * Scale shape: one window per group (hash-partitioned on the group
    * key); the sort is per-group, never global.
    */
  def groupReservoir(df: DataFrame, groupCol: String, keyCol: String,
                     k: Int, salt: String = "graft"): DataFrame = {
    require(k >= 1, "graft.Sampling: k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Exact rank buckets (deciles and friends): bucket
    * `floor(position * buckets / n)` from the row's 0-based global
    * position in `(orderCol, idCol)` order — every bucket within one row
    * of n/buckets, boundaries exact, no approximate percentiles. The
    * quality-binning primitive behind per-decile sampling rates and
    * score-stratified reporting.
    *
    * Scale shape: global positions come from [[SequencePack.assignments]]
    * over a unit-token stream (the [[deterministicShuffle]] machinery) —
    * one range shuffle plus two narrow passes, NO single-partition window
    * at any size; `ntile()` over an unpartitioned window would be exactly
    * that and is the anti-pattern this replaces.
    */
  def rankBuckets(df: DataFrame, orderCol: String, idCol: String,
                  buckets: Int): DataFrame = {
    require(buckets >= 1, "graft.Sampling: buckets must be >= 1")
    val pos = SequencePack.assignments(df.withColumn("__one", lit(1L)), "__one",
      seqLen = 1L, orderBy = Seq(col(orderCol), col(idCol)))
    // 1-row total broadcast into the bucket expression (n_seqs is the
    // per-row span count, not the table size)
    pos.crossJoin(pos.agg(count(lit(1)).as("__nrows")))
      .withColumn("bucket",
        expr(s"start_token * $buckets div __nrows").cast("int"))
      .drop("__one", "seq_id", "offset_in_seq", "start_token", "n_seqs",
        "__nrows")
  }

  def shardOf(key: Column, shards: Int, salt: String = "graft"): Column = {
    val digits = (math.log(shards) / math.log(16)).round.toInt
    require(digits >= 1 && math.pow(16, digits).toInt == shards,
      s"shards must be a positive power of 16, got $shards")
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, digits),
      16, 10).cast("int")
  }
}
