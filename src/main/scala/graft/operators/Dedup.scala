package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.linalg.{Vector => MLVector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline extensions mandated beyond the reference surface
  * (the reference's only dedup-adjacent behavior is delete-by-source upsert,
  * `yamlpipe/components/sinks.py:66-80`).
  *
  * Scale design:
  *  - exact dedup is a single hash-shuffle groupBy on the content hash —
  *    map-side partial aggregation, no driver state;
  *  - MinHash+LSH banding turns the quadratic near-dup join into a
  *    bucket-equi-join: candidates shuffle only within matching bands;
  *  - SimHash reduces each doc to 64 bits; near-dups cluster by hamming
  *    distance on bucketed prefixes;
  *  - n-gram Jaccard is the exact verifier, run only on candidate pairs;
  *  - embedding-cosine near-dup blocks on a key (label/LSH bucket) to bound
  *    the pairwise join.
  */
object Dedup {

  // -------------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------------

  /** Exact duplicate groups by content hash: one row per distinct content
    * with the kept (minimum) id and the duplicate count. Pure hash groupBy:
    * partial-aggregates map-side, shuffles only one row per distinct text.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep exactly one row per distinct content (the min-id winner). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // -------------------------------------------------------------------------
  // Shingles + n-gram Jaccard (exact similarity kernel)
  // -------------------------------------------------------------------------

  /** Distinct word n-gram shingles as a Column expression (codegen'd, also
    * expressible 1:1 in the DuckDB oracle). Tokenizes on single spaces.
    */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val cnt = size(toks) - (n - 1)
    val grams = when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    ).otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /** Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Exact n-gram Jaccard over candidate pairs: `pairs` must carry shingle
    * array columns `aCol`/`bCol`.
    */
  def ngramJaccard(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.withColumn("jaccard", jaccard(col(aCol), col(bCol)))

  // -------------------------------------------------------------------------
  // MinHash + LSH (approximate Jaccard at scale)
  // -------------------------------------------------------------------------

  /** Near-duplicate candidate pairs via MinHashLSH over hashed shingle
    * features. Returns (idCol_a, idCol_b, jaccard_dist) with a < b.
    * Deterministic under the fixed seed. At scale the approxSimilarityJoin
    * shuffles only rows sharing an LSH band — never the full cross product.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      maxJaccardDistance: Double = 0.6,
                      numHashTables: Int = 8,
                      numFeatures: Int = 1 << 18,
                      shingleSize: Int = 3,
                      seed: Long = 42L): DataFrame = {
    val withShingles = df
      .withColumn("__shingles", shingles(col(textCol), shingleSize))
      .filter(size(col("__shingles")) > 0)
    val tf = new HashingTF()
      .setInputCol("__shingles").setOutputCol("__features")
      .setNumFeatures(numFeatures).setBinary(true)
    val feats = tf.transform(withShingles)
    val lsh = new MinHashLSH()
      .setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxJaccardDistance, "jaccard_dist")
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        col("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }

  // -------------------------------------------------------------------------
  // SimHash (64-bit fingerprint; hamming-near docs are near-dups)
  // -------------------------------------------------------------------------

  private val simhashUdf = udf((toks: Seq[String]) => {
    val votes = new Array[Long](64)
    toks.foreach { t =>
      // xxhash-style 64-bit mix of the token (stable scala murmur x2)
      val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xffffffffL
      val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xffffffffL
      val h = (h1 << 32) | h2
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  })

  /** Add a 64-bit `simhash` column from space-tokenized content. */
  def simhash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash",
      simhashUdf(filter(split(lower(col(textCol)), " "), t => length(t) > 0)))

  /** Hamming distance between two simhash columns (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the high 16 bits (near-dups almost
    * always share a prefix band), then verify hamming <= threshold within
    * blocks. At scale the block key bounds the self-join.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val h = simhash(df, textCol)
      .select(col(idCol), col("simhash"), shiftrightunsigned(col("simhash"), 48).as("band"))
    val a = h.select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("band"))
    val b = h.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("band"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDist(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // -------------------------------------------------------------------------
  // Embedding-cosine near-dup
  // -------------------------------------------------------------------------

  /** Near-duplicate pairs by embedding cosine similarity, blocked on
    * `blockCol` to bound the pairwise join (at scale the block key is an LSH
    * bucket; here any low-cardinality key works).
    */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String, blockCol: String,
                  minCosine: Double = 0.8): DataFrame = {
    val a = df.select(col(blockCol).as("block"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(blockCol).as("block"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("block", "id_a", "id_b", "cosine")
  }
}
