package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — THE standard compression path for
  * embedding search at scale: split each `dim`-dim vector into `m`
  * subspaces of `dim/m` dims, k-means each subspace independently, and
  * store only the per-subspace nearest-centroid CODE (one small int each).
  * A 64-dim float vector becomes `m` bytes (256× smaller at m=8/k=256),
  * which is what makes a 100 TB embedding corpus fit executor memory for
  * scanning at all. Queries run ADC (asymmetric distance computation): the
  * exact query vector builds an `m × k` lookup table of subspace distances
  * once, and each row's approximate distance is `m` table lookups + adds —
  * no float vector is ever touched at scan time.
  *
  * Composition: use standalone as a compressed brute-force scan (already
  * linear, no quadratic joins), or inside an IVF cell scan
  * ([[Similarity.ivfTopK]]) for IVF-PQ.
  *
  * Determinism (gate contract): training reuses [[KMeans.fit]] per
  * subspace — lowest-id seeds, left-to-right double arithmetic, round-6
  * centroids per iteration — so the DuckDB oracle replays it with the same
  * unrolled-CTE machinery as `kmeans_assign`, per subspace. Code ties
  * break to the lowest code; ADC output rounds to 6dp with ties to the
  * lowest id.
  *
  * Scale shape: training = `m` independent vocab... corpus-scan k-means
  * fits (each its own bounded-driver-state Lloyd loop; sample-bound the
  * input with [[Sampling.hashSample]] for a 100 TB corpus — centroids
  * need a sample, not the corpus). Encoding = one narrow UDF pass (the
  * codebook broadcasts in the closure, `m*k*dim/m` doubles). ADC = a
  * codegen'd expression over the codes array + TakeOrderedAndProject —
  * no shuffle until the final top-k.
  */
object Pq {

  /** Per-subspace codebooks: `centroids(j)(c)` is the `subDim`-dim centroid
    * of code `c` in subspace `j`.
    */
  final case class Codebooks(m: Int, subDim: Int,
                             centroids: Array[Array[Array[Double]]]) {
    def k: Int = centroids(0).length
  }

  /** Train `m` codebooks of `k` centroids each. `df`'s `vecCol` dimension
    * must be divisible by `m`. One [[KMeans.fit]] per subspace over the
    * sliced vectors.
    */
  def train(df: DataFrame, vecCol: String, idCol: String, m: Int, k: Int,
            iterations: Int, roundDp: Int = 6): Codebooks = {
    require(m > 0, "m must be positive")
    val vecs = df.select(col(idCol).as("__id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"))
      .filter(col("__v").isNotNull)
      .persist()
    try {
      val dim = vecs.select(size(col("__v"))).head().getInt(0)
      require(dim % m == 0, s"graft.Pq: dim $dim not divisible by m=$m")
      val subDim = dim / m
      val books = (0 until m).toArray.map { j =>
        KMeans.fit(
          vecs.select(col("__id"),
            slice(col("__v"), j * subDim + 1, subDim).as("__s")),
          "__s", "__id", k, iterations, roundDp)
      }
      Codebooks(m, subDim, books)
    } finally vecs.unpersist()
  }

  /** The `m` codes of a vector column as an expression — the kernel behind
    * [[encode]], exposed so composite indexes (IVF-PQ) can attach codes in
    * the same pass that attaches the cell. Codebook rides the closure.
    */
  def encodeColumn(cb: Codebooks, vec: Column): Column = {
    val books = cb.centroids
    val subDim = cb.subDim
    val encodeUdf = udf((v: Seq[Double]) => {
      val arr = v.toArray
      Array.tabulate(books.length) { j =>
        val off = j * subDim
        var bestC = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < books(j).length) {
          val cent = books(j)(c)
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val t = arr(off + i) - cent(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; bestC = c } // strict: ties keep low code
          c += 1
        }
        bestC
      }.toSeq
    })
    encodeUdf(vec.cast(ArrayType(DoubleType)))
  }

  /** Encode every row to its `m` codes: `(id, codes array<int>)` — ints
    * here for plumbing clarity; at k <= 256 a production sink stores them
    * as `m` bytes. One narrow pass, codebook in the closure.
    */
  def encode(df: DataFrame, vecCol: String, idCol: String,
             cb: Codebooks): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), encodeColumn(cb, col(vecCol)).as("codes"))

  /** ADC top-k over an encoded frame: builds the `m × k` distance table
    * from the exact `query` driver-side (tiny), inlines it as a literal,
    * and scores each row with a pure codegen'd expression — `m` lookups
    * and adds per row, then TakeOrderedAndProject. Returns
    * `(id, adc_dist2)` rounded to `roundDp`, ties to the lowest id.
    */
  def adcTopK(codes: DataFrame, cb: Codebooks, query: Array[Double],
              topK: Int, idCol: String = "vec_id",
              roundDp: Int = 6): DataFrame = {
    require(query.length == cb.m * cb.subDim,
      s"graft.Pq: query dim ${query.length} != ${cb.m * cb.subDim}")
    // table(j)(c) = ||query_sub_j - centroid_jc||^2, left-to-right sums —
    // the same arithmetic the oracle's per-subspace distance SQL uses.
    val table: Array[Array[Double]] = Array.tabulate(cb.m) { j =>
      val off = j * cb.subDim
      cb.centroids(j).map { cent =>
        var d = 0.0
        var i = 0
        while (i < cb.subDim) {
          val t = query(off + i) - cent(i); d += t * t; i += 1
        }
        d
      }
    }
    val tableLit = array(table.map(row => array(row.map(lit): _*)): _*)
    val score = aggregate(
      zip_with(col("codes"), tableLit, (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    codes.select(col(idCol), round(score, roundDp).as("adc_dist2"))
      .orderBy(col("adc_dist2").asc, col(idCol).asc)
      .limit(topK)
  }
}
