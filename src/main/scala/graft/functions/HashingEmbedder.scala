package graft.functions

import scala.util.hashing.MurmurHash3

/** Deterministic, offline text embedder: a seeded feature-hashing projection
  * to a fixed-dimension L2-normalized float vector.
  *
  * Stands in for the reference's `SentenceTransformerEmbedder` /
  * `OpenAIEmbedder` (`yamlpipe/components/embedders.py:29-91`), which need a
  * local model or network access — neither exists in this environment. The
  * operator CONTRACT is preserved exactly: batch text -> fixed-dim float
  * vector, dimension configurable (reference defaults: 384 for
  * all-MiniLM-L6-v2, 768 for ko-sbert); empty input -> empty output
  * (`embedders.py:52-53`). The implementation is the classic hashing trick
  * (token -> bucket via hash, sign via a second hash bit), so equal texts map
  * to equal vectors and token overlap yields cosine similarity — good enough
  * to exercise search/dedup/eval semantics deterministically.
  *
  * Pure function of (text, dim, seed): safe to run as a UDF inside codegen'd
  * stages and reproducible across executors and runs.
  */
object HashingEmbedder {

  val DefaultDim = 64 // matches /root/testdata embeddings dim for interop
  val DefaultSeed = 42

  private val tokenPattern = "[\\p{L}\\p{N}]+".r

  def tokenize(text: String): Seq[String] =
    if (text == null) Seq.empty
    // Locale.ROOT: executor default locales must not change tokenization
    // (Turkish dotted/dotless I would split the vocabulary by machine).
    else tokenPattern.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** Embed one text into a unit-length float vector of dimension `dim`. */
  def embed(text: String, dim: Int = DefaultDim, seed: Int = DefaultSeed): Array[Float] = {
    val v = new Array[Double](dim)
    val toks = tokenize(text)
    if (toks.isEmpty) return new Array[Float](dim)
    toks.foreach { t =>
      val h = MurmurHash3.stringHash(t, seed)
      val bucket = java.lang.Math.floorMod(h, dim)
      val sign = if (((h >>> 16) & 1) == 0) 1.0 else -1.0
      v(bucket) += sign
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i) * v(i); i += 1 }
    val out = new Array[Float](dim)
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { out(i) = (v(i) * inv).toFloat; i += 1 }
    }
    out
  }

  /** Batch embed — the reference's embedder contract
    * (`embedders.py:51-59`): n texts -> n vectors, empty in -> empty out.
    */
  def embedBatch(texts: Seq[String], dim: Int = DefaultDim, seed: Int = DefaultSeed): Seq[Array[Float]] =
    texts.map(embed(_, dim, seed))
}
