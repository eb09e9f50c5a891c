package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashingEmbedder
import graft.operators.Partitioning

/** Embedding operator: DataFrame -> DataFrame + `embedding: array<float>`
  * column, row-aligned by construction (the reference zips a separate batch
  * result back onto chunks by index, `yamlpipe/core/pipeline.py:87-91` — in a
  * DataFrame the alignment is free and the operation is partition-parallel).
  *
  * The default binding is the deterministic offline hashing embedder (see
  * [[graft.functions.HashingEmbedder]]); the trait mirrors the reference's
  * pluggable embedder registry (`yamlpipe/core/factory.py:40-43`) so a real
  * model-serving client (one connection per partition, bounded batches) can
  * be slotted in without touching callers. Bounded per-partition batching is
  * the scale-safe shape — the reference's single global batch
  * (`pipeline.py:86-88`) would OOM the driver at 100 TB.
  */
object Embed {

  private def hashingUdf = udf((text: String, dim: Int, seed: Int) =>
    HashingEmbedder.embed(text, dim, seed))

  /** Attach an `embedding` column computed from `textCol`. */
  def hashing(df: DataFrame, textCol: String, dim: Int = HashingEmbedder.DefaultDim,
              seed: Int = HashingEmbedder.DefaultSeed, outCol: String = "embedding"): DataFrame =
    Partitioning.ensureParallelism(df)
      .withColumn(outCol, hashingUdf(col(textCol), lit(dim), lit(seed)))

  /** Embed a single query string on the driver (the reference's
    * `embedder.embed([query])[0]`, `core/evaluation.py:53`).
    */
  def embedQuery(query: String, dim: Int = HashingEmbedder.DefaultDim,
                 seed: Int = HashingEmbedder.DefaultSeed): Array[Float] =
    HashingEmbedder.embed(query, dim, seed)
}
