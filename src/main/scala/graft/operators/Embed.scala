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

  /** Per-dimension mean of `vecCol` per `groupCol` in EXPLODED layout
    * `(group, dim, value)` — chunk-to-document embedding pooling (and any
    * centroid summary). posexplode + groupBy partial-aggregates map-side:
    * only `groups x dim x partitions` partial sums shuffle, never rows —
    * the same budget as [[KMeans]]'s re-centroid step. Null vectors
    * contribute no rows.
    */
  def meanPoolExploded(df: DataFrame, groupCol: String, vecCol: String,
                       roundDp: Int = 6): DataFrame =
    df.select(col(groupCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "__v")))
      .groupBy(col(groupCol), col("dim"))
      .agg(round(avg(col("__v")), roundDp).as("value"))

  /** [[meanPoolExploded]] reassembled into an `embedding` array per group
    * (dimension order preserved).
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String,
               roundDp: Int = 6): DataFrame =
    meanPoolExploded(df, groupCol, vecCol, roundDp)
      .groupBy(col(groupCol))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("value")))),
        s => s.getField("value")).as("embedding"))

  /** Attach an `embedding` column by calling a remote OpenAI-style
    * embeddings endpoint (`embedders.py:62-91`): mapPartitions with ONE
    * http client per partition and bounded batches of `batchSize` texts per
    * POST — embeddings zip back row-aligned within the partition, so the
    * operation stays distributed and the driver never holds a global batch.
    * A failed batch fails the task (and with it the job) loudly; Spark task
    * retry is the retry policy. Pass `dim` in production: it is sent as the
    * API's `dimensions` parameter, validated against every returned vector,
    * and sizes the zero vector for null/empty texts (without it an
    * all-empty batch cannot know the width and emits length-0 vectors).
    */
  def remote(df: DataFrame, textCol: String, endpoint: String,
             apiKey: Option[String] = None,
             model: String = graft.functions.RemoteEmbedder.DefaultModel,
             batchSize: Int = graft.functions.RemoteEmbedder.DefaultBatchSize,
             timeoutSeconds: Int = 30,
             outCol: String = "embedding",
             dim: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val outSchema = StructType(
      inSchema.fields :+ StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val textIdx = inSchema.fieldIndex(textCol)
    Partitioning.ensureParallelism(df).mapPartitions { rows =>
      lazy val client = graft.functions.RemoteEmbedder.newClient(timeoutSeconds)
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => if (r.isNullAt(textIdx)) "" else r.getString(textIdx))
        // Null/empty texts never reach the API (OpenAI rejects "" inputs
        // with a 400, which would fail the whole job for one blank row);
        // they get the zero vector — the hashing embedder's contract.
        val nonEmpty = texts.zipWithIndex.filter(_._1.nonEmpty)
        val vecs =
          if (nonEmpty.isEmpty) Array.empty[Array[Float]]
          else graft.functions.RemoteEmbedder.embedBatch(
            client, endpoint, apiKey, model, nonEmpty.map(_._1), timeoutSeconds,
            dimensions = dim)
        val aligned = new Array[Array[Float]](texts.size)
        nonEmpty.map(_._2).zip(vecs).foreach { case (i, v) => aligned(i) = v }
        // Without a configured dim, an all-empty batch has no way to know
        // the vector width — a silent 0-length vector would make the
        // embedding column ragged across batches; fail loudly instead.
        if (nonEmpty.size < texts.size && dim.isEmpty && vecs.isEmpty)
          throw new IllegalStateException(
            "graft.Embed.remote: a batch of only null/empty texts needs an explicit dim " +
              "to size their zero vectors — pass dim=Some(d)")
        val zero = new Array[Float](dim.orElse(vecs.headOption.map(_.length)).getOrElse(0))
        batch.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (if (aligned(i) == null) zero else aligned(i)).toSeq)
        }
      }
    }(enc)
  }
}
