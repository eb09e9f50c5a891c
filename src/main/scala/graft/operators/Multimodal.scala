package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video as opaque `binary`
  * payloads with typed metadata, and run decode / feature-extraction as
  * batched per-partition transforms.
  *
  * The Spark-side shape is real and tested: schema, partitioning, batch
  * iteration, and the feature-frame contract all match what a production
  * decoder (via `mapInPandas` / a JNI codec) would use. The DECODE ITSELF IS
  * A STUB — this container has no image/audio codecs — replaced by a
  * deterministic fake that derives "features" from the payload bytes, clearly
  * marked below. Swapping in a real decoder changes only the body of
  * [[stubDecode]].
  */
object Multimodal {

  /** Canonical multimodal record schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Ingest a directory of files as multimodal records via Spark's
    * binaryFile source: one row per file, payload + path metadata, read
    * partition-parallel with no driver materialization.
    */
  def readBinaryDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content").as("payload"),
        lit("application/octet-stream").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        col("length").as("n_bytes"))

  /** Wrap a text frame as fake media records (payload = utf-8 bytes) so the
    * plumbing is exercisable on the synthetic corpus.
    */
  def fromText(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      length(col(textCol)).cast("long").as("n_bytes"))

  /** >>> STUB <<< — deterministic fake decode: a real implementation would
    * decode the payload (image pixels / audio samples) and emit features.
    * This fake derives a fixed-dim feature vector from payload bytes so the
    * pipeline shape (batch in, row-aligned features out) is fully testable
    * offline. Replace the body with a real codec call to productionize.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += out(j) * out(j); j += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { out(j) *= inv; j += 1 }
    }
    out
  }

  /** Feature extraction over media records: batched per partition (the
    * mapInPandas batch shape — a real decoder amortizes codec init across
    * the partition), emitting `media_id, mime, n_bytes, features`.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    Partitioning.ensureParallelism(
        media.select("media_id", "mime", "n_bytes", "payload"))
      .mapPartitions { rows =>
        // One decoder "session" per partition; rows stream through in order.
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("mime"),
            r.getAs[Long]("n_bytes"), stubDecode(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Resize shape for image-like payloads: downsample a decoded feature
    * grid to `outDim` cells by box-averaging — the per-row transform a real
    * `resize(w, h)` uses (decode -> pixel grid -> interpolate), with the
    * decode step behind the same [[stubDecode]] stub. Emits `media_id,
    * resized` (array<float> of outDim), row-aligned, no shuffle.
    */
  def resizeFeatures(media: DataFrame, srcDim: Int = 64, outDim: Int = 16): DataFrame = {
    require(srcDim % outDim == 0, "srcDim must be a multiple of outDim (box resize)")
    val box = srcDim / outDim
    val resizeUdf = udf((payload: Array[Byte]) => {
      val full = stubDecode(payload, srcDim)
      val out = new Array[Float](outDim)
      var i = 0
      while (i < outDim) {
        var acc = 0.0f
        var j = 0
        while (j < box) { acc += full(i * box + j); j += 1 }
        out(i) = acc / box
        i += 1
      }
      out
    })
    Partitioning.ensureParallelism(media)
      .select(col("media_id"), resizeUdf(col("payload")).as("resized"))
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * `nFrames` even byte windows and extract features per window — the
    * 1->N explode pattern a real frame sampler uses.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4, dim: Int = 8): DataFrame = {
    val frameUdf = udf((payload: Array[Byte]) => {
      if (payload == null || payload.isEmpty) Seq.empty[Seq[Float]]
      else {
        val step = math.max(1, payload.length / nFrames)
        (0 until nFrames).map { f =>
          val from = math.min(f * step, payload.length)
          val until = math.min((f + 1) * step, payload.length)
          stubDecode(java.util.Arrays.copyOfRange(payload, from, until), dim).toSeq
        }
      }
    })
    Partitioning.ensureParallelism(media)
      .withColumn("frames", frameUdf(col("payload")))
      .select(col("media_id"), posexplode(col("frames")).as(Seq("frame_index", "frame_features")))
  }
}
