package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Sink

/** Vector-store sinks (SURVEY §2.4; reference
  * `yamlpipe/components/sinks.py:33-162`) as partitioned parquet tables
  * with delete-by-source upsert semantics.
  *
  * Upsert = DYNAMIC PARTITION OVERWRITE on a `source` hash bucket: only the
  * partitions containing incoming sources are rewritten (the reference's
  * "DELETE WHERE source IN (...) then append", `sinks.py:66-80`), everything
  * else untouched — no full-table rewrite at any scale.
  *
  * Schema semantics preserved from `yamlpipe/utils/dynamic_schemas.py`:
  *  - fixed `text` + `vector` columns always present (`:44-51`);
  *  - metadata columns restricted to the supported type set
  *    str/int/float/list/datetime (`:16-22`), unsupported -> error (`:56-60`);
  *  - on schema mismatch with the existing table, MIGRATE by rewriting:
  *    old rows are unioned in with missing columns nulled
  *    (`sinks.py:40-48,59-63`), via write-new-then-atomic-rename (the
  *    reference recreates the table in place, which has a loss window).
  */
trait GraftSink {
  def write(df: DataFrame): Unit
  def read(spark: SparkSession): DataFrame
  def testConnection(spark: SparkSession): Unit
}

object SinkSchemas {

  /** The supported metadata types (reference `dynamic_schemas.py:16-22`):
    * str/int/float/list/datetime plus the fixed text/vector columns.
    */
  def validate(schema: StructType): Unit = {
    require(schema.fieldNames.contains("text"), "sink schema must contain 'text'")
    require(schema.fieldNames.contains("vector"), "sink schema must contain 'vector'")
    schema.fields.foreach { f =>
      val ok = f.dataType match {
        case StringType | LongType | IntegerType | DoubleType | FloatType |
             TimestampType | DateType | BooleanType => true
        case ArrayType(_, _) => true
        case MapType(StringType, StringType, _) => true // promoted metadata map
        case _ => false
      }
      if (!ok) throw new IllegalArgumentException(
        s"unsupported metadata type for sink column '${f.name}': ${f.dataType.simpleString}")
    }
  }

  /** Schemas compatible = same names+types modulo nullability and column
    * order (first-observed-type-wins in the reference collapses to: the
    * DataFrame's own schema is the inferred schema).
    */
  def compatible(a: StructType, b: StructType): Boolean = {
    def norm(s: StructType) = s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    norm(a) == norm(b)
  }
}

/** K1 — table sink with the `text + vector + metadata` projection and
  * delete-by-source upsert (the reference's LanceDB sink).
  */
final case class VectorTableSink(path: String, numBuckets: Int = Sink.DefaultBuckets)
    extends GraftSink {

  // Whole-write serialization per table path (reentrant with the inner
  // upsert's lock): concurrent in-JVM writers see each other's completed
  // writes, never a half-migrated table.
  override def write(df: DataFrame): Unit = Sink.lockFor(path).synchronized {
    SinkSchemas.validate(df.schema)
    val spark = df.sparkSession
    val existing = try Some(spark.read.parquet(path)) catch { case _: Exception => None }
    existing match {
      case Some(old)
          if !SinkSchemas.compatible(
            old.drop("source_bucket").schema, df.schema) =>
        // Schema migration: rewrite old rows under the merged schema with
        // missing columns nulled (`sinks.py:40-48`), atomically.
        val oldData = old.drop("source_bucket")
        val merged = df.unionByName(oldData
            .join(df.select("source").distinct(), Seq("source"), "left_anti"),
          allowMissingColumns = true)
        // Unique staging dir (concurrent migrations must not clobber each
        // other), and move-old-aside-then-promote instead of
        // delete-then-rename so readers never observe a missing table:
        // the table path is absent only between two metadata-level renames,
        // not for the duration of a recursive delete.
        val runId = java.util.UUID.randomUUID().toString
        val tmp = path + ".migrate-" + runId
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val pathP = new org.apache.hadoop.fs.Path(path)
        val tmpP = new org.apache.hadoop.fs.Path(tmp)
        val oldAside = new org.apache.hadoop.fs.Path(path + ".old-" + runId)
        // Hadoop rename signals failure by RETURNING FALSE (and renaming
        // onto an existing dir nests the source inside it) — every rename
        // result is checked so a failed step can't silently "succeed" with
        // stale data. On a failed promote the old table is restored.
        var promoted = false
        try {
          merged.withColumn("source_bucket", pmod(hash(col("source")), lit(numBuckets)))
            .write.partitionBy("source_bucket").mode("overwrite").parquet(tmp)
          Sink.lockFor(path).synchronized {
            require(fs.rename(pathP, oldAside),
              s"sink migration: rename $pathP -> $oldAside failed")
            try {
              require(fs.rename(tmpP, pathP),
                s"sink migration: rename $tmpP -> $pathP failed")
              promoted = true
            } catch {
              case e: Throwable =>
                fs.rename(oldAside, pathP) // best-effort restore of the old table
                throw e
            }
          }
          fs.delete(oldAside, true)
        } finally {
          if (!promoted) fs.delete(tmpP, true)
        }
      case _ =>
        Sink.upsertBySource(df, path, numBuckets = numBuckets)
    }
  }

  override def read(spark: SparkSession): DataFrame =
    spark.read.parquet(path).drop("source_bucket")

  override def testConnection(spark: SparkSession): Unit = {
    // The reference probes `table_names()` (`sinks.py:95-100`); here:
    // the parent directory must be usable.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = p.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
  }
}

/** K2 — collection sink (the reference's ChromaDB sink): same upsert, but
  * every record gets a fresh uuid id (`sinks.py:143`) and the row shape is
  * ids + documents + embeddings + metadata.
  */
final case class CollectionSink(path: String, numBuckets: Int = Sink.DefaultBuckets)
    extends GraftSink {

  private val inner = VectorTableSink(path, numBuckets)

  override def write(df: DataFrame): Unit = {
    val withIds = if (df.columns.contains("id")) df
                  else df.withColumn("id", expr("uuid()"))
    inner.write(withIds)
  }

  override def read(spark: SparkSession): DataFrame = inner.read(spark)
  override def testConnection(spark: SparkSession): Unit = inner.testConnection(spark)
}

/** Corpus-export sink: sharded JSONL (optionally gzip), the interchange
  * format every downstream trainer/tokenizer reads. One JSON object per
  * document; shard count = the frame's partitioning (repartition upstream
  * to choose shard size — at 100 TB you want ~1 GiB shards, not one file).
  * `ignoreNullFields = false` keeps schema-stable lines (a missing key and
  * a null are different things to a reader contract).
  */
final case class JsonlExportSink(path: String, compress: Boolean = false,
                                 mode: String = "overwrite") extends GraftSink {

  override def write(df: DataFrame): Unit = {
    val w = df.write.mode(mode).option("ignoreNullFields", "false")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  override def read(spark: SparkSession): DataFrame = spark.read.json(path)

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = p.getParent
    if (parent != null && !fs.exists(parent))
      throw new IllegalStateException(s"parent directory does not exist: $parent")
  }
}
