package graft

import org.apache.spark.sql.DataFrame

import graft.config.{ComponentConfig, GraftConfigException}
import graft.functions.HashingEmbedder
import graft.operators.{Chunkers, Embed}
import graft.sinks.{ChromaRestSink, CollectionSink, GraftSink, JsonlExportSink, VectorTableSink}
import graft.sources.{ArchiveSource, ColumnarSource, CsvSource, GraftSource, JdbcSource, JsonlSource, LocalFileSource, ObjectStoreSource, WarcSource, WebSource}
import graft.state.{JsonStateManager, MemoryStateManager, RedisStateManager, StateManager, TableStateManager}

/** Component registries + factory (SURVEY §2.8; reference
  * `yamlpipe/core/factory.py:29-90`). Type strings match the reference's
  * registries exactly (`local_files/web/s3/postgres`,
  * `recursive_character/markdown/adaptive`, `sentence_transformer/openai`,
  * `lancedb/chromadb`, `json/redis`), with engine-native additions
  * (`object_store`, `table`, `memory`). Unknown or missing types raise the
  * reference's error shape (`factory.py:56-90`).
  */
object Factory {

  // ---------------------------------------------------------------------
  // Component contracts
  // ---------------------------------------------------------------------

  /** Chunker: document frame -> chunk frame (adds chunk, chunk_index). */
  trait GraftChunker {
    def chunk(df: DataFrame, textCol: String = "content"): DataFrame
  }

  /** Embedder: frame -> frame + embedding column; plus driver-side query
    * embedding (reference `embedder.embed([query])[0]`,
    * `core/evaluation.py:53`).
    */
  trait GraftEmbedder {
    def dim: Int
    def embed(df: DataFrame, textCol: String): DataFrame
    def embedQuery(query: String): Array[Float]
  }

  // ---------------------------------------------------------------------
  // Implementations
  // ---------------------------------------------------------------------

  private final case class RecursiveChunker(size: Int, overlap: Int) extends GraftChunker {
    def chunk(df: DataFrame, textCol: String): DataFrame =
      Chunkers.recursive(df, textCol, size, overlap)
  }
  private final case object MarkdownChunker extends GraftChunker {
    def chunk(df: DataFrame, textCol: String): DataFrame = Chunkers.markdown(df, textCol)
  }
  private final case class AdaptiveChunker(size: Int, overlap: Int) extends GraftChunker {
    def chunk(df: DataFrame, textCol: String): DataFrame =
      Chunkers.adaptive(df, textCol, size, overlap)
  }
  private final case class SentenceChunker(per: Int, overlap: Int) extends GraftChunker {
    def chunk(df: DataFrame, textCol: String): DataFrame =
      Chunkers.sentences(df, textCol, per, overlap)
  }

  /** Deterministic offline embedder (the engine's default binding for both
    * reference embedder types — no local model or network exists here; the
    * contract and config surface are preserved, see
    * [[graft.functions.HashingEmbedder]]).
    */
  private final case class HashingEmbedderComponent(dim: Int, seed: Int) extends GraftEmbedder {
    def embed(df: DataFrame, textCol: String): DataFrame =
      Embed.hashing(df, textCol, dim, seed)
    def embedQuery(query: String): Array[Float] = HashingEmbedder.embed(query, dim, seed)
  }

  /** Remote HTTP embedder (the reference's OpenAI client,
    * `embedders.py:62-91`): distributed mapPartitions batch client against
    * an OpenAI-style `/embeddings` endpoint. Bound when the config provides
    * a `base_url`/`endpoint`; without one (this environment has no egress)
    * the factory falls back to the hashing stand-in, documented below.
    */
  private final case class RemoteEmbedderComponent(endpoint: String, apiKey: Option[String],
                                                   model: String, dim: Int,
                                                   batchSize: Int) extends GraftEmbedder {
    def embed(df: DataFrame, textCol: String): DataFrame =
      Embed.remote(df, textCol, endpoint, apiKey, model, batchSize, dim = Some(dim))
    def embedQuery(query: String): Array[Float] =
      graft.functions.RemoteEmbedder.embedBatch(
        graft.functions.RemoteEmbedder.newClient(30), endpoint, apiKey, model,
        Seq(query), dimensions = Some(dim))(0)
  }

  // ---------------------------------------------------------------------
  // Registries (F1)
  // ---------------------------------------------------------------------

  val sources: Map[String, ComponentConfig => GraftSource] = Map(
    "local_files" -> (c => LocalFileSource(c.require("directory"), c.strOr("glob", "*"))),
    "web" -> (c => WebSource(c.require("url"))),
    // "s3" keeps the reference type string; the engine reads any Hadoop
    // filesystem uri (s3a://bucket/prefix, file:///..., hdfs://...).
    "s3" -> (c => ObjectStoreSource(
      c.str("uri").getOrElse(s"s3a://${c.require("bucket")}/${c.strOr("prefix", "")}"),
      c.strOr("glob", "*"))),
    // Scale-path extension (no reference counterpart): Common Crawl-style
    // web-archive ingestion, one document per captured page.
    "warc" -> { c =>
      val mb = c.int("max_record_mb", 256)
      // zero/negative would silently skip every record; >= 2048 would wrap
      // the Int multiplication to a zero/negative cap — reject one, clamp
      // the other.
      if (mb <= 0)
        throw new config.GraftConfigException(
          s"warc: max_record_mb must be positive, got $mb")
      WarcSource(c.require("directory"), c.strOr("glob", "*.warc*"),
        maxRecordBytes = math.min(mb.toLong * 1024 * 1024, Int.MaxValue.toLong).toInt)
    },
    // Scale-path extension: archive-of-documents corpora — .tar/.tar.gz/
    // .tgz/.zip/.gz expand inside the distributed scan, one document per
    // leaf entry, entries dispatched by their own extension.
    "archive" -> { c =>
      val depth = c.int("max_depth", 3)
      if (depth < 1)
        throw new config.GraftConfigException(
          s"archive: max_depth must be >= 1, got $depth")
      ArchiveSource(c.require("directory"),
        c.strOr("glob", ArchiveSource.DefaultGlob), maxDepth = depth)
    },
    // Scale-path extension: JSONL corpora (one JSON document per line).
    "jsonl" -> { c =>
      val metas = c.str("meta_fields").map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      JsonlSource(c.require("directory"), c.strOr("glob", "*.jsonl"),
        c.strOr("text_field", "text"), c.str("id_field"), metas,
        strict = c.str("strict").exists(_.toBoolean))
    },
    // Scale-path extension: CSV/TSV corpora (positional columns, optional
    // header row; delimiter '\t' for TSV).
    "csv" -> { c =>
      val metas = c.str("meta_fields").map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      CsvSource(c.require("directory"), c.strOr("glob", "*.csv"),
        c.strOr("text_field", "text"), c.str("id_field"), metas,
        header = c.str("header").forall(_.toBoolean),
        delimiter = c.strOr("delimiter", ","),
        multiLine = c.str("multiline").exists(_.toBoolean),
        strict = c.str("strict").exists(_.toBoolean))
    },
    // Scale-path extension: columnar corpora (parquet/ORC tables) with a
    // predicate pushed into the scan.
    "parquet" -> { c =>
      val metas = c.str("meta_fields").map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      ColumnarSource(c.require("path"), c.strOr("format", "parquet"),
        c.strOr("text_field", "text"), c.str("id_field"), metas,
        where = c.str("where"))
    },
    "object_store" -> (c => ObjectStoreSource(c.require("uri"), c.strOr("glob", "*"))),
    "postgres" -> (c => JdbcSource(
      c.str("jdbc_url").getOrElse(
        s"jdbc:postgresql://${c.strOr("host", "localhost")}:${c.strOr("port", "5432")}/${c.require("dbname")}"),
      c.require("query"),
      c.str("timestamp_column"),
      None,
      Seq("user", "password").flatMap(k => c.str(k).map(k -> _)).toMap)),
    "jdbc" -> (c => JdbcSource(
      c.require("jdbc_url"), c.require("query"), c.str("timestamp_column"), None,
      Seq("user", "password", "driver").flatMap(k => c.str(k).map(k -> _)).toMap)))

  val chunkers: Map[String, ComponentConfig => GraftChunker] = Map(
    "recursive_character" -> (c =>
      RecursiveChunker(c.int("chunk_size", 100), c.int("chunk_overlap", 20))),
    "markdown" -> (_ => MarkdownChunker),
    "adaptive" -> (c =>
      AdaptiveChunker(c.int("chunk_size", 100), c.int("chunk_overlap", 20))),
    // Scale-path extension: RAG sentence-window strategy.
    "sentence_window" -> (c =>
      SentenceChunker(c.int("sentences_per_chunk", 5), c.int("overlap_sentences", 1))))

  val embedders: Map[String, ComponentConfig => GraftEmbedder] = Map(
    // Reference default model all-MiniLM-L6-v2 is 384-dim
    // (`embedders.py:32`); dim is configurable.
    "sentence_transformer" -> (c =>
      HashingEmbedderComponent(c.int("dim", 384), c.int("seed", HashingEmbedder.DefaultSeed))),
    // The reference requires an api key (arg or env) and errors without one
    // (`embedders.py:71-73`) — config error path preserved. With a
    // `base_url`/`endpoint` configured the REAL HTTP client is bound
    // (mapPartitions batch client, Embed.remote); without one this offline
    // environment binds the hashing stand-in under the same trait.
    "openai" -> { c =>
      val key = c.str("api_key").orElse(sys.env.get("OPENAI_API_KEY"))
      if (key.isEmpty)
        throw new GraftConfigException("OpenAI API key not set (api_key or OPENAI_API_KEY)")
      c.str("base_url").orElse(c.str("endpoint")) match {
        case Some(url) => RemoteEmbedderComponent(url, key,
          c.strOr("model", graft.functions.RemoteEmbedder.DefaultModel),
          c.int("dim", 1536),
          c.int("batch_size", graft.functions.RemoteEmbedder.DefaultBatchSize))
        case None =>
          HashingEmbedderComponent(c.int("dim", 1536), c.int("seed", HashingEmbedder.DefaultSeed))
      }
    },
    "hashing" -> (c =>
      HashingEmbedderComponent(c.int("dim", HashingEmbedder.DefaultDim),
        c.int("seed", HashingEmbedder.DefaultSeed))))

  val sinks: Map[String, ComponentConfig => GraftSink] = Map(
    "lancedb" -> (c => VectorTableSink(c.require("uri"))),
    // With a `host` configured the REAL over-the-wire client is bound
    // (Chroma REST surface, distributed per-partition upsert); without one
    // this offline environment binds the parquet-backed collection sink
    // under the same trait (same upsert semantics).
    "chromadb" -> { c =>
      c.str("host") match {
        case Some(h) => ChromaRestSink(
          s"http://$h:${c.int("port", 8000)}",
          c.strOr("collection_name", "yamlpipe_collection"))
        case None => CollectionSink(c.str("path").getOrElse(c.require("uri")))
      }
    },
    "table" -> (c => VectorTableSink(c.require("uri"))),
    // Scale-path extension: sharded JSONL corpus export (the trainer /
    // tokenizer interchange format).
    "jsonl" -> (c => JsonlExportSink(c.require("path"),
      compress = c.str("compress").exists(_.toBoolean),
      mode = c.strOr("mode", "overwrite"))))

  val stateManagers: Map[String, ComponentConfig => StateManager] = Map(
    "json" -> (c => JsonStateManager(c.strOr("path", ".graft_state.json"))),
    "table" -> (c => TableStateManager(c.require("path"))),
    "memory" -> (_ => new MemoryStateManager),
    "redis" -> (c => RedisStateManager(
      c.strOr("host", "localhost"), c.int("port", 6379),
      c.strOr("key", "graft:pipeline_state"))))

  // ---------------------------------------------------------------------
  // build_component (F2)
  // ---------------------------------------------------------------------

  private def build[T](registry: Map[String, ComponentConfig => T],
                       kind: String, cfg: ComponentConfig): T =
    registry.get(cfg.componentType) match {
      case Some(ctor) => ctor(cfg)
      case None => throw new GraftConfigException(
        s"unknown $kind type: '${cfg.componentType}' (available: ${registry.keys.toSeq.sorted.mkString(", ")})")
    }

  def source(cfg: ComponentConfig): GraftSource = build(sources, "source", cfg)
  def chunker(cfg: ComponentConfig): GraftChunker = build(chunkers, "chunker", cfg)
  def embedder(cfg: ComponentConfig): GraftEmbedder = build(embedders, "embedder", cfg)
  def sink(cfg: ComponentConfig): GraftSink = build(sinks, "sink", cfg)
  def stateManager(cfg: ComponentConfig): StateManager = build(stateManagers, "state_manager", cfg)

  /** Registry listing for the CLI (`cli.py:125-138`). */
  def listComponents: Map[String, Seq[String]] = Map(
    "sources" -> sources.keys.toSeq.sorted,
    "chunkers" -> chunkers.keys.toSeq.sorted,
    "embedders" -> embedders.keys.toSeq.sorted,
    "sinks" -> sinks.keys.toSeq.sorted,
    "state_managers" -> stateManagers.keys.toSeq.sorted)
}
