package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ComponentConfig, Configs, GraftConfigException}

/** Config loading (F3) + factory registries (F1/F2): reference semantics
  * from `yamlpipe/utils/config.py:18-57` and `yamlpipe/core/factory.py`.
  */
class ConfigFactorySpec extends AnyFunSuite {

  private val goodYaml =
    """source:
      |  type: local_files
      |  config:
      |    directory: /tmp/data
      |chunker:
      |  type: recursive_character
      |  config:
      |    chunk_size: 150
      |    chunk_overlap: 30
      |embedder:
      |  type: sentence_transformer
      |  config:
      |    dim: 64
      |sink:
      |  type: lancedb
      |  config:
      |    uri: /tmp/sink
      |""".stripMargin

  test("parses a full pipeline config") {
    val cfg = Configs.parse(goodYaml)
    assert(cfg.source.componentType == "local_files")
    assert(cfg.source.require("directory") == "/tmp/data")
    assert(cfg.chunker.int("chunk_size", 0) == 150)
    assert(cfg.embedder.int("dim", 0) == 64)
    assert(cfg.sink.require("uri") == "/tmp/sink")
  }

  test("missing state_manager block defaults to the json backend") {
    val cfg = Configs.parse(goodYaml)
    assert(cfg.stateManager.componentType == "json")
    assert(cfg.stateManager.strOr("path", "") == ".graft_state.json")
  }

  test("empty / missing-file / bad-root configs raise") {
    assertThrows[GraftConfigException](Configs.parse(""))
    assertThrows[GraftConfigException](Configs.load("/nonexistent/pipeline.yaml"))
    assertThrows[GraftConfigException](Configs.parse("- a\n- b\n"))
    assertThrows[GraftConfigException](Configs.parse("source: {config: {}}\n"))
  }

  test("missing component block raises naming the component") {
    val e = intercept[GraftConfigException](Configs.parse("source:\n  type: web\n  config: {url: x}\n"))
    assert(e.getMessage.contains("chunker"))
  }

  test("factory builds every registered chunker/embedder type") {
    assert(Factory.chunker(ComponentConfig("recursive_character", Map())) != null)
    assert(Factory.chunker(ComponentConfig("markdown", Map())) != null)
    assert(Factory.chunker(ComponentConfig("adaptive", Map())) != null)
    assert(Factory.embedder(ComponentConfig("sentence_transformer", Map())).dim == 384)
    assert(Factory.embedder(ComponentConfig("hashing", Map())).dim == 64)
  }

  test("unknown component type raises with available types listed") {
    val e = intercept[GraftConfigException](
      Factory.chunker(ComponentConfig("nope", Map())))
    assert(e.getMessage.contains("unknown chunker type"))
    assert(e.getMessage.contains("recursive_character"))
  }

  test("openai embedder without api key raises (reference embedders.py:71-73)") {
    assertThrows[GraftConfigException](
      Factory.embedder(ComponentConfig("openai", Map())))
    assert(Factory.embedder(
      ComponentConfig("openai", Map("api_key" -> "k"))).dim == 1536)
  }

  test("openai embedder with a base_url binds the real HTTP client") {
    // Key error still fires first, with or without an endpoint.
    assertThrows[GraftConfigException](
      Factory.embedder(ComponentConfig("openai", Map("base_url" -> "http://x/v1/embeddings"))))
    val remote = Factory.embedder(ComponentConfig("openai",
      Map("api_key" -> "k", "base_url" -> "http://127.0.0.1:1/v1/embeddings", "dim" -> 8)))
    assert(remote.dim == 8)
    assert(remote.getClass.getSimpleName.contains("Remote"))
    // without an endpoint the offline hashing stand-in is bound
    val offline = Factory.embedder(ComponentConfig("openai", Map("api_key" -> "k")))
    assert(offline.getClass.getSimpleName.contains("Hashing"))
  }

  test("component registries expose the reference type strings") {
    val l = Factory.listComponents
    assert(l("sources").contains("local_files") && l("sources").contains("web") &&
      l("sources").contains("s3") && l("sources").contains("postgres"))
    assert(l("chunkers") == Seq("adaptive", "markdown", "recursive_character", "sentence_window"))
    assert(l("embedders").contains("sentence_transformer") && l("embedders").contains("openai"))
    assert(l("sinks").contains("lancedb") && l("sinks").contains("chromadb"))
    assert(l("state_managers").contains("json") && l("state_managers").contains("redis"))
    // scale-path extension formats
    assert(l("sources").contains("jsonl") && l("sources").contains("csv") &&
      l("sources").contains("parquet") && l("sources").contains("warc"))
    assert(l("sources").contains("archive"))
    assert(l("sinks").contains("jsonl"))
  }

  test("archive source builds from config; bad max_depth raises") {
    val src = Factory.source(ComponentConfig("archive",
      Map("directory" -> "/tmp/arch", "max_depth" -> 2)))
    assert(src.isInstanceOf[graft.sources.ArchiveSource])
    assert(src.asInstanceOf[graft.sources.ArchiveSource].maxDepth == 2)
    val e = intercept[graft.config.GraftConfigException](
      Factory.source(ComponentConfig("archive",
        Map("directory" -> "/tmp/arch", "max_depth" -> 0))))
    assert(e.getMessage.contains("max_depth"))
  }
}
