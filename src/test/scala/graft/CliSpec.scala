package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.config.Configs

/** CLI verbs with filesystem effects (F5/F7/F9). Verbs that own a
  * SparkSession (run/status/eval/search) are covered through
  * Pipeline/Engine specs — invoking them here would stop the shared test
  * session.
  */
class CliSpec extends AnyFunSuite with SparkTestBase {

  test("init scaffolds data/ and a pipeline.yaml that Configs.load accepts") {
    val dir = tempDir("cli-init").toString
    Cli.main(Array("init", dir))
    assert(Files.isDirectory(Paths.get(dir, "data")))
    val cfgPath = Paths.get(dir, "pipeline.yaml")
    assert(Files.exists(cfgPath))
    val cfg = Configs.load(cfgPath.toString)
    assert(cfg.source.componentType == "local_files")
    assert(cfg.chunker.componentType == "adaptive")
    assert(cfg.sink.componentType == "lancedb")
    assert(cfg.stateManager.componentType == "json")
    // idempotent: re-init must not clobber an existing config
    Files.writeString(cfgPath, "# user-edited\n" + Files.readString(cfgPath))
    Cli.main(Array("init", dir))
    assert(Files.readString(cfgPath).startsWith("# user-edited"))
  }

  test("clean --yes deletes the state file and sink dir from the config") {
    val dir = tempDir("cli-clean")
    val statePath = dir.resolve("state.json")
    val sinkPath = dir.resolve("sink_table")
    Files.writeString(statePath, "{}")
    Files.createDirectories(sinkPath)
    Files.writeString(sinkPath.resolve("part-0.parquet"), "x")
    val cfgPath = dir.resolve("pipeline.yaml")
    Files.writeString(cfgPath,
      s"""source: {type: local_files, config: {directory: $dir}}
         |chunker: {type: recursive_character, config: {}}
         |embedder: {type: sentence_transformer, config: {}}
         |sink: {type: lancedb, config: {uri: $sinkPath}}
         |state_manager: {type: json, config: {path: $statePath}}
         |""".stripMargin)
    Cli.main(Array("clean", "-c", cfgPath.toString, "--yes"))
    assert(!Files.exists(statePath))
    assert(!Files.exists(sinkPath))
  }

  test("clean --registry prunes stale artifact versions, keeps live ones") {
    val root = tempDir("cli-registry")
    def mk(fp: String, ageMin: Long): java.nio.file.Path = {
      val p = java.nio.file.Paths.get(graft.operators.Similarity
        .registryPath(root.toString, "base", 4, 8, fp))
      Files.createDirectories(p)
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L - ageMin * 60000))
      p
    }
    val live = mk("aa-1", 30)
    val stale = mk("bb-2", 20)
    val newest = mk("cc-3", 10)
    Cli.main(Array("clean", "--registry", root.toString,
      "--keep", "1", "--live", "aa-1", "--yes"))
    assert(Files.isDirectory(live) && Files.isDirectory(newest))
    assert(!Files.exists(stale))
  }

  test("list-components prints every registry") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.main(Array("list-components"))
    }
    val text = out.toString
    for (expected <- Seq("local_files", "web", "s3", "postgres",
        "recursive_character", "markdown", "adaptive",
        "sentence_transformer", "openai", "lancedb", "chromadb", "json", "redis"))
      assert(text.contains(expected), s"missing component '$expected' in: $text")
  }
}
