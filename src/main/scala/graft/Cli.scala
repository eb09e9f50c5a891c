package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.Configs
import graft.operators.StateStore

/** Command-line entry points (SURVEY §2.8 F4–F10; reference
  * `yamlpipe/cli.py`). Verbs:
  *
  * {{{
  * run -c <config.yaml>                  execute the pipeline
  * init [dir]                            scaffold data/ + pipeline.yaml
  * status -c <config.yaml>               list processed item ids
  * list-components                       print the component registries
  * test-connection -c <config.yaml>      probe source + sink
  * clean -c <config.yaml> --yes          delete state + sink table
  * clean --registry <root> [--keep N] [--live fp,..] --yes
  *                                       prune index-artifact registry
  * eval <dataset.jsonl> -c <cfg> [-k N]  retrieval hit-rate
  * search <query> -c <cfg> [-k N]        top-k search (app.py:53-61)
  * }}}
  */
object Cli {

  private val DefaultConfigYaml =
    """# graft pipeline configuration
      |source:
      |  type: local_files
      |  config:
      |    directory: data
      |    glob: "*"
      |chunker:
      |  type: adaptive
      |  config:
      |    chunk_size: 500
      |    chunk_overlap: 50
      |embedder:
      |  type: sentence_transformer
      |  config:
      |    dim: 384
      |sink:
      |  type: lancedb
      |  config:
      |    uri: graft_sink
      |state_manager:
      |  type: json
      |  config:
      |    path: .graft_state.json
      |""".stripMargin

  private def arg(args: Array[String], flag: String): Option[String] = {
    val i = args.indexOf(flag)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  private def configPath(args: Array[String]): String =
    arg(args, "-c").orElse(arg(args, "--config")).getOrElse("pipeline.yaml")

  private def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", s"local[${Runtime.getRuntime.availableProcessors}]"))
    .appName("graft")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(1) }
    args.head match {
      case "run" =>
        val cfg = Configs.load(configPath(args))
        val spark = session()
        try {
          val report = Pipeline.run(spark, cfg)
          println(s"pipeline complete: ${report.documentsLoaded} docs loaded, " +
            s"${report.documentsChanged} changed, ${report.chunksWritten} chunks written, " +
            s"${report.sourcesProcessed} sources processed")
        } finally spark.stop()

      case "init" =>
        val dir = args.drop(1).headOption.filterNot(_.startsWith("-")).getOrElse(".")
        Files.createDirectories(Paths.get(dir, "data"))
        val cfgFile = Paths.get(dir, "pipeline.yaml")
        if (!Files.exists(cfgFile))
          Files.writeString(cfgFile, DefaultConfigYaml)
        println(s"initialized: $dir/data, $cfgFile")

      case "status" =>
        val cfg = Configs.load(configPath(args))
        val spark = session()
        try {
          val state = Factory.stateManager(cfg.stateManager).load(spark)
          val items = statusItems(state).collect().map(_.getString(0))
          if (items.isEmpty) println("no processed items")
          else { println(s"${items.length} processed item(s):"); items.foreach(i => println(s"  $i")) }
        } finally spark.stop()

      case "list-components" =>
        Factory.listComponents.toSeq.sortBy(_._1).foreach { case (kind, names) =>
          println(s"$kind: ${names.mkString(", ")}")
        }

      case "test-connection" =>
        val cfg = Configs.load(configPath(args))
        val spark = session()
        try {
          Factory.source(cfg.source).testConnection(spark)
          println(s"source (${cfg.source.componentType}): OK")
          Factory.sink(cfg.sink).testConnection(spark)
          println(s"sink (${cfg.sink.componentType}): OK")
        } finally spark.stop()

      case "clean" =>
        // `clean --registry <root> [--keep N] [--live fp1,fp2] --yes`
        // prunes the cross-session index-artifact registry instead of the
        // pipeline state/sink: keep the N newest versions per artifact
        // family plus every live fingerprint, drop the rest (the
        // Similarity.pruneRegistry retention verb). No config needed.
        arg(args, "--registry") match {
          case Some(root) =>
            if (!args.contains("--yes")) {
              println("refusing to prune the registry without --yes"); sys.exit(1)
            }
            val keep = arg(args, "--keep").map(_.toInt).getOrElse(2)
            val live = arg(args, "--live")
              .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
              .getOrElse(Set.empty[String])
            val removed =
              graft.operators.Similarity.pruneRegistry(root, keep, live)
            removed.foreach(p => println(s"pruned: $p"))
            println(s"registry clean: removed ${removed.size} version(s) " +
              s"under $root (kept newest $keep per family + " +
              s"${live.size} live fingerprint(s))")
          case None =>
            val cfg = Configs.load(configPath(args))
            if (!args.contains("--yes")) {
              println("refusing to delete state + sink without --yes"); sys.exit(1)
            }
            cfg.stateManager.str("path").foreach { p =>
              Files.deleteIfExists(Paths.get(p)); println(s"deleted state: $p")
            }
            cfg.sink.str("uri").orElse(cfg.sink.str("path")).foreach { p =>
              val f = new java.io.File(p)
              if (f.exists()) {
                org.apache.spark.network.util.JavaUtils.deleteRecursively(f)
                println(s"deleted sink: $p")
              }
            }
        }

      case "eval" =>
        val dataset = args.drop(1).headOption.filterNot(_.startsWith("-"))
          .getOrElse { println("usage: eval <dataset.jsonl> -c <config>"); sys.exit(1); "" }
        val cfg = Configs.load(configPath(args))
        val k = arg(args, "-k").map(_.toInt).getOrElse(5)
        val spark = session()
        try {
          val row = Engine.Evaluator(cfg).evaluate(spark, dataset, k).collect()(0)
          println(s"hit_rate=${row.getDouble(0)}% total=${row.getLong(1)} hits=${row.getLong(2)}")
        } finally spark.stop()

      case "search" =>
        val query = args.drop(1).headOption.filterNot(_.startsWith("-"))
          .getOrElse { println("usage: search <query> -c <config>"); sys.exit(1); "" }
        val cfg = Configs.load(configPath(args))
        val k = arg(args, "-k").map(_.toInt).getOrElse(3)
        val spark = session()
        try Engine.Searcher(cfg).search(spark, query, k).show(k, truncate = 80)
        finally spark.stop()

      case "dashboard" =>
        // F11 (reference `streamlit run app.py`): the interactive
        // run-and-search dashboard, served by the zero-dep JDK HttpServer
        // (Dashboard.scala). Blocks until killed.
        val port = arg(args, "-p").map(_.toInt).getOrElse(8501)
        val workDir = Paths.get(
          args.drop(1).headOption.filterNot(_.startsWith("-"))
            .getOrElse("temp_ui"))
        val spark = session()
        val d = Dashboard.serve(spark, workDir, port)
        println(s"dashboard listening on http://127.0.0.1:${d.boundPort} " +
          s"(workdir $workDir); Ctrl-C to stop")
        Thread.currentThread().join()

      case other =>
        println(s"unknown command: $other"); println(usage); sys.exit(1)
    }
  }

  /** The `status` verb's projection over a loaded state table: processed
    * item ids, watermark row excluded, sorted — shared by the verb and the
    * `cli_status` correctness gate (which drives it through a real JSON
    * backend save→load round trip).
    */
  def statusItems(state: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    state.filter(col("item_id") =!= StateStore.WatermarkKey)
      .select("item_id").orderBy("item_id")

  private def usage: String =
    """usage: graft <run|init|status|list-components|test-connection|clean|eval|search|dashboard> [options]
      |  -c/--config <path>   pipeline YAML (default: pipeline.yaml)
      |  -k <n>               top-k for eval/search
      |  -p <port>            dashboard port (default 8501)
      |  --yes                confirm clean
      |  --registry <root>    clean: prune the index-artifact registry
      |  --keep <n>           registry versions to keep per family (default 2)
      |  --live <fp,..>       registry fingerprints that must survive""".stripMargin
}
