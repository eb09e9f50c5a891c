package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump a SUBSET of gates + their oracles for a targeted
  * `scripts/check_oracle.py` run — the fast inner loop when iterating on
  * one gate (full `graft.Verify` replays all of them, ~2 min).
  *
  * Usage: `runMain graft.tools.VerifyOne <gate[,gate...]> <sfDir> <outDir>`
  * then `python3 scripts/check_oracle.py <sfDir> <outDir>`.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // "@sql" dumps oracle_sql.json for EVERY gate without running any
    // query — the fast path when only oracle SQL text changed.
    val wanted =
      if (names == "@sql") Seq.empty
      else names.split(',').toSeq
    // Per-gate try/catch like `Verify`: one broken gate must not hide the
    // status of the rest of a multi-failure round.
    val failed = wanted.flatMap { n =>
      try {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
        None
      } catch {
        case e: Exception =>
          System.err.println(s"[VerifyOne] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          // A previous run's parquet must not masquerade as this run's
          // result in a later check_oracle.py pass (the Bench stale-digest
          // rule).
          org.apache.spark.network.util.JavaUtils.deleteRecursively(
            new java.io.File(s"$outDir/$n"))
          Some(n)
      }
    }
    if (failed.nonEmpty)
      System.err.println(s"[VerifyOne] ${failed.size}/${wanted.size} gates failed: ${failed.mkString(",")}")
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sqlNames = if (names == "@sql") graft.SparkEntry.oracleSql.keys.toSeq.sorted else wanted
    val json = sqlNames.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Non-zero exit on any gate failure: a pipeline keyed on exit codes
    // must never green-light a broken gate.
    if (failed.nonEmpty) sys.exit(1)
  }
}
