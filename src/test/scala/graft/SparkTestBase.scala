package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (JVM-wide — sbt runs
  * suites in a single forked JVM, so getOrCreate dedupes).
  */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // Spark 4.1's checksum checkpoint manager can deadlock local-mode task
    // slots against its own background pool (all workers parked in
    // ChecksumCheckpointFileManager.awaitResult); not needed for tests.
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // Static conf: catalog tables (bucketing tests) land in a temp warehouse.
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}

trait SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def tempDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }
}
