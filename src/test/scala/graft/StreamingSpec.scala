package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ComponentConfig
import graft.streaming.Streaming

/** Structured Streaming surface: incremental ingest via AvailableNow,
  * watermarked windowed aggregation, stateful streaming dedup.
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  test("ingest processes only new files per AvailableNow run (incremental semantics)") {
    val root = tempDir("graft-stream")
    val in = root.resolve("in"); Files.createDirectories(in)
    val sinkDir = root.resolve("sink").toString
    val ckpt = root.resolve("ckpt").toString
    Files.writeString(in.resolve("one.txt"), "the first streaming document about spark engines")

    val chunker = Factory.chunker(ComponentConfig("recursive_character",
      Map("chunk_size" -> 60, "chunk_overlap" -> 5)))
    val embedder = Factory.embedder(ComponentConfig("hashing", Map("dim" -> 16)))

    val q1 = Streaming.ingest(spark, in.toString, sinkDir, ckpt, chunker, embedder)
    q1.awaitTermination()
    val n1 = spark.read.parquet(sinkDir).count()
    assert(n1 >= 1)

    // Second run with no new files: nothing appended.
    val q2 = Streaming.ingest(spark, in.toString, sinkDir, ckpt, chunker, embedder)
    q2.awaitTermination()
    assert(spark.read.parquet(sinkDir).count() == n1)

    // New file arrives: only it is processed.
    Files.writeString(in.resolve("two.txt"), "a second document arrives later in the stream")
    val q3 = Streaming.ingest(spark, in.toString, sinkDir, ckpt, chunker, embedder)
    q3.awaitTermination()
    val out = spark.read.parquet(sinkDir)
    assert(out.count() > n1)
    assert(out.select("source").distinct().count() == 2)
  }

  test("ingestUpsert: reprocessing a modified file replaces its chunks, keeps others") {
    val root = tempDir("graft-stream-up")
    val in = root.resolve("in"); Files.createDirectories(in)
    val sinkDir = root.resolve("sink").toString
    val chunker = Factory.chunker(ComponentConfig("recursive_character",
      Map("chunk_size" -> 60, "chunk_overlap" -> 5)))
    val embedder = Factory.embedder(ComponentConfig("hashing", Map("dim" -> 16)))

    Files.writeString(in.resolve("a.txt"), "original content of document a for streaming upsert")
    Files.writeString(in.resolve("b.txt"), "content of document b which will stay untouched")
    val q1 = Streaming.ingestUpsert(spark, in.toString, sinkDir,
      root.resolve("ckpt1").toString, chunker, embedder)
    q1.awaitTermination()
    val first = spark.read.parquet(sinkDir)
    assert(first.select("source").distinct().count() == 2)

    // File a changes; the file stream tracks seen paths, so reprocessing
    // needs a fresh checkpoint — the upsert makes that safe: a's chunks are
    // REPLACED (not appended), b's are carried through untouched.
    Files.writeString(in.resolve("a.txt"), "completely rewritten document a after the edit")
    Files.delete(in.resolve("b.txt"))
    val q2 = Streaming.ingestUpsert(spark, in.toString, sinkDir,
      root.resolve("ckpt2").toString, chunker, embedder)
    q2.awaitTermination()
    val out = spark.read.parquet(sinkDir)
    assert(out.select("source").distinct().count() == 2, "b's chunks must survive")
    val aTexts = out.filter(col("source").endsWith("a.txt"))
      .select("text").collect().map(_.getString(0))
    assert(aTexts.nonEmpty && aTexts.forall(_.contains("rewritten")),
      s"stale chunks for a.txt: ${aTexts.mkString("; ")}")
  }

  test("stateUpsertSink: streaming batches maintain the bucketed state " +
      "table incrementally; a second run merges, not rewrites") {
    val root = tempDir("graft-stream-state")
    val in = root.resolve("in"); Files.createDirectories(in)
    val statePath = root.resolve("state").toString
    def stream() = spark.readStream
      .format("text").option("wholetext", "true").load(in.toString)
      .select(org.apache.spark.sql.functions.input_file_name().as("item_id"),
        org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.col("value"), 256).as("fingerprint"))
    Files.writeString(in.resolve("a.txt"), "doc a v1")
    Files.writeString(in.resolve("b.txt"), "doc b v1")
    val q1 = Streaming.stateUpsertSink(stream(), statePath,
      root.resolve("ckpt1").toString, numBuckets = 8)
    q1.awaitTermination()
    val s1 = graft.operators.StateStore.loadBucketed(spark, statePath)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(s1.size == 2 && s1.keys.forall(_.nonEmpty))
    // Second run from a fresh checkpoint with one changed + one new file:
    // changed id's fingerprint is replaced, unchanged id survives, new id
    // appends — upsert semantics through the streaming engine.
    Files.writeString(in.resolve("a.txt"), "doc a v2")
    Files.writeString(in.resolve("c.txt"), "doc c v1")
    val q2 = Streaming.stateUpsertSink(stream(), statePath,
      root.resolve("ckpt2").toString, numBuckets = 8)
    q2.awaitTermination()
    val s2 = graft.operators.StateStore.loadBucketed(spark, statePath)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(s2.size == 3, s2.keys.toString)
    val aKey = s2.keys.find(_.endsWith("a.txt")).get
    val bKey = s2.keys.find(_.endsWith("b.txt")).get
    assert(s2(aKey) != s1(aKey), "changed file must get a new fingerprint")
    assert(s2(bKey) == s1(bKey), "unchanged file's fingerprint survives")
  }

  test("runStateDetectAvailableNow: a corpus with nothing new or changed " +
      "returns an empty frame, not a missing-path crash") {
    import spark.implicits._
    val dir = tempDir("graft-stream-detect-empty")
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text") // no id divisible by 5 or 7 -> plant detects nothing
    val path = dir.resolve("documents.parquet").toString
    docs.coalesce(1).write.parquet(path)
    val out = graft.streaming.Streaming.runStateDetectAvailableNow(spark, path)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("doc_id", "fingerprint", "fp_after"))
  }

  test("watermarked windowed aggregation over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = stream.toDF().toDF("ts", "event_type", "value")
    val agg = Streaming.windowedEventCounts(events,
      windowDuration = "10 minutes", watermarkDelay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      stream.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "view", 5.0))
      q.processAllAvailable()
      // Advance the watermark past the first windows so they close and emit.
      stream.addData((ts(40), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("event_type", "n_events", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("AvailableNow windowed run over the events table matches the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Streaming.runWindowedAvailableNow(spark, s"$dir/events.parquet")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.EventTime.readMicros(spark, s"$dir/events.parquet")
      .groupBy(org.apache.spark.sql.functions.expr(
        "ts - ts % 3600000000").as("window_start_us"),
        col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(col("value").cast("decimal(28,6)"))
          .cast("double").as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("AvailableNow stream-static enrichment matches the batch join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Streaming.runEnrichAvailableNow(spark,
        s"$dir/events.parquet", s"$dir/customer.parquet")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.EventTime.readMicros(spark, s"$dir/events.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(col("value").cast("decimal(28,6)"))
          .cast("double").as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("AvailableNow stream-stream interval join matches the batch self-join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Streaming.runIntervalJoinAvailableNow(
        spark, s"$dir/events.parquet")
      .collect().map(_.toSeq).toSet
    val ev = graft.operators.EventTime.readMicros(spark, s"$dir/events.parquet")
    def side(p: String) = ev.select(col("user_id").as(s"${p}_user"),
      col("ts").as(s"${p}_us"), col("event_type").as(s"${p}_type"))
    val batch = side("a").join(side("b"),
        col("a_user") === col("b_user") &&
        col("b_us") > col("a_us") &&
        col("b_us") <= col("a_us") + org.apache.spark.sql.functions.lit(1800000000L))
      .select(col("a_user"), col("a_us"), col("b_us"), col("a_type"), col("b_type"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("outer interval join adds exactly the closed-window unmatched rows") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Streaming.runIntervalJoinOuterAvailableNow(
        spark, s"$dir/events.parquet")
      .collect().map(_.toSeq).toSet
    val ev = graft.operators.EventTime.readMicros(spark, s"$dir/events.parquet")
    val maxTs = ev.agg(org.apache.spark.sql.functions.max(col("ts")))
      .head.getLong(0)
    def side(p: String) = ev.select(col("user_id").as(s"${p}_user"),
      col("ts").as(s"${p}_us"), col("event_type").as(s"${p}_type"))
    val inner = side("a").join(side("b"),
        col("a_user") === col("b_user") &&
        col("b_us") > col("a_us") &&
        col("b_us") <= col("a_us") + org.apache.spark.sql.functions.lit(1800000000L))
      .select(col("a_user"), col("a_us"), col("b_us"), col("a_type"), col("b_type"))
      .collect().map(_.toSeq).toSet
    // null-extended rows: unmatched left AND window closed under the
    // terminal watermark (strict <) — the engine's eviction boundary
    val unmatched = streamed.filter(_(2) == null)
    assert(unmatched.nonEmpty, "fixture must exercise the null-extension path")
    assert(streamed.filter(_(2) != null) === inner,
      "matched rows must equal the eager inner join")
    val wm = maxTs - 7200000000L
    assert(unmatched.forall(r =>
      r(1).asInstanceOf[Long] + 1800000000L < wm),
      "every emitted null row's window must be closed")
    val matchedA = inner.map(r => (r(0), r(1)))
    assert(unmatched.forall(r => !matchedA.contains((r(0), r(1)))),
      "null rows must be genuinely unmatched")
  }

  test("one-shot runners clean up after themselves (conf, memory table, result survives)") {
    // r7 ADVICE fix: the AvailableNow gate runners used to leave the
    // checksum conf mutated session-wide and leak one memory-sink temp
    // view + one temp checkpoint dir per invocation.
    val confKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val before = spark.conf.getOption(confKey)
    val viewsBefore = spark.catalog.listTables().count()
    val out = Streaming.runNearDupAvailableNow(
      spark, "/root/testdata/sf0.001/documents.parquet")
    assert(spark.conf.getOption(confKey) == before, "conf must be restored")
    assert(spark.catalog.listTables().count() == viewsBefore,
      "memory-sink temp view must be dropped")
    // the returned frame must remain usable AFTER its sink table is gone
    assert(out.count() > 0)
  }

  test("curation filters (PII redaction, quality, repetition) run unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    // The curation operators are stateless narrow expressions, so the SAME
    // operator code serves batch and streaming — no streaming variant needed.
    val curated = graft.operators.TextAnalysis.piiFrame(docs, "text", "doc_id")
      .join(graft.operators.TextAnalysis.repetitionFrame(docs, "text", "doc_id"), "doc_id")
    val q = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      stream.addData((1L, "mail a@b.co now\nrepeat\nrepeat"), (2L, "clean text"))
      q.processAllAvailable()
      val rows = spark.table("curated").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(rows(1L).getAs[String]("redacted").startsWith("mail [EMAIL]"))
      assert(rows(1L).getAs[Double]("dup_line_fraction") > 0.0)
      assert(rows(2L).getAs[Long]("n_email") == 0L &&
        rows(2L).getAs[Double]("dup_line_fraction") == 0.0)
    } finally q.stop()
  }

  test("streaming session windows merge within the gap and close on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = stream.toDF().toDF("ts", "user_id", "value")
    val agg = graft.operators.Sessionize.streamingSessionStats(
      events, "user_id", "ts", gap = "10 minutes", delay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      // user 1: two events 5 min apart (one session), one event 25 min later
      // (a second session); user 2: a single event.
      stream.addData((ts(0), 1L, 1.0), (ts(5), 1L, 2.0), (ts(30), 1L, 4.0),
        (ts(1), 2L, 8.0))
      q.processAllAvailable()
      stream.addData((ts(59), 9L, 0.0)) // advance watermark; close sessions
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), rows.toString) // merged session
      assert(rows.contains((1L, 1L, 4.0)))                // split session
      assert(rows.contains((2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("stream-static near-dup flags incoming docs against a reference corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely unrelated reference material about databases")
    ).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val flags = Streaming.nearDupFlagsAgainst(
      stream.toDS().toDF("doc_id", "text"), ref, "text", "doc_id",
      maxJaccardDistance = 0.5)
    val q = flags.writeStream.format("memory").queryName("neardup_flags")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 100
        (2L, "totally novel text with no reference overlap at all"))
      q.processAllAvailable()
      val got = spark.table("neardup_flags")
        .select("id_new", "id_ref").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L)))
      // a later batch still flags against the same static side
      stream.addData((3L, "completely unrelated reference material about databases"))
      q.processAllAvailable()
      val all = spark.table("neardup_flags")
        .select("id_new", "id_ref").as[(Long, Long)].collect().toSet
      assert(all == Set((1L, 100L), (3L, 101L)))
    } finally q.stop()
  }

  test("streaming dedup emits each fingerprint once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val deduped = Streaming.streamingDedup(stream.toDS())
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("update").start()
    try {
      stream.addData(("fp1", "a.txt"), ("fp2", "b.txt"), ("fp1", "a_copy.txt"))
      q.processAllAvailable()
      val batch1 = spark.table("dedup_out").as[(String, String)].collect().toSet
      assert(batch1.map(_._1) == Set("fp1", "fp2"))

      // Same fingerprint again in a later batch: suppressed by query state.
      stream.addData(("fp1", "again.txt"), ("fp3", "c.txt"))
      q.processAllAvailable()
      val all = spark.table("dedup_out").as[(String, String)].collect()
      assert(all.count(_._1 == "fp1") == 1) // still only the first emission
      assert(all.map(_._1).toSet == Set("fp1", "fp2", "fp3"))
    } finally q.stop()
  }

  test("streaming heavy hitters equal the batch GROUP BY (exact regime)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streaming
      .runHeavyHittersAvailableNow(spark, s"$dir/documents.parquet")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming anomaly flags equal the batch robustFlags verdicts") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streaming
      .runAnomalyAvailableNow(spark, s"$dir/events.parquet")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("day")) -> ((r.getAs[Long]("n"),
        r.getAs[Boolean]("is_outlier")))).toMap
    val daily = graft.operators.EventTime
      .readMicros(spark, s"$dir/events.parquet")
      .groupBy(col("event_type"),
        expr(s"ts div ${graft.operators.EventTime.DayMicros}").as("day"))
      .agg(count(lit(1)).as("n"))
    val batch = graft.operators.Profile.robustFlags(daily, "event_type", "n")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("day")) -> ((r.getAs[Long]("n"),
        r.getAs[Boolean]("is_outlier")))).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
