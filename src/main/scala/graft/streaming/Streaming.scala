package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.Factory.{GraftChunker, GraftEmbedder}
import graft.operators.{Dedup, Sink}

/** Structured Streaming surface. The reference is batch/incremental-batch
  * (its "watermark" is an ingest cursor, not event time) — its incremental
  * model maps naturally onto `Trigger.AvailableNow`: each invocation
  * processes exactly the files that arrived since the last checkpoint, then
  * stops. That subsumes the reference's sha256-diff change detection for
  * append-only sources, with exactly-once bookkeeping from the checkpoint
  * instead of a hand-rolled state file.
  *
  * Also provides the event-time operators a streaming deployment of the
  * engine needs: watermarked windowed aggregation and
  * mapGroupsWithState-based streaming dedup.
  *
  * Local-mode note: Spark 4.1's checkpoint file-checksum manager
  * (`spark.sql.streaming.checkpoint.fileChecksum.enabled`) runs checksum IO
  * on a background pool that can starve against a small local[N] task pool
  * (all task slots parked in ChecksumCheckpointFileManager.awaitResult);
  * disable it for local runs.
  */
object Streaming {

  /** Incremental chunk+embed ingest: new files under `inputDir` flow
    * through the chunker/embedder into an append-only parquet sink.
    * `Trigger.AvailableNow` = one incremental batch per call (the
    * reference's `run` semantics); pass `continuous = true` for an
    * always-on stream.
    */
  def ingest(spark: SparkSession, inputDir: String, sinkDir: String,
             checkpointDir: String, chunker: GraftChunker, embedder: GraftEmbedder,
             continuous: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(inputDir)
      .select(col("value").as("content"),
        input_file_name().as("source"),
        sha2(col("value"), 256).as("fingerprint"),
        map().cast("map<string,string>").as("metadata"))
      .filter(length(trim(col("content"))) > 0)
    val chunked = chunker.chunk(raw, "content")
    val embedded = embedder.embed(chunked, "chunk")
    val projected = Sink.project(embedded, textCol = "chunk", vecCol = "embedding")
      .drop("content")
    val writer = projected.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow())).start()
  }

  /** Incremental ingest with the BATCH pipeline's upsert semantics: each
    * micro-batch runs the same delete-by-source dynamic-partition-overwrite
    * as `Sink.upsertBySource` via `foreachBatch` — re-ingesting a modified
    * file REPLACES its chunks instead of appending duplicates. Checkpoint
    * bookkeeping still guarantees each file is processed once; the upsert
    * makes reprocessing after a checkpoint reset idempotent too.
    */
  def ingestUpsert(spark: SparkSession, inputDir: String, sinkDir: String,
                   checkpointDir: String, chunker: GraftChunker, embedder: GraftEmbedder,
                   continuous: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(inputDir)
      .select(col("value").as("content"),
        input_file_name().as("source"),
        sha2(col("value"), 256).as("fingerprint"),
        map().cast("map<string,string>").as("metadata"))
      .filter(length(trim(col("content"))) > 0)
    val chunked = chunker.chunk(raw, "content")
    val embedded = embedder.embed(chunked, "chunk")
    val projected = Sink.project(embedded, textCol = "chunk", vecCol = "embedding")
      .drop("content")
    val writer = projected.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) Sink.upsertBySource(batch, sinkDir)
      }
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow())).start()
  }

  /** Streaming maintenance of the BUCKETED fingerprint state table
    * ([[graft.operators.StateStore.upsertBucketed]]): every micro-batch
    * merges its `(item_id, fingerprint)` rows into the state at `statePath`,
    * rewriting only the touched bucket directories — the incremental-state
    * write path composed with the real streaming engine. Checkpointing
    * gives each batch at-least-once delivery; the upsert is idempotent
    * (newest fingerprint per id), so replays after a checkpoint reset
    * converge to the same state, the [[ingestUpsert]] argument.
    *
    * `stream` must expose `idCol` and `fpCol`. Scale shape: per batch the
    * write cost is O(|batch| · (1 + |state|/numBuckets)) — the state table
    * never fully rewrites, so a long-running ingest over a 10⁹-item state
    * pays for its batches, not its history.
    */
  def stateUpsertSink(stream: DataFrame, statePath: String,
                      checkpointDir: String,
                      idCol: String = "item_id",
                      fpCol: String = "fingerprint",
                      numBuckets: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.StateStore.upsertBucketed(
            batch.sparkSession, statePath, batch, numBuckets, idCol, fpCol)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The INCREMENTAL-INGEST composition run end to end through the real
    * streaming engine (r12 verdict #7): change-detect each micro-batch
    * against the BUCKETED fingerprint state, emit only the new-or-changed
    * rows, and merge exactly those back into the state via
    * [[graft.operators.StateStore.upsertBucketed]] — detect → emit →
    * merge, the reference's incremental pipeline
    * (`yamlpipe/utils/state_manager.py:155-196`) over the 10⁹-item state
    * layout. Prior state is planted deterministically from the corpus
    * itself (every `doc_id % 5 == 0` carries a STALE fingerprint → must
    * be detected changed; every `doc_id % 7 == 0` is absent → detected
    * new; everything else is current → must NOT be emitted), so the
    * detected set AND the post-merge fingerprints are closed-form — one
    * value oracle covers detection and merge through the engine,
    * regardless of how AvailableNow splits the input (ids are unique in
    * the stream, so per-row decisions never interact).
    *
    * Returns a LOCAL frame `(doc_id, fingerprint, fp_after)` — detected
    * rows joined to the final state — and cleans up its temp dirs (the
    * [[runToLocalFrame]] discipline). Scale shape per micro-batch: one
    * broadcast anti-join against the state + a touched-buckets-only
    * merge; nothing rewrites the full table.
    */
  def runStateDetectAvailableNow(spark: SparkSession, docsPath: String,
                                 numBuckets: Int = 8): DataFrame = withHarnessConf(spark) {
    import graft.operators.StateStore
    val root = java.nio.file.Files.createTempDirectory("graft-stream-detect")
    try {
      val statePath = root.resolve("state").toString
      val outPath = root.resolve("detected").toString
      val docs = spark.read.parquet(docsPath)
      val prior = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").cast("string").as("item_id"),
          when(col("doc_id") % 5 === 0,
            sha2(concat(col("text"), lit(" stale")), 256))
            .otherwise(sha2(col("text"), 256)).as("fingerprint"),
          lit(null).cast("timestamp").as("updated_at"))
      StateStore.saveBucketed(prior, statePath, numBuckets)
      val p = new org.apache.hadoop.fs.Path(docsPath)
      val stream = spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", p.getName).parquet(p.getParent.toString)
        .select(col("doc_id").cast("string").as("item_id"),
          sha2(col("text"), 256).as("fingerprint"))
      val q = stream.writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val sp = batch.sparkSession
            // Bucket-pruned detection (r13): reads only the bucket dirs
            // this micro-batch touches — the read-path twin of the merge
            // below. Pinned: the detected set feeds TWO actions
            // (emit + merge); an unpinned lineage could re-evaluate
            // between them.
            val changed = StateStore
              .changedBucketed(sp, statePath, batch, numBuckets)
              .localCheckpoint(true)
            if (!changed.isEmpty) {
              changed.write.mode("append").parquet(outPath)
              StateStore.upsertBucketed(sp, statePath, changed, numBuckets)
            }
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val fin = StateStore.loadBucketed(spark, statePath)
        .select(col("item_id"), col("fingerprint").as("fp_after"))
      // outPath exists only if some batch emitted changed rows (r13
      // review): a corpus with nothing new or changed must return an
      // empty frame, not a PATH_NOT_FOUND crash.
      val detSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("fingerprint",
          org.apache.spark.sql.types.StringType)))
      // dropDuplicates on read (r13 advice): the foreachBatch append of
      // detected rows is non-transactional, so an at-least-once retry
      // after a partial append would duplicate rows for the retried
      // batch's ids. Ids are unique in the stream, so deduping on item_id
      // is exact (a retry re-emits the same (item_id, fingerprint)).
      val detected =
        (if (new java.io.File(outPath).exists())
          spark.read.schema(detSchema).parquet(outPath)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], detSchema))
          .dropDuplicates("item_id")
      val out = detected
        .select(col("item_id"), col("fingerprint"))
        .join(fin, Seq("item_id"))
        .select(col("item_id").cast("long").as("doc_id"),
          col("fingerprint"), col("fp_after"))
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(out.collect(): _*)),
        out.schema)
    } finally {
      org.apache.spark.network.util.JavaUtils.deleteRecursively(root.toFile)
    }
  }

  /** Watermarked sliding/tumbling-window aggregation over an event stream
    * (`events` table shape: ts, event_type, value). Late events beyond
    * `watermarkDelay` are dropped; state is bounded.
    */
  def windowedEventCounts(events: DataFrame,
                          tsCol: String = "ts",
                          keyCol: String = "event_type",
                          windowDuration: String = "1 hour",
                          watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** The windowed event aggregation executed as a REAL streaming query —
    * `readStream` over the events table, hourly tumbling windows,
    * `Trigger.AvailableNow` — run to completion and returned as a batch
    * DataFrame. Complete-mode memory sink keeps the result deterministic
    * (no watermark-withheld tail windows) regardless of how AvailableNow
    * splits the input into micro-batches; the always-on deployment is
    * [[windowedEventCounts]] (append mode + watermark to a real sink),
    * where state stays bounded — complete+memory is the finite-input
    * harness, not the 100 TB path.
    *
    * Event time is the events table's `ts` normalized to epoch micros
    * ([[graft.operators.EventTime]]) so the output matches engines that
    * carry microsecond timestamps.
    */
  /** Run `build(memTableName, checkpointDir)` to completion with the
    * local-mode checksum workaround applied, then return the memory-sink
    * contents as a self-contained LOCAL frame. Cleans up everything the
    * one-shot harness touched: the checksum conf is restored (not left
    * mutated session-wide), the temp checkpoint directory is deleted, and
    * the memory-sink temp view is dropped — repeated gate runs in one
    * session no longer accumulate tables/dirs. Materializing is safe by
    * construction: memory sinks already hold the full result on the
    * driver, so the collect adds no new driver pressure (these runners are
    * the finite-input harness, not the 100 TB path — see each caller).
    */
  /** State-store fan-out for the run-to-completion local harness: a
    * stateful query instantiates ONE state store per shuffle partition at
    * query start, and each HDFS-backed instance pays a delta file +
    * snapshot + commit per micro-batch. At the finite gate scale that
    * per-instance overhead dominates (measured sf0.1: session-window
    * 4.0 s → 2.5 s, first-seen dedup 2.2 s → 1.4 s going 32 → 8), while
    * results are partition-count independent — exact aggregations,
    * per-key state, and the heavy-hitters sketch in its exact regime.
    * Production deployments call the streaming operators directly with
    * cluster-sized `spark.sql.shuffle.partitions`; this override lives
    * ONLY inside the harness and is restored on exit.
    */
  private val HarnessStateParts =
    sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "8") // env-probe (r17); 8 = measured optimum

  /** Harness-scoped conf overrides (checksum-pool fix from the object
    * scaladoc + [[HarnessStateParts]]), restored on exit. Disabling the
    * trailing no-data micro-batch was MEASURED here and reverted: the
    * isolated probe suggested ~30% per stateful gate, but family-level
    * bench runs came out slower with it off (the AvailableNow
    * termination path waits longer without the no-data cycle), and
    * append-with-watermark queries would silently lose their tail
    * windows — not worth it.
    */
  private def withHarnessConf[T](spark: SparkSession)(body: => T): T = {
    val overrides = Seq(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> HarnessStateParts)
    val prevs = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prevs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def runToLocalFrame(spark: SparkSession, prefix: String)
                             (build: (String, String) => StreamingQuery): DataFrame =
    withHarnessConf(spark) {
      val name = prefix + java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
      try {
        build(name, ckpt.toString).awaitTermination()
        val sunk = spark.table(name)
        spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(sunk.collect(): _*)),
          sunk.schema)
      } finally {
        spark.catalog.dropTempView(name)
        org.apache.spark.network.util.JavaUtils.deleteRecursively(ckpt.toFile)
      }
    }

  /** Stream the events table with `ts` normalized to epoch micros — the
    * streaming twin of [[graft.operators.EventTime.readMicros]], shared by
    * both event-time streaming gates so a fixture-encoding or
    * FileStreamSource workaround change has ONE site. EventTime's
    * normalization is a pure projection, so it composes with the streaming
    * frame unchanged; FileStreamSource needs a DIRECTORY to watch and the
    * test tables are single files, hence parent dir + name filter.
    */
  private def streamEventsMicros(spark: SparkSession, eventsPath: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsPath).schema
    val p = new org.apache.hadoop.fs.Path(eventsPath)
    graft.operators.EventTime.tsMicros(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", p.getName)
        .parquet(p.getParent.toString), "ts")
  }

  def runWindowedAvailableNow(spark: SparkSession, eventsPath: String): DataFrame = {
    runToLocalFrame(spark, "sw_") { (name, ckpt) =>
      streamEventsMicros(spark, eventsPath)
        .withColumn("ets", timestamp_micros(col("ts")))
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n_events"), col("sum_value"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** The session_window aggregation executed as a REAL streaming query —
    * stateful session-window merging through the streaming engine, run to
    * completion with `Trigger.AvailableNow`. Complete-mode memory sink
    * keeps the result deterministic (no watermark-withheld tail sessions)
    * regardless of micro-batch splits, exactly the [[runWindowedAvailableNow]]
    * pattern; the always-on deployment is
    * [[graft.operators.Sessionize.streamingSessionStats]] with a watermark
    * to a real sink. Output columns match the batch gate
    * (`session_window_events`) so ONE oracle covers both execution paths.
    */
  def runSessionWindowAvailableNow(spark: SparkSession, eventsPath: String,
                                   gap: String = "30 minutes"): DataFrame = {
    runToLocalFrame(spark, "ssw_") { (name, ckpt) =>
      val ev = streamEventsMicros(spark, eventsPath)
        .select(col("user_id"), timestamp_micros(col("ts")).as("ts"), col("value"))
      graft.operators.Sessionize.streamingSessionStats(ev, "user_id", "ts", gap)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events"), col("sum_value"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** STREAM-STREAM interval join — the two-live-streams pattern
    * (click→conversion attribution, request→response matching): each
    * event matched to every LATER event of the same user within `within`,
    * both sides REAL streaming readers over the events table. Inner
    * stream-stream joins emit rows eagerly on match (no watermark
    * withholding — that applies to outer joins only), so append-mode +
    * AvailableNow is deterministic; the watermarks exist to let the
    * engine EVICT join state older than the interval bound — the
    * 100 TB-scale property, since unbounded join state is the classic
    * stream-join failure. The time-range predicate is what makes
    * eviction possible: Spark derives state watermarks from
    * `b_ets ∈ (a_ets, a_ets + within]` ([SS guide], inner join with time
    * range). The plain SQL self-join is the oracle.
    */
  def runIntervalJoinAvailableNow(spark: SparkSession, eventsPath: String,
                                  within: String = "30 minutes"): DataFrame =
    intervalJoinFrame(spark, eventsPath, within, "inner")

  /** LEFT OUTER stream-stream interval join — the attribution-completeness
    * twin of [[runIntervalJoinAvailableNow]]: a click with NO conversion in
    * its interval surfaces as a null-extended row. Outer results cannot
    * emit eagerly — an unmatched left row only becomes PROVABLY unmatched
    * once the watermark passes its join window (`a_ets + within`), at
    * which point the engine emits the null row and evicts the state in the
    * same move. Left rows whose window the terminal watermark never passes
    * stay withheld (their match set is still open — emitting them would be
    * a wrong answer, not a late one). Deterministic under AvailableNow:
    * the no-data micro-batch advances the watermark to its terminal value
    * `max(event_time) - delay`, so the emitted set is exactly
    * "unmatched AND window closed" — the cutoff the oracle replays.
    */
  def runIntervalJoinOuterAvailableNow(spark: SparkSession, eventsPath: String,
                                       within: String = "30 minutes"): DataFrame =
    intervalJoinFrame(spark, eventsPath, within, "leftOuter")

  private def intervalJoinFrame(spark: SparkSession, eventsPath: String,
                                within: String, joinType: String): DataFrame = {
    // r16 width probe, REVERTED: running this family at the session's 32
    // shuffle partitions (8 tasks -> 32) inflated task time 8.9 s -> 240 s
    // and wall 4.2 s -> 11.1 s — the stream-stream join instantiates FOUR
    // state stores per partition and the per-instance checkpoint I/O
    // swamps the extra parallelism. HarnessStateParts=8 stands.
    runToLocalFrame(spark, "ssj_") { (name, ckpt) =>
      def side(p: String) = streamEventsMicros(spark, eventsPath)
        .select(col("user_id").as(s"${p}_user"),
          timestamp_micros(col("ts")).as(s"${p}_ets"),
          col("event_type").as(s"${p}_type"))
        .withWatermark(s"${p}_ets", "2 hours")
      side("a").join(side("b"),
          col("a_user") === col("b_user") &&
          col("b_ets") > col("a_ets") &&
          col("b_ets") <= col("a_ets") + expr(s"INTERVAL $within"),
          joinType)
        .select(col("a_user").as("user_id"),
          unix_micros(col("a_ets")).as("a_ts_us"),
          unix_micros(col("b_ets")).as("b_ts_us"),
          col("a_type"), col("b_type"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** Stream-static enrichment — the dimension-join pattern every event
    * pipeline runs: a streaming fact (events) inner-joined to a broadcast
    * static dimension (customer), then aggregated per (segment, type).
    * Stream-static joins are stateless in Structured Streaming (the static
    * side is re-read per micro-batch, broadcast here since dimensions are
    * small); only the aggregation keeps state. Complete-mode memory sink +
    * AvailableNow = deterministic batch-equivalent output, so the plain
    * SQL join IS the oracle. Decimal-exact value sums as everywhere.
    */
  def runEnrichAvailableNow(spark: SparkSession, eventsPath: String,
                            customerPath: String): DataFrame = {
    runToLocalFrame(spark, "en_") { (name, ckpt) =>
      val dim = broadcast(spark.read.parquet(customerPath)
        .select(col("c_custkey"), col("c_mktsegment")))
      streamEventsMicros(spark, eventsPath)
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** Daily-count anomaly flags through the streaming engine: the
    * fences-offline / flag-online deployment shape — exact median/MAD
    * fences per event type are trained BATCH-side (the
    * [[graft.operators.Profile.robustFlags]] statistics), broadcast as a
    * static dimension into the stream, and every day's count is flagged
    * in-flight by the 3-MAD rule. Because fences here are trained on the
    * same fixture the stream replays, the final complete-mode table is
    * byte-identical to the batch `event_anomaly_mad` gate — ONE oracle
    * covers both execution paths (the `streaming_windowed` discipline).
    *
    * Scale shape: the fence table is |event types| rows (broadcast); the
    * streaming aggregation keys on (type, day) — bounded state, no
    * per-event state growth.
    */
  def runAnomalyAvailableNow(spark: SparkSession, eventsPath: String,
                             k: Double = 3.0): DataFrame = {
    import graft.operators.EventTime
    val daily = EventTime.readMicros(spark, eventsPath)
      .groupBy(col("event_type"),
        expr(s"ts div ${EventTime.DayMicros}").as("day"))
      .agg(count(lit(1)).as("n"))
    val fences = broadcast(
      graft.operators.Profile.robustFlags(daily, "event_type", "n", k)
        .select(col("event_type"), col("med_v"), col("mad_v")).distinct())
    runToLocalFrame(spark, "an_") { (name, ckpt) =>
      streamEventsMicros(spark, eventsPath)
        .withColumn("day", expr(s"ts div ${EventTime.DayMicros}"))
        .join(fences, Seq("event_type"))
        .groupBy(col("event_type"), col("day"), col("med_v"), col("mad_v"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("day"), col("n"), col("med_v"),
          col("mad_v"),
          (abs(col("n") - col("med_v")) > lit(k) * col("mad_v"))
            .as("is_outlier"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** Streaming first-seen dedup via mapGroupsWithState: one state entry per
    * fingerprint; each (fingerprint, first source) is emitted once, repeats
    * emit nothing. State grows with distinct fingerprints — a production
    * deployment bounds it with ProcessingTimeTimeout-based TTL (which makes
    * the query re-trigger continuously to fire timeouts; avoid in
    * one-shot/AvailableNow runs).
    */
  def streamingDedup(docs: Dataset[(String, String)]): Dataset[(String, String)] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .mapGroupsWithState[Boolean, Option[(String, String)]](
        GroupStateTimeout.NoTimeout()) {
        case (fp, rows, state: GroupState[Boolean]) =>
          if (state.exists) None // already seen -> duplicate
          else {
            state.update(true)
            rows.toSeq.headOption.map { case (_, source) => (fp, source) }
          }
      }
      .filter(_.isDefined)
      .map(_.get)
  }

  /** [[streamingDedup]] executed as a REAL streaming query over the
    * documents table with planted exact duplicates (the stream unioned
    * with an id-shifted copy of itself — both copies land in the same
    * AvailableNow batch, so the state dedup collapses them inside the
    * first group visit). Emits the deterministic projection — the SET of
    * first-seen fingerprints — which must equal DISTINCT sha256(text)
    * exactly once each; the first-SOURCE attribution is batch-order
    * dependent by design and stays out of the gate.
    */
  def runFirstSeenAvailableNow(spark: SparkSession, docsPath: String): DataFrame = {
    val batch = spark.read.parquet(docsPath)
    val p = new org.apache.hadoop.fs.Path(docsPath)
    runToLocalFrame(spark, "fs_") { (name, ckpt) =>
      val stream = spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", p.getName)
        .parquet(p.getParent.toString)
        .select(col("doc_id"), col("text"), col("source"))
      val doubled = stream.union(
        stream.withColumn("doc_id", col("doc_id") + 100000))
      import spark.implicits._
      val ds = doubled
        .select(sha2(col("text"), 256).as("fp"), col("source"))
        .as[(String, String)]
      streamingDedup(ds).toDF("fingerprint", "first_source")
        .select("fingerprint")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  /** The custom Misra-Gries `TypedImperativeAggregate`
    * ([[graft.plans.HeavyHittersAgg]]) executed by the STREAMING engine:
    * complete-mode aggregation over the streamed documents table, sketch
    * buffers merged across micro-batches by the state store. Capacity 64
    * exceeds the distinct-source count, so the sketch runs in its exact
    * regime and the final table equals the batch GROUP BY — the
    * `heavy_hitters` oracle covers both execution paths. The explode of
    * the final top-items array happens on the COLLECTED frame (the
    * streaming query emits the one-row sketch; generators after a
    * streaming aggregation are not supported in-plan).
    */
  def runHeavyHittersAvailableNow(spark: SparkSession,
                                  docsPath: String): DataFrame = {
    val batch = spark.read.parquet(docsPath)
    val p = new org.apache.hadoop.fs.Path(docsPath)
    val sunk = runToLocalFrame(spark, "hh_") { (name, ckpt) =>
      spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", p.getName)
        .parquet(p.getParent.toString)
        .agg(graft.plans.HeavyHittersAgg.approxTopItems(col("source"), 64)
          .as("top"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    sunk.select(explode(col("top")).as(Seq("source", "n_docs")))
  }

  /** [[nearDupFlagsAgainst]] executed as a REAL streaming query over the
    * documents table (`Trigger.AvailableNow`), against a planted reference:
    * every 7th document re-appears under a shifted id with a one-word
    * suffix. Returns the collected flags as a batch frame, distinct-ed
    * batch-side (multi-band collisions emit duplicate flags on the
    * stateless stream — see [[nearDupFlagsAgainst]]). The gate harness for
    * the streaming near-dup path; deterministic because MinHash is.
    */
  def runNearDupAvailableNow(spark: SparkSession, docsPath: String): DataFrame = {
    val batch = spark.read.parquet(docsPath)
    val ref = batch.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))
    val p = new org.apache.hadoop.fs.Path(docsPath)
    runToLocalFrame(spark, "nd_") { (name, ckpt) =>
      val stream = spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", p.getName)
        .parquet(p.getParent.toString)
        .select(col("doc_id"), col("text"))
      nearDupFlagsAgainst(stream, ref, "text", "doc_id",
          maxJaccardDistance = 0.5)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }.distinct()
  }

  /** Flag incoming documents that near-duplicate a STATIC reference corpus
    * (the existing training set) as they stream in — the crawl-frontier
    * twin of [[graft.operators.Dedup.crossCorpusPairs]]. Returns a
    * streaming frame `(id_new, id_ref, jaccard_dist)`.
    *
    * STATELESS by construction: the MinHash banding is a narrow projection
    * on the stream, candidate generation and shingle lookup are
    * stream-static inner equi-joins (no watermark, no state store, any
    * output mode), and the exact-Jaccard verify is per-row. Two artifacts
    * of statelessness, both deliberate:
    *  - a pair colliding in MULTIPLE bands emits duplicate identical flags
    *    (cross-batch distinct would need a state store — dedup downstream
    *    in foreachBatch when exactly-once flags matter);
    *  - the reference plan is re-evaluated per micro-batch — persist()
    *    the ref frame (or point it at a bucketed table) in production.
    */
  def nearDupFlagsAgainst(stream: DataFrame, ref: DataFrame,
                          textCol: String, idCol: String,
                          maxJaccardDistance: Double = 0.6,
                          numHashes: Int = 16, bandSize: Int = 2,
                          shingleSize: Int = 3, seed: Long = 42L): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be a multiple of bandSize")
    val mixedSeed = (seed ^ (seed >>> 32)).toInt
    val refBands = Dedup.bandedKeys(ref, textCol, idCol,
        numHashes, bandSize, shingleSize, seed)
      .select(col(idCol).as("__id_ref"), col("__band"), col("__minh"))
    val refShingles = ref.select(col(idCol).as("__id_ref"),
      Dedup.shinglesUdf(col(textCol), lit(shingleSize)).as("__sh_b"))
    val streamBanded = stream
      .select(col(idCol).as("id_new"),
        Dedup.shinglesUdf(col(textCol), lit(shingleSize)).as("__sh_a"),
        posexplode_outer(Dedup.minhashBandsFromTextUdf(col(textCol),
          lit(shingleSize), lit(numHashes), lit(bandSize), lit(mixedSeed)))
          .as(Seq("__band", "__minh")))
      .filter(col("__minh").isNotNull)
    streamBanded
      .join(refBands, Seq("__band", "__minh"))
      .join(refShingles, Seq("__id_ref"))
      .withColumn("jaccard_dist",
        lit(1.0) - Dedup.jaccardOnceUdf(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard_dist") <= maxJaccardDistance)
      .select(col("id_new"), col("__id_ref").as("id_ref"), col("jaccard_dist"))
  }
}
