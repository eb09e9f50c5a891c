package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: lay the corpus out as one deterministic
  * token stream and cut it into fixed-length training sequences (the
  * GPT-style "concatenate and chunk" recipe). Each document is mapped to the
  * global offset of its first token; from that offset alone follow the
  * sequence id it starts in, its offset inside that sequence, and how many
  * sequences it spans. `pieces` explodes the per-sequence slices so a
  * writer can emit the actual packed examples.
  *
  * No reference counterpart (the reference stops at ingest+search) — this is
  * the step a 100 TB pretraining pipeline runs after mixing, immediately
  * before tokenized shard writing.
  *
  * Scale stance: the global offset is an exclusive prefix sum over a total
  * order — the textbook single-partition window. This implementation does it
  * as a two-pass distributed prefix sum instead: range-partition by the
  * order keys, running sum WITHIN each partition (parallel), plus a
  * broadcast map of per-partition token totals (one tiny row per partition)
  * to shift each partition into global coordinates. No stage ever sees the
  * corpus in one task. The range-partitioned input is pinned with an EAGER
  * `localCheckpoint` so the totals pass and the output read the exact same
  * partition boundaries: range sampling is nondeterministic across
  * executions, and a plain persist would silently re-sample on an
  * executor loss (recompute) — checkpoint truncation makes block loss a
  * loud job failure instead of offsets inconsistent with the collected
  * totals. Checkpoint blocks live in the block manager OUTSIDE the
  * CacheManager, so `spark.catalog.clearCache()` does NOT touch them; they
  * are reclaimed only by the ContextCleaner after the checkpointed RDD is
  * garbage-collected (i.e. once the returned frame and its lineage are
  * unreferenced and a GC runs). Between corpora in one long session, drop
  * all references to the previous output and its inputs; under real memory
  * pressure the supported bound is Spark's own periodic cleaner nudge —
  * set `spark.cleaner.periodicGC.interval` (default 30min) low (a
  * hand-rolled `System.gc()` is a JVM-wide stall and a silent no-op under
  * `-XX:+DisableExplicitGC`). At extreme scale the same two passes would
  * run against a staged table instead of the block-manager cache.
  */
object SequencePack {

  /** Map each document to its place in the packed token stream.
    *
    * Emits the input columns plus `start_token` (global offset of the
    * document's first token), `seq_id` (index of the `seqLen`-sized sequence
    * that offset falls in), `offset_in_seq`, and `n_seqs` (how many
    * sequences the document spans; 0 for empty documents).
    *
    * `orderBy` must be a TOTAL order (include a unique tiebreaker such as
    * the document id) — the packing is deterministic only if the stream
    * order is. `tokensCol` must be non-negative; nulls propagate to null
    * outputs.
    *
    * Plan: one range shuffle on the order keys, then two narrow passes over
    * it (per-partition totals → broadcast; per-partition running sum). The
    * per-partition totals collected to the driver are bounded by the
    * partition count, not the data.
    */
  def assignments(df: DataFrame, tokensCol: String, seqLen: Long,
                  orderBy: Seq[Column], numPartitions: Option[Int] = None): DataFrame = {
    require(seqLen > 0, "graft.SequencePack: seqLen must be positive")
    // tokensCol is interpolated into expr() below — plain identifiers only
    // (same stance as the JDBC watermark column).
    require(tokensCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"tokensCol must be a plain identifier, got: '$tokensCol'")
    val spark = df.sparkSession
    val nPart = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)

    // Pass 0: one range shuffle establishes contiguous, sorted partitions of
    // the stream order. Eager localCheckpoint pins those boundaries for both
    // downstream passes (see scaladoc: loss -> loud failure, blocks
    // reclaimed via ContextCleaner / clearCache, not a session-lifetime
    // cache leak).
    val parted = df
      .repartitionByRange(nPart, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)

    // Pass 1: per-partition token totals — |partitions| rows, driver-safe by
    // construction (same pattern as the bounded IVF training sample).
    val totals = parted.groupBy(col("__pid"))
      .agg(sum(col(tokensCol)).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    // Exclusive prefix: tokens in all partitions strictly before this one.
    val prefix: Map[Int, Long] = {
      var acc = 0L
      (0 until nPart).map { pid =>
        val p = pid -> acc
        acc += totals.getOrElse(pid, 0L)
        p
      }.toMap
    }

    // Pass 2: running sum within each partition (parallel — the window is
    // partitioned by __pid, never global), shifted by the partition prefix.
    val w = Window.partitionBy(col("__pid")).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start =
      element_at(typedlit(prefix), col("__pid")) +
        sum(col(tokensCol)).over(w) - col(tokensCol)
    val toks = col(tokensCol)
    parted
      .withColumn("start_token", start)
      .withColumn("seq_id", expr(s"start_token div $seqLen"))
      .withColumn("offset_in_seq", col("start_token") % seqLen)
      .withColumn("n_seqs",
        when(toks > 0,
          expr(s"(start_token + ${tokensCol} - 1) div $seqLen") - col("seq_id") + 1L)
          .otherwise(lit(0L)))
      .drop("__pid")
  }

  /** Explode each document into its per-sequence slices: one row per
    * (document × spanned sequence) with the in-document token range that
    * lands there. `sum(take_len)` over a document equals its token count;
    * every sequence except possibly the last is filled to exactly `seqLen`
    * tokens by the union of its slices.
    *
    * Input must be an `assignments` output (needs `start_token`, `seq_id`,
    * `n_seqs`). Narrow (a generator over already-computed columns): no
    * additional shuffle.
    */
  def pieces(assigned: DataFrame, tokensCol: String, seqLen: Long,
             idCol: String): DataFrame = {
    require(seqLen > 0, "graft.SequencePack: seqLen must be positive")
    assigned
      .filter(col(tokensCol) > 0)
      .select(
        col(idCol),
        col(tokensCol),
        col("start_token"),
        explode(expr(s"sequence(seq_id, seq_id + n_seqs - 1)")).as("seq"))
      // slice of the global stream covered by (this doc ∩ this sequence)
      .withColumn("__slice_from",
        greatest(col("start_token"), col("seq") * seqLen))
      .withColumn("__slice_to",
        least(col("start_token") + col(tokensCol), (col("seq") + 1) * seqLen))
      .select(
        col(idCol),
        col("seq"),
        (col("__slice_from") - col("start_token")).as("take_from"),
        (col("__slice_to") - col("__slice_from")).as("take_len"),
        (col("__slice_from") % seqLen).as("pos_in_seq"))
  }

  /** Padding-waste report for length-bucketed batching — the alternative
    * to concat-and-chunk packing: docs are padded up to their length
    * bucket's ceiling (`bucketWidth`-token buckets) and batched per
    * bucket. Emits one row per occupied bucket: `(bucket_max, n_docs,
    * total_tokens, padded_tokens, waste_ratio)` — the tokens-paid-for vs
    * tokens-carried audit that decides between padding and packing (cf.
    * [[assignments]]' zero-waste layout vs this layout's per-doc
    * coherence). Zero-token docs land in the first bucket (they still pay
    * one padded row). One partial-aggregating shuffle on the bucket key —
    * map-side combine reduces to |buckets| rows regardless of corpus size.
    */
  def paddingWasteReport(df: DataFrame, tokensCol: String,
                         bucketWidth: Long = 64L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val nt = greatest(col(tokensCol).cast("long"), lit(1L))
    val bucketMax = (floor((nt - 1) / bucketWidth) + 1) * bucketWidth
    df.groupBy(bucketMax.as("bucket_max"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("total_tokens"))
      .select(col("bucket_max"), col("n_docs"), col("total_tokens"),
        (col("bucket_max") * col("n_docs")).as("padded_tokens"),
        round(lit(1.0) - col("total_tokens").cast("double") /
          (col("bucket_max") * col("n_docs")), 6).as("waste_ratio"))
  }
}
