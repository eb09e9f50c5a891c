package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.StateStore

/** Committed dev tool (the [[PercolateBench]] pattern): measure
  * `StateStore.upsertBucketed`'s O(batch + touched buckets) write-cost
  * claim with numbers — the r12 verdict asked for the PercolateBench
  * treatment: upsert wall time vs ACCUMULATED state size, sparse vs dense
  * batches, at the default 64 buckets.
  *
  * Per state size N (ascending, so JIT/shuffle warm-up lands on the
  * smallest):
  *  - `bootstrap`: saveBucketed of N rows (the full-rewrite cost every
  *    run would pay without bucketing — also the honest baseline).
  *  - `sparse`: a `batch`-row update batch confined to buckets {0,1}
  *    (2/64 touched — the incremental-crawl shape).
  *  - `dense`: a `batch`-row update batch striding the whole id range
  *    (all 64 buckets touched — the shape where merge-on-read degrades
  *    to a full rewrite by construction; the tool exists to price that
  *    honestly, not to hide it).
  *  - `rebucket`: StateStore.rebucket 64 -> 128 (the growth escape
  *    hatch, a one-off full rewrite).
  * Each upsert asserts the state row count is unchanged (update-only
  * batches), so the bench doubles as a merge-correctness stress test.
  *
  * Usage: runMain graft.tools.StateBench <sizes,comma-sep> [batch]
  * e.g. runMain graft.tools.StateBench 100000,1000000,10000000 10000
  */
object StateBench {
  def main(args: Array[String]): Unit = {
    val sizes = args(0).split(',').map(_.trim.toLong).toSeq
    val batch = args.lift(1).map(_.toInt).getOrElse(10000)
    val numBuckets = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft_state_bench"
    def time(n: Long, label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[state-bench] n=$n%9d $label%-22s " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def itemId(idExpr: org.apache.spark.sql.Column) =
      concat(lit("item-"), idExpr)
    for (n <- sizes) {
      val dir = s"$root/state_$n"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val base = spark.range(n).select(
        itemId(col("id")).as("item_id"),
        md5(col("id").cast("string")).as("fingerprint"),
        current_timestamp().as("updated_at"))
      time(n, "bootstrap(saveBucketed)") {
        StateStore.saveBucketed(base, dir, numBuckets)
      }
      // Sparse: existing ids confined to 2 of 64 buckets. The filter uses
      // the same bucket function as the table, so touched-bucket count is
      // exact by construction.
      val sparse = spark.range(n)
        .select(itemId(col("id")).as("item_id"))
        .filter(StateStore.stateBucket(col("item_id"), numBuckets) < 2)
        .limit(batch)
        .withColumn("fingerprint", lit("sparse-v2"))
      time(n, s"upsert sparse 2/$numBuckets") {
        StateStore.upsertBucketed(spark, dir, sparse, numBuckets)
      }
      // Dense: existing ids striding the whole range -> every bucket.
      // `% n` keeps every id inside the existing state even when
      // n < batch (r13 review: an out-of-range id would be an INSERT,
      // breaking the update-only row-count assertion below); wrapped
      // duplicates collapse via the upsert's per-id dedup.
      val stride = math.max(n / batch, 1L)
      val dense = spark.range(batch.toLong)
        .select(itemId((col("id") * stride) % n).as("item_id"))
        .withColumn("fingerprint", lit("dense-v3"))
      time(n, s"upsert dense $numBuckets/$numBuckets") {
        StateStore.upsertBucketed(spark, dir, dense, numBuckets)
      }
      // READ path: change detection for a sparse batch — the bucket-
      // pruned scan vs the full-load broadcast twin. Both are timed to
      // a count() of the detected set (same 10k-row batch, all ids
      // existing with a new fingerprint -> everything detected).
      val probe = spark.range(n)
        .select(itemId(col("id")).as("item_id"))
        .filter(StateStore.stateBucket(col("item_id"), numBuckets) < 2)
        .limit(batch)
        .withColumn("fingerprint", lit("probe-v9"))
        .localCheckpoint(true)
      time(n, s"detect pruned 2/$numBuckets") {
        val d = StateStore.changedBucketed(spark, dir, probe, numBuckets)
          .count()
        require(d == probe.count(), s"pruned detect missed rows: $d")
      }
      time(n, "detect broadcast full") {
        val d = StateStore
          .changed(probe, StateStore.loadBucketed(spark, dir)).count()
        require(d == probe.count(), s"broadcast detect missed rows: $d")
      }
      val rows = StateStore.loadBucketed(spark, dir).count()
      require(rows == n,
        s"merge lost or duplicated rows: expected $n, got $rows")
      time(n, s"rebucket $numBuckets->128") {
        StateStore.rebucket(spark, dir, 128)
      }
      val rows2 = StateStore.loadBucketed(spark, dir).count()
      require(rows2 == n, s"rebucket changed row count: $n -> $rows2")
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    spark.stop()
  }
}
