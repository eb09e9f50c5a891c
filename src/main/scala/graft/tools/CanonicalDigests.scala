package graft.tools

/** Committed dev tool: regenerate `bench_plans/digests_canonical.json`
  * from the committed plan texts. The canonical digest is a PURE function
  * of the (already-normalized) `bench_plans/<gate>.txt` contents, so a
  * canonicalization-rule change never needs a ~28-minute full bench rerun
  * to keep the artifact consistent — recompute it from the texts.
  * (The PRIMARY digests.json is different: its inputs are the live plans,
  * so it can only come from a real bench run.)
  *
  * Usage: runMain graft.tools.CanonicalDigests [bench_plans]
  */
object CanonicalDigests {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse("bench_plans"))
    val listed = dir.listFiles()
    require(listed != null,
      s"[canonical-digests] not a readable directory: ${dir.getAbsolutePath}")
    // Only gates that still exist in the registry (r13 advice): a stale
    // plan file left behind by a removed/renamed gate must not make the
    // regenerated artifact diverge from Bench's output, which covers
    // exactly the benched queries.
    val live = graft.SparkEntry.queries.keySet
    val stale = listed.filter(f => f.getName.endsWith(".txt") &&
      !live.contains(f.getName.stripSuffix(".txt")))
    stale.sortBy(_.getName).foreach(f => println(
      s"[canonical-digests] skipping stale plan (no such gate): ${f.getName}"))
    val plans = listed
      .filter(f => f.getName.endsWith(".txt") &&
        live.contains(f.getName.stripSuffix(".txt")))
      .sortBy(_.getName)
    def digest(s: String): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    }
    val entries = plans.map { f =>
      val text = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val name = f.getName.stripSuffix(".txt")
      // normalizePlan is idempotent on already-normalized texts, so this
      // matches Bench's live computation exactly AND stays correct when
      // pointed at plan dumps from older normalizer versions.
      s"\"$name\":\"${digest(graft.Bench.canonicalizePlan(
        graft.Bench.normalizePlan(text)))}\""
    }
    java.nio.file.Files.write(
      new java.io.File(dir, "digests_canonical.json").toPath,
      entries.mkString("{", ",", "}")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[canonical-digests] wrote ${plans.length} entries")
  }
}
