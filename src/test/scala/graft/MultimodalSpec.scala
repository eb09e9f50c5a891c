package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing: binary ingest, feature extraction (stub decode —
  * the Spark-side schema/partitioning/batching is the real subject), frame
  * sampling.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("binaryFile ingest: one record per file with payload + metadata") {
    val dir = tempDir("graft-media")
    Files.write(dir.resolve("img1.bin"), Array[Byte](1, 2, 3, 4, 5))
    Files.write(dir.resolve("img2.bin"), Array[Byte](9, 8, 7))
    val media = Multimodal.readBinaryDir(spark, dir.toString)
    val rows = media.collect()
    assert(rows.length == 2)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "mime", "width", "height", "n_bytes"))
    assert(rows.map(_.getAs[Long]("n_bytes")).sorted.toSeq == Seq(3L, 5L))
  }

  test("feature extraction: fixed dim, unit norm, deterministic, row-aligned") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((1L, "hello"), (2L, ""), (3L, "hello")).toDF("id", "txt"), "txt", "id")
    val feats = Multimodal.extractFeatures(media, dim = 8).orderBy("media_id").collect()
    assert(feats.length == 3)
    val f1 = feats(0).getSeq[Float](3)
    val f2 = feats(1).getSeq[Float](3)
    val f3 = feats(2).getSeq[Float](3)
    assert(f1.length == 8 && f1 == f3)
    assert(f2.forall(_ == 0f)) // empty payload -> zero features
    val norm = math.sqrt(f1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("resize: box-average of the full-dim decode, deterministic, row-aligned") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((1L, "resize me please"), (2L, "")).toDF("id", "txt"), "txt", "id")
    val resized = Multimodal.resizeFeatures(media, srcDim = 16, outDim = 4)
      .orderBy("media_id").collect()
    assert(resized.length == 2)
    val r1 = resized(0).getSeq[Float](1)
    assert(r1.length == 4)
    // box semantics: each cell is the mean of its 4 source cells
    val full = Multimodal.stubDecode("resize me please".getBytes("UTF-8"), 16)
    val expected = full.grouped(4).map(g => g.sum / 4).toSeq
    assert(r1 == expected)
    assert(resized(1).getSeq[Float](1).forall(_ == 0f)) // empty payload
  }

  test("real image decode: PNG payload yields pixel-derived features and dims") {
    import org.apache.spark.sql.Row
    // 8x4 image: left half black, right half white -> luminance histogram
    // mass splits evenly between the lowest and highest bins.
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, png, "image/png", null, null, png.length.toLong),
        Row(2L, "not an image".getBytes("UTF-8"), "text/plain", null, null, 12L)),
      Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()
    val f = feats(0).getSeq[Float](3)
    // 16 black pixels in bin 0, 16 white in bin 3, L2-normalized
    val inv = (1.0 / math.sqrt(2)).toFloat
    assert(math.abs(f(0) - inv) < 1e-5 && math.abs(f(3) - inv) < 1e-5)
    assert(f(1) == 0f && f(2) == 0f)
    // non-image rows keep the documented stub path
    assert(feats(1).getSeq[Float](3) ==
      Multimodal.stubDecode("not an image".getBytes("UTF-8"), 4).toSeq)
    // metadata fill: width/height decoded from the real pixels
    val dims = Multimodal.withImageDims(media).orderBy("media_id")
      .select("width", "height").collect()
    assert(dims(0).getInt(0) == 8 && dims(0).getInt(1) == 4)
    assert(dims(1).isNullAt(0) && dims(1).isNullAt(1))
    // corrupt image bytes fall back to the stub rather than failing ingest
    val broken = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, Array[Byte](1, 2, 3), "image/png", null, null, 3L)),
      Multimodal.mediaSchema)
    val bf = Multimodal.extractFeatures(broken, dim = 4).collect()(0).getSeq[Float](3)
    assert(bf == Multimodal.stubDecode(Array[Byte](1, 2, 3), 4).toSeq)
  }

  test("real audio decode: WAV payload yields sample-derived energy envelope") {
    import org.apache.spark.sql.Row
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 400 samples: first half silence, second half a loud square wave ->
    // RMS envelope mass concentrates in the trailing windows.
    val n = 400
    val pcm = new Array[Byte](n * 2) // 16-bit mono little-endian
    for (i <- n / 2 until n) {
      val v: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val (samples, rate) = Multimodal.decodeAudio(wav).get
    assert(rate == 8000f && samples.length == n)
    assert(samples.take(n / 2).forall(_ == 0f))
    assert(math.abs(samples(n / 2).abs - 0.5f) < 1e-3)

    val media = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, wav, "audio/wav", null, null, wav.length.toLong)),
      Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(media, dim = 4).collect()(0).getSeq[Float](3)
    val inv = (1.0 / math.sqrt(2)).toFloat
    assert(f(0) == 0f && f(1) == 0f) // silent half
    assert(math.abs(f(2) - inv) < 1e-4 && math.abs(f(3) - inv) < 1e-4)
    // corrupt audio bytes fall back to the stub rather than failing ingest
    val broken = spark.createDataFrame(
      java.util.Arrays.asList(Row(2L, Array[Byte](1, 2, 3), "audio/wav", null, null, 3L)),
      Multimodal.mediaSchema)
    val bf = Multimodal.extractFeatures(broken, dim = 4).collect()(0).getSeq[Float](3)
    assert(bf == Multimodal.stubDecode(Array[Byte](1, 2, 3), 4).toSeq)
  }

  test("frame sampling: nFrames windows per non-empty payload, 0-based index") {
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((1L, "a longer payload for frames"), (2L, "")).toDF("id", "txt"), "txt", "id")
    val frames = Multimodal.sampleFrames(media, nFrames = 4, dim = 8)
    val rows = frames.collect()
    assert(rows.length == 4) // empty payload contributes no frames
    assert(rows.map(_.getAs[Int]("frame_index")).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(rows.forall(_.getSeq[Float](2).length == 8))
  }

  test("dHash: real BMP round trip matches the analytic bit formula") {
    val seed = 5L
    val img = Multimodal.decodeImage(Multimodal.syntheticBmp(seed, 9, 8)).get
    assert(img.getWidth == 9 && img.getHeight == 8)
    val (hi, lo) = Multimodal.dHashBits(img)
    def v(x: Int, y: Int): Long = (seed * 7 + x * 13 + y * 31) % 256
    var expHi = 0L; var expLo = 0L
    for (y <- 0 until 8; x <- 0 until 8; if v(x, y) < v(x + 1, y)) {
      val k = y * 8 + x
      if (k >= 32) expHi |= 1L << (k - 32) else expLo |= 1L << k
    }
    assert((hi, lo) == ((expHi, expLo)))
  }

  test("imageResizeFrame: identity at native size; 9x8 -> 4x4 matches the " +
      "center-sample analytic grid; undecodable drops") {
    import spark.implicits._
    val seed = 3L
    def v(x: Int, y: Int): Long = (seed * 7 + x * 13 + y * 31) % 256
    val media = Seq(
      (1L, Multimodal.syntheticBmp(seed, 9, 8)),
      (2L, Multimodal.syntheticBmp(seed, 4, 4)),
      (3L, Array[Byte](1, 2, 3))) // not an image -> dropped
      .toDF("media_id", "payload")
    val got = Multimodal.imageResizeFrame(media, 4, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got.size == 32, got.toString) // 2 decodable images x 16 pixels
    // Identity: a 4x4 source samples its own pixels (sx = gx, sy = gy).
    for (y <- 0 until 4; x <- 0 until 4)
      assert(got((2L, x.toLong, y.toLong)) == v(x, y), s"identity ($x,$y)")
    // 9x8 -> 4x4: sx = floor((gx + 0.5) * 9 / 4) = {1,3,5,7},
    // sy = 2*gy + 1 — the dHash center-sample mapping.
    val sxs = Seq(1, 3, 5, 7)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(got((1L, x.toLong, y.toLong)) == v(sxs(x), 2 * y + 1),
        s"resample ($x,$y)")
  }

  test("audioResampleFrame: real WAV decode, exact integer box levels, " +
      "floor division on negative windows, trailing tail drops") {
    import spark.implicits._
    val seed = 2L
    val media = Seq(
      (1L, Multimodal.syntheticWav(seed, 70)), // 70 samples, factor 32 -> 2 windows, 6-sample tail drops
      (2L, Array[Byte](1, 2, 3))) // not audio -> dropped
      .toDF("media_id", "payload")
    val got = Multimodal.audioResampleFrame(media, factor = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 2, got.toString)
    def a(i: Int): Long = (seed * 7 + i * 13) % 2001 - 1000
    for (j <- 0 until 2) {
      val sum = (j * 32 until j * 32 + 32).map(a).sum
      assert(got((1L, j.toLong)) == Math.floorDiv(sum, 32L), s"window $j")
    }
  }

  test("dHash is invariant under 2x pixel-replication upscaling") {
    // An 18x16 image that replicates each 9x8 pattern pixel 2x2 samples
    // back to the identical grid -> identical hash (the scale-robustness
    // property that makes dHash a near-dup key, not an exact-bytes key).
    val seed = 11L
    val small = Multimodal.decodeImage(Multimodal.syntheticBmp(seed, 9, 8)).get
    val big = new java.awt.image.BufferedImage(18, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18)
      big.setRGB(x, y, small.getRGB(x / 2, y / 2))
    assert(Multimodal.dHashBits(big) == Multimodal.dHashBits(small))
  }

  test("audio fingerprint: real WAV round trip matches integer window sums") {
    val seed = 3L
    val n = 2080 // 65 windows x 32 samples
    val (samples, rate) = Multimodal.decodeAudio(
      Multimodal.syntheticWav(seed, n)).get
    assert(samples.length == n && rate == 8000f)
    val (hi, lo) = Multimodal.audioEnvelopeBits(samples)
    def a(i: Int): Long = (seed * 7 + i * 13) % 2001 - 1000
    val energy = (0 until 65).map(w =>
      (w * 32 until (w + 1) * 32).map(i => a(i) * a(i)).sum)
    var expHi = 0L; var expLo = 0L
    for (k <- 0 until 64 if energy(k) < energy(k + 1))
      if (k >= 32) expHi |= 1L << (k - 32) else expLo |= 1L << k
    assert((hi, lo) == ((expHi, expLo)))
  }

  test("audio fingerprint is invariant under uniform gain scaling") {
    val (samples, _) = Multimodal.decodeAudio(
      Multimodal.syntheticWav(9L, 2080)).get
    val halved = samples.map(_ * 0.5f)
    assert(Multimodal.audioEnvelopeBits(halved) ==
      Multimodal.audioEnvelopeBits(samples))
  }

  test("AVI decode: DIB frames round-trip the analytic pattern pixel-exact") {
    val seed = 4L
    val frames = Multimodal.decodeAviFrames(
      Multimodal.syntheticAvi(seed, 3, 8, 6)).get
    assert(frames.length == 3)
    for (f <- 0 until 3) {
      val img = frames(f)
      assert(img.getWidth == 8 && img.getHeight == 6)
      for (y <- 0 until 6; x <- 0 until 8) {
        val v = ((seed * 7 + x * 13 + y * 31 + f * 97) % 256).toInt
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == v && ((rgb >> 8) & 0xff) == v &&
          (rgb & 0xff) == v, s"frame $f pixel ($x,$y)")
      }
    }
  }

  test("AVI decode: MJPEG frames decode via per-frame ImageIO, identical " +
      "to decoding the same JPEG bytes directly") {
    // Build two real JPEGs with ImageIO, wrap them in an MJPG AVI, and
    // require the container walk to surface EXACTLY what direct ImageIO
    // decode of the same bytes yields — lossy codec, but same bytes +
    // same decoder = same pixels.
    val jpegs = (0 until 2).map { f =>
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, ((x * 16 + y * 7 + f * 40) % 256) * 0x010101)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", b)
      b.toByteArray
    }
    val frames = Multimodal.decodeAviFrames(
      Multimodal.mjpegAvi(jpegs, 16, 12)).get
    assert(frames.length == 2)
    for (f <- 0 until 2) {
      val direct = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpegs(f)))
      assert(frames(f).getWidth == 16 && frames(f).getHeight == 12)
      for (y <- 0 until 12; x <- 0 until 16)
        assert(frames(f).getRGB(x, y) == direct.getRGB(x, y),
          s"frame $f pixel ($x,$y)")
    }
  }

  test("AVI decode: undecodable-container null contract (WAV, truncated, " +
      "garbage, null, frame cap)") {
    assert(Multimodal.decodeAviFrames(Multimodal.syntheticWav(1L, 64)).isEmpty)
    assert(Multimodal.decodeAviFrames(null).isEmpty)
    assert(Multimodal.decodeAviFrames(Array[Byte](1, 2, 3)).isEmpty)
    val avi = Multimodal.syntheticAvi(2L, 2, 8, 6)
    // Truncation mid-movi: the walk stops at the broken chunk; whatever
    // decoded before it survives, a fully-headerless prefix yields None.
    assert(Multimodal.decodeAviFrames(avi.take(20).toArray).isEmpty)
    // maxFrames caps the explode factor by construction.
    assert(Multimodal.decodeAviFrames(
      Multimodal.syntheticAvi(3L, 5, 8, 6), maxFrames = 2).get.length == 2)
  }

  test("video luminance frame: exact integer sums per frame, one null row " +
      "per undecodable payload") {
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.syntheticAvi(1L, 2, 8, 6)),
      (2L, Multimodal.syntheticWav(2L, 64))) // RIFF but not AVI
      .toDF("media_id", "payload")
    val rows = Multimodal.videoFrameLuminanceFrame(media).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    def lumSum(seed: Long, f: Int): Long =
      (for (y <- 0 until 6; x <- 0 until 8)
        yield (seed * 7 + x * 13 + y * 31 + f * 97) % 256).sum
    assert(rows == Set((1L, 0L, lumSum(1L, 0)), (1L, 1L, lumSum(1L, 1)),
      (2L, -1L, -1L)))
  }

  test("dHash frame: per-media hashes, null for undecodable payloads") {
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.syntheticBmp(1L, 9, 8)),
      (2L, Array[Byte](1, 2, 3)) // not an image
    ).toDF("media_id", "payload")
    val out = Multimodal.imageDHashFrame(media).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }
}
