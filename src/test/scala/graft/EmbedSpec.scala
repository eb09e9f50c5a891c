package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashingEmbedder
import graft.operators.Embed

/** Pins the hashing-embedder vector VALUES (the correctness-gate compares
  * only scalar digests — dim and nonzero-ness — because the projection
  * isn't ANSI-SQL; reference contract `yamlpipe/components/embedders.py`).
  */
class EmbedSpec extends AnyFunSuite with SparkTestBase {

  test("embedding is deterministic, unit-norm, and dimension-correct") {
    val a = HashingEmbedder.embed("the quick brown fox", 64, 42)
    val b = HashingEmbedder.embed("the quick brown fox", 64, 42)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty / null / non-alnum text embeds to the zero vector") {
    assert(HashingEmbedder.embed("", 16).forall(_ == 0f))
    assert(HashingEmbedder.embed(null, 16).forall(_ == 0f))
    assert(HashingEmbedder.embed("!!! ...", 16).forall(_ == 0f))
  }

  test("token overlap yields higher cosine than disjoint text") {
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      dot // unit vectors
    }
    val base = HashingEmbedder.embed("spark catalyst optimizer engine", 64)
    val near = HashingEmbedder.embed("spark catalyst engine tuning", 64)
    val far = HashingEmbedder.embed("tomato basil garlic sauce", 64)
    assert(cos(base, near) > cos(base, far))
  }

  test("DataFrame operator is row-aligned and distributed") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, ""), (3L, "alpha beta")).toDF("id", "txt")
    val out = Embed.hashing(df, "txt", dim = 32).orderBy("id")
      .select(col("id"), col("embedding")).collect()
    assert(out.length == 3)
    val v1 = out(0).getSeq[Float](1)
    val v2 = out(1).getSeq[Float](1)
    val v3 = out(2).getSeq[Float](1)
    assert(v1 == v3)           // equal text -> equal vector
    assert(v2.forall(_ == 0f)) // empty -> zero vector
    assert(v1.length == 32)
    // matches the driver-side query embedding (search parity)
    assert(v1 == Embed.embedQuery("alpha beta", dim = 32).toSeq)
  }

  test("batch embed contract: n in -> n out, empty in -> empty out") {
    assert(HashingEmbedder.embedBatch(Seq.empty).isEmpty)
    assert(HashingEmbedder.embedBatch(Seq("a", "b", "c")).length == 3)
  }

  /** Serve an OpenAI-shape embeddings endpoint; vector = [len(text), 1.5].
    * Entries are returned in REVERSED order so the client's index-based
    * re-alignment is actually exercised.
    */
  private def withFakeServer(status: Int = 200)(
      body: (String, java.util.List[String], java.util.concurrent.atomic.AtomicInteger) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val nRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    val authHeaders = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    server.createContext("/v1/embeddings", (ex: com.sun.net.httpserver.HttpExchange) => {
      nRequests.incrementAndGet()
      authHeaders.add(ex.getRequestHeaders.getFirst("Authorization"))
      val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val root = new org.yaml.snakeyaml.Yaml().load[Any](req)
        .asInstanceOf[java.util.Map[String, Any]]
      val input = root.get("input").asInstanceOf[java.util.List[String]]
      val entries = (0 until input.size).reverse.map { i =>
        s"""{"index":$i,"embedding":[${input.get(i).length}.0,1.5]}"""
      }
      val resp =
        if (status == 200) s"""{"data":[${entries.mkString(",")}]}"""
        else """{"error":"simulated upstream failure"}"""
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings", authHeaders, nRequests)
    finally server.stop(0)
  }

  test("remote embedder: distributed batch client round-trips, row-aligned, with auth") {
    import spark.implicits._
    withFakeServer() { (url, auths, nRequests) =>
      val df = Seq((1L, "ab"), (2L, "abcd"), (3L, ""), (4L, "xyzxyz")).toDF("id", "txt")
      val out = Embed.remote(df, "txt", url, apiKey = Some("sk-test"), batchSize = 2,
          dim = Some(2))
        .orderBy("id").select("id", "embedding").collect()
      assert(out.length == 4)
      // vectors re-aligned by index despite the server's reversed response
      assert(out(0).getSeq[Float](1) == Seq(2f, 1.5f))
      assert(out(1).getSeq[Float](1) == Seq(4f, 1.5f))
      // empty text never reaches the API (OpenAI 400s on "") — zero vector
      assert(out(2).getSeq[Float](1) == Seq(0f, 0f))
      assert(out(3).getSeq[Float](1) == Seq(6f, 1.5f))
      assert(nRequests.get() >= 2, "batchSize=2 over 4 texts must take multiple POSTs")
      assert(auths.toArray.forall(_ == "Bearer sk-test"))
    }
  }

  test("remote embedder: configured dim is validated against returned vectors") {
    import spark.implicits._
    withFakeServer() { (url, _, _) =>
      val df = Seq((1L, "ab")).toDF("id", "txt")
      // fake server always returns 2-dim vectors: dim=2 passes...
      val ok = Embed.remote(df, "txt", url, dim = Some(2)).collect()
      assert(ok(0).getSeq[Float](2).length == 2)
      // ...dim=5 fails loudly instead of silently mis-sizing the column
      val e = intercept[Exception](Embed.remote(df, "txt", url, dim = Some(5)).collect())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("configured dim"))))
    }
  }

  test("remote embedder: non-2xx fails the job loudly with the API body") {
    import spark.implicits._
    withFakeServer(status = 500) { (url, _, _) =>
      val df = Seq((1L, "boom")).toDF("id", "txt")
      val e = intercept[Exception](Embed.remote(df, "txt", url).collect())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(t =>
        Option(t.getMessage).exists(m => m.contains("HTTP 500") && m.contains("simulated"))))
    }
  }

  test("int8 quantization: bounded error, zero-vector identity, clamped range") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)),             // zero vector -> scale 0, q all 0
      (3L, Seq(1000.0f, -1000.0f, 1.0f)) // extremes land exactly on +/-127
    ).toDF("id", "v")
    val out = vecs
      .withColumn("s", int8Scale(col("v")))
      .withColumn("q", quantizeInt8(col("v"), col("s")))
      .withColumn("err", dequantMeanAbsError(col("v"), col("q"), col("s")))
      .select("id", "s", "q", "err")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2), r.getDouble(3))).toMap
    val (s1, q1, e1) = out(1L)
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-12)
    assert(q1 === Seq(64, -127, 32, 0)) // 0.5/s+0.5 = 64.0 exactly
    assert(e1 <= s1 / 2 + 1e-12, s"mean abs err $e1 exceeds half-step ${s1 / 2}")
    val (s2, q2, e2) = out(2L)
    assert(s2 === 0.0 && q2 === Seq(0, 0) && e2 === 0.0)
    val (_, q3, _) = out(3L)
    assert(q3.head === 127 && q3(1) === -127)
    assert(q3.forall(q => q >= -127 && q <= 127))
  }

  test("remote embedder protocol core: escape, encode, parse") {
    import graft.functions.RemoteEmbedder
    val body = RemoteEmbedder.requestBody("m", Seq("a\"b", "line\nbreak", "tab\there"))
    assert(body.contains("\\\"") && body.contains("\\n") && body.contains("\\t"))
    val parsed = RemoteEmbedder.parseResponse(
      """{"data":[{"index":1,"embedding":[3.0]},{"index":0,"embedding":[1.0]}]}""", 2)
    assert(parsed(0).toSeq == Seq(1f) && parsed(1).toSeq == Seq(3f))
    // count mismatch and duplicate/missing indices fail loudly
    assertThrows[IllegalArgumentException](
      RemoteEmbedder.parseResponse("""{"data":[{"index":0,"embedding":[1.0]}]}""", 2))
    assertThrows[IllegalArgumentException](RemoteEmbedder.parseResponse(
      """{"data":[{"index":0,"embedding":[1.0]},{"index":0,"embedding":[2.0]}]}""", 2))
  }

  test("meanPool averages per dimension per group; null vectors drop; order preserved") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 10.0f)), ("a", Seq(3.0f, 30.0f)),
      ("b", Seq(5.0f, 7.0f)), ("b", null.asInstanceOf[Seq[Float]])
    ).toDF("g", "vec")
    val pooled = Embed.meanPool(df, "g", "vec")
      .collect().map(r => r.getAs[String]("g") ->
        r.getSeq[Double](r.fieldIndex("embedding"))).toMap
    assert(pooled("a").toSeq == Seq(2.0, 20.0))
    assert(pooled("b").toSeq == Seq(5.0, 7.0)) // null vector contributes nothing
    val exploded = Embed.meanPoolExploded(df, "g", "vec")
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("dim")) -> r.getAs[Double]("value")).toMap
    assert(exploded(("a", 0)) == 2.0 && exploded(("a", 1)) == 20.0)
  }
}
