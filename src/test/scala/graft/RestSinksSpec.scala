package graft

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.config.ComponentConfig
import graft.sinks.{ChromaRestSink, CollectionSink}

/** Over-the-wire Chroma sink against an in-process fake server speaking the
  * public REST surface (heartbeat / collections get-or-create / delete /
  * upsert / get). Exercises the real distributed write path: uuid ids,
  * delete-by-source scope, per-partition batched upserts.
  */
class RestSinksSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Minimal in-memory Chroma: one collection store, id -> (doc, emb, src). */
  private def withFakeChroma(
      body: (String, java.util.Map[String, (String, Seq[Float], String)], AtomicInteger) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val store = java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, (String, Seq[Float], String)]())
    val nUpserts = new AtomicInteger(0)
    def yaml(s: String) = new org.yaml.snakeyaml.Yaml().load[Any](s)
      .asInstanceOf[java.util.Map[String, Any]]
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/api/v1/heartbeat",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 200, """{"nanosecond heartbeat": 1}"""))
    server.createContext("/api/v1/collections",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val path = ex.getRequestURI.getPath
        val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        if (path == "/api/v1/collections") {
          respond(ex, 200, """{"id":"col-1","name":"c"}""")
        } else if (path.endsWith("/delete")) {
          val where = yaml(req).get("where").asInstanceOf[java.util.Map[String, Any]]
          val in = where.get("source").asInstanceOf[java.util.Map[String, Any]]
            .get("$in").asInstanceOf[java.util.List[Any]].asScala.map(_.toString).toSet
          store.entrySet().removeIf(e => in.contains(e.getValue._3))
          respond(ex, 200, "true")
        } else if (path.endsWith("/upsert")) {
          nUpserts.incrementAndGet()
          val r = yaml(req)
          val ids = r.get("ids").asInstanceOf[java.util.List[Any]].asScala.map(_.toString)
          val docs = r.get("documents").asInstanceOf[java.util.List[Any]].asScala.map(_.toString)
          val embs = r.get("embeddings").asInstanceOf[java.util.List[Any]].asScala
            .map(_.asInstanceOf[java.util.List[Any]].asScala
              .map(_.asInstanceOf[Number].floatValue()).toSeq)
          val metas = r.get("metadatas").asInstanceOf[java.util.List[Any]].asScala
            .map(_.asInstanceOf[java.util.Map[String, Any]].get("source").toString)
          ids.indices.foreach(i => store.put(ids(i), (docs(i), embs(i), metas(i))))
          respond(ex, 200, "true")
        } else if (path.endsWith("/get")) {
          val entries = store.entrySet().asScala.toSeq
          val ids = entries.map(e => "\"" + e.getKey + "\"").mkString(",")
          val docs = entries.map(e => "\"" + e.getValue._1 + "\"").mkString(",")
          val embs = entries.map(e => e.getValue._2.mkString("[", ",", "]")).mkString(",")
          val metas = entries.map(e => s"""{"source":"${e.getValue._3}"}""").mkString(",")
          respond(ex, 200,
            s"""{"ids":[$ids],"documents":[$docs],"embeddings":[$embs],"metadatas":[$metas]}""")
        } else respond(ex, 404, "{}")
      })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", store, nUpserts)
    finally server.stop(0)
  }

  private def frame(rows: (String, String, Seq[Float], String)*) =
    rows.toSeq.toDF("id", "text", "vector", "source")
      .selectExpr("id", "text", "cast(vector as array<float>) as vector", "source")

  test("write -> delete-by-source scope -> distributed upsert -> read round-trip") {
    withFakeChroma { (url, store, nUpserts) =>
      val sink = ChromaRestSink(url, "c", batchSize = 2)
      sink.testConnection(spark) // heartbeat
      sink.write(frame(
        ("a1", "alpha one", Seq(1f, 0f), "src/a"),
        ("a2", "alpha two", Seq(0f, 1f), "src/a"),
        ("b1", "beta one", Seq(1f, 1f), "src/b")))
      assert(store.size() == 3)
      // re-write source a: its records are replaced, b untouched
      sink.write(frame(("a3", "alpha three", Seq(0.5f, 0.5f), "src/a")))
      assert(store.keySet().asScala.toSet == Set("a3", "b1"))
      val back = sink.read(spark).collect().map(r =>
        (r.getString(0), r.getString(1), r.getSeq[Float](2), r.getString(3))).toSet
      assert(back == Set(
        ("a3", "alpha three", Seq(0.5f, 0.5f), "src/a"),
        ("b1", "beta one", Seq(1f, 1f), "src/b")))
      assert(nUpserts.get() >= 2) // batched (batchSize=2 over 3 rows) + second write
    }
  }

  test("records without ids get deterministic content-derived ids (retry-idempotent)") {
    withFakeChroma { (url, store, _) =>
      val sink = ChromaRestSink(url, "c")
      def df = Seq(("t1", Seq(1f), "s1"), ("t2", Seq(2f), "s1"))
        .toDF("text", "vector", "source")
        .selectExpr("text", "cast(vector as array<float>) as vector", "source")
      sink.write(df)
      assert(store.size() == 2)
      val firstIds = store.keySet().asScala.toSet
      firstIds.foreach(id => assert(id.matches("[0-9a-f]{32}")))
      // A re-post of the same rows (what a task retry does) lands on the
      // SAME ids — no duplicate records survive.
      sink.write(df)
      assert(store.size() == 2 && store.keySet().asScala.toSet == firstIds)
    }
  }

  test("null source/text/vector fails loudly BEFORE the destructive delete runs") {
    withFakeChroma { (url, store, _) =>
      val sink = ChromaRestSink(url, "c")
      sink.write(frame(("a1", "keep me", Seq(1f), "src/a")))
      assert(store.size() == 1)
      val bad = Seq((null.asInstanceOf[String], Seq(2f), "src/a"))
        .toDF("text", "vector", "source")
        .selectExpr("text", "cast(vector as array<float>) as vector", "source")
      val e = intercept[IllegalArgumentException](sink.write(bad))
      assert(e.getMessage.contains("null source/text/vector"))
      // the existing record for src/a survived — the delete never ran
      assert(store.size() == 1 && store.containsKey("a1"))
    }
  }

  test("non-2xx fails loudly with the body in the message") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val b = """{"error":"boom"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(500, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val e = intercept[IllegalStateException](
        ChromaRestSink(url, "c").write(frame(("x", "t", Seq(1f), "s"))))
      assert(e.getMessage.contains("HTTP 500") && e.getMessage.contains("boom"))
    } finally server.stop(0)
  }

  test("factory binds the REST client when host is configured, parquet sink otherwise") {
    val remote = Factory.sink(ComponentConfig("chromadb",
      Map("host" -> "127.0.0.1", "port" -> 9999, "collection_name" -> "c")))
    assert(remote.isInstanceOf[ChromaRestSink])
    assert(remote.asInstanceOf[ChromaRestSink].baseUrl == "http://127.0.0.1:9999")
    val local = Factory.sink(ComponentConfig("chromadb", Map("path" -> "/tmp/x")))
    assert(local.isInstanceOf[CollectionSink])
  }
}
