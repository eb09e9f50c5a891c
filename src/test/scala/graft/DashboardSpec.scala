package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** F11 end-to-end over real HTTP (reference `app.py:96-200`): upload files,
  * run the pipeline through the generated temp config, search the sink —
  * plus the guard rails (search-before-run refusal, upload path traversal).
  */
class DashboardSpec extends AnyFunSuite with SparkTestBase {

  private def request(url: String, method: String = "GET",
                      body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(UTF_8))
    }
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = new String(stream.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, text)
  }

  test("upload -> run -> search round trip; guards on bad input") {
    val work = tempDir("graft-dash")
    val dash = new Dashboard(spark, work, port = 0)
    dash.start()
    val base = s"http://127.0.0.1:${dash.boundPort}"
    try {
      // index page serves the UI
      val (ic, ihtml) = request(s"$base/")
      assert(ic == 200 && ihtml.contains("graft") && ihtml.contains("Run pipeline"))

      // search before any run refuses, the app.py:196-198 warning
      val (pre, preBody) = request(s"$base/search?q=anything")
      assert(pre == 409 && preBody.contains("run a pipeline first"), preBody)

      // path traversal in upload names is rejected
      assert(request(s"$base/upload?name=..%2Fevil.txt", "POST",
        Some("x"))._1 == 400)

      // a FAILED run must not arm the session: unreachable web source ->
      // 500, and /search still refuses with 409 (review fix: session is
      // set only after a successful run)
      assert(request(s"$base/run", "POST",
        Some("source_type=web&url=http%3A%2F%2F127.0.0.1%3A9%2Fnope"))._1 == 500)
      assert(request(s"$base/search?q=x")._1 == 409)
      // YAML-breaking url content is a 400, not config injection
      assert(request(s"$base/run", "POST",
        Some("source_type=web&url=x%22%0Asink%3A%20evil"))._1 == 400)
      // malformed k is a client error
      // (checked after the successful run below arms the session)

      // upload two docs (app.py:119-124 uploads dir)
      assert(request(s"$base/upload?name=spark.txt", "POST", Some(
        "Apache Spark is a distributed analytics engine for large scale " +
          "data processing. Spark uses a catalyst optimizer."))._1 == 200)
      assert(request(s"$base/upload?name=cooking.txt", "POST", Some(
        "A good tomato sauce needs garlic, olive oil, basil and patience. " +
          "Simmer the tomatoes slowly."))._1 == 200)

      // run the pipeline through the generated temp config
      val (rc, report) = request(s"$base/run", "POST",
        Some("source_type=local_files"))
      assert(rc == 200, report)
      assert(report.contains("\"documents_loaded\": 2"), report)
      assert("\"chunks_written\": (\\d+)".r.findFirstMatchIn(report)
        .exists(_.group(1).toInt > 0), report)

      // interactive search finds the right doc (app.py:164-195, k=3)
      val (sc, results) = request(
        s"$base/search?q=distributed+analytics+engine+spark&k=1")
      assert(sc == 200, results)
      assert(results.contains("spark.txt") && !results.contains("cooking.txt"),
        results)

      // web-source run without a url is a client error, not a 500
      assert(request(s"$base/run", "POST",
        Some("source_type=web"))._1 == 400)
      // malformed k on an armed session is a 400, not a 500
      assert(request(s"$base/search?q=x&k=abc")._1 == 400)
    } finally dash.stop()
  }
}
