package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlFunctions

class UrlFunctionsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq

  private def domain(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.registeredDomain(col("u")))
      .as[String].collect().toSeq

  test("canonicalize: case, default ports, fragments, tracking params, slashes") {
    assert(canon(
      "HTTP://Example.COM:80/Path?id=1#top",     // scheme+host lower, :80, #frag
      "https://A.com:443/",                      // :443 + trailing slash
      "https://a.com:8443/x",                    // non-default port KEPT
      "http://a.com/x/?utm_source=f&id=2",       // slash-before-query + utm
      "http://a.com/x?utm_a=1&utm_b=2",          // all params tracking -> no query
      "http://a.com/x?utm_a=1&id=3&fbclid=z",    // first tracking, real survivor
      "http://a.com/Path/To?q=UPPER",            // path+query case preserved
      "not a url"                                // passthrough
    ) == Seq(
      "http://example.com/Path?id=1",
      "https://a.com",
      "https://a.com:8443/x",
      "http://a.com/x?id=2",
      "http://a.com/x",
      "http://a.com/x?id=3",
      "http://a.com/Path/To?q=UPPER",
      "not a url"))
  }

  test("canonicalize is idempotent and null-safe") {
    val raw = Seq(
      "HTTP://Example.COM:80/Path?utm_x=1&id=1#top",
      "https://WWW.Site.co.uk:443/a/?gclid=g")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
    val n = Seq((1L, null.asInstanceOf[String])).toDF("i", "u")
      .select(UrlFunctions.canonicalizeUrl(col("u"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("registered domain: two-label default, pinned two-level suffixes, userinfo/port") {
    assert(domain(
      "https://www.example.com/x",
      "http://a.b.c.example.ORG/",
      "https://www.site.co.uk/x",        // two-level suffix -> 3 labels
      "https://shop.example.com.au?x=1", // two-level suffix
      "http://user:pw@Sub.Host.net:8080/p", // userinfo + port stripped
      "https://localhost/x"              // single label host -> itself
    ) == Seq(
      "example.com", "example.org", "site.co.uk", "example.com.au",
      "host.net", "localhost"))
    // no scheme://host shape -> null
    val n = Seq("plain text").toDF("u")
      .select(UrlFunctions.registeredDomain(col("u"))).collect()(0)
    assert(n.isNullAt(0))
  }
}
