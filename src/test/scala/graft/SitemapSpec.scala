package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sitemap

class SitemapSpec extends AnyFunSuite {

  test("urlset: fields parse, entities decode, CDATA tolerated, optionals null") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      | <url>
      |  <loc>https://ex.org/a?x=1&amp;y=2</loc>
      |  <lastmod>2024-03-01</lastmod>
      |  <changefreq>weekly</changefreq>
      |  <priority>0.8</priority>
      | </url>
      | <url><loc><![CDATA[https://ex.org/raw?a=1&b=2]]></loc></url>
      |</urlset>""".stripMargin
    val got = Sitemap.parse(xml)
    assert(got.size == 2)
    assert(got(0) == Sitemap.Entry("https://ex.org/a?x=1&y=2", "2024-03-01",
      "weekly", "0.8", fromIndex = false))
    assert(got(1) == Sitemap.Entry("https://ex.org/raw?a=1&b=2", null, null,
      null, fromIndex = false))
  }

  test("sitemapindex with namespace prefixes yields fromIndex pointers") {
    val xml = """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
      | <sm:sitemap><sm:loc>https://ex.org/s1.xml</sm:loc>
      |  <sm:lastmod>2024-01-15</sm:lastmod></sm:sitemap>
      | <sm:sitemap><sm:loc>https://ex.org/s2.xml</sm:loc></sm:sitemap>
      |</sm:sitemapindex>""".stripMargin
    val got = Sitemap.parse(xml)
    assert(got.map(_.loc) == Seq("https://ex.org/s1.xml", "https://ex.org/s2.xml"))
    assert(got.forall(_.fromIndex))
    assert(got(0).lastmod == "2024-01-15" && got(1).lastmod == null)
  }

  test("entries missing <loc> are dropped; structural breakage is loud") {
    val ok = "<urlset><url><lastmod>2024-01-01</lastmod></url>" +
      "<url><loc>https://ex.org/x</loc></url></urlset>"
    assert(Sitemap.parse(ok).map(_.loc) == Seq("https://ex.org/x"))
    val notSitemap = intercept[IllegalArgumentException](
      Sitemap.parse("<html><body>404</body></html>"))
    assert(notSitemap.getMessage.contains("neither"))
    val empty = intercept[IllegalArgumentException](
      Sitemap.parse("<urlset></urlset>"))
    assert(empty.getMessage.contains("zero"))
  }
}
