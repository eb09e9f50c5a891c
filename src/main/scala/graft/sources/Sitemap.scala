package graft.sources

/** Sitemap-protocol parsing (sitemaps.org 0.9 — the crawl-frontier
  * companion to `CurationRules.robotsCheck`): `<urlset>` documents yield
  * page entries, `<sitemapindex>` documents yield child-sitemap pointers;
  * a crawler feeds the latter back into fetch and the former into its
  * frontier. Reference scope: the reference's web source
  * (yamlpipe/sources/web.py) fetches explicit URL lists; sitemap discovery
  * is the training-pipeline extension that turns a site root into that
  * list.
  *
  * Namespace-agnostic local-name matching (real sitemaps carry the 0.9
  * namespace, generators add prefixes), XML entity decode on every field
  * (`&amp;` is ubiquitous in query-string locs), CDATA tolerated around
  * locs. Structurally broken input fails loudly — a sitemap that parses
  * to nothing is a crawl silently dropped.
  *
  * Scale stance: one parse call per sitemap FILE inside a distributed
  * scan (the [[graft.functions.DocumentExtract]] discipline); a 50k-URL
  * sitemap is a single ~10 MB document, so per-file is the right
  * granularity.
  */
object Sitemap {

  /** One parsed entry. `fromIndex = true` marks a `<sitemap>` pointer in a
    * `<sitemapindex>` (fetch next), `false` a `<url>` page entry (crawl).
    * Absent optional fields are null; `priority` keeps its string form so
    * the caller decides numeric handling (the spec says 0.0–1.0 but real
    * sitemaps carry junk).
    */
  final case class Entry(loc: String, lastmod: String, changefreq: String,
                         priority: String, fromIndex: Boolean)

  private val blockRe =
    "(?is)<(?:\\w+:)?(url|sitemap)\\b[^>]*>(.*?)</(?:\\w+:)?\\1\\s*>".r
  private def fieldRe(name: String) =
    s"(?is)<(?:\\w+:)?$name\\b[^>]*>(.*?)</(?:\\w+:)?$name\\s*>".r

  private def field(block: String, name: String): String =
    fieldRe(name).findFirstMatchIn(block).map { m =>
      val raw = m.group(1).trim
      val noCdata =
        if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
          raw.substring(9, raw.length - 3)
        else raw
      graft.functions.DocumentExtract.decodeEntities(noCdata).trim
    }.orNull

  /** Parse a sitemap or sitemap-index document. Throws
    * `IllegalArgumentException` when the root is neither `urlset` nor
    * `sitemapindex`, or when no entry carries a `<loc>`.
    */
  def parse(xml: String): Seq[Entry] = {
    val lower = xml.toLowerCase(java.util.Locale.ROOT)
    val isIndex = lower.contains("<sitemapindex") ||
      lower.matches("(?s).*<\\w+:sitemapindex.*")
    val isUrlset = lower.contains("<urlset") ||
      lower.matches("(?s).*<\\w+:urlset.*")
    if (!isIndex && !isUrlset)
      throw new IllegalArgumentException(
        "not a sitemap: root is neither <urlset> nor <sitemapindex>")
    val entries = blockRe.findAllMatchIn(xml).flatMap { m =>
      val fromIndex = m.group(1).equalsIgnoreCase("sitemap")
      val block = m.group(2)
      Option(field(block, "loc")).map { loc =>
        Entry(loc, field(block, "lastmod"), field(block, "changefreq"),
          field(block, "priority"), fromIndex)
      }
    }.toSeq
    if (entries.isEmpty)
      throw new IllegalArgumentException(
        "sitemap parsed to zero <loc>-bearing entries")
    entries
  }
}
