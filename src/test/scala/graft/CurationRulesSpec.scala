package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationRules

/** Gopher document rules and C4 line cleaning: hand-checked rule firing,
  * metric values, and edge inputs.
  */
class CurationRulesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("gopher: clean prose passes, each rule can fail independently") {
    val prose = ("the data pipeline reads a document and writes a result " * 6).trim
    val docs = Seq(
      (1L, prose),                                   // passes everything
      (2L, "too short"),                             // word count < 50
      (3L, ("a " * 60).trim),                        // mean word len < 3
      (4L, prose + " " + ("#" * 40)),                // symbol ratio > 0.1
      (5L, prose + "\n" + Seq.fill(20)("- item").mkString("\n")), // bullets
      (6L, prose.split(" ").map(_ + "...").mkString("\n")),       // ellipses
      (7L, ("12345 " * 60).trim)                     // alpha frac 0 + no stopwords
    ).toDF("doc_id", "text")
    val got = CurationRules.gopherFlags(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("passes")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false, 7L -> false))
  }

  test("gopher metrics are the hand-computed values") {
    val r = CurationRules.gopherFlags(
      Seq((1L, "alpha beta gamma#...\n- b1\nplain line")).toDF("doc_id", "text"),
      "text", "doc_id").collect()(0)
    // SPACE tokenizer (newlines don't split): "alpha", "beta",
    // "gamma#...\n-", "b1\nplain", "line" -> 5 tokens; symbols = # + one
    // "..." = 2.
    assert(r.getAs[Long]("word_count") == 5L)
    assert(r.getAs[Double]("symbol_ratio") ==
      BigDecimal(2.0 / 5).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("bullet_frac") ==
      BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("c4: keeps punctuated >=5-word lines, drops javascript lines and brace docs") {
    val docs = Seq(
      (1L, "This first line has enough words.\nshort one.\nno terminal punctuation here at all\nPlease enable javascript to continue reading.\nAnother good line with plenty of words!"),
      (2L, "A fine sentence with many words. { embedded code }"),
      (3L, "We apologise for the lorem ipsum filler text here."),
      (4L, "only\nfragments\nhere")
    ).toDF("doc_id", "text")
    val got = CurationRules.c4Clean(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_lines_kept"),
          r.getAs[Boolean]("doc_dropped")))).toMap
    assert(got(1L) == (("This first line has enough words.\nAnother good line with plenty of words!", 2L, false)))
    assert(got(2L) == (("", 0L, true)))  // brace -> whole doc dropped
    assert(got(3L) == (("", 0L, true)))  // lorem ipsum
    assert(got(4L) == (("", 0L, true)))  // no kept lines
  }

  test("null and empty texts are dropped, not crashed on") {
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    val c4 = CurationRules.c4Clean(weird, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("doc_dropped")).toMap
    assert(c4 == Map(1L -> true, 2L -> true))
  }

  test("blocklist: counts occurrences, audits terms, thresholds, case-folds") {
    val docs = Seq(
      (1L, "Slow SLOW slow pipeline"),       // 3 hits of one term
      (2L, "a dup and a deadlock appear"),   // 2 hits, 2 distinct terms
      (3L, "perfectly clean prose"),         // 0 hits
      (4L, "slow-dup hyphenated")            // punctuation splits -> 2 hits
    ).toDF("doc_id", "text")
    val terms = Seq("slow", "DUP", "deadlock")
    val got = CurationRules.blocklistFlags(docs, "text", "doc_id", terms, maxFlagged = 1L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_flagged"), r.getAs[String]("flagged_terms"),
          r.getAs[Boolean]("blocked")))).toMap
    assert(got(1L) == ((3L, "slow", true)))
    assert(got(2L) == ((2L, "deadlock,dup", true)))
    assert(got(3L) == ((0L, "", false)))
    assert(got(4L) == ((2L, "dup,slow", true)))
  }

  test("sharedPrefixFlags: groups within source only, threshold, short docs") {
    val docs = Seq(
      (1L, "s1", "TEMPLATE HEAD alpha body"),
      (2L, "s1", "TEMPLATE HEAD beta body"),
      (3L, "s1", "TEMPLATE HEAD gamma body"),
      (4L, "s2", "TEMPLATE HEAD other source"),  // same prefix, other source
      (5L, "s1", "unique document text here"),
      (6L, "s1", "tiny"), (7L, "s1", "tiny")     // short docs: full text key
    ).toDF("doc_id", "source", "text")
    val got = CurationRules.sharedPrefixFlags(docs, "text", "doc_id", "source",
      prefixLen = 13, minShared = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("prefix_count"), r.getAs[Boolean]("is_boilerplate")))).toMap
    assert(got(1L) == ((3L, true)) && got(2L) == ((3L, true)) && got(3L) == ((3L, true)))
    assert(got(4L) == ((1L, false)))  // source partitioning isolates s2
    assert(got(5L) == ((1L, false)))
    assert(got(6L) == ((2L, false)) && got(7L) == ((2L, false)))  // < minShared
  }

  test("blocklist: join scale path matches the narrow path row for row") {
    val docs = Seq(
      (1L, "slow slow dup"), (2L, "nothing here"), (3L, "Deadlock! dup."),
      (4L, null.asInstanceOf[String]), (5L, "")
    ).toDF("doc_id", "text")
    val terms = Seq("slow", "dup", "deadlock")
    val narrow = CurationRules.blocklistFlags(docs, "text", "doc_id", terms)
    val joined = CurationRules.blocklistFlagsJoin(docs, "text", "doc_id",
      terms.toDF("term"))
    // Null text: regexp over null yields null tokens -> null/0 hits on both
    // paths; assert identical ordered rows.
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_flagged"),
        r.getAs[String]("flagged_terms"), r.getAs[Boolean]("blocked"))
    assert(narrow.collect().map(key).sortBy(_._1).toSeq ==
      joined.collect().map(key).sortBy(_._1).toSeq)
  }

  test("kAnonymity: group sizes vs k, multi-column quasi-identifier, guards") {
    import spark.implicits._
    val df = Seq(
      ("us", "a"), ("us", "a"), ("us", "a"), // (us,a) x3
      ("us", "b"),                           // (us,b) x1
      ("de", "a"), ("de", "a")               // (de,a) x2
    ).toDF("country", "segment")
    val out = graft.operators.CurationRules
      .kAnonymity(df, Seq("country", "segment"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_rows"), r.getAs[Boolean]("k_anonymous"))).toSet
    assert(out == Set(("us", "a", 3L, true), ("us", "b", 1L, false),
      ("de", "a", 2L, true)))
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.kAnonymity(df, Seq.empty, 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.kAnonymity(df, Seq("country"), 0)
    }
  }

  test("lDiversity: distinct sensitive values vs l, homogeneous group flagged") {
    import spark.implicits._
    val df = Seq(
      ("us", "cancer"), ("us", "flu"), ("us", "cold"), // (us): 3 distinct
      ("de", "flu"), ("de", "flu"), ("de", "flu"),     // (de): large but homogeneous
      ("fr", "flu"), ("fr", "cold")                    // (fr): 2 distinct
    ).toDF("country", "condition")
    val out = graft.operators.CurationRules
      .lDiversity(df, Seq("country"), "condition", l = 2)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_sensitive"), r.getAs[Boolean]("l_diverse"))).toSet
    assert(out == Set(("us", 3L, 3L, true), ("de", 3L, 1L, false),
      ("fr", 2L, 2L, true)))
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.lDiversity(df, Seq.empty, "condition", 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.lDiversity(df, Seq("condition"), "condition", 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.lDiversity(df, Seq("country"), "condition", 0)
    }
  }

  test("tCloseness: hand-computed TVD incl. the absent-value mass") {
    // Global sensitive distribution: v1 x6, v2 x2, v3 x2 (N=10).
    // g1 (n=4): v1 x3, v2 x1 — v3 absent from the group:
    //   TVD = 0.5*(|3/4-0.6| + |1/4-0.2| + |0-0.2|) = 0.2
    // g2 (n=6): v1 x3, v2 x1, v3 x2:
    //   TVD = 0.5*(|0.5-0.6| + |1/6-0.2| + |1/3-0.2|) = 2/15 = 0.133333
    val df = (Seq.fill(3)(("g1", "v1")) ++ Seq(("g1", "v2")) ++
      Seq.fill(3)(("g2", "v1")) ++ Seq(("g2", "v2")) ++
      Seq.fill(2)(("g2", "v3"))).toDF("grp", "disease")
    val got = graft.operators.CurationRules
      .tCloseness(df, Seq("grp"), "disease", t = 0.15)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got("g1") == ((4L, 0.2, false)))
    assert(got("g2") == ((6L, 0.133333, true)))
  }

  test("tCloseness: null sensitive values count as a real level (r9 advice)") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // Global: a x3, null x2 (N=5). g1 (n=4): a x2, null x2:
    //   TVD = 0.5*(|2/4-3/5| + |2/4-2/5|) = 0.1
    // g2 (n=1): a x1 — null absent:
    //   TVD = 0.5*(|1-3/5| + |0-2/5|) = 0.4
    // The old inner-join-on-__v shape dropped null-keyed cells: g1 would
    // have reported n_rows=2 and a TVD computed against N=5 — wrong both.
    val df = Seq(("g1", Some("a")), ("g1", Some("a")), ("g1", None),
      ("g1", None), ("g2", Some("a"))).toDF("grp", "disease")
    val got = graft.operators.CurationRules
      .tCloseness(df, Seq("grp"), "disease", t = 0.15)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got("g1") == ((4L, 0.1, true)))
    assert(got("g2") == ((1L, 0.4, false)))
  }

  test("tCloseness guards: empty quasi, sensitive-in-quasi, t range") {
    val df = Seq(("a", "x")).toDF("grp", "disease")
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.tCloseness(df, Seq.empty, "disease", 0.1)
    }
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.tCloseness(df, Seq("disease"), "disease", 0.1)
    }
    intercept[IllegalArgumentException] {
      graft.operators.CurationRules.tCloseness(df, Seq("grp"), "disease", 1.5)
    }
  }

  test("robotsCheck: longest match wins, allow tie-break, no-rule default") {
    val urls = Seq((1L, "a.com", "/path/13"), (2L, "a.com", "/other"),
      (3L, "b.com", "/path/9"), (4L, "c.com", "/anything"),
      (5L, "a.com", "/dup")).toDF("id", "host", "path")
    val rules = Seq(
      ("a.com", "/", true), ("a.com", "/path/", false),
      ("a.com", "/path/1", true),           // longest match re-allows
      ("a.com", "/dup", true), ("a.com", "/dup", false), // tie -> allow
      ("b.com", "/path/", false)).toDF("rhost", "rule", "allow")
    val got = graft.operators.CurationRules
      .robotsCheck(urls, "host", "path", "id", rules, "rhost", "rule",
        "allow")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(3)), r.getBoolean(4)))).toMap
    assert(got(1L) == ((Some("/path/1"), true)))  // 7-char beats 6-char deny
    assert(got(2L) == ((Some("/"), true)))
    assert(got(3L) == ((Some("/path/"), false)))
    assert(got(4L) == ((None, true)))             // no ruleset -> crawlable
    assert(got(5L) == ((Some("/dup"), true)))     // equal length: allow wins
  }

  test("stack code flags: each filter flips keep independently") {
    val clean = "def add(a, b):\n    return a + b\n\nprint(add(1, 2))"
    val docs = Seq(
      (1L, clean),                                    // keeps
      (2L, clean + "\n" + ("x" * 1200)),              // max line length
      (3L, Seq.fill(4)(("y " * 75).trim).mkString("\n")), // mean line length
      (4L, "()[]{};;;\n<<>>!!||&&\n--++==~~^^"),      // alnum fraction
      (5L, "# This file is AUTO-GENERATED, do not edit\n" + clean),
      (6L, clean + "\nblob = \"" + ("Zm9v" * 20) + "\"") // data blob, still kept
    ).toDF("doc_id", "text")
    val got = CurationRules.stackCodeFlags(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[Boolean]("has_autogen"),
          r.getAs[Boolean]("has_data_blob")))).toMap
    assert(got(1L) == ((true, false, false)))
    assert(got(2L) == ((false, false, true))) // a 1200-char run IS a data blob
    assert(got(3L) == ((false, false, false)))
    assert(got(4L) == ((false, false, false)))
    assert(got(5L) == ((false, true, false)))
    assert(got(6L) == ((true, false, true)))
  }

  test("stack code flags: metric values on a hand-computed document") {
    val text = "ab\n\nabcd1"                 // lines 2, 0, 5; alnum 7 of 9
    val r = CurationRules.stackCodeFlags(Seq((1L, text)).toDF("doc_id", "text"),
      "text", "doc_id").collect().head
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("max_line_len") == 5L)
    assert(math.abs(r.getAs[Double]("mean_line_len") - 7.0 / 3) < 1e-6)
    assert(math.abs(r.getAs[Double]("alnum_frac") - 7.0 / 9) < 1e-6)
    assert(r.getAs[Long]("n_long_lines") == 0L)
    assert(r.getAs[Boolean]("keep"))
  }
}
