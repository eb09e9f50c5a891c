package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sample = Seq[(java.lang.Long, java.lang.Double)](
    (1L, 1.5), (2L, 2.5), (2L, null), (3L, 2.5), (null, 0.5)
  ).toDF("a", "b")

  test("exact profile reports counts, nulls, distincts, min/max per column") {
    val p = Profile.numeric(sample, Seq("a", "b"), exactDistinct = true)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(p("a") == ((5L, 1L, 3L, 1.0, 3.0)))
    assert(p("b") == ((5L, 1L, 3L, 0.5, 2.5)))
  }

  test("numericBy stratifies per group and rejects profiling the group key") {
    import spark.implicits._
    val rows = Seq(("en", Some(1.0)), ("en", Some(3.0)), ("de", Some(5.0)),
      ("de", None)).toDF("lang", "v")
    val p = Profile.numericBy(rows, "lang", Seq("v"), exactDistinct = true)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("min_v"), r.getAs[Double]("max_v")))).toMap
    assert(p("en") == ((2L, 0L, 2L, 1.0, 3.0)))
    assert(p("de") == ((2L, 1L, 1L, 5.0, 5.0)))
    intercept[IllegalArgumentException] {
      Profile.numericBy(rows, "lang", Seq("lang", "v"))
    }
  }

  test("approx regime needs no row shuffle: only the 1-row aggregate merge moves") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val q = Profile.numeric(df, Seq("l_quantity", "l_discount"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange hashpartitioning"),
      s"profiling shuffled data rows:\n${plan.take(600)}")
    // column pruning: the scan reads only the profiled columns
    assert(!plan.contains("l_extendedprice"), "scan read unprofiled columns")
  }

  test("zipfFit: perfect power law fits slope -1 with r2 1; degenerate inputs null out") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // freq(rank r) = 60/r exactly for r=1..4 -> ln y = ln 60 - 1 * ln x
    val words = Seq("a" -> 60, "b" -> 30, "c" -> 20, "d" -> 15)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val one = Profile.zipfFit(Seq((1L, text)).toDF("id", "text"), "text").collect()(0)
    assert(one.getLong(0) == 4)
    assert(math.abs(one.getDouble(1) + 1.0) < 1e-6)   // slope = -1
    assert(math.abs(one.getDouble(3) - 1.0) < 1e-6)   // r2 = 1
    // all-equal frequencies: x varies, y constant -> slope 0, r2 null
    val flat = Profile.zipfFit(Seq((1L, "a b c")).toDF("id", "text"), "text").collect()(0)
    assert(flat.getDouble(1) == 0.0 && flat.isNullAt(3))
    // single term: no x variance -> all fit columns null
    val mono = Profile.zipfFit(Seq((1L, "a a a")).toDF("id", "text"), "text").collect()(0)
    assert(mono.getLong(0) == 1 && mono.isNullAt(1) && mono.isNullAt(2) && mono.isNullAt(3))
  }

  test("percentRankBy: within-group ranks, tie sharing, single-member group at 0") {
    val df = Seq(
      ("a", 1L, 0.2), ("a", 2L, 0.5), ("a", 3L, 0.5), ("a", 4L, 0.9),
      ("b", 5L, 0.1)
    ).toDF("src", "id", "q")
    val got = Profile.percentRankBy(df, "src", "q")
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("pct_rank")).toMap
    // group a (n=4): ranks (1,2,2,4) -> (0, 1/3, 1/3, 1)
    assert(got(1L) == 0.0 && got(4L) == 1.0)
    assert(got(2L) == got(3L) && got(2L) == 0.333333)
    // singleton group: percent_rank of the only row is 0
    assert(got(5L) == 0.0)
  }

  test("robustOutliers: median/MAD fence flags the planted spike, constant group is calm") {
    // group a: 1..9 plus a 1000 spike -> med 5.5; sorted |v-med| =
    // (0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5) -> MAD 2.5; fence
    // 3*2.5 = 7.5 flags only the spike (|1-5.5|=4.5 and |9-5.5|=3.5 pass).
    // group b: constant value -> MAD 0, zero outliers.
    val df = ((1 to 9).map(v => ("a", v.toLong)) :+ ("a", 1000L)) ++
      (1 to 5).map(_ => ("b", 7L))
    val out = Profile.robustOutliers(df.toDF("src", "len"), "src", "len")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med_v"), r.getAs[Double]("mad_v"),
          r.getAs[Long]("n_outliers")))).toMap
    assert(out("a")._1 == 10L && out("a")._4 == 1L)
    assert(out("a")._2 == 5.5 && out("a")._3 == 2.5)
    assert(out("b") == ((5L, 7.0, 0.0, 0L)))
  }

  test("classBalance: balanced entropy 1, skew hand-checked, single class 0") {
    import spark.implicits._
    // balanced 2x2 -> H/ln2 = 1
    val bal = Profile.classBalance(Seq(0, 0, 1, 1).toDF("label"), "label")
      .collect()(0)
    assert((bal.getLong(0), bal.getLong(1), bal.getDouble(2), bal.getDouble(3))
      == ((2L, 4L, 0.5, 1.0)))
    // 3:1 split -> H = -(0.75 ln 0.75 + 0.25 ln 0.25) = 0.562335,
    // /ln2 = 0.811278
    val skew = Profile.classBalance(Seq(0, 0, 0, 1).toDF("label"), "label")
      .collect()(0)
    assert(skew.getDouble(2) == 0.75 && skew.getDouble(3) == 0.811278)
    // one class -> entropy 0 by guard
    val one = Profile.classBalance(Seq(7, 7).toDF("label"), "label").collect()(0)
    assert(one.getLong(0) == 1L && one.getDouble(3) == 0.0)
  }

  test("giniConcentration: even split 0, dominated split hand-checked, empty 0") {
    import spark.implicits._
    // even: 4 groups x 25 -> G = 2*(1+2+3+4)*25/(4*100) - 5/4 = 1.25-1.25 = 0
    val even = Profile.giniConcentration(
      Seq(25L, 25L, 25L, 25L).toDF("w"), "w").collect()(0)
    assert(even.getLong(0) == 4L && even.getLong(1) == 100L)
    assert(even.getDouble(2) == 0.0)
    // skewed: (1, 1, 98): sorted 1,1,98 -> 2*(1+2+294)/(3*100) - 4/3
    //  = 594/300 - 4/3 = 1.98 - 1.333333... = 0.646667 (6dp)
    val skew = Profile.giniConcentration(
      Seq(98L, 1L, 1L).toDF("w"), "w").collect()(0)
    assert(skew.getDouble(2) == 0.646667)
    val empty = Profile.giniConcentration(
      spark.emptyDataFrame.withColumn("w", org.apache.spark.sql.functions.lit(0L))
        .limit(0), "w").collect()(0)
    assert(empty.getDouble(2) == 0.0)
  }

  test("fkOrphans: row/key orphan counts and coverage, clean and broken links") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 9L, 9L, 8L).toDF("fk") // keys 9,8 orphaned
    val r = Profile.fkOrphans(child, "fk", parent, "pk").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 4L, 3L, 2L)))
    assert(r.getDouble(4) == 0.5) // 2 of 4 child keys covered
    // fully covered
    val clean = Profile.fkOrphans(Seq(1L, 2L).toDF("fk"), "fk", parent, "pk")
      .collect()(0)
    assert(clean.getLong(2) == 0L && clean.getDouble(4) == 1.0)
  }

  test("winsorizedStats: exact fences, clip counts, decimal-exact means") {
    import spark.implicits._
    // group a: 1..10. p10 fence = 1.9, p90 = 9.1 (linear interpolation).
    val df = (1 to 10).map(i => ("a", i.toDouble)).toDF("g", "v")
    val r = Profile.winsorizedStats(df, "g", "v", pLo = 0.1, pHi = 0.9)
      .collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("fence_lo") == 1.9)
    assert(r.getAs[Double]("fence_hi") == 9.1)
    assert(r.getAs[Long]("n_clipped_lo") == 1L) // only 1 < 1.9
    assert(r.getAs[Long]("n_clipped_hi") == 1L) // only 10 > 9.1
    assert(r.getAs[Double]("mean_raw") == 5.5)
    // winsorized: 1.9 + 2..9 + 9.1 = 55 - 1 - 10 + 1.9 + 9.1 = 55.0 -> 5.5
    assert(r.getAs[Double]("mean_winsorized") == 5.5)
    // asymmetric clip actually moves the mean
    val sk = (Seq.fill(9)(1.0) :+ 1000.0).map(("b", _)).toDF("g", "v")
    val rs = Profile.winsorizedStats(sk, "g", "v", pLo = 0.0, pHi = 0.5)
      .collect()(0)
    assert(rs.getAs[Double]("mean_winsorized") == 1.0)
    assert(rs.getAs[Long]("n_clipped_hi") == 1L)
  }

  test("vocabCoverage: hand-counted curve, k clips at vocab size, tie cut") {
    import spark.implicits._
    // counts: a x5, b x3, c x1, d x1 -> total 10, 4 types
    val df = Seq("a a a b b", "a a b c", "d").toDF("text")
    val r = Profile.vocabCoverage(df, "text", ks = Seq(1, 2, 10))
      .collect().map(x => x.getAs[Long]("k") ->
        ((x.getAs[Long]("n_top_types"), x.getAs[Long]("covered_tokens"),
          x.getAs[Long]("total_tokens"), x.getAs[Long]("n_types"),
          x.getAs[Double]("coverage")))).toMap
    assert(r(1L) == ((1L, 5L, 10L, 4L, 0.5)))
    assert(r(2L) == ((2L, 8L, 10L, 4L, 0.8)))
    // k beyond the vocab clips: all 4 types, full mass
    assert(r(10L) == ((4L, 10L, 10L, 4L, 1.0)))
    // tie at rank cut breaks by term: c (x1) beats d (x1) at k=3
    val r3 = Profile.vocabCoverage(df, "text", ks = Seq(3)).collect()(0)
    assert(r3.getAs[Long]("covered_tokens") == 9L) // a+b+c, not a+b+d... both 9
  }

  test("topDuplicatedNgrams: counts, threshold, deterministic rank cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z a b"), (2L, "x y z c d"), (3L, "x y z a b"),
      (4L, "p q") // too short for 3-grams
    ).toDF("doc_id", "text")
    val r = Profile.topDuplicatedNgrams(docs, "text", "doc_id",
        n = 3, minCount = 2, k = 10)
      .collect().map(x => (x.getString(0), x.getAs[Long]("n_occ"),
        x.getAs[Long]("n_docs"))).toSeq
    // "x y z" occurs 3x in 3 docs; "y z a"/"z a b" 2x in 2 docs.
    assert(r.head == (("x y z", 3L, 3L)))
    assert(r.toSet == Set(("x y z", 3L, 3L), ("y z a", 2L, 2L),
      ("z a b", 2L, 2L)))
    // rank ties (n_occ 2) break by ngram ascending
    assert(r.drop(1).map(_._1) == Seq("y z a", "z a b"))
    // k cuts deterministically
    val top2 = Profile.topDuplicatedNgrams(docs, "text", "doc_id", 3, 2, 2)
      .collect().map(_.getString(0)).toSeq
    assert(top2 == Seq("x y z", "y z a"))
  }

  test("robustFlags: per-row fence flags the spike row, zero-MAD group") {
    import spark.implicits._
    // group a: values 10,10,10,11,100 -> med 10, MAD 0? ads = 0,0,0,1,90
    // -> MAD 0... use 8,10,10,11,100: med 10, ads 2,0,0,1,90 -> MAD 1.
    val df = Seq(("a", 8.0), ("a", 10.0), ("a", 10.0), ("a", 11.0),
      ("a", 100.0), ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val r = Profile.robustFlags(df, "g", "v", k = 3.0)
      .collect().map(x => (x.getAs[String]("g"), x.getAs[Double]("v"),
        x.getAs[Double]("med_v"), x.getAs[Double]("mad_v"),
        x.getAs[Boolean]("is_outlier"))).toSet
    assert(r.contains(("a", 100.0, 10.0, 1.0, true)))
    assert(r.contains(("a", 11.0, 10.0, 1.0, false)))
    assert(r.contains(("a", 8.0, 10.0, 1.0, false))) // |8-10| = 2 <= 3*1
    // zero-MAD group: any off-median row would flag; none exists here
    assert(r.filter(_._1 == "b").forall(x => x._4 == 0.0 && !x._5))
  }

  test("hillTailIndex: exact Pareto order stats recover the exponent") {
    import spark.implicits._
    // x_i = (n/i)^(1/2): exact Pareto(alpha=2) quantiles. With k=10,
    // gamma = mean(ln x_i - ln x_11) = (1/10)*sum ln(sqrt(11/i))
    val n = 40
    val xs = (1 to n).map(i => math.pow(n.toDouble / i, 0.5))
    val r = Profile.hillTailIndex(xs.toDF("x"), "x", k = 10).collect()(0)
    val expG = (1 to 10).map(i => 0.5 * math.log(11.0 / i)).sum / 10.0
    assert(r.getAs[Long]("k") == 10L)
    assert(math.abs(r.getAs[Double]("gamma") - expG) < 1e-6)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0 / expG) < 1e-4)
    // degenerate: all values equal -> gamma 0, alpha null
    val d = Profile.hillTailIndex(Seq(5.0, 5.0, 5.0, 5.0).toDF("x"), "x", k = 2)
      .collect()(0)
    assert(d.getAs[Double]("gamma") == 0.0 && d.isNullAt(3))
  }

  test("mutualInformation: independent -> 0, deterministic copy -> H, guards") {
    import spark.implicits._
    // Perfectly independent 2x2 with equal counts: MI = 0.
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val ri = Profile.mutualInformation(ind, "a", "b").collect()(0)
    assert(ri.getAs[Long]("n_cells") == 4L && ri.getAs[Long]("n_rows") == 4L)
    assert(math.abs(ri.getAs[Double]("mi_nats")) == 0.0)
    assert(ri.getAs[Double]("mi_norm") == 0.0)
    // b is a copy of a: MI = H(a) = ln 2 (balanced binary), mi_norm = 1.
    val cp = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val rc = Profile.mutualInformation(cp, "a", "b").collect()(0)
    assert(math.abs(rc.getAs[Double]("mi_nats") - math.log(2)) < 1e-6)
    assert(math.abs(rc.getAs[Double]("h_a") - math.log(2)) < 1e-6)
    assert(rc.getAs[Double]("mi_norm") == 1.0)
    // constant column: entropy 0, normalized MI defined as 0
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val r0 = Profile.mutualInformation(const, "a", "b").collect()(0)
    assert(r0.getAs[Double]("h_a") == 0.0 && r0.getAs[Double]("mi_norm") == 0.0)
    // null categories are a LEVEL, not dropped (equi-joins would silently
    // lose them without the sentinel): null-b perfectly predicts x here
    val withNull = Seq(("x", null.asInstanceOf[String]), ("x", null.asInstanceOf[String]),
      ("y", "p"), ("y", "p")).toDF("a", "b")
    val rn = Profile.mutualInformation(withNull, "a", "b").collect()(0)
    assert(rn.getAs[Long]("n_rows") == 4L && rn.getAs[Long]("n_cells") == 2L)
    assert(math.abs(rn.getAs[Double]("mi_nats") - math.log(2)) < 1e-6)
  }

  test("benford: digit extraction incl. sub-1 values and the 10->1 clamp") {
    // digits: 1.0->1, 19->1, 1000->1 (directly or via the clamp when
    // log10 lands one ulp under 3), 0.25->2, 300->3, 0.99->9;
    // -2, 0 and null excluded. N=6.
    val vals = Seq(Some(1.0), Some(19.0), Some(1000.0), Some(0.25),
      Some(300.0), Some(0.99), Some(-2.0), Some(0.0), None)
    val got = graft.operators.Profile.benford(vals.toDF("v"), "v")
      .orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def exp(d: Int) = r6(6 * r6(math.log10(1.0 + 1.0 / d)))
    def chi(n: Long, e: Double) = r6((n - e) * (n - e) / e)
    assert(got.toSeq == Seq(
      (1L, 3L, exp(1), chi(3, exp(1))),
      (2L, 1L, exp(2), chi(1, exp(2))),
      (3L, 1L, exp(3), chi(1, exp(3))),
      (9L, 1L, exp(9), chi(1, exp(9)))))
  }

  test("paretoFrontier: strict dominance, surviving ties, null drop") {
    val df = Seq((Some(5.0), Some(10L)), (Some(5.0), Some(12L)),
      (Some(4.0), Some(8L)), (Some(4.0), Some(8L)), (Some(3.0), Some(20L)),
      (Some(2.0), Some(5L)), (None, Some(1L)), (Some(9.0), None))
      .toDF("q", "l")
    val got = graft.operators.Profile.paretoFrontier(df, "q", "l")
      .orderBy(org.apache.spark.sql.functions.col("q").desc)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    // (5,12) dominated by (5,10); (3,20) by (4,8); equal (4,8) pair both
    // survive; (2,5) survives on the cheap axis.
    assert(got.toSeq == Seq((5.0, 10L), (4.0, 8L), (4.0, 8L), (2.0, 5L)))
  }

  test("inclusionDependency: containment fraction and threshold flag") {
    val child = Seq(Some(1L), Some(2L), Some(3L), None, Some(2L)).toDF("ck")
    val parent = Seq(1L, 2L, 4L).toDF("pk")
    val r = graft.operators.Profile
      .inclusionDependency(child, "ck", parent, "pk", "c->p").collect()(0)
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.666667 && !r.getBoolean(4))
    val r2 = graft.operators.Profile
      .inclusionDependency(child, "ck", parent, "pk", "c->p", threshold = 0.5)
      .collect()(0)
    assert(r2.getBoolean(4))
  }

  test("functionalDependency: violation counts, null exclusion, holds flag") {
    val df = Seq((Some(1L), Some("x")), (Some(1L), Some("x")),
      (Some(2L), Some("y")), (Some(2L), Some("z")), (Some(3L), Some("w")),
      (None, Some("q")), (Some(4L), None)).toDF("l", "r")
    val v = graft.operators.Profile
      .functionalDependency(df, "l", "r", "t.l->r").collect()(0)
    assert((v.getString(0), v.getLong(1), v.getLong(2), v.getLong(3),
      v.getBoolean(4)) == (("t.l->r", 3L, 1L, 2L, false)))
    val ok = Seq((1L, "x"), (2L, "y"), (1L, "x")).toDF("l", "r")
    assert(graft.operators.Profile
      .functionalDependency(ok, "l", "r", "ok").collect()(0).getBoolean(4))
  }

  test("domainTree: reversed-label prefix nodes with per-node counts") {
    val df = Seq("a.example.com", "b.example.com", "c.example.org")
      .map(Tuple1(_)).toDF("host")
    val got = graft.operators.Profile.domainTree(df, "host")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("com", 1L) -> 2L, ("com.example", 2L) -> 2L,
      ("com.example.a", 3L) -> 1L, ("com.example.b", 3L) -> 1L,
      ("org", 1L) -> 1L, ("org.example", 2L) -> 1L,
      ("org.example.c", 3L) -> 1L))
  }

  test("datasetCard: exact counts, dup rate over non-null texts, fixed " +
      "language rows, null-safe degenerate ratios") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog"),      // en
      (2L, "the cat and the dog"),      // exact dup of 1
      (3L, "der hund und die katze"),   // de
      (4L, "   "),                      // blank (counted, tokens 0)
      (5L, null.asInstanceOf[String]))  // null text
      .toDF("doc_id", "text")
    val card = Profile.datasetCard(docs)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(card.size == 13, card.keys.toString) // 7 scalars + 6 languages
    assert(card("n_docs") == Some(5.0))
    assert(card("n_empty_docs") == Some(2.0)) // blank + null
    assert(card("n_tokens") == Some(5 + 5 + 5 + 0.0))
    assert(card("exact_text_dup_rate") == Some(0.25)) // 4 non-null, 3 distinct
    assert(card("lang_share_en") == Some(0.4))
    assert(card("lang_share_de") == Some(0.2))
    assert(card("lang_share_unknown") == Some(0.4)) // blank + null
    assert(card("lang_share_zh") == Some(0.0))
    // mean_quality describes CONTENT: null-text docs are excluded (they
    // would otherwise score 0.6 via least()'s null-skipping and inflate
    // the headline above real short docs), so the mean is invariant to
    // adding null rows.
    val cardNoNull = Profile.datasetCard(docs.filter($"text".isNotNull))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(card("mean_quality") == cardNoNull("mean_quality"),
      s"${card("mean_quality")} vs ${cardNoNull("mean_quality")}")
    // Empty corpus: counts 0, every ratio NULL (never NaN).
    val empty = Profile.datasetCard(docs.filter($"doc_id" < 0))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(empty("n_docs") == Some(0.0))
    assert(empty("mean_doc_tokens").isEmpty)
    assert(empty("exact_text_dup_rate").isEmpty)
    assert(empty("mean_quality").isEmpty)
    assert(empty("lang_share_en").isEmpty)
  }

  test("datasetCard storage section: decision-table rows reshape to two " +
      "(metric, value) rows per axis, appended after the content card") {
    import spark.implicits._
    val docs = Seq((1L, "the cat and the dog")).toDF("doc_id", "text")
    val tradeoff = Seq(
      ("sq8", 4.0, 20L, Some(0.99)),
      ("jl_16", 4.0, 20L, Some(0.12)),
      ("empty_arm", 32.0, 0L, None)) // NULL mean_recall rides through
      .toDF("axis", "memory_ratio", "n_queries", "mean_recall")
    val card = Profile.datasetCard(docs, storage = Some(tradeoff))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(card.size == 13 + 6, card.keys.toString)
    assert(card("storage_memory_ratio_sq8") == Some(4.0))
    assert(card("storage_mean_recall_sq8") == Some(0.99))
    assert(card("storage_mean_recall_jl_16") == Some(0.12))
    assert(card("storage_memory_ratio_empty_arm") == Some(32.0))
    assert(card("storage_mean_recall_empty_arm").isEmpty,
      "an empty arm's NULL recall must stay NULL in the card")
    // The plain card is unchanged by the optional section.
    assert(Profile.datasetCard(docs).count() == 13)
  }

  test("chiSquareIndependence: hand 2x2 table, totals, dof") {
    // cells: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=30; N=80.
    // row x=40, col p=40 -> e=20 everywhere; term=(10)^2/20=5 -> chi2=20.
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val got = graft.operators.Profile
      .chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))).toMap
    assert(got(("x", "p")) == ((30L, 20.0, 5.0, 20.0, 1L)))
    assert(got(("y", "p")) == ((10L, 20.0, 5.0, 20.0, 1L)))
    assert(got.size == 4)
  }

  test("pearsonByGroup: Simpson flip — positive in groups, negative pooled") {
    // two groups each with slope +1, but group B offset so the pooled
    // cloud tilts negative.
    val rows = Seq(("A", 0L, 100L), ("A", 1L, 101L), ("A", 2L, 102L),
      ("B", 10L, 0L), ("B", 11L, 1L), ("B", 12L, 2L))
    val got = graft.operators.Profile
      .pearsonByGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("A") == 1.0 && got("B") == 1.0)
    assert(got("<pooled>") < 0.0) // the paradox
    // constant x -> null r
    val const = Seq(("C", 5L, 1L), ("C", 5L, 9L)).toDF("g", "x", "y")
    val rc = graft.operators.Profile
      .pearsonByGroup(const, "g", "x", "y")
      .collect().filter(_.getString(0) == "C")
    assert(rc.forall(_.isNullAt(2)))
  }

  test("quantileDiff: exact rank-selected deciles and gaps") {
    val a = (1L to 100L).map(i => (i, i * 10)).toDF("id", "v")
    val b = (1L to 100L).map(i => (i, i * 10 + 55)).toDF("id", "v")
    val got = graft.operators.Profile.quantileDiff(a, b, "v", "id")
      .orderBy("q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // decile k selects rank ceil(k*100/10) = 10k -> value 100k; the
    // shifted side differs by exactly 55 at every decile.
    assert(got.toSeq == (1 to 9).map(k =>
      (k.toLong, k * 100L, k * 100L + 55L, 55L)))
  }
}
