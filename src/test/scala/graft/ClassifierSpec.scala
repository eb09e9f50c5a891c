package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

/** Logistic-regression quality classifier: hand-computed gradient steps,
  * separation on separable data, null exclusion, determinism, and the
  * narrow-scoring plan pin.
  */
class ClassifierSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("one gradient step matches the hand computation") {
    // w=0 -> sigmoid(0)=0.5 for both rows; err = (-0.5, +0.5).
    // g_bias = 0; g_x = (-0.5*1 + 0.5*0)/2 = -0.25 -> w = (0, 0.25).
    val df = Seq((1.0, 1.0), (0.0, 0.0)).toDF("x", "y")
    val w = Classifier.fitLogistic(df, Seq("x"), "y", iterations = 1, lr = 1.0)
    assert(w.toSeq == Seq(0.0, 0.25))
  }

  test("second step uses the first step's rounded weights") {
    val df = Seq((1.0, 1.0), (0.0, 0.0)).toDF("x", "y")
    val w2 = Classifier.fitLogistic(df, Seq("x"), "y", iterations = 2, lr = 1.0)
    // Replay by hand from (0, 0.25): s1 = sigmoid(0.25), s0 = sigmoid(0).
    val s1 = 1.0 / (1.0 + math.exp(-0.25)); val s0 = 0.5
    val g0 = ((s1 - 1.0) + (s0 - 0.0)) / 2.0
    val g1 = ((s1 - 1.0) * 1.0 + (s0 - 0.0) * 0.0) / 2.0
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(w2.toSeq == Seq(r6(0.0 - g0), r6(0.25 - g1)))
  }

  test("separable data separates: confident probs on each side") {
    val df = (1 to 50).map(i => (i.toDouble / 50.0, 0.0)) ++
      (1 to 50).map(i => (2.0 + i.toDouble / 50.0, 1.0))
    val scored = Classifier.fitScoreLogistic(df.toDF("x", "y"), Seq("x"), "y",
      iterations = 30, lr = 1.0)
    val avgByY = scored.groupBy("y").agg(org.apache.spark.sql.functions.avg("prob"))
      .as[(Double, Double)].collect().toMap
    assert(avgByY(0.0) < 0.35 && avgByY(1.0) > 0.65)
    // predicted agrees with prob
    assert(scored.filter(($"prob" >= 0.5) =!= $"predicted").count() == 0)
  }

  test("null labels and features are excluded from the gradient") {
    val withNulls = Seq(
      (Some(1.0), Some(1.0)), (Some(0.0), Some(0.0)),
      (None, Some(1.0)), (Some(0.5), None)
    ).toDF("x", "y")
    val clean = Seq((1.0, 1.0), (0.0, 0.0)).toDF("x", "y")
    assert(Classifier.fitLogistic(withNulls, Seq("x"), "y", 2).toSeq ==
      Classifier.fitLogistic(clean, Seq("x"), "y", 2).toSeq)
  }

  test("all-null training input raises a named error instead of NPE") {
    val allNull = Seq((None: Option[Double], None: Option[Double]))
      .toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Classifier.fitLogistic(allNull, Seq("x"), "y", iterations = 1)
    }
    assert(e.getMessage.contains("no trainable rows"))
  }

  test("weights/features arity mismatch raises") {
    val df = Seq((1.0, 1.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Classifier.scoreLogistic(df, Seq("x"), Array(0.0, 0.1, 0.2))
    }
  }

  test("plan: scoring is one narrow pass (no Exchange)") {
    val df = Seq((1.0, 1.0)).toDF("x", "y")
    val plan = Classifier.scoreLogistic(df, Seq("x"), Array(0.1, 0.2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("aucFrame: perfect, inverted, chance, and tied rankings hand-checked") {
    def auc(rows: Seq[(Double, Double)]): (Double, Long, Long) =
      Classifier.aucFrame(rows.toDF("prob", "label"), "prob", "label")
        .as[(Double, Long, Long)].collect()(0)
    // perfect separation
    assert(auc(Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))) == ((1.0, 2L, 2L)))
    // inverted
    assert(auc(Seq((0.1, 1.0), (0.2, 1.0), (0.8, 0.0), (0.9, 0.0)))._1 == 0.0)
    // all scores tied -> chance
    assert(auc(Seq((0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)))._1 == 0.5)
    // one pos above one neg, one pos tied with one neg:
    // pairs: (p=.9,n=.5)->1, (p=.9,n=.2)->1, (p=.5,n=.5)->0.5, (p=.5,n=.2)->1
    // AUC = 3.5/4 = 0.875
    assert(auc(Seq((0.9, 1.0), (0.5, 1.0), (0.5, 0.0), (0.2, 0.0)))._1 == 0.875)
  }

  test("calibrationFrame: bins, means, rates and gaps hand-checked") {
    val scored = Seq(
      (0.05, 0.0), (0.15, 0.0), (0.15, 1.0), // bins 0 and 1
      (0.95, 1.0), (0.97, 1.0), (0.99, 0.0), // bin 9
      (1.0, 1.0)                             // prob 1.0 stays in bin 9
    ).toDF("prob", "label")
    val got = Classifier.calibrationFrame(scored, "prob", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(0L, 1L, 9L))
    assert(got(0L) == ((1L, 0.05, 0.0, 0.05)))
    assert(got(1L) == ((2L, 0.15, 0.5, 0.35)))
    // bin 9: mean = (0.95+0.97+0.99+1.0)/4 = 0.9775, rate = 3/4
    assert(got(9L) == ((4L, 0.9775, 0.75, 0.2275)))
  }

  test("cohenKappa matches the hand-computed 2x2 confusion matrix") {
    // cells: (a,a)x20 (a,b)x5 (b,a)x10 (b,b)x15 -> n=50, agree=35,
    // margA=(25,25), margB=(30,20), sumProd=1250.
    // po=0.7, pe=0.5, kappa=(50*35-1250)/(2500-1250)=0.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = Classifier.cohenKappa(rows.toDF("ra", "rb"), "ra", "rb")
      .collect()(0)
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.7 && r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
  }

  test("cohenKappa excludes null-rated rows and ignores one-sided labels") {
    // The (null, a) and (a, null) rows drop; label 'c' appears only for
    // rater B, so it adds nothing to the chance product.
    val rows = Seq(
      (Some("a"), Some("a")), (Some("a"), Some("c")), (Some("b"), Some("b")),
      (None, Some("a")), (Some("a"), None))
    val r = Classifier.cohenKappa(rows.toDF("ra", "rb"), "ra", "rb")
      .collect()(0)
    assert(r.getLong(0) == 3L)
    // n=3, agree=2, margA: a=2,b=1; margB: a=1,b=1,c=1; sumProd=2*1+1*1=3
    // po=2/3, pe=3/9, kappa=(3*2-3)/(9-3)=0.5
    assert(r.getDouble(1) == 0.666667 && r.getDouble(2) == 0.333333)
    assert(r.getDouble(3) == 0.5)
  }

  test("cohenKappa degenerate constant raters -> kappa 0 by convention") {
    val rows = Seq.fill(4)(("x", "x"))
    val r = Classifier.cohenKappa(rows.toDF("ra", "rb"), "ra", "rb")
      .collect()(0)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.0)
  }

  test("brierDecomposition: hand-computed two-bin Murphy terms") {
    // bin1: p=0.15 x(3 neg + 1 pos); bin9: p=0.95 x 4 pos. N=8, SY=5.
    // rel1=(0.15-0.25)^2*4/8=0.005   rel9=(0.95-1.0)^2*4/8=0.00125
    // res1=res9=(4/8)*(1/4-5/8)^2 -> 144/2048=0.0703125 -> 0.070313
    // brier=(3*0.15^2+0.85^2+4*0.05^2)/8=0.1  unc=5*3/64=0.234375
    val scored = (Seq.fill(3)((0.15, 0.0)) ++ Seq((0.15, 1.0)) ++
      Seq.fill(4)((0.95, 1.0))).toDF("prob", "label")
    val got = Classifier.brierDecomposition(scored, "prob", "label")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, 4L, 0.005, 0.070313, 0.1, 0.234375),
      (9L, 4L, 0.00125, 0.070313, 0.1, 0.234375)))
  }

  test("brierDecomposition: null rows drop; perfect classifier is clean") {
    val scored = (Seq((1.0, 1.0), (0.0, 0.0)).map { case (p, y) =>
      (Option(p), Option(y)) } ++ Seq((None: Option[Double], Some(1.0)),
      (Some(0.5), None: Option[Double]))).toDF("prob", "label")
    val got = Classifier.brierDecomposition(scored, "prob", "label")
      .orderBy("bin").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 9L))
    // brier 0, reliability 0 per bin, uncertainty 1*1/4
    assert(got.forall(r => r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0))
    assert(got.forall(r => r.getDouble(5) == 0.25))
  }

  test("targetEncodeLoo: leave-one-out means, smoothing, singleton collapse") {
    // category A: y = 10, 20, 30 (sum 60); B: y = 100 (singleton).
    // global: N=4, SY=160 -> mean 40. m=2.
    // A row y=10: ((60-10) + 2*40) / (3-1+2) = 130/4 = 32.5
    // B row: LOO sum 0 -> (0 + 2*40)/(0+2) = 40 = global mean exactly.
    val df = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "B", 100L)).toDF("id", "cat", "y")
    val got = Classifier.targetEncodeLoo(df, "id", "cat", "y", m = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 32.5 && got(2L) == 30.0 && got(3L) == 27.5)
    assert(got(4L) == 40.0)
    intercept[IllegalArgumentException] {
      Classifier.targetEncodeLoo(df, "id", "cat", "y", m = 0)
    }
  }

  test("conformalThreshold: exact rank quantile and holdout coverage") {
    // calibration scores (cal=true): s = |y-p| over 9 rows with p chosen
    // so s = 0.1, 0.2, ..., 0.9; rank = min(9, ceil(10*0.9)) = 9 -> 0.9.
    val rows = (1 to 9).map(i => (i.toLong, i / 10.0, 0.0, true)) ++
      Seq((100L, 0.05, 0.0, false), (101L, 0.95, 0.0, false))
    val df = rows.toDF("id", "prob", "label", "cal")
    val r = Classifier.conformalThreshold(df, "id", "prob", "label",
      org.apache.spark.sql.functions.col("cal")).collect()(0)
    // eval: s = 0.05 (covered), 0.95 (not, 0.95 > 0.9) -> coverage 0.5
    assert((r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)) ==
      ((9L, 0.9, 2L, 0.5)))
    intercept[IllegalArgumentException] {
      Classifier.conformalThreshold(df, "id", "prob", "label",
        org.apache.spark.sql.functions.col("cal"), aNum = 3, aDen = 2)
    }
    // EMPTY calibration split (r9: the funnelLatency annihilation class):
    // still one row — real n_eval, null threshold/coverage, not an empty
    // frame.
    val noCal = Classifier.conformalThreshold(
      df.filter(!org.apache.spark.sql.functions.col("cal")), "id", "prob",
      "label", org.apache.spark.sql.functions.col("cal")).collect()
    assert(noCal.length == 1)
    assert(noCal(0).isNullAt(0) && noCal(0).isNullAt(1) &&
      noCal(0).getLong(2) == 2L && noCal(0).isNullAt(3))
  }

  test("featureAttribution: argmax on rounded contributions, name ties") {
    // weights: bias 0, w=(2, -1); means: x1: 1.0, x2: 2.0.
    // row 1: x=(2,2): c1=2*(1)=2, c2=-1*0=0 -> top x1, logit 2*2-2=2
    // row 2: x=(1,4): c1=0, c2=-2 -> top x2 (|c2| wins)
    // row 3: x=(0,0): c1=-2, c2=2 -> tie on |c|: name order -> a
    val df = Seq((1L, 2.0, 2.0), (2L, 1.0, 4.0), (3L, 0.0, 0.0))
      .toDF("id", "a", "b")
    val got = Classifier.featureAttribution(df, "id", Seq("a", "b"),
      Array(0.0, 2.0, -1.0))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == (("a", 2.0, 2.0)))
    assert(got(2L) == (("b", -2.0, -2.0)))
    assert(got(3L) == (("a", -2.0, 0.0)))
  }

  test("bestF1Threshold: exact sweep and conservative tie-break") {
    // scores: 0.9 (pos), 0.8 (neg), 0.7 (pos), 0.6 (neg x2).
    // t=0.9: tp1 fp0 fn1 -> F1 2/3; t=0.7: tp2 fp1 fn0 -> F1 0.8;
    // t=0.8: tp1 fp1 fn1 -> 0.5; t=0.6: tp2 fp3 -> 4/7. Best: 0.7.
    val df = Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.6, 0.0),
      (0.6, 0.0)).toDF("prob", "label")
    val r = Classifier.bestF1Threshold(df, "prob", "label").collect()(0)
    assert((r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((0.7, 2L, 1L, 0L)))
    assert(r.getDouble(4) == 0.666667 && r.getDouble(5) == 1.0 &&
      r.getDouble(6) == 0.8)
    // perfect separation: tie between nothing; all-one-class guard
    val onec = Seq((0.9, 1.0), (0.1, 1.0)).toDF("prob", "label")
    val r1 = Classifier.bestF1Threshold(onec, "prob", "label").collect()(0)
    assert(r1.getDouble(0) == 0.1 && r1.getDouble(6) == 1.0)
  }
}
