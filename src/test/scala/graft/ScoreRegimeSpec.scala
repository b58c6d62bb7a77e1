package graft

import org.apache.spark.sql.functions._

import graft.ml.{Intercomparison, RF}
import graft.ml.Intercomparison.ModelConfig

/** The ML pipeline exercised at BASELINE.md's published skill-score REGIME
  * (examples/output/all_scores_stats.p, reproduced in BASELINE.md "Skill
  * scores"): not the arithmetic of one score (m9_skill_scores gates that)
  * but the end-to-end behavioral orderings the reference's own
  * cross-validation table exhibits —
  *
  *   1. at 10 min, RF sits BETWEEN the reference products:
  *      CORR(CPCH) 0.800 > CORR(RF_dualpol) 0.700 > CORR(RZC) 0.619;
  *   2. 60-min aggregation scores better than 10-min for EVERY model
  *      (CORR up, MAE down, scatter down — e.g. RF_dualpol CORR
  *      0.700→0.804, MAE 1.020→0.656, scatter 3.152→2.272 dB);
  *   3. the products carry the published negative bias (−0.408 dB) while
  *      the bias-corrected RF sits nearer zero (+0.121 dB at 10 min,
  *      +0.068 at 60 min) — |logbias(RF)| < |logbias(product)|, and the
  *      'cdf' correction moves the raw forest's bias TOWARD zero.
  *
  * The fixture is a deterministic synthetic rain regime with the same
  * noise STRUCTURE the real table reflects: a smooth positive rain-rate
  * signal; a good reference product (small multiplicative log-noise) and a
  * poor one (large log-noise), both sharing the products' −0.408 dB
  * climatological bias; and features that carry the signal through
  * moderate log-noise, so a trained forest must land between the two
  * products. Per-sample noise is i.i.d. across the 6 samples of each
  * hour, so hourly sums cancel noise and every model improves at 60 min —
  * the same mechanism behind the reference's 10→60-min improvement.
  * Everything is hash-derived (no RNG) and the RF seed is fixed, so the
  * asserted orderings are bit-stable across runs.
  */
class ScoreRegimeSpec extends SparkSpec {

  /** Deterministic uniform in [0,1) (the classic sin-hash). */
  private def u(i: Int, salt: Double): Double = {
    val x = math.sin(i * 12.9898 + salt) * 43758.5453
    x - math.floor(x)
  }

  /** Symmetric deterministic noise in [−1, 1). */
  private def g(i: Int, salt: Double): Double = 2.0 * u(i, salt) - 1.0

  private val ProductBiasDb = -0.408 // BASELINE.md: CPCH/RZC bias column

  /** Mean of 10^(a·g) for g uniform on [−1,1): sinh(a·ln10)/(a·ln10).
    * Dividing the noise factor by this keeps the product's MEAN ratio at
    * exactly the injected bias — without it, Jensen's convexity term
    * (+0.66 dB at the RZC amplitude) swamps the −0.408 dB signal.
    */
  private def logNoiseMean(a: Double): Double = {
    val t = a * math.log(10.0)
    math.sinh(t) / t
  }

  private lazy val fixture = {
    import spark.implicits._
    val rows = (0 until 2880).map { i =>
      // slow signal (period ≈ 34 h »  the hour): within an hour the rain
      // rate is ~constant, so per-sample noise is the i.i.d. part hourly
      // sums cancel — the mechanism behind the reference's 10→60-min
      // improvement. A fast signal would mix signal into the residual and
      // aggregation would stop helping the forest.
      val rTrue = 0.3 + 4.0 * math.abs(math.sin(i * 0.031))
      // features: the rain signal through substantial log-noise (f1), a
      // noisy linear channel (f2), and a pure-noise distractor (f3) —
      // noisy enough that the forest cannot out-score the good product
      val f1 = math.log10(rTrue) + 0.45 * g(i, 1.0)
      val f2 = rTrue * (1.0 + 0.5 * g(i, 2.0))
      val f3 = g(i, 3.0)
      val biasLin = math.pow(10.0, ProductBiasDb / 10.0)
      def productNoise(a: Double, salt: Double): Double =
        math.pow(10.0, a * g(i, salt)) / logNoiseMean(a)
      // good product: ±0.08 dex log-noise; poor product: ±0.42 dex
      val cpch = rTrue * productNoise(0.08, 4.0) * biasLin
      val rzc = rTrue * productNoise(0.42, 5.0) * biasLin
      val hour = i / 6
      val fold = hour % 2 // event-split flavored: whole hours per fold
      (fold, hour, rTrue, f1, f2, f3, cpch, rzc, 5.0)
    }
    rows.toDF("fold", "hour", "ref", "f1", "f2", "f3", "cpch", "rzc", "temp")
  }

  private lazy val scoreTable = Intercomparison.run(
    fixture,
    configs = Seq(ModelConfig("RF", Seq("f1", "f2", "f3"),
      numTrees = 15, maxDepth = 8)),
    refProducts = Map("CPCH" -> "cpch", "RZC" -> "rzc"),
    labelCol = "ref", tempCol = "temp", foldCol = "fold", k = 2,
    hourCol = Some("hour"))
    .collect()
    .map(r => (r.getAs[String]("model"), r.getAs[String]("agg")) -> r)
    .toMap

  test("10-min regime: RF lands between RZC and CPCH (BASELINE.md order)") {
    def corr(m: String) = scoreTable((m, "10min")).getAs[Double]("corr")
    assert(corr("CPCH") > corr("RF"),
      s"CPCH ${corr("CPCH")} should beat RF ${corr("RF")} (BASELINE 0.800 > 0.700)")
    assert(corr("RF") > corr("RZC"),
      s"RF ${corr("RF")} should beat RZC ${corr("RZC")} (BASELINE 0.700 > 0.619)")
  }

  test("numeric regime bands cite the BASELINE.md table, not just orderings") {
    scoreTable.toSeq.sortBy(_._1).foreach { case ((m, a), r) =>
      info(f"$m%s/$a%s corr=${r.getAs[Double]("corr")}%.4f " +
        f"mae=${r.getAs[Double]("mae")}%.4f " +
        f"scatter=${r.getAs[Double]("scatter_db")}%.4f " +
        f"logbias=${r.getAs[Double]("logbias_db")}%.4f " +
        f"ed=${r.getAs[Double]("ed")}%.4f")
    }
    def at(m: String, a: String, c: String): Double =
      scoreTable((m, a)).getAs[Double](c)
    // BASELINE.md 10-min row: CORR 0.800 (CPCH) / 0.700 (RF) / 0.619
    // (RZC). The fixture's noise amplitudes differ, so the assertions are
    // BANDS + the published GAP structure (0.181 CPCH−RZC, ~0.08-0.1 per
    // side for RF), not the exact constants:
    assert(at("CPCH", "10min", "corr") > 0.9,
      "good product must be high-corr (BASELINE CPCH 0.800 tops the table)")
    assert(at("RZC", "10min", "corr") < at("CPCH", "10min", "corr") - 0.1,
      "poor product trails by a real gap (BASELINE 0.800 - 0.619 = 0.181)")
    assert(at("CPCH", "10min", "corr") - at("RF", "10min", "corr") > 0.02 &&
      at("RF", "10min", "corr") - at("RZC", "10min", "corr") > 0.02,
      "RF sits strictly between with margin (BASELINE 0.800 > 0.700 > 0.619)")
    // scatter column: RZC 3.777 dB vs CPCH 2.303 dB at 10 min — the poor
    // product's spread must exceed the good one's by a real margin
    assert(at("RZC", "10min", "scatter_db") > at("CPCH", "10min", "scatter_db") + 0.3,
      "BASELINE scatter: RZC 3.777 > CPCH 2.303 dB")
    // ED column: CPCH 0.174 < RZC 0.189 at 10 min
    assert(at("CPCH", "10min", "ed") < at("RZC", "10min", "ed"),
      "BASELINE ED: CPCH 0.174 < RZC 0.189")
    // bias column: both products carry -0.408 dB; estimator noise allows a
    // band, not the constant
    for (p <- Seq("CPCH", "RZC")) {
      val lb = at(p, "10min", "logbias_db")
      assert(lb < -0.05 && lb > -1.5,
        s"$p 10-min logbias $lb outside the (-1.5, -0.05) dB band " +
          "(BASELINE -0.408)")
    }
    assert(math.abs(at("RF", "10min", "logbias_db")) < 0.35,
      "bias-corrected RF sits near zero (BASELINE +0.121 dB)")
  }

  test("60-min aggregation scores better than 10-min for every model") {
    for (m <- Seq("RF", "CPCH", "RZC")) {
      val t10 = scoreTable((m, "10min"))
      val t60 = scoreTable((m, "60min"))
      assert(t60.getAs[Double]("corr") > t10.getAs[Double]("corr"),
        s"$m: 60-min CORR should improve (BASELINE: every model improves)")
      // the 60-min rows are 6-sample SUMS; BASELINE's table is in rate
      // space (mm/h), so the comparable hourly MAE is mae60 / 6
      assert(t60.getAs[Double]("mae") / 6.0 < t10.getAs[Double]("mae"),
        s"$m: 60-min rate-space MAE should drop")
      // scatter is a ratio quantile spread — scale-free, directly comparable
      assert(t60.getAs[Double]("scatter_db") < t10.getAs[Double]("scatter_db"),
        s"$m: 60-min scatter should drop")
    }
  }

  test("bias regime: products carry the published negative bias, RF sits nearer zero") {
    for (agg <- Seq("10min", "60min"); p <- Seq("CPCH", "RZC")) {
      val lb = scoreTable((p, agg)).getAs[Double]("logbias_db")
      // the injected −0.408 dB is a MEAN-ratio bias; the per-sample
      // log-noise adds a convexity term, so assert direction + magnitude
      // band rather than the exact constant
      assert(lb < 0.0, s"$p/$agg logbias $lb should be negative (BASELINE −0.408)")
      val rfLb = scoreTable(("RF", agg)).getAs[Double]("logbias_db")
      assert(math.abs(rfLb) < math.abs(lb),
        s"|RF logbias| ${math.abs(rfLb)} should undercut |$p| ${math.abs(lb)} " +
          "(BASELINE: |0.121| < |−0.408|)")
    }
  }

  test("'cdf' bias correction has the published direction: stretch + small positive bias") {
    val train = fixture.filter(col("fold") === 0)
    val test = fixture.filter(col("fold") === 1)
    val m = RF.fit(train, Seq("f1", "f2", "f3"), "ref",
      numTrees = 15, maxDepth = 8, featureSubset = "auto")
    // a forest on noisy features COMPRESSES (regression to the mean):
    // quantile-matching BC therefore fits a stretch, slope > 1 — the
    // mechanism behind the reference table's positive RF bias (+0.121 dB)
    // opposite in sign to the products' −0.408 dB
    assert(m.bcSlope > 1.0,
      s"cdf slope ${m.bcSlope} should stretch compressed forest predictions")
    val preds = RF.predict(m, test)
    def logbias(c: String): Double = {
      val r = preds.agg(
        sum(col(c).cast("decimal(27,10)")).cast("double"),
        sum(col("ref").cast("decimal(27,10)")).cast("double")).head()
      10.0 * math.log10(r.getDouble(0) / r.getDouble(1))
    }
    val bc = logbias("prediction_bc")
    assert(bc > 0.0 && bc < 1.0,
      s"corrected bias $bc dB should be small positive " +
        "(BASELINE RF +0.121 dB vs products −0.408)")
  }
}
