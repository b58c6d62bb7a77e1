package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Statistical contracts of the uncertainty-quantification operators:
  * the hash-bootstrap CI brackets the truth on clean data, and the
  * split-conformal interval achieves its finite-sample coverage.
  */
class UncertaintySpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("poissonBootstrapCi: CI brackets the sample mean, width shrinks with n") {
    import spark.implicits._
    // group 1: 200 values in [0, 2); group 2: 12 values, same distribution
    val rows = (0 until 200).map(i => (1L, i.toLong, (i % 20) / 10.0)) ++
      (0 until 12).map(i => (2L, (1000 + i).toLong, (i % 20) / 10.0))
    val out = Stats.poissonBootstrapCi(rows.toDF("g", "id", "v"),
      "g", "id", "v", reps = 32, tailK = 2)
      .orderBy(col("g")).collect()
    assert(out.length == 2)
    val big = out(0); val small = out(1)
    assert(big.getLong(2) == 32, "all replicas of a 200-row group have mass")
    val mean1 = (0 until 200).map(i => (i % 20) / 10.0).sum / 200.0
    assert(big.getDouble(4) <= mean1 && mean1 <= big.getDouble(5),
      s"CI [${big.getDouble(4)}, ${big.getDouble(5)}] misses mean $mean1")
    // bootstrap SE scales ~1/sqrt(n): the 12-row group's CI is wider
    val w1 = big.getDouble(5) - big.getDouble(4)
    val w2 = small.getDouble(5) - small.getDouble(4)
    assert(w2 > w1, s"small-group CI ($w2) should be wider than large-group ($w1)")
    // boot_mean is near the sample mean
    assert(math.abs(big.getDouble(3) - mean1) < 0.1)
  }

  test("poissonBootstrapCi weights behave like Poisson(1): total mass ~ n per replica") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (1L, i.toLong, 1.0))
    val out = Stats.poissonBootstrapCi(rows.toDF("g", "id", "v"),
      "g", "id", "v", reps = 16, tailK = 1).head()
    // with x ≡ 1 every replicate mean is exactly 1 → degenerate CI at 1
    assert(out.getDouble(3) == 1.0 && out.getDouble(4) == 1.0 && out.getDouble(5) == 1.0)
  }

  test("conformalInterval achieves ~1-alpha held-out coverage on a linear group") {
    import spark.implicits._
    // y = 3x + noise; calibration = even ids, test = odd ids
    val rows = (0 until 400).map { i =>
      val x = (i % 97).toDouble
      val y = 3.0 * x + math.sin(i * 1.7) * 2.0
      (1L, ts(i % 300), i.toLong, x, y, i % 2 == 0)
    }.toDF("g", "ts", "id", "x", "y", "cal")
    val out = Stats.conformalInterval(rows, "g", "x", "id", "y", "cal", alpha = 0.1)
      .head()
    val ncal = out.getLong(1); val ntest = out.getLong(2)
    val q = out.getDouble(3); val cov = out.getDouble(4)
    assert(ncal == 200 && ntest == 200)
    assert(q > 0 && q < 3.0, s"q_hat $q should be near the noise scale (~2)")
    assert(cov >= 0.85, s"coverage $cov below the conformal guarantee regime")
  }

  test("conformalInterval falls back to the mean predictor when x is constant") {
    import spark.implicits._
    val rows = (0 until 40).map(i =>
      (1L, i.toLong, 5.0, (i % 4).toDouble, i % 2 == 0))
      .toDF("g", "id", "x", "y", "cal")
    val out = Stats.conformalInterval(rows, "g", "x", "id", "y", "cal", alpha = 0.2)
      .head()
    // calibration (even ids) has y ∈ {0, 2} → mean predictor 1, every
    // calibration residual exactly 1 → q = 1; test (odd ids) has
    // y ∈ {1, 3} → residuals {0, 2} → exactly half are covered
    assert(out.getDouble(3) == 1.0, s"q_hat ${out.getDouble(3)}")
    assert(out.getDouble(4) == 0.5, s"coverage ${out.getDouble(4)}")
  }
}
