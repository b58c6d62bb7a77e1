package graft

import org.apache.spark.sql.functions._

import graft.ml.Glm

class GlmSpec extends SparkSpec {

  test("logisticIrls: recovers the separating direction on planted data") {
    // y = 1 iff x1 + noise > 0.5 — strong positive b1, b2 ~ irrelevant
    val rng = new scala.util.Random(5)
    val rows = (1 to 400).map { i =>
      val x1 = rng.nextDouble(); val x2 = rng.nextDouble()
      val y = if (x1 + 0.1 * rng.nextGaussian() > 0.5) 1.0 else 0.0
      R(y, x1, x2)
    }
    val d = df("y DOUBLE, x1 DOUBLE, x2 DOUBLE", rows)
    val b = Glm.logisticIrls(d, "y", "x1", "x2", iters = 3).collect()(0)
    assert(b.getLong(0) == 400L)
    val (b0, b1, b2) = (b.getDouble(1), b.getDouble(2), b.getDouble(3))
    assert(b1 > 3.0, s"planted slope not recovered: b1=$b1")
    assert(math.abs(b2) < b1 / 3, s"noise feature dominated: b2=$b2 b1=$b1")
    assert(b0 < 0.0, s"intercept must offset the 0.5 threshold: b0=$b0")
  }

  test("logisticIrls: deterministic across runs and partitionings") {
    val rows = (1 to 300).map { i =>
      R(if (i % 3 == 0) 1.0 else 0.0, (i % 17) / 17.0, (i % 5) / 5.0)
    }
    val d1 = df("y DOUBLE, x1 DOUBLE, x2 DOUBLE", rows)
    val d2 = df("y DOUBLE, x1 DOUBLE, x2 DOUBLE", rows).repartition(7)
    val r1 = Glm.logisticIrls(d1, "y", "x1", "x2").collect()(0)
    val r2 = Glm.logisticIrls(d2, "y", "x1", "x2").collect()(0)
    assert(r1 == r2)
  }

  test("huberIrls: outlier is downweighted toward the clean-line fit") {
    // 20 points on y = 2x + 1 plus one gross outlier; OLS is dragged,
    // Huber must land within 0.05 of the true slope
    val rows = (1 to 20).map(i => R(2.0 * i / 10.0 + 1.0, i / 10.0)) :+
      R(100.0, 1.0)
    val d = df("y DOUBLE, x DOUBLE", rows)
    val b = graft.ml.Glm.huberIrls(d, "y", "x", c = 1.5, iters = 3).collect()(0)
    assert(b.getLong(0) == 21L)
    assert(math.abs(b.getDouble(2) - 2.0) < 0.05,
      s"slope ${b.getDouble(2)} not robust to the outlier")
  }

  test("huberIrls: clean data reproduces the exact OLS line") {
    val d = df("y DOUBLE, x DOUBLE",
      (0 to 10).map(i => R(3.0 * i - 4.0, i.toDouble)))
    val b = graft.ml.Glm.huberIrls(d, "y", "x").collect()(0)
    assert(b.getDouble(1) == -4.0 && b.getDouble(2) == 3.0)
  }

  test("logisticIrls: one step from beta=0 is the closed-form Newton step") {
    // at beta=0: p=0.5, w=0.25 for every row — the step is the weighted
    // least-squares solve with constant weights, checkable by hand on a
    // tiny system
    val d = df("y DOUBLE, x1 DOUBLE, x2 DOUBLE", Seq(
      R(1.0, 1.0, 0.0), R(0.0, 0.0, 1.0), R(1.0, 1.0, 1.0), R(0.0, 0.0, 0.0)))
    val b = Glm.logisticIrls(d, "y", "x1", "x2", iters = 1).collect()(0)
    // A = 0.25*[[4,2,2],[2,2,1],[2,1,2]], g = [0, 1, 0]
    // solve A d = g: d = [-2, 4, 0]
    assert(b.getDouble(1) == -2.0 && b.getDouble(2) == 4.0 && b.getDouble(3) == 0.0)
  }
}
