package graft

import org.apache.spark.sql.functions._

import graft.ml.BiasCorrection

/** Pins the r13 m3 optimization: [[BiasCorrection.isotonicFitted]] (the
  * analytic pooled-mean relation) must equal the MLlib isotonic model it
  * replaced, BIT-FOR-BIT, on every in-sample prediction — including
  * duplicate-feature runs, the one case where PAV actually pools.
  */
class IsotonicEquivSpec extends SparkSpec {

  private def assertPathsEqual(d: org.apache.spark.sql.DataFrame): Unit = {
    val model = BiasCorrection.fitIsotonic(d, "pred", "obs")
    val rel = BiasCorrection.isotonicFitted(d, "pred", "obs")
    import org.apache.spark.ml.feature.VectorAssembler
    val assembled = new VectorAssembler().setInputCols(Array("pred"))
      .setOutputCol("features")
      .transform(rel.select(col("pred")))
    val mlib = model.transform(assembled)
      .select(col("pred"), col("prediction"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val ours = rel.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == mlib.keySet)
    // exact equality, not tolerance: the m3 oracle hash-gates these values
    for ((p, f) <- ours)
      assert(f == mlib(p), s"pred=$p: relational $f != mlib ${mlib(p)}")
  }

  test("isotonicFitted == MLlib fit+transform on duplicate-feature runs") {
    // heavy pred duplication with integer labels — the bench feed's shape
    // (duplicate-pred runs pooled by mean; means exact in double)
    val rows = (1 to 120).map { i =>
      R((i % 10).toDouble / 4.0, (i % 37).toDouble)
    }
    assertPathsEqual(df("pred DOUBLE, obs DOUBLE", rows))
  }

  test("isotonicFitted == MLlib fit+transform on all-distinct preds") {
    val rows = (1 to 60).map(i => R(i * 0.37, (i * i % 23).toDouble))
    assertPathsEqual(df("pred DOUBLE, obs DOUBLE", rows))
  }

  test("isotonicFitted pooled means are monotone in pred") {
    val rows = (1 to 90).map(i => R((i % 9).toDouble, (i % 13).toDouble))
    val fit = BiasCorrection.isotonicFitted(
        df("pred DOUBLE, obs DOUBLE", rows), "pred", "obs")
      .orderBy(col("pred")).collect().map(_.getDouble(1))
    assert(fit.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }
}
