package graft

import org.apache.spark.sql.functions._

import graft.ml.Scores

class EvalMetricsSpec extends SparkSpec {

  test("aucRoc: perfect separation is 1.0, anti-separation 0.0, ties average") {
    val perfect = df("s DOUBLE, pos BOOLEAN", Seq(
      R(0.1, false), R(0.2, false), R(0.8, true), R(0.9, true)))
    assert(Scores.aucRoc(perfect, "s", "pos").collect()(0).getDouble(2) == 1.0)

    val anti = df("s DOUBLE, pos BOOLEAN", Seq(
      R(0.9, false), R(0.1, true)))
    assert(Scores.aucRoc(anti, "s", "pos").collect()(0).getDouble(2) == 0.0)

    // all scores tied: AUC must be exactly 0.5 whatever the labels
    val tied = df("s DOUBLE, pos BOOLEAN", Seq(
      R(0.5, false), R(0.5, true), R(0.5, false), R(0.5, true)))
    assert(Scores.aucRoc(tied, "s", "pos").collect()(0).getDouble(2) == 0.5)

    // hand case with a tie straddling the classes:
    // scores 0.1- 0.5- 0.5+ 0.9+ → ranks 1, 2.5, 2.5, 4
    // U = (2.5+4) - 2*3/2 = 3.5 → AUC = 3.5/4 = 0.875
    val mixed = df("s DOUBLE, pos BOOLEAN", Seq(
      R(0.1, false), R(0.5, false), R(0.5, true), R(0.9, true)))
    assert(Scores.aucRoc(mixed, "s", "pos").collect()(0).getDouble(2) == 0.875)
  }

  test("aucRoc: single-class input yields NULL") {
    val one = df("s DOUBLE, pos BOOLEAN", Seq(R(0.3, true), R(0.6, true)))
    assert(one.count() == 2)
    assert(Scores.aucRoc(one, "s", "pos").collect()(0).isNullAt(2))
  }

  test("calibrationEce: perfectly calibrated bins give 0; known gap computes") {
    // bin 2 (est .25): 4 rows, 1 pos → gap |0.25-0.25| = 0
    val cal = df("est DOUBLE, pos DOUBLE", Seq(
      R(0.25, 0.0), R(0.25, 0.0), R(0.25, 0.0), R(0.25, 1.0)))
    val r0 = Scores.calibrationEce(cal, "est", "pos").collect()(0)
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(3) == 0.0)
    // two bins: bin0 (est .05, rate 1.0 → gap .95, n 1),
    //           bin9 (est .95, rate 0.0 → gap .95, n 3)
    val off = df("est DOUBLE, pos DOUBLE", Seq(
      R(0.05, 1.0), R(0.95, 0.0), R(0.95, 0.0), R(0.95, 0.0)))
    val r1 = Scores.calibrationEce(off, "est", "pos").collect()(0)
    assert(r1.getLong(0) == 2L && r1.getDouble(2) == 0.95 && r1.getDouble(3) == 0.95)
  }

  test("gaussianNbConfusion: separable classes classify the held-out rows") {
    // class a ~ N(0, small), class b ~ N(100, small); ids %5==0 held out
    val rows = (1 to 50).map { i =>
      R(i.toLong, "a", (i % 7).toDouble / 10.0)
    } ++ (51 to 100).map { i =>
      R(i.toLong, "b", 100.0 + (i % 7).toDouble / 10.0)
    }
    val d = df("id BIGINT, label STRING, v DOUBLE", rows)
    val out = graft.llm.Classify.gaussianNbConfusion(d, "id", "label", "v",
        col("id") % 5 =!= 0)
      .orderBy(col("actual"), col("predicted")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "a", 10L), ("b", "b", 10L)))
  }

  test("gaussianNbConfusion: zero-variance class falls back to the prior") {
    val rows = (1 to 20).map(i => R(i.toLong, "const", 5.0)) ++
      (21 to 60).map(i => R(i.toLong, "wide", (i % 10).toDouble))
    val d = df("id BIGINT, label STRING, v DOUBLE", rows)
    // must not crash; the majority-prior class dominates degenerate scores
    val out = graft.llm.Classify.gaussianNbConfusion(d, "id", "label", "v",
      col("id") % 5 =!= 0).collect()
    assert(out.map(_.getLong(2)).sum == 12L) // 20% of 60 held out
  }
}
