package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.plans.ArrayCosine

/** The fused [[graft.plans.ArrayCosine]] must be a DROP-IN for the composed
  * `dot / (sqrt(norm2)·sqrt(norm2))` form (kept as
  * `Similarity.cosineComposed`): bit-identical doubles on every input, NULL
  * on zero-norm / NULL-array / length-mismatch / NULL-element inputs.
  */
class ArrayCosineSpec extends SparkSpec {

  test("bit-identical to the composed form on random float vectors") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      R(Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val d = df("a ARRAY<FLOAT>, b ARRAY<FLOAT>", rows)
    val out = d.select(
      ArrayCosine.arrayCosine(col("a"), col("b")).as("fused"),
      Similarity.cosineComposed("a", "b", 64).as("composed")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("NULL cases: zero-norm, null array, length mismatch, null element") {
    val d = df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", Seq(
      R(Seq(0.0, 0.0), Seq(1.0, 2.0)),        // zero-norm left
      R(null, Seq(1.0)),                      // null array
      R(Seq(1.0, 2.0), Seq(1.0)),             // length mismatch
      R(Seq(1.0, null), Seq(1.0, 2.0)),       // null element
      R(Seq(3.0, 4.0), Seq(3.0, 4.0))))       // identical: cosine 1.0
    val out = d.select(
      ArrayCosine.arrayCosine(col("a"), col("b")).as("fused"),
      Similarity.cosineComposed("a", "b", 2).as("composed")).collect()
    out.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1), r.toString))
    (0 to 3).foreach(i => assert(out(i).isNullAt(0), s"row $i"))
    assert(out(4).getDouble(0) == 1.0)
  }

  test("mixed float/double element types (the IVF probe shape)") {
    val d = df("qv ARRAY<FLOAT>, cvec ARRAY<DOUBLE>", Seq(
      R(Seq(3.0f, 4.0f), Seq(3.0, 4.0))))
    val r = d.select(ArrayCosine.arrayCosine(col("qv"), col("cvec")).as("c"))
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
  }

  test("stays inside whole-stage codegen") {
    val d = spark.range(0, 100).selectExpr(
      "array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT)) AS a",
      "array(CAST(id AS FLOAT), CAST(id - 1 AS FLOAT)) AS b")
    val q = d.select(ArrayCosine.arrayCosine(col("a"), col("b")).as("c"))
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(q.count() == 100)
  }
}
