package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.ArrayDot

/** The native [[graft.plans.ArrayDot]] expression must be a DROP-IN for the
  * `aggregate(zip_with(...))` higher-order fold it replaced: bit-identical
  * doubles (the DuckDB oracle mirrors encode that exact association order)
  * and identical NULL semantics — NULL array, mismatched lengths (zip_with
  * pads with nulls), or a NULL element all yield NULL.
  */
class ArrayDotSpec extends SparkSpec {

  private def hofDot(a: String, b: String): Column =
    aggregate(
      zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the HOF fold on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      R(Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val d = df("a ARRAY<FLOAT>, b ARRAY<FLOAT>", rows)
    val out = d.select(ArrayDot.arrayDot(col("a"), col("b")).as("nat"),
      hofDot("a", "b").as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("NULL semantics match zip_with/aggregate exactly") {
    val d = df("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", Seq(
      R(null, Seq(1.0)),                      // null input array
      R(Seq(1.0, 2.0), Seq(1.0)),             // length mismatch
      R(Seq(1.0, null), Seq(1.0, 2.0)),       // null element
      R(Seq(1.5, 2.0), Seq(2.0, -1.0))))      // plain: 3 - 2 = 1
    val out = d.select(ArrayDot.arrayDot(col("a"), col("b")).as("nat"),
      hofDot("a", "b").as("hof")).collect()
    out.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1), r.toString))
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && out(2).isNullAt(0))
    assert(out(3).getDouble(0) == 1.0)
  }

  test("mixed float/double element types (the IVF probe shape)") {
    val d = df("qv ARRAY<FLOAT>, cvec ARRAY<DOUBLE>", Seq(
      R(Seq(1.0f, 2.0f, -0.5f), Seq(2.0, 0.25, 4.0))))
    val r = d.select(ArrayDot.arrayDot(col("qv"), col("cvec")).as("nat"),
      hofDot("qv", "cvec").as("hof")).collect()(0)
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 0.5)
  }

  test("stays inside whole-stage codegen") {
    // range-backed input (a literal LocalRelation constant-folds the whole
    // projection away), arrays built with array() — a transform() HOF here
    // would itself knock the Project out of codegen and mask the result.
    // Codegen'd operators print with the `*(stageId)` prefix.
    val d = spark.range(0, 100).selectExpr(
      "array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT)) AS a",
      "array(CAST(id AS FLOAT), CAST(id - 1 AS FLOAT)) AS b")
    val q = d.select(ArrayDot.arrayDot(col("a"), col("b")).as("dot"))
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(q.count() == 100)
  }

  test("non-float/double element arrays are rejected at analysis time") {
    // the kernels read via getFloat/getDouble; an int array through
    // getDouble would read wrong strides SILENTLY — must fail in analysis
    val d = df("a ARRAY<INT>, b ARRAY<INT>", Seq(R(Seq(1, 2), Seq(3, 4))))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      d.select(ArrayDot.arrayDot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array_dot") ||
           e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
  }

  test("usable as a SQL function (the GraftExtensions registration shape)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => plans.ArrayDot(exprs.head, exprs(1)), "scala_udf")
    val out = spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(out == 11.0)
  }
}
