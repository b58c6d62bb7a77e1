package graft

import org.apache.spark.sql.functions._

import graft.plans.{SearchSorted, UTMacroParser}

class ExtensionsSpec extends SparkSpec {

  test("SearchSorted expression: binary search matches the CASE-chain variant") {
    val bounds = Seq(0.0, 0.1, 0.4, 1.0, 5.0, 20.0, 100.0)
    val d = df("v DOUBLE", Seq(R(-1.0), R(0.0), R(0.25), R(3.0), R(150.0)))
    val native = d.select(SearchSorted.searchsorted(
        lit(bounds.toArray), col("v")).as("b")).collect().map(_.getInt(0))
    val chain = d.select(graft.functions.Phys.searchSorted(col("v"), bounds).as("b"))
      .collect().map(_.getInt(0))
    assert(native.toSeq == chain.toSeq)
    assert(native.toSeq == Seq(0, 1, 2, 4, 7))
  }

  test("SearchSorted registered as a SQL function") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "searchsorted", exprs => SearchSorted(exprs.head, exprs(1)), "scala_udf")
    val out = spark.sql(
      "SELECT searchsorted(array(0.0D, 1.0D, 5.0D), 2.5D) AS b").collect().head.getInt(0)
    assert(out == 2)
  }

  test("UTMacroParser rewrites UT( before delegating to the real parser") {
    val parser = new UTMacroParser(spark.sessionState.sqlParser)
    val plan = parser.parsePlan("SELECT UT(ts) FROM tbl")
    assert(plan.toString.toLowerCase.contains("unix_timestamp"))
    // identifiers untouched
    assert(parser.parseTableIdentifier("tbl").table == "tbl")
  }
}
