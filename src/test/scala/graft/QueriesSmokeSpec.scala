package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run and produce rows on the smallest testdata
  * scale — the driver's smoke contract (rows > 0) plus schema sanity.
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name returns rows at sf0.001") {
      val out = fn(spark, sfDir)
      assert(out.columns.nonEmpty)
      assert(out.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
