package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** The two round-10 bounded ranking aggregators that replaced the last
  * pair-relation global windows (TopKStr for string identities,
  * BottomKPair for closest-pair rankings): exactness vs a driver-side
  * sort, tie-break order, and bit-identical results under different
  * partitionings (the partial-buffer admit/merge path must be
  * order-independent).
  */
class TopKAggregatorsSpec extends SparkSpec {

  test("TopKStr == sortBy(score DESC, id ASC).take(k), any partitioning") {
    import spark.implicits._
    // scores with heavy ties so the string tie-break is actually exercised
    val rows = (0 until 500).map(i => (s"p${500 - i}", (i % 7).toDouble))
    val expect = rows.sortBy { case (id, s) => (-s, id) }.take(10)
    val topk = udaf(new Aggregators.TopKStr(10))
    Seq(1, 4, 13).foreach { nPart =>
      val got = spark.createDataset(rows).repartition(nPart)
        .toDF("id", "score")
        .agg(topk(col("score"), col("id")).as("hits"))
        .select(posexplode(col("hits")))
        .select(col("col.id"), col("col.score"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == expect, s"nPart=$nPart")
    }
  }

  test("BottomKPair == sortBy(score ASC, a, b).take(k), any partitioning") {
    import spark.implicits._
    val rows = (0 until 500).map(i =>
      ((i % 5).toDouble, (i % 11).toLong, i.toLong))
    val expect = rows.sortBy { case (s, a, b) => (s, a, b) }.take(12)
    val botk = udaf(new Aggregators.BottomKPair(12))
    Seq(1, 4, 13).foreach { nPart =>
      val got = spark.createDataset(rows).repartition(nPart)
        .toDF("score", "a", "b")
        .agg(botk(col("score"), col("a"), col("b")).as("hits"))
        .select(posexplode(col("hits")))
        .select(col("col.score"), col("col.a"), col("col.b"))
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect, s"nPart=$nPart")
    }
  }

  test("fewer candidates than k returns all of them, ranked") {
    import spark.implicits._
    val topk = udaf(new Aggregators.TopKStr(50))
    val got = spark.createDataset(Seq(("b", 1.0), ("a", 1.0), ("c", 2.0)))
      .toDF("id", "score")
      .agg(topk(col("score"), col("id")).as("hits"))
      .select(posexplode(col("hits"))).select(col("col.id"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("c", "a", "b"))
  }
}
