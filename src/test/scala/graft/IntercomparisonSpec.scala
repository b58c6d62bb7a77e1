package graft

import org.apache.spark.sql.functions._

import graft.ml.{Intercomparison, Scores}

/** M9: the intercomparison orchestration — score parity with
  * Scores.perfscores on identical slices, phase split at 2 °C, fold
  * averaging, hourly aggregation row group.
  */
class IntercomparisonSpec extends SparkSpec {

  test("skillScores reproduces perfscores logbias/scatter on the same slice") {
    import spark.implicits._
    val rows = (1 to 80).map(i => (i / 8.0 + 0.2, (i / 8.0 + 0.2) * 1.5 + (i % 3) * 0.1))
    val base = rows.toDF("ref", "est")
    val scored = base.select(lit("m").as("model"), lit("10min").as("agg"),
      lit("liquid").as("phase"), lit(0).as("fold"), col("est"), col("ref"))
    val mine = Intercomparison.skillScores(scored).collect()(0)
    val perf = Scores.perfscores(base.withColumn("g", lit("x")), "g", "est", "ref")
      .collect()(0)
    assert(mine.getAs[Double]("logbias_db") == perf.getAs[Double]("logbias_db"))
    assert(mine.getAs[Double]("scatter_db") == perf.getAs[Double]("scatter_db"))
    assert(mine.getAs[Long]("n") == perf.getAs[Long]("n"))
  }

  test("run: phase split at 2 °C, fold-averaged scores, reference product only") {
    import spark.implicits._
    // fold 0: est = 2·ref (logbias +10·log10 2); fold 1: est = ref/2 (−);
    // temp alternates around the 2 °C split within every fold
    val rows = for (f <- 0 until 2; i <- 1 to 60) yield
      (f, i / 5.0 + 0.2, (i / 5.0 + 0.2) * (if (f == 0) 2.0 else 0.5),
        if (i % 2 == 0) -3.0 else 5.0)
    val d = rows.toDF("fold", "ref", "prod", "temp")
    val out = Intercomparison.run(d, configs = Nil,
      refProducts = Map("P" -> "prod"), labelCol = "ref", tempCol = "temp",
      foldCol = "fold", k = 2)
    val got = out.collect()
    assert(got.length == 2) // one model × 10min × {solid, liquid}
    assert(got.map(_.getAs[String]("phase")).toSet == Set("solid", "liquid"))
    got.foreach { r =>
      // fold logbiases are ±10·log10(2): the fold mean cancels to 0
      assert(math.abs(r.getAs[Double]("logbias_db")) < 1e-5, r.toString)
      // est is an exact linear map of ref in every fold → corr 1
      assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-5, r.toString)
      assert(r.getAs[Long]("n") == 60)
    }
  }

  test("run with hourCol adds a 60min aggregation row group") {
    import spark.implicits._
    val rows = for (f <- 0 until 2; i <- 1 to 40) yield
      (f, i / 5.0 + 0.2, i / 4.0 + 0.1, 5.0, i % 5)
    val d = rows.toDF("fold", "ref", "prod", "temp", "hour")
    val out = Intercomparison.run(d, Nil, Map("P" -> "prod"),
      "ref", "temp", "fold", 2, hourCol = Some("hour"))
    val aggs = out.collect().map(r => r.getAs[String]("agg")).toSet
    assert(aggs == Set("10min", "60min"))
    // hourly sums: 5 hours × liquid only → n = 5 per fold, summed over folds
    val hourly = out.filter(col("agg") === "60min").collect()(0)
    assert(hourly.getAs[Long]("n") == 10)
  }
}
