package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class CoreSpec extends SparkSpec {

  test("readAny dispatches csv vs parquet on suffix, inferring csv schema") {
    val dir = Files.createTempDirectory("graft_core").toString
    val d = df("k INT, v DOUBLE", Seq(R(1, 1.5), R(2, 2.5)))
    d.write.option("header", "true").csv(s"$dir/c.csv")
    d.write.parquet(s"$dir/p.parquet")
    val csv = Core.readAny(spark, s"$dir/c.csv")
    assert(csv.schema("k").dataType.typeName == "integer") // inferred
    assert(csv.count() == 2)
    assert(Core.readAny(spark, s"$dir/p.parquet").count() == 2)
  }

  test("registerAll exposes tables to SQL; UT( macro rewrites in query()") {
    Core.registerAll(spark, "/root/testdata/sf0.001", Seq("events"))
    val out = Core.query(spark,
      "SELECT COUNT(*) AS n FROM events WHERE UT(ts) > 0").collect().head
    assert(out.getLong(0) == 1000)
  }

  test("collectGuarded refuses oversized results and returns small ones") {
    val small = df("v INT", (1 to 10).map(R(_)))
    assert(Core.collectGuarded(small).get.length == 10)
    assert(Core.collectGuarded(small, maxBytes = 1).isEmpty)
  }

  test("writeResult produces gzip csv and parquet sinks") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val d = df("k INT, v DOUBLE", Seq(R(1, 1.5)))
    Core.writeResult(d, s"$dir/out.csv.gz")
    Core.writeResult(d, s"$dir/out.parquet")
    assert(spark.read.option("header", "true").csv(s"$dir/out.csv.gz").count() == 1)
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 1)
  }

  test("loadConfig parses nested keys and interpolates ${VAR}") {
    val p = Files.createTempDirectory("graft_cfg").resolve("c.yml")
    Files.writeString(p,
      """# comment
        |NO_DATA_FILL: -9999
        |RADAR_RETRIEVAL:
        |  MAX_NB_SLURM_JOBS: 100
        |  OUTPUT: ${GRAFT_TEST_OUT}/radar   # trailing comment
        |TOP: plain
        |""".stripMargin)
    val cfg = Core.loadConfig(p.toString, Map("GRAFT_TEST_OUT" -> "/data"))
    assert(cfg("NO_DATA_FILL") == "-9999")
    assert(cfg("RADAR_RETRIEVAL.MAX_NB_SLURM_JOBS") == "100")
    assert(cfg("RADAR_RETRIEVAL.OUTPUT") == "/data/radar")
    assert(cfg("TOP") == "plain")
  }

  test("configEquivalent ignores job-control keys and keys outside the filter") {
    val a = Map("NO_DATA_FILL" -> "-9999",
      "RADAR_RETRIEVAL.MAX_NB_SLURM_JOBS" -> "100",
      "RADAR_RETRIEVAL.TMP_FOLDER" -> "/tmp/a",
      "SNR_THRESHOLD" -> "3")
    val sameData = a + ("RADAR_RETRIEVAL.MAX_NB_SLURM_JOBS" -> "5") +
      ("RADAR_RETRIEVAL.TMP_FOLDER" -> "/scratch")
    assert(Core.configEquivalent(a, sameData)) // job-control diffs don't matter
    val diffData = a + ("SNR_THRESHOLD" -> "5")
    assert(!Core.configEquivalent(a, diffData))
    // key missing on one side is a data difference...
    assert(!Core.configEquivalent(a, a - "SNR_THRESHOLD"))
    // ...unless the comparison is restricted to other keys
    assert(Core.configEquivalent(a, diffData, Some(Set("NO_DATA_FILL"))))
  }

  test("approx_count_distinct sketch lands within 5% of exact at 100k") {
    val d = Core.table(spark, "/root/testdata/sf0.001", "events")
    val row = d.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect().head
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("table() converts the nanos-long events ts back to TimestampType") {
    val e = Core.table(spark, "/root/testdata/sf0.001", "events")
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.filter(col("ts").isNull).count() == 0)
  }
}
