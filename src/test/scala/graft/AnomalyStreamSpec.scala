package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.RT

/** Stream-static anomaly join ↔ batch parity: the same per-window anomaly
  * counts must come out of an AvailableNow replay of the events file as
  * out of the identical plan evaluated in batch (withWatermark is a no-op
  * on batch inputs, so RT.anomalyStream IS the batch reference when fed a
  * batch DataFrame).
  */
class AnomalyStreamSpec extends SparkSpec {

  private def baselineOf(df: org.apache.spark.sql.DataFrame) =
    graft.operators.Agg.madOutliers(
        df.select(col("event_type"), hour(col("ts")).as("hr"), col("value")),
        Seq("event_type", "hr"), "value", 3.5)
      .select(col("event_type"), col("hr"), col("med"), col("mad"))

  test("anomalyStream AvailableNow replay matches the batch evaluation") {
    val stageDir = Files.createTempDirectory("graft_anom_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      stageDir.resolve("part-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDf = Core.normalizeNanosTs(spark.read.parquet(stageDir.toString))
    val baseline = baselineOf(batchDf).cache()

    val expected = RT.anomalyStream(batchDf, baseline,
        "ts", "event_type", "value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(expected.nonEmpty && expected.values.exists(_._2 > 0),
      "parity base must contain real anomalies")

    val stream = Core.normalizeNanosTs(
      RT.fileStream(spark, stageDir.toString,
        spark.read.parquet(stageDir.toString).schema))
    val q = RT.anomalyStream(stream, baseline, "ts", "event_type", "value")
      .writeStream.format("memory").queryName("anom_counts")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val got = spark.table("anom_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("anomalyStream: events outside the baseline are counted, never flagged") {
    import java.sql.Timestamp
    val ev = df("ts TIMESTAMP, event_type STRING, value DOUBLE", Seq(
      R(new Timestamp(3600000L), "unseen", 1e9)))
    val baseline = df("event_type STRING, hr INT, med DOUBLE, mad DOUBLE",
      Seq(R("other", 1, 0.0, 1.0)))
    val out = RT.anomalyStream(ev, baseline, "ts", "event_type", "value")
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 1L && out(0).getLong(3) == 0L)
  }
}
