package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.RT

/** Stream-stream join ↔ batch join parity: a watermarked AvailableNow
  * replay of the real events file, purchases joined to same-user clicks
  * within ±30 minutes, must produce exactly the rows the equivalent batch
  * theta-join produces.
  */
class StreamJoinSpec extends SparkSpec {

  test("streamJoinWithin AvailableNow replay matches the batch interval join") {
    val stageDir = Files.createTempDirectory("graft_ssj_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      stageDir.resolve("part-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val src = Core.normalizeNanosTs(spark.read.parquet(stageDir.toString))

    def sides(d: org.apache.spark.sql.DataFrame) = (
      d.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id")),
      d.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id")))

    val (bl, br) = sides(src)
    val expected = bl.join(
        br.select(col("user_id").as("u2"), col("ts").as("r_ts"),
          col("event_id").as("r_event_id")),
        col("user_id") === col("u2") &&
          col("r_ts") >= col("ts") - expr("INTERVAL 30 MINUTES") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("event_id"), col("r_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "parity over a non-trivial join")

    val stream = Core.normalizeNanosTs(
      RT.fileStream(spark, stageDir.toString,
        spark.read.parquet(stageDir.toString).schema))
    val (sl, sr) = sides(stream)
    val q = RT.streamJoinWithin(sl, sr, "user_id", "ts", "ts", "30 minutes")
      .select(col("event_id"), col("r_event_id"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("ssj_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == expected,
        s"stream ${streamed.size} rows vs batch ${expected.size}")
    } finally q.stop()
  }

  test("streamJoinWithin plan carries watermarks and a symmetric hash join") {
    val stageDir = Files.createTempDirectory("graft_ssj_plan")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      stageDir.resolve("part-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = Core.normalizeNanosTs(
      RT.fileStream(spark, stageDir.toString,
        spark.read.parquet(stageDir.toString).schema))
    val l = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val r = stream.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val joined = RT.streamJoinWithin(l, r, "user_id", "ts", "ts", "10 minutes")
    // the time-bound condition is what lets the streaming join evict state;
    // assert it survived analysis (EventTimeWatermark on both inputs)
    val analyzed = joined.queryExecution.analyzed.toString
    assert("EventTimeWatermark".r.findAllIn(analyzed).size == 2, analyzed)
    assert(joined.isStreaming)
  }
}
