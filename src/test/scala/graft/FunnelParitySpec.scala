package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Behavior
import graft.streaming.RT

/** Streaming funnel ↔ batch funnel parity (the CadenceSpec pattern): an
  * AvailableNow replay of the real events file must report, per step, the
  * same surviving-user count the batch operator computes.
  */
class FunnelParitySpec extends SparkSpec {

  test("funnelStream AvailableNow replay matches batch funnel step counts") {
    val steps = Seq("view", "click", "purchase")
    val stageDir = Files.createTempDirectory("graft_funnel_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      stageDir.resolve("part-000.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val batchDf = Core.normalizeNanosTs(spark.read.parquet(stageDir.toString))
    val expected = Behavior.funnel(batchDf, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    import spark.implicits._
    val stream = Core.normalizeNanosTs(
        RT.fileStream(spark, stageDir.toString, spark.read.parquet(stageDir.toString).schema))
      .select(col("user_id"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_type"))
      .as[RT.FunnelEvent]
    val q = RT.funnelStream(stream, steps)
      .writeStream.format("memory").queryName("funnel_progress")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val progress = spark.table("funnel_progress")
        .groupBy(col("user_id")).agg(max(col("step_reached")).as("sr"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      steps.indices.foreach { i =>
        val streamed = progress.count(_._2 >= i + 1).toLong
        assert(streamed == expected(i + 1),
          s"step ${i + 1}: streamed $streamed vs batch ${expected(i + 1)}")
      }
      assert(expected(1) > 0) // the parity is over a non-trivial funnel
    } finally q.stop()
  }
}
