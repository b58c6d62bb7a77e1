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

  test("funnelStream state carries across micro-batches (time-split files)") {
    val steps = Seq("view", "click", "purchase")
    val src = Core.normalizeNanosTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    // split by event time so per-user order across batches follows file
    // order (the stream's documented in-order delivery contract)
    val cut = src.agg(org.apache.spark.sql.functions.expr(
      "percentile_approx(CAST(ts AS DOUBLE), 0.5)")).head.getDouble(0)
    val stageDir = Files.createTempDirectory("graft_funnel_2b")
    src.filter(col("ts").cast("double") <= cut).coalesce(1)
      .write.parquet(stageDir.resolve("b0").toString)
    src.filter(col("ts").cast("double") > cut).coalesce(1)
      .write.parquet(stageDir.resolve("b1").toString)
    val f0 = Files.list(stageDir.resolve("b0")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val f1 = Files.list(stageDir.resolve("b1")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val inDir = Files.createTempDirectory("graft_funnel_2b_in")
    // the file source orders by MODIFICATION TIME — set them explicitly a
    // second apart so the early-time file really forms the first batch
    Files.copy(Paths.get(f0), inDir.resolve("a-000.parquet"))
    Files.copy(Paths.get(f1), inDir.resolve("b-001.parquet"))
    Files.setLastModifiedTime(inDir.resolve("a-000.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    Files.setLastModifiedTime(inDir.resolve("b-001.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000001000L))

    val expected = Behavior.funnel(src, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    import spark.implicits._
    val stream = Core.normalizeNanosTs(
        spark.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", "1") // FORCE two micro-batches
          .parquet(inDir.toString))
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"),
        col("event_type"))
      .as[RT.FunnelEvent]
    val q = RT.funnelStream(stream, steps)
      .writeStream.format("memory").queryName("funnel_2b")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val progress = spark.table("funnel_2b")
        .groupBy(col("user_id")).agg(max(col("step_reached")).as("sr"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      steps.indices.foreach { i =>
        val streamed = progress.count(_._2 >= i + 1).toLong
        assert(streamed == expected(i + 1),
          s"step ${i + 1}: streamed $streamed vs batch ${expected(i + 1)}")
      }
    } finally q.stop()
  }
}
