package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.RT

/** Streaming CDC apply ↔ batch parity: an AvailableNow replay of the
  * events file (ops derived exactly as in the s16_cdc_apply gate) must
  * converge, key for key, to the batch operator's snapshot — including
  * delete tombstones.
  */
class CdcParitySpec extends SparkSpec {

  private def opOf = when(col("event_type") === "signup", lit("I"))
    .when(col("event_type") === "error", lit("D"))
    .otherwise(lit("U"))

  test("cdcStream AvailableNow replay converges to the batch snapshot") {
    val stageDir = Files.createTempDirectory("graft_cdc_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      stageDir.resolve("part-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDf = Core.normalizeNanosTs(spark.read.parquet(stageDir.toString))

    val expected = graft.operators.Relational.cdcApply(
        batchDf.withColumn("op", opOf), "user_id", "ts", "event_id", "op")
      .select(col("user_id"), col("op"), unix_micros(col("ts")).as("tsUs"),
        col("value"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(expected.nonEmpty)

    import spark.implicits._
    val stream = Core.normalizeNanosTs(
        RT.fileStream(spark, stageDir.toString,
          spark.read.parquet(stageDir.toString).schema))
      .select(col("user_id").as("key"), unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("opId"), opOf.as("op"), col("value"))
      .as[RT.CdcOp]
    val q = RT.cdcStream(stream)
      .writeStream.format("memory").queryName("cdc_current")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      // last emit per key = the row with the max (tsUs, opId) kept state
      val got = spark.table("cdc_current")
        .groupBy(col("key"))
        .agg(max(struct(col("tsUs"), col("op"), col("value"),
          col("deleted"))).as("s"))
        .select(col("key"), col("s.op"), col("s.tsUs"), col("s.value"),
          col("s.deleted"))
        .collect()
      val live = got.filter(!_.getBoolean(4))
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(live == expected)
      // tombstoned keys are exactly the batch-dropped ones
      val dead = got.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
      assert(dead.nonEmpty && dead.intersect(expected.keySet).isEmpty)
    } finally q.stop()
  }

  test("cdcStream ignores ops older than the kept state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[RT.CdcOp]
    val q = RT.cdcStream(ms.toDS())
      .writeStream.format("memory").queryName("cdc_late")
      .outputMode("update").start()
    try {
      ms.addData(RT.CdcOp(1L, 100L, 2L, "U", 5.0))
      q.processAllAvailable()
      ms.addData(RT.CdcOp(1L, 50L, 1L, "I", 1.0)) // older — must not regress
      q.processAllAvailable()
      val rows = spark.table("cdc_late").collect()
      assert(rows.forall(r => r.getString(1) == "U" && r.getDouble(3) == 5.0))
    } finally q.stop()
  }
}
