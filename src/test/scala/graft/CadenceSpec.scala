package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Phys
import graft.operators.Agg
import graft.streaming.RT

/** The reference maintains a full copy-paste 5-minute variant of its 10-min
  * pipeline (reference: rainforest/database_5min/, ~2,600 LoC duplicated from
  * database_10min with the cadence constants changed). In this engine the
  * cadence is a VALUE — [[Phys.floorToCadence]]'s step, the slot key fed to
  * [[Agg.aggregateMulti]], [[RT.windowAgg]]'s window string — so the SAME
  * code runs both cadences with zero change. This spec is the golden proof:
  * the identical call chain wired at 5 min (a) produces 300 s-aligned slots,
  * (b) refines exactly to the 10-min run (pairs of 5-min slots roll up to
  * the 10-min totals), and (c) the streaming path agrees with the batch path
  * on the same cadence parameter.
  */
class CadenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The 10-min pipeline's slot+aggregate chain, cadence as the ONLY knob:
    * F14 floor → A4 multi-op aggregate (sum + mean codes).
    */
  private def pipeline(stepS: Long) = {
    val slotted = Core.table(spark, dir, "events").select(
      col("event_type"),
      Phys.floorToCadence(unix_timestamp(col("ts")), stepS).as("slot"),
      col("value"))
    Agg.aggregateMulti(slotted, Seq("event_type", "slot"),
      Seq(("value", 2), ("value", 0)))
  }

  test("batch cadence: the 10-min chain re-parameterizes to 5 min, slots refine exactly") {
    val five = pipeline(300)
    val ten = pipeline(600)
    val fiveRows = five.collect()
    // (a) every 5-min slot is 300 s-aligned, and the run is a strict
    // refinement: at least as many slots as the 10-min run
    assert(fiveRows.forall(_.getAs[Long]("slot") % 300 == 0))
    assert(fiveRows.length >= ten.count())
    // (b) rolling the 5-min sums up to their containing 10-min slot
    // reproduces the 10-min sums bit-for-bit-ish (sum of doubles regrouped:
    // compare at 1e-6, the suite's float tolerance)
    val rolled = five
      .groupBy(col("event_type"), (col("slot") - col("slot") % 600).as("slot"))
      .agg(sum(col("value_sum")).as("value_sum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val tenMap = ten.collect()
      .map(r => (r.getString(0), r.getAs[Long]("slot")) -> r.getDouble(r.fieldIndex("value_sum")))
      .toMap
    assert(rolled.keySet == tenMap.keySet)
    rolled.foreach { case (k, v) => assert(math.abs(v - tenMap(k)) < 1e-6) }
  }

  test("streaming cadence: R1 windowAgg at 5 min matches the batch 5-min slots") {
    // file source needs a directory; stage the real events file into one
    val stageDir = Files.createTempDirectory("graft_cadence_src")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      stageDir.resolve("part-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(stageDir.toString).schema
    // the SAME windowAgg the 10-min path uses — only the window string moves
    val stream = Core.normalizeNanosTs( // nanos-long → ts (no-op on µs data)
      RT.fileStream(spark, stageDir.toString, schema))
    val q = RT.windowAgg(stream, "event_type", "ts", "value",
        window_ = "5 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("cadence5")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("cadence5")
        .select(col("event_type"), unix_timestamp(col("window.start")).as("slot"),
                col("n"), col("sum_v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      // streamed slot starts are 300 s-aligned and match the batch floor
      assert(streamed.keySet.forall(_._2 % 300 == 0))
      val batch = Core.table(spark, dir, "events")
        .groupBy(col("event_type"),
          Phys.floorToCadence(unix_timestamp(col("ts")), 300).as("slot"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, (n, s)) =>
        assert(n == batch(k)._1)
        assert(math.abs(s - batch(k)._2) < 1e-6)
      }
    } finally q.stop()
  }
}
