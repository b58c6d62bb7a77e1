package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.RT
import graft.typed.TypedOps

class TypedStreamE2ESpec extends SparkSpec {

  test("typed pricing summary equals the untyped DataFrame aggregation") {
    val dir = "/root/testdata/sf0.001"
    val typed = TypedOps.pricingSummary(TypedOps.lineitems(spark, dir))
      .collect().map(r => ((r.flag, r.status), (r.sumQty, r.n))).toMap
    val untyped = Core.table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getLong(3)))).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, (q, n)) =>
      assert(math.abs(q - untyped(k)._1) < 1e-6)
      assert(n == untyped(k)._2)
    }
  }

  test("file-source streaming E2E: AvailableNow over real parquet matches batch") {
    // file source needs a directory; stage the real events file into one
    val stageDir = Files.createTempDirectory("graft_stream_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      stageDir.resolve("part-000.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val batchDf = spark.read.parquet(stageDir.toString)
    val schema = batchDf.schema
    val stream = Core.normalizeNanosTs( // nanos-long → ts (no-op on µs data)
      RT.fileStream(spark, stageDir.toString, schema))
    val counted = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = counted.writeStream.format("memory").queryName("e2e_days")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("e2e_days")
        .agg(sum("n")).collect().head.getLong(0)
      assert(streamed == 1000) // all sf0.001 events flowed through
      // per-type totals equal the batch computation
      val sTypes = spark.table("e2e_days").groupBy("event_type")
        .agg(sum("n").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bTypes = Core.table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sTypes == bTypes)
    } finally q.stop()
  }
}
