package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.RT

/** Streaming conformal monitoring: the maintained residual-count state
  * must yield EXACTLY the conformal threshold a batch computation over
  * the union of calibration batches produces (same quantization, same
  * k = ⌈(1−α)(n+1)⌉ selection), and the serve loop must flag exactly
  * the rows above it.
  */
class ConformalStreamSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"), name)
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f.getAbsolutePath
  }

  test("maintained quantile == batch conformal quantile; alerts flag exactly the exceeders") {
    import spark.implicits._
    // three calibration batches, two groups, deterministic residuals
    val mk = (lo: Int, hi: Int) => (lo until hi).map { i =>
      (1L + i % 2, math.abs(math.sin(i * 1.7)) * 3.0)
    }
    val batches = Seq(mk(0, 50), mk(50, 80), mk(80, 130))

    val srcDir = Files.createTempDirectory("graft_conf_src").toString
    batches.foreach { b =>
      b.toDF("g", "resid").coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100)
    }
    val statePath = tmp("graft_conf_state")
    val schema = StructType(Seq(StructField("g", LongType),
      StructField("resid", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch(RT.residualFoldBatch(statePath, "g", "resid"))
      .option("checkpointLocation", tmp("graft_conf_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val alpha = 0.1
    val got = RT.maintainedQuantile(spark, statePath, alpha)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // driver-side batch computation over the union, same quantization
    val all = batches.flatten
    val expected = all.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(r => math.floor(r._2 * RT.residQ).toLong).sorted
      val n = sorted.length
      val k = math.min(math.ceil((1.0 - alpha) * (n + 1)).toLong, n.toLong)
      g -> ((n.toLong, sorted(k.toInt - 1) / RT.residQ))
    }
    assert(got == expected, s"got $got\nexpected $expected")

    // serve: rows strictly above the group threshold alert; ties do not.
    // Row 14 quantizes EXACTLY to the threshold bucket rb (resid =
    // (rb+0.5)/residQ → floor = rb) while q_hat = rb/residQ can round-trip
    // to rb−1 — the bucket-vs-bucket comparison must still treat it as a
    // tie, not an exceedance (the floor(q_hat·residQ) re-derivation bug).
    val rb1 = RT.maintainedQuantile(spark, statePath, alpha)
      .where(col("g") === 1L).collect().head.getLong(3)
    val serveRows = Seq((1L, 10L, got(1L)._2 + 0.5), (1L, 11L, got(1L)._2),
      (2L, 12L, 0.0), (3L, 13L, 99.0), // group 3 has no calibration
      (1L, 14L, (rb1 + 0.5) / RT.residQ))
    val outPath = tmp("graft_conf_alerts")
    RT.conformalAlertBatch(statePath, "g", "resid", alpha, outPath)(
      serveRows.toDF("g", "id", "resid"), 0L)
    val alerts = spark.read.parquet(outPath).collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[Any]("alert")).map(_.asInstanceOf[Boolean]))).toMap
    assert(alerts(10L).contains(true), "exceeder not flagged")
    assert(alerts(11L).contains(false), "a tie at the threshold must not alert")
    assert(alerts(12L).contains(false))
    assert(alerts(13L).isEmpty, "uncalibrated group must be explicitly unscoreable")
    assert(alerts(14L).contains(false),
      "a residual in exactly the threshold bucket must not alert")

    // replaying the same serve batchId is a no-op
    RT.conformalAlertBatch(statePath, "g", "resid", alpha, outPath)(
      serveRows.toDF("g", "id", "resid"), 0L)
    assert(spark.read.parquet(outPath).count() == 5, "replay duplicated alerts")

    // replaying an applied calibration batch is a no-op too
    val before = spark.read.parquet(s"$statePath/v2").collect().toSet
    RT.residualFoldBatch(statePath, "g", "resid")(
      batches.last.toDF("g", "resid"), 2L)
    assert(spark.read.parquet(s"$statePath/v2").collect().toSet == before)
  }
}
