package graft

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.qpe.{Odim, Qpe}
import graft.streaming.RT

/** The composed streaming QPE daemon (reference qpe_rt_daemon.py:466
  * `process_all`): per-radar gate files LAND in a spool directory (R1 file
  * source, one file per micro-batch), the completeness state machine
  * (R2/R3) emits each 5-min slot as soon as all five radars arrived — or
  * degraded on event-time timeout when one never does — and every emitted
  * slot triggers the batch QPE compute (gridStage → kernelStage →
  * ODIM/GIF products) over that slot's spooled gates, with the streaming
  * quality string driving the product metadata. R4 (pairWithPrevious)
  * then carries each cell's previous-slot value across micro-batches for
  * the disaggregation path.
  *
  * Parity oracle: the SAME slots computed directly in batch from the same
  * spool must produce BIT-IDENTICAL grids, and the streamed prev-pairing
  * must equal a per-cell slot lag over those batch grids. The individual
  * pieces are spec'd elsewhere (MlStreamGridSpec, QpeE2ESpec); this is
  * the missing composition test.
  */
class StreamingQpeE2ESpec extends SparkSpec {

  private val cfg = Qpe.Config(nx = 4, ny = 5, outlierK = 1)

  test("daemon composition: streaming grids == batch grids over 3 slots incl. a degraded emit") {
    import spark.implicits._
    val spool = Files.createTempDirectory("graft_qpe_spool").toString
    val prodDir = Files.createTempDirectory("graft_qpe_prod").toString

    // three 5-min slots; slot s1 never receives radar W → degraded
    val s0 = 1000000L; val s1 = 1300000L; val s2 = 1600000L
    val slots = Seq(s0, s1, s2)
    def gates(slot: Long, radars: Seq[String]) = for {
      (r, ri) <- radars.zipWithIndex
      sweep <- Seq(1, 2)
      az <- 0 until 4
      rng <- 0 until 5
    } yield (slot, r, sweep, az, rng,
      20.0 + ri * 2 + (slot - s0) / 100000 + (az + rng) % 4,
      1.0, 95.0, 1.0, slot)
    val files = Seq(
      gates(s0, RT.AllSources),
      gates(s1, RT.AllSources.filterNot(_ == "W")),
      gates(s2, RT.AllSources),
      // two watermark-flush arrivals for a dummy slot that never emits:
      // they advance the watermark past s1's deadline so its event-time
      // timeout fires (the daemon's "later files keep the clock moving")
      Seq((9999999999L, "A", 1, 0, 0, 20.0, 1.0, 95.0, 1.0, 2000000L)),
      Seq((9999999999L, "A", 1, 0, 0, 20.0, 1.0, 95.0, 1.0, 2100000L)))
    files.foreach { b =>
      b.toDF("slot", "radar", "sweep", "az_idx", "rng_idx", "zh",
          "noise", "visib", "w", "eventTimeMs")
        .coalesce(1).write.mode("append").parquet(spool)
      Thread.sleep(1100) // distinct mtimes: oldest-first replay order
    }
    val lut = (for { sweep <- Seq(1, 2); az <- 0 until 4; rng <- 0 until 5 }
      yield (sweep, az, rng, az, rng))
      .toDF("sweep", "az_idx", "rng_idx", "chx", "chy")

    val schema = StructType(Seq(
      StructField("slot", LongType), StructField("radar", StringType),
      StructField("sweep", IntegerType), StructField("az_idx", IntegerType),
      StructField("rng_idx", IntegerType), StructField("zh", DoubleType),
      StructField("noise", DoubleType), StructField("visib", DoubleType),
      StructField("w", DoubleType), StructField("eventTimeMs", LongType)))
    val stream = RT.fileStream(spark, spool, schema,
        Map("maxFilesPerTrigger" -> "1")) // one landed file per micro-batch
      .select(col("slot"), col("radar").as("source"), col("eventTimeMs"))
      .as[RT.SourceArrival]

    def computeSlot(slot: Long): Array[Array[Double]] = {
      val polar = spark.read.schema(schema).parquet(spool)
        .filter(col("slot") === slot)
        .select(col("sweep"), col("az_idx"), col("rng_idx"), col("zh"),
          col("noise"), col("visib"), col("w"))
      Qpe.kernelStage(Qpe.gridStage(polar, lut, cfg), cfg)
    }

    val results =
      new scala.collection.concurrent.TrieMap[Long, (String, Array[Array[Double]])]()
    val q = RT.completenessStream(stream, timeoutMs = 60000)
      .writeStream.outputMode("append")
      .foreachBatch { (df: Dataset[RT.SlotResult], _: Long) =>
        df.collect().foreach { sr =>
          val grid = computeSlot(sr.slot)
          Qpe.writeProducts(grid, prodDir, sr.slot / 1000, sr.quality)
          results.put(sr.slot, (sr.quality, grid))
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // every real slot emitted, with the right quality strings
    assert(results.keySet == slots.toSet, s"emitted ${results.keySet}")
    assert(results(s0)._1 == "ADLPW" && results(s2)._1 == "ADLPW")
    assert(results(s1)._1 == "ADLP-", s"degraded slot got ${results(s1)._1}")

    // parity 1: streaming-triggered grids are BIT-identical to the batch
    // compute over the same spool (degraded slot included: only the four
    // present radars contribute)
    slots.foreach { slot =>
      val batch = computeSlot(slot)
      val streamed = results(slot)._2
      for (x <- 0 until cfg.nx; y <- 0 until cfg.ny)
        assert(java.lang.Double.compare(streamed(x)(y), batch(x)(y)) == 0,
          s"slot $slot cell ($x,$y): ${streamed(x)(y)} vs ${batch(x)(y)}")
    }
    // the missing radar genuinely changes the product: slot s0 recomputed
    // WITHOUT radar W's gates must differ from the streamed full-radar s0
    // grid (the degraded path is not a no-op on the numbers)
    val s0NoW = gates(s0, RT.AllSources.filterNot(_ == "W"))
      .toDF("slot", "radar", "sweep", "az_idx", "rng_idx", "zh",
        "noise", "visib", "w", "eventTimeMs")
      .select(col("sweep"), col("az_idx"), col("rng_idx"), col("zh"),
        col("noise"), col("visib"), col("w"))
    val gNoW = Qpe.kernelStage(Qpe.gridStage(s0NoW, lut, cfg), cfg)
    assert((0 until cfg.nx).exists(x => (0 until cfg.ny).exists(y =>
      java.lang.Double.compare(gNoW(x)(y), results(s0)._2(x)(y)) != 0)),
      "removing a radar's gates must change the computed grid")

    // parity 2: the product sink carries the streaming quality string
    val (_, fields) = Odim.read(s"$prodDir/qpe_${s1 / 1000}.h5")
    assert(fields("radar") == "ADLP-")

    // parity 3 (R4): pairWithPrevious over the per-cell grid stream equals
    // a per-cell slot lag over the batch grids
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val cellsIn = MemoryStream[RT.KeyedValue]
    val pq = RT.pairWithPrevious(cellsIn.toDS())
      .writeStream.format("memory").queryName("qpe_prev")
      .outputMode("append").start()
    try {
      slots.foreach { slot =>
        val g = results(slot)._2
        cellsIn.addData((for (x <- 0 until cfg.nx; y <- 0 until cfg.ny)
          yield RT.KeyedValue(s"$x:$y", slot, g(x)(y))): _*)
        pq.processAllAvailable()
      }
      val paired = spark.table("qpe_prev").as[RT.Paired].collect()
        .map(p => (p.key, p.slot) -> p.prevValue).toMap
      for (x <- 0 until cfg.nx; y <- 0 until cfg.ny; i <- slots.indices) {
        val expectPrev = if (i == 0) None
          else Some(results(slots(i - 1))._2(x)(y))
        assert(paired((s"$x:$y", slots(i))) == expectPrev,
          s"cell $x:$y slot ${slots(i)}")
      }
    } finally pq.stop()
  }
}
