package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Phys
import graft.qpe.Grid

/** SURVEY §3.3 end-to-end: the gridded QPE chain composed from library
  * pieces on synthetic polar fixtures — LUT broadcast join → weighted cell
  * accumulation (distributed) → driver grid → outlier removal → Gaussian
  * smoothing → Z-R disaggregation → DN sink round-trip.
  */
class QpeE2ESpec extends SparkSpec {

  test("full QPE grid pipeline over synthetic polar sweeps") {
    import spark.implicits._

    // polar gates: 2 sweeps × 8 az × 10 range bins with dB reflectivity
    val polar = (for {
      sweep <- Seq(1, 2)
      az <- 0 until 8
      rng <- 0 until 10
    } yield (sweep, az, rng, 25.0 + sweep + (az % 3), 90.0 + rng))
      .toDF("sweep", "az_idx", "rng_idx", "zh", "visib")

    // LUT: gate → Cartesian cell (a tiny synthetic mapping) + weight basis
    val lut = (for {
      sweep <- Seq(1, 2)
      az <- 0 until 8
      rng <- 0 until 10
    } yield (sweep, az, rng, az % 4, rng % 5, 1000.0 * sweep))
      .toDF("sweep", "az_idx", "rng_idx", "chx", "chy", "height")

    // J5 LUT join + F1/F3 weighting + A9 accumulate — one distributed plan
    val contribs = Grid.lutJoin(polar, lut)
      .withColumn("v", Phys.dbToLin(col("zh")))
      .withColumn("w",
        pow(lit(10.0), col("height") / 1000.0 * -0.5) * col("visib") / 100.0)
    val cells = Grid.accumulate(
      contribs.select(col("chx"), col("chy"), col("v"), col("w")))
    assert(cells.count() == 20) // 4 × 5 cells

    // driver-side kernels on the collected grid
    val grid = Grid.collectGrid(cells, 4, 5)
    assert(!grid(0)(0).isNaN)
    val cleaned = Grid.outlierRemoval(grid, k = 1, zmax = 3.0)
    val smoothed = Grid.gaussianSmooth(cleaned, 0.5)
    assert(smoothed.flatten.count(!_.isNaN) == 20)
    // smoothing preserves total mass direction: values stay positive, bounded
    val (lo, hi) = (grid.flatten.filter(!_.isNaN).min, grid.flatten.filter(!_.isNaN).max)
    assert(smoothed.flatten.filter(!_.isNaN).forall(v => v >= lo - 1e-9 && v <= hi + 1e-9))

    // F16/R7: disaggregation by Z-R proxy ratio (here ratio 2 everywhere)
    val rNow = Array.tabulate(4, 5)((_, _) => 2.0)
    val rMean = Array.tabulate(4, 5)((_, _) => 1.0)
    val disagg = Grid.disaggregate(smoothed, rNow, rMean)
    assert(math.abs(disagg(1)(1) / smoothed(1)(1) - 2.0) < 1e-12)

    // S13 sink: DN encode/decode round-trip preserves scale-quantized values
    val scale = (1 to 255).map(i => math.pow(10.0, i / 50.0)).toArray
    val path = Files.createTempDirectory("graft_qpe").resolve("q.raw").toString
    Grid.writeRawDN(disagg, scale, path)
    val back = Grid.readRawDN(path, 4, 5, scale)
    // quantization error bounded by one scale step (×10^0.02)
    for (x <- 0 until 4; y <- 0 until 5 if !disagg(x)(y).isNaN && disagg(x)(y) >= scale(0)) {
      assert(back(x)(y) <= disagg(x)(y) + 1e-9)
      assert(back(x)(y) * math.pow(10, 0.02) >= disagg(x)(y) - 1e-9)
    }
  }

  test("Qpe.compute: polar gates to ODIM + GIF product files in one call") {
    import spark.implicits._
    import graft.qpe.{Gif, Odim, Qpe}
    val polar = (for {
      sweep <- Seq(1, 2); az <- 0 until 8; rng <- 0 until 10
    } yield (sweep, az, rng, 25.0 + sweep + (az % 3), 2.0, 90.0 + rng, 1.0))
      .toDF("sweep", "az_idx", "rng_idx", "zh", "noise", "visib", "w")
    val lut = (for {
      sweep <- Seq(1, 2); az <- 0 until 8; rng <- 0 until 10
    } yield (sweep, az, rng, az % 4, rng % 5))
      .toDF("sweep", "az_idx", "rng_idx", "chx", "chy")
    val outDir = Files.createTempDirectory("graft_qpe_prod").toString
    val cfg = Qpe.Config(nx = 4, ny = 5, outlierK = 1)
    val grid = Qpe.compute(polar, lut, outDir, tEnd = 1700000300L,
      quality = "AD-PW", cfg = cfg)
    assert(grid.flatten.count(v => !v.isNaN && v > 0) == 20)
    // both product files exist and carry the degraded quality / the grid
    val (odimGrid, fields) = Odim.read(s"$outDir/qpe_1700000300.h5")
    assert(fields("radar") == "AD-PW")
    assert(math.abs(odimGrid(1)(1) - BigDecimal(grid(1)(1)).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-4)
    val gifGrid = Gif.readGif(s"$outDir/qpe_1700000300.gif")
    // GIF quantization: within one DN step of the product value
    assert(gifGrid(1)(1) >= grid(1)(1) - 1e-9)
    // one DN step in the power-law domain = (10^(1/20))^(2/3) = 10^(1/30)
    assert(gifGrid(1)(1) / grid(1)(1) < math.pow(10.0, 1.0 / 30.0) + 1e-9)
  }

  test("Database wrapper: addTable → info → UT query → display path") {
    val db = new Database(spark)
    db.addTable("ev", "/root/testdata/sf0.001/events.parquet")
    assert(db.tableNames == Seq("ev"))
    val info = db.info("ev")
    assert(info.rows == 1000 && info.cols == 6)
    assert(info.tsMin.exists(_ > 0) && info.tsMax.exists(_ > info.tsMin.get))
    val n = db.query("SELECT COUNT(*) AS n FROM ev WHERE UT(ts) > 0")
      .collect().head.getLong(0)
    assert(n == 1000)
    val sink = Files.createTempDirectory("graft_db").resolve("out.csv.gz").toString
    db.queryTo("SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1", sink)
    assert(spark.read.option("header", "true").csv(sink).count() == 5)
  }
}
