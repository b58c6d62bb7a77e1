package graft.qpe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Phys

/** The composed QPE product pipeline — the reference's per-timestep compute
  * loop (qpe/qpe.py:329-762 `QPEProcessor.compute`) as one API a user
  * drives end to end:
  *
  *   distributed: polar gates → SNR mask (F4) → dB→linear (F1) → visibility
  *   correction (F3) → polar→Cartesian LUT broadcast join (J5) → weighted
  *   cell accumulation (A9);
  *   driver kernels on the collected 1.8 MB grid: 7×7 outlier removal (W4)
  *   → Gaussian σ=0.5 smoothing (W5) → validity-floor clamp (P11);
  *   sinks: ODIM grid (S12), palette GIF (S13), raw DN bytes.
  *
  * The split mirrors the reference exactly: everything per-gate/per-cell is
  * a single declarative Spark plan; the 2-D image kernels run on the
  * driver because a shuffle for a 1.8 MB array is pure overhead
  * (SURVEY §7.3).
  */
object Qpe {

  final case class Config(
      snrThreshold: Double = 3.0,
      minVisib: Double = 37.0,
      maxVisibCorr: Double = 2.0,
      outlierK: Int = 3,
      outlierZ: Double = 3.0,
      gaussianSigma: Double = 0.5,
      minValid: Double = 0.04, // MIN_RZC_VALID, constants.py:296
      nx: Int = Grid.NX,
      ny: Int = Grid.NY)

  /** Distributed stage: corrected linear reflectivity accumulated into
    * Cartesian cells. `polar` needs (sweep, az_idx, rng_idx, zh, noise,
    * visib, w); `lut` maps gates to (chx, chy).
    */
  def gridStage(polar: DataFrame, lut: DataFrame, cfg: Config = Config()): DataFrame = {
    val masked = Phys.snrMask(col("zh"), col("noise"), cfg.snrThreshold)
    val corrected = Phys.visibCorrect(
      Phys.dbToLin(masked), col("visib"), cfg.minVisib, cfg.maxVisibCorr)
    Grid.accumulate(
      Grid.lutJoin(polar, lut)
        .withColumn("v", corrected)
        .filter(col("v").isNotNull)
        .select(col("chx"), col("chy"), col("v"), col("w")))
  }

  /** Driver kernel stage: collected grid → outlier removal → smoothing →
    * validity clamp. Returns the final product grid.
    */
  def kernelStage(cells: DataFrame, cfg: Config = Config()): Array[Array[Double]] = {
    val grid = Grid.collectGrid(cells, cfg.nx, cfg.ny)
    val cleaned = Grid.outlierRemoval(grid, cfg.outlierK, cfg.outlierZ)
    val smoothed = Grid.gaussianSmooth(cleaned, cfg.gaussianSigma)
    smoothed.map(_.map(v => if (!v.isNaN && v < cfg.minValid) 0.0 else v))
  }

  /** Product writes for one timestep: ODIM grid + palette GIF (the
    * reference's DATA_FORMAT float→ODIM and DN→gif paths, qpe.py:276-308).
    * `quality` is the completeness string (streaming RT.quality or "ADLPW").
    * Returns the written paths.
    */
  def writeProducts(grid: Array[Array[Double]], outDir: String, tEnd: Long,
                    quality: String): Seq[String] = {
    val meta = Odim.chMetaFromQuality(tEnd, quality)
    val odimPath = s"$outDir/qpe_$tEnd.h5"
    val gifPath = s"$outDir/qpe_$tEnd.gif"
    Odim.write(odimPath, grid, meta)
    Gif.saveGif(gifPath, grid)
    Seq(odimPath, gifPath)
  }

  /** The full per-timestep compute: one call from polar gates to product
    * files, composing the three stages above.
    */
  def compute(polar: DataFrame, lut: DataFrame, outDir: String, tEnd: Long,
              quality: String = "ADLPW",
              cfg: Config = Config()): Array[Array[Double]] = {
    val grid = kernelStage(gridStage(polar, lut, cfg), cfg)
    writeProducts(grid, outDir, tEnd, quality)
    grid
  }
}
