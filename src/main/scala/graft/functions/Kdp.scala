package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Windows

/** W6: KDP estimation by the moving least-squares method the reference uses
  * (radarprocessing.py:307-354: pyart smooth_phidp_single_window +
  * kdp_leastsquare_single_window) — smooth ΨDP with a centered moving
  * average, then KDP = ½ · dΦDP/dr from a windowed least-squares slope.
  * Two window passes over the same (ray, range) sort — Catalyst reuses the
  * single per-ray sort for both.
  */
object Kdp {

  /** @param drKm     gate spacing in km (slope is per-gate; divide by dr)
    * @param smoothHw half-width of the ΨDP smoothing window (gates)
    * @param slopeHw  half-width of the least-squares slope window (gates)
    */
  def compute(df: DataFrame, rayKeys: Seq[String], rangeCol: String,
              psidpCol: String, drKm: Double,
              smoothHw: Int = 5, slopeHw: Int = 12): DataFrame = {
    val smoothed = Windows.rollingMean(df, rayKeys, rangeCol, col(psidpCol),
      smoothHw, as = "phidp_smooth")
    val withSlope = Windows.rollingSlope(smoothed, rayKeys, rangeCol,
      col(rangeCol).cast("double") * drKm, col("phidp_smooth"), slopeHw,
      as = "dphidp_dr")
    // KDP [deg/km] = half the range derivative of the two-way phase
    withSlope.withColumn("kdp", col("dphidp_dr") / 2.0)
  }
}
