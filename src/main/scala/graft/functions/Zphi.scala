package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F6: ZPHI attenuation correction (Testud et al. 2000, the algorithm behind
  * the reference's correct_attenuation — radarprocessing.py:271-305, which
  * delegates to pyart calculate_attenuation_zphi).
  *
  * Per ray (radar, sweep, azimuth), over the rain segment [r0, rm]:
  *   ΔΦdp = φ(rm) − φ(r0)
  *   I(r1,r2) = 0.46·b·∫ Zh_lin(s)^b ds
  *   C = 10^(0.1·b·α·ΔΦdp) − 1
  *   AH(r) = Zh_lin(r)^b · C / (I(r0,rm) + C·I(r,rm))      [dB/km]
  *   PIA(r) = 2·∫_{r0}^{r} AH ds ;  ZH_CORR = ZH + PIA
  *
  * Spark realization: ONE sort per ray partition — cumulative/total window
  * sums give every integral; everything else is codegen'd scalar math. The
  * analytic identity 2·∫AH = α·ΔΦdp (derivable from the closed form) is the
  * spec's correctness anchor.
  *
  * Inputs: `zhCol` reflectivity dBZ, `phidpCol` differential phase (deg),
  * liquid-segment rows only (caller applies the temperature / iso0 mask as
  * the reference does). Default coefficients are pyart's X/C-band style
  * b=0.64884, α=0.08 dB/deg.
  */
object Zphi {

  def attenuation(df: DataFrame, rayKeys: Seq[String], rangeCol: String,
                  zhCol: String, phidpCol: String, drKm: Double,
                  b: Double = 0.64884, alpha: Double = 0.08): DataFrame = {
    val ray = Window.partitionBy(rayKeys.map(col): _*)
    val full = ray.orderBy(col(rangeCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = ray.orderBy(col(rangeCol))
      .rowsBetween(Window.unboundedPreceding, 0)

    val zb = pow(lit(10.0), col(zhCol) * (0.1 * b)) // Zh_lin^b
    val withZb = df.withColumn("__zb", zb)
    val iTot = (sum(col("__zb")).over(full)) * (0.46 * b * drKm)
    val iCum = (sum(col("__zb")).over(cum)) * (0.46 * b * drKm)
    // ∫ from the current gate (inclusive) to rm
    val iToEnd = iTot - iCum + col("__zb") * (0.46 * b * drKm)
    val dphi = last(col(phidpCol)).over(full) - first(col(phidpCol)).over(full)
    val c = pow(lit(10.0), dphi * (0.1 * b * alpha)) - 1.0

    val out = withZb
      .withColumn("__itot", iTot)
      .withColumn("__iend", iToEnd)
      .withColumn("__c", c)
      .withColumn("ah",
        when(col("__c") > 0 && col("__itot") > 0,
          col("__zb") * col("__c") / (col("__itot") + col("__c") * col("__iend")))
          .otherwise(lit(0.0)))
    out
      .withColumn("pia", sum(col("ah")).over(cum) * (2.0 * drKm))
      .withColumn("zh_corr", col(zhCol) + col("pia"))
      .drop("__zb", "__itot", "__iend", "__c")
  }
}
