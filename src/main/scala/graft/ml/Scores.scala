package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M6/M7: skill scores (reference: common/utils.py:76-166 perfscores,
  * performance/eval_calculate.py:30-159 contingency scores).
  *
  * All scores are one groupBy + (for the scatter quantiles) one window sort
  * per group — no driver-side loops, decimal accumulators for
  * order-independence.
  */
object Scores {

  private def dsum(c: Column): Column = sum(c.cast("decimal(27,10)")).cast("double")

  /** M6 `perfscores`: per-group N, logBias = 10·log10(Σest/Σref), conditional
    * RMSE over rows where both est and ref exceed `minValid`, and scatter =
    * ½·(Q84w − Q16w) of the dB error 10·log10(est/ref), weighted by the
    * reference share (reference: common/utils.py:76-166; weighted quantile
    * utils.py:294-369 — realized here as an exact cumulative-weight crossing
    * on the per-group sort, the distributed equivalent).
    */
  def perfscores(df: DataFrame, groupCol: String, estCol: String, refCol: String,
                 minValid: Double = 0.1): DataFrame = {
    val est = col(estCol)
    val ref = col(refCol)
    val valid = df.filter(est.isNotNull && ref.isNotNull)

    val base = valid.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      round(log10(dsum(est) / dsum(ref)) * 10.0, 6).as("logbias_db"),
      round(sqrt(dsum(when(est > minValid && ref > minValid,
          (est - ref) * (est - ref))) /
        count(when(est > minValid && ref > minValid, lit(1)))), 6).as("rmse_cond"))

    // scatter: weighted quantiles of the dB ratio over the conditional rows
    val cond = valid.filter(est > minValid && ref > minValid)
      .withColumn("ratio_db", log10(est / ref) * 10.0)
      .withColumn("w", ref)
    val byRatio = Window.partitionBy(col(groupCol)).orderBy(col("ratio_db"))
    val grp = Window.partitionBy(col(groupCol))
    val cum = cond
      .withColumn("cumw", sum(col("w").cast("decimal(27,10)"))
        .over(byRatio.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("totw", sum(col("w").cast("decimal(27,10)"))
        .over(grp).cast("double"))
    val quants = cum.groupBy(col(groupCol)).agg(
      min(when(col("cumw") >= col("totw") * 0.16, col("ratio_db"))).as("q16"),
      min(when(col("cumw") >= col("totw") * 0.84, col("ratio_db"))).as("q84"))
      .withColumn("scatter_db", round((col("q84") - col("q16")) / 2.0, 6))
      .drop("q16", "q84")

    base.join(quants, Seq(groupCol), "left")
  }

  /** M7: contingency table at a (obs, pred) threshold pair + the derived
    * categorical scores POD / FAR / CSI
    * (reference: performance/eval_calculate.py:30-159).
    */
  def contingency(df: DataFrame, groupCol: String, obsEvent: Column,
                  predEvent: Column): DataFrame =
    df.groupBy(col(groupCol)).agg(
        count(when(obsEvent && predEvent, lit(1))).as("hits"),
        count(when(obsEvent && !predEvent, lit(1))).as("misses"),
        count(when(!obsEvent && predEvent, lit(1))).as("false_alarms"),
        count(when(!obsEvent && !predEvent, lit(1))).as("correct_negatives"))
      .withColumn("pod", round(col("hits") / (col("hits") + col("misses")), 6))
      .withColumn("far", round(col("false_alarms") / (col("hits") + col("false_alarms")), 6))
      .withColumn("csi", round(col("hits") / (col("hits") + col("misses") + col("false_alarms")), 6))
}
