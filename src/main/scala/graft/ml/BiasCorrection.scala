package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M2/M3/M4: a-posteriori bias correction of regression output by quantile
  * mapping (reference: ml/rfdefinitions.py:42-50 _polyfit_no_inter,
  * 144-146 spline variant, 192-242 fit/predict).
  *
  * 'cdf' mode: sort predictions and observations independently (quantile
  * mapping) and fit a zero-intercept degree-1 polynomial, slope = Σxy/Σx².
  * The positional zip is a double global sort + row_number join — kept OUT of
  * the per-query path (train-time only, ≈10⁵–10⁶ rows; SURVEY §7.4).
  */
object BiasCorrection {

  /** Positionally zip the two independently sorted columns. Ties among equal
    * predictions are interchangeable, so the Σxy slope is order-stable.
    *
    * Scale-safe construction: `sort` is a RANGE-partitioned parallel sort
    * (never a single-partition window), and the global position comes from
    * `zipWithIndex`, which preserves the sorted partition order without
    * another shuffle. The old `row_number().over(Window.orderBy(...))`
    * version pulled the whole table through one partition — twice.
    */
  def sortedPairs(df: DataFrame, predCol: String, obsCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val spark = df.sparkSession
    def ranked(c: String, as: String): DataFrame = {
      val sorted = df.select(col(c).cast("double").as(as)).sort(col(as))
      val rdd = sorted.rdd.zipWithIndex.map { case (row, i) =>
        Row(i + 1, if (row.isNullAt(0)) null else row.getDouble(0))
      }
      spark.createDataFrame(rdd, StructType(Seq(
        StructField("rn", LongType, nullable = false),
        StructField(as, DoubleType, nullable = true))))
    }
    ranked(predCol, "pred").join(ranked(obsCol, "obs"), "rn")
  }

  /** Zero-intercept least squares on the sorted pairs: slope = Σ(x·y)/Σ(x²)
    * (reference: rfdefinitions.py:42-50). Decimal accumulators keep the sums
    * order-independent.
    */
  def cdfSlope(df: DataFrame, predCol: String, obsCol: String): DataFrame =
    sortedPairs(df, predCol, obsCol).agg(
      (sum((col("pred") * col("obs")).cast("decimal(30,8)")).cast("double") /
       sum((col("pred") * col("pred")).cast("decimal(30,8)")).cast("double")).as("slope"))

  /** M4: apply the fitted correction with the non-negativity clamp
    * (reference: rfdefinitions.py:205-242 out = max(polyval(pred), 0)).
    */
  def applyCdf(pred: Column, slope: Double): Column =
    greatest(lit(0.0), pred * slope)

  /** M3: monotone ('spline') variant via MLlib isotonic regression over the
    * sorted pairs — documented deviation from the reference's
    * UnivariateSpline (SURVEY §7.3): both are monotone quantile maps.
    */
  def fitIsotonic(df: DataFrame, predCol: String, obsCol: String): org.apache.spark.ml.regression.IsotonicRegressionModel = {
    import org.apache.spark.ml.feature.VectorAssembler
    val pairs = sortedPairs(df, predCol, obsCol)
    val assembled = new VectorAssembler().setInputCols(Array("pred")).setOutputCol("features")
      .transform(pairs)
    new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("features").setLabelCol("obs")
      .fit(assembled)
  }

  /** The [[fitIsotonic]] fit as a RELATION — (pred, fitted), one row per
    * distinct prediction. On [[sortedPairs]] input the labels arrive
    * already non-decreasing in feature order (both columns independently
    * sorted before the positional zip), so PAV has no violators to pool
    * beyond duplicate features: the fit reduces ANALYTICALLY to the mean
    * label per distinct feature, and every in-sample transform hits a
    * model boundary exactly (no interpolation arithmetic in play). Run
    * means stay monotone because each run's labels dominate every earlier
    * label. IsotonicEquivSpec pins this relation equal to the MLlib
    * model's boundary/prediction arrays on the bench shape.
    *
    * Equality scope: bit-for-bit equality with the MLlib fit holds when
    * pooled label sums are exact in double — integer-valued (or otherwise
    * exactly-summable) labels, as on the bench feed. With general
    * fractional labels Spark's partitioned partial-sum avg and MLlib's
    * sequential tie-pooling can differ in the last ULP, and null `obs`
    * rows are averaged out here where the MLlib path (VectorAssembler)
    * throws — callers beyond m3 with such inputs should use
    * [[fitIsotonic]].
    *
    * Why: the MLlib path costs a VectorAssembler pass, an RDD PAV with a
    * driver-side boundary collect, a model broadcast and a per-row
    * binary-search transform — all to materialize numbers one keyed AVG
    * already determines. Duplicate-pred runs are small and integer-labeled
    * on the bench feed, so the pooled means are exact in double on both
    * engines regardless of summation order.
    */
  def isotonicFitted(df: DataFrame, predCol: String, obsCol: String): DataFrame =
    sortedPairs(df, predCol, obsCol)
      .groupBy(col("pred"))
      .agg(avg(col("obs")).as("fitted"))
}
