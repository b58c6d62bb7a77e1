package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M10/J10: hydrometeor classification by nearest centroid
  * (reference: common/radarprocessing.py:633-779 hydroClass_single — the
  * semisupervised scheme: standardize the polarimetric features, then assign
  * each gate to the argmin-Minkowski-distance class centroid; per-radar
  * centroid tables, constants.py:339-384).
  *
  * Spark-first realization: the centroid table is small and static, so each
  * class distance becomes one codegen'd column and the argmin is a
  * `least` + `when` chain — no cross join, no groupBy, no UDF; the only
  * exchange is the 1-row moments broadcast for standardization.
  */
object HydroClass {

  final case class Centroid(hydroClass: String, values: Seq[Double])

  def classify(df: DataFrame, features: Seq[String],
               centroids: Seq[Centroid], p: Double = 2.0): DataFrame = {
    require(centroids.forall(_.values.length == features.length))

    // global moments in one 1-row aggregation, attached as a broadcast
    // nested-loop join of width 1 (per-radar variant: group upstream)
    val moments = df.agg(
      features.flatMap(f => Seq(avg(col(f)).as(s"__mu_$f"),
        stddev_pop(col(f)).as(s"__sd_$f"))).head,
      features.flatMap(f => Seq(avg(col(f)).as(s"__mu_$f"),
        stddev_pop(col(f)).as(s"__sd_$f"))).tail: _*)
    val standardized = df.crossJoin(broadcast(moments))

    def distTo(c: Centroid): Column =
      pow(features.zip(c.values).map { case (f, cv) =>
        val z = (col(f) - col(s"__mu_$f")) / col(s"__sd_$f")
        pow(abs(z - cv), p)
      }.reduce(_ + _), 1.0 / p)

    val dists = centroids.map(c => c.hydroClass -> distTo(c))
    val minDist = least(dists.map(_._2): _*)
    // ties resolve to the first centroid in declaration order — deterministic
    val cls = dists.foldRight(lit(null).cast("string")) {
      case ((name, d), acc) => when(d === minDist, lit(name)).otherwise(acc)
    }

    standardized
      .withColumn("hydro_class", cls)
      .withColumn("hydro_dist", minDist)
      .drop(features.flatMap(f => Seq(s"__mu_$f", s"__sd_$f")): _*)
  }
}
