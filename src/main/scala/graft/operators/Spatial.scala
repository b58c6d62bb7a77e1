package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial similarity joins over planar point sets. The scale pattern is
  * grid-cell blocking: bucket points into radius-sized cells, expand ONE
  * side to its 3×3 cell neighborhood, join on cell, and verify exact
  * distance on the candidates only — the spatial analogue of the LSH
  * band-join used by every near-dup path in graft.llm.Dedup. A pair is
  * produced exactly once (the left row's own cell meets exactly one of
  * the right row's nine expansions), so no post-join dedup is needed.
  */
object Spatial {

  /** All pairs (a < b by id) within euclidean `radius`, via grid blocking:
    * cell side = radius, candidates from the 9-cell neighborhood, exact
    * squared-distance verify. Output: (id_a, id_b, dist2 rounded 6 dp).
    *
    * Scale shape: the only shuffle is the cell-key join; cell population
    * is bounded by point density (not corpus size), so candidate fan-out
    * per row is O(density·9) and no pair outside adjacent cells is ever
    * materialized. Never the quadratic cross join.
    */
  def neighborPairs(pts: DataFrame, idCol: String, xCol: String,
                    yCol: String, radius: Double): DataFrame = {
    require(radius > 0, s"neighborPairs needs radius > 0; got $radius")
    val r2 = radius * radius
    val cx = floor(col(xCol) / radius).cast("long")
    val cy = floor(col(yCol) / radius).cast("long")
    val left = pts.select(col(idCol).as("id_a"), col(xCol).as("__xa"),
      col(yCol).as("__ya"), cx.as("__cx"), cy.as("__cy"))
    val offsets = Seq(-1L, 0L, 1L)
    val right = pts.select(col(idCol).as("id_b"), col(xCol).as("__xb"),
        col(yCol).as("__yb"), cx.as("__bx"), cy.as("__by"))
      .withColumn("__dx", explode(lit(offsets.toArray)))
      .withColumn("__dy", explode(lit(offsets.toArray)))
    val d2 = (col("__xa") - col("__xb")) * (col("__xa") - col("__xb")) +
      (col("__ya") - col("__yb")) * (col("__ya") - col("__yb"))
    left.join(right,
        col("__cx") === col("__bx") + col("__dx") &&
        col("__cy") === col("__by") + col("__dy") &&
        col("id_a") < col("id_b"))
      .filter(d2 <= r2)
      .select(col("id_a"), col("id_b"), round(d2, 6).as("dist2"))
  }
}
