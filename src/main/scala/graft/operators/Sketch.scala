package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Probabilistic counting sketches with DETERMINISTIC cross-engine hashes
  * (the md5Long pair), so the whole sketch — build and probe — sits under
  * the exact DuckDB hash gate rather than a rows-only check.
  */
object Sketch {

  /** Count-min sketch heavy hitters over a token stream (Cormode &
    * Muthukrishnan 2005): d independent hash rows × `width` buckets; a
    * token's estimate is the MIN over its d bucket counters, an upper
    * bound on the true count (never under — collisions only inflate).
    *
    * Scale shape: the sketch build is ONE map-side explode + one
    * d·width-cell aggregation (the shuffle carries ≤ d·width rows however
    * large the corpus — that is the point of a CMS at 100 TB); the probe
    * joins candidates against the tiny sketch broadcast-style. The
    * candidate set here is the exact vocabulary (and the exact counts ride
    * along to exhibit the overestimate bound); at corpus scale you'd feed
    * a sampled/heuristic candidate set instead and skip the exact pass —
    * the sketch side is unchanged.
    *
    * Output: top-`k` candidates by (estimate DESC, token) with the
    * estimate and the exact count (est_cnt ≥ exact_cnt always).
    */
  def cmsTopK(df: DataFrame, textCol: String, d: Int = 3, width: Int = 256,
              k: Int = 20): DataFrame = {
    require(d > 0 && width > 0 && k > 0, s"cmsTopK: bad shape d=$d w=$width k=$k")
    val toks = df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    def bucket(j: Int): Column =
      TextAnalysis.md5Long(concat(lit(s"cms$j:"), col("tok"))) % width
    // one pass over the stream: all d buckets map-side, then a (j, b) pair
    // explode — the aggregate output is d·width cells regardless of input
    val cells = toks
      .select(posexplode(array((0 until d).map(bucket): _*)).as(Seq("j", "b")))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cnt"))
    val cand = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
    val probe = cand
      .select(col("tok"), col("exact_cnt"),
        posexplode(array((0 until d).map(bucket): _*)).as(Seq("j", "b")))
      .join(broadcast(cells), Seq("j", "b"))
      .groupBy(col("tok")).agg(
        first(col("exact_cnt")).as("exact_cnt"),
        min(col("cnt")).as("est_cnt"))
    probe
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("est_cnt").desc, col("tok"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("tok"), col("est_cnt"), col("exact_cnt"))
  }
}
