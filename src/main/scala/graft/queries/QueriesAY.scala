package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.ml.Als
import graft.operators.Behavior

/** Batch 51 (round 11, fourth wave): deterministic ALS matrix
  * factorization under the exact gate, and the process-mining
  * direct-follows graph with exact counted medians.
  */
object QueriesAY {
  import Queries.QueryDef

  private val lam = 0.1
  private val alsIters = 3

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** md5-uniform init literal text shared with [[Als]]. */
  private def hashUSql(tag: String): String =
    s"""${Ora.md5LongSql(s"CONCAT('$tag', ':', CAST(p AS VARCHAR))")}
        / ${java.lang.Double.toString(1152921504606846976.0)}"""

  /** One ALS ridge half-step as SQL: five fixed-point long sums per
    * `solveKey` joined against `givenName`, then the 2×2 Cramer solve
    * with the det expression inlined — token-identical to
    * [[Als.halfStep]].
    */
  private def halfSql(outName: String, solveKey: String, givenKey: String,
                      givenName: String): String = {
    // the fixed-point long kernel (Als.fx/unfx): floor-quantized 1e-10
    // terms summed as integers — order-independent like a decimal sum,
    // primitive-speed; the inner CAST(... AS BIGINT) pins the exact
    // integer before the (correctly-rounded) int→double conversion
    val fx = (e: String) =>
      s"CAST(CAST(SUM(CAST(FLOOR(($e) * 1.0E10) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0E10"
    val det = s"((s.a11 + $lam) * (s.a22 + $lam) - s.a12 * s.a12)"
    s"""${outName}s AS (SELECT $solveKey,
          ${fx("f1 * f1")} AS a11, ${fx("f1 * f2")} AS a12,
          ${fx("f2 * f2")} AS a22,
          ${fx("r * f1")} AS b1, ${fx("r * f2")} AS b2
        FROM ratings JOIN $givenName USING ($givenKey)
        GROUP BY $solveKey),
      $outName AS (SELECT $solveKey,
          ((s.a22 + $lam) * s.b1 - s.a12 * s.b2) / $det AS f1,
          ((s.a11 + $lam) * s.b2 - s.a12 * s.b1) / $det AS f2
        FROM ${outName}s s)"""
  }

  /** Deterministic 2-factor ALS over the customer×part purchase matrix
    * ([[Als.factorize2]]): hash-initialized item factors, 3 alternating
    * closed-form ridge rounds, the item-factor slice under the exact
    * hash gate — matrix-factorization TRAINING as a gated query (the
    * logistic-IRLS / Lloyd-kmeans precedent).
    */
  val alsFactorize: QueryDef = QueryDef(
    "als_factorize_2f",
    (s, dir) => {
      val ratings = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"),
          col("l_quantity").as("qty"))
      val (_, items) = Als.factorize2(ratings, "cust", "part", "qty",
        iters = alsIters, lambda = lam)
      items.filter(pmod(col("p"), lit(97)) === 0)
        .select(col("p"), col("f1"), col("f2"))
        .orderBy(col("p"))
    },
    Some(s"""WITH ratings AS (SELECT o_custkey AS u, l_partkey AS p,
          CAST(l_quantity AS DOUBLE) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity IS NOT NULL
          AND NOT isnan(CAST(l_quantity AS DOUBLE))),
      it0 AS (SELECT p, ${hashUSql("f1")} AS f1, ${hashUSql("f2")} AS f2
        FROM (SELECT DISTINCT p FROM ratings)),
      ${halfSql("us1", "u", "p", "it0")},
      ${halfSql("it1", "p", "u", "us1")},
      ${halfSql("us2", "u", "p", "it1")},
      ${halfSql("it2", "p", "u", "us2")},
      ${halfSql("us3", "u", "p", "it2")},
      ${halfSql("it3", "p", "u", "us3")}
      SELECT p, f1, f2 FROM it3 WHERE p % 97 = 0 ORDER BY p"""))

  /** Process-mining direct-follows graph over the event log
    * ([[Behavior.processDfg]]): edge frequencies plus exact counted-median
    * / min / max transition gaps.
    */
  val processDfg: QueryDef = QueryDef(
    "process_dfg",
    (s, dir) => {
      Behavior.processDfg(t(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type")
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH e AS (SELECT user_id, event_type AS to_type,
          CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
          LAG(event_type) OVER w AS from_type,
          LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w AS pt
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      ed AS (SELECT from_type, to_type, t - pt AS gap
        FROM e WHERE from_type IS NOT NULL),
      c AS (SELECT from_type, to_type, gap, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ed GROUP BY 1, 2, 3),
      r AS (SELECT from_type, to_type, gap, cnt,
          SUM(cnt) OVER (PARTITION BY from_type, to_type) AS m,
          SUM(cnt) OVER (PARTITION BY from_type, to_type ORDER BY gap
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM c)
      SELECT from_type, to_type, CAST(MAX(m) AS BIGINT) AS n,
        MIN(gap) AS min_gap_s, MAX(gap) AS max_gap_s,
        CAST(MIN(CASE WHEN cum >= CAST(FLOOR(CAST(m + 1 AS DOUBLE) / 2.0) AS BIGINT)
            THEN gap END)
          + MIN(CASE WHEN cum >= CAST(FLOOR(CAST(m AS DOUBLE) / 2.0) AS BIGINT) + 1
            THEN gap END) AS DOUBLE) / 2.0 AS median_gap_s
      FROM r GROUP BY from_type, to_type
      ORDER BY from_type, to_type"""))

  val all: Seq[QueryDef] = Seq(alsFactorize, processDfg)
}
