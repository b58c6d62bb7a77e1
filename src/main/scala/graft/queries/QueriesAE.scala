package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 31 (round 8): robust regression and graph core structure. */
object QueriesAE {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Huber-IRLS robust fit of value on hour-of-day — three reweighted
    * rounds from the OLS start; no libm call anywhere, so the whole fit
    * is exactly deterministic with no rounding tricks.
    */
  val huberIrls: QueryDef = {
    val c = 1.5; val iters = 3
    val decS = (e: String) => s"CAST(SUM(CAST(($e) AS DECIMAL(27,10))) AS DOUBLE)"
    def wlsSql(src: String, i: Int) =
      s"""m$i AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          ${decS("w")} AS sw, ${decS("w * x")} AS swx,
          ${decS("w * x * x")} AS swxx, ${decS("w * y")} AS swy,
          ${decS("w * x * y")} AS swxy FROM $src),
        bet$i AS (SELECT n,
          (swy * swxx - swx * swxy) / (sw * swxx - swx * swx) AS b0,
          (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
          FROM m$i)"""
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT b.y, b.x,
          CASE WHEN ABS(b.y - (t.b0 + t.b1 * b.x)) <= $c THEN 1.0
            ELSE $c / ABS(b.y - (t.b0 + t.b1 * b.x)) END AS w
          FROM base b CROSS JOIN bet${i - 1} t),
        ${wlsSql(s"r$i", i)}"""
    }.mkString(",\n        ")
    QueryDef(
      "ml_huber_irls",
      (s, dir) => graft.ml.Glm.huberIrls(
        t(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(col("value").as("y"),
            hour(col("ts")).cast("double").as("x")),
        "y", "x", c = c, iters = iters),
      Some(s"""WITH base AS (SELECT CAST(value AS DOUBLE) AS y,
          CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS x
          FROM events WHERE value IS NOT NULL),
        w0 AS (SELECT y, x, 1.0 AS w FROM base),
        ${wlsSql("w0", 0)},
        $steps
      SELECT n, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1 FROM bet$iters"""))
  }

  /** 3-round k-core (k=3) peeling census over the repeat co-purchase
    * graph: surviving nodes/edges per round.
    */
  val kcorePeel: QueryDef = {
    val k = 3; val rounds = 3
    val steps = (1 to rounds).map { i =>
      s"""k$i AS (SELECT src FROM (SELECT src, COUNT(*) AS deg
          FROM ed${i - 1} GROUP BY 1) WHERE deg >= $k),
        ed$i AS MATERIALIZED (SELECT e.src, e.dst FROM ed${i - 1} e
          SEMI JOIN k$i a ON e.src = a.src
          SEMI JOIN k$i b ON e.dst = b.src),
        r$i AS (SELECT $i AS round,
          (SELECT COUNT(DISTINCT src) FROM ed$i) AS n_nodes,
          CAST((SELECT COUNT(*) / 2 FROM ed$i) AS BIGINT) AS n_edges)"""
    }.mkString(",\n        ")
    QueryDef(
      "graph_kcore_peel",
      (s, dir) => {
        val edges = Queries.coPurchasePairs(s, dir)
          .filter(col("n_ab") >= 2)
          .select(col("a"), col("b"))
        graft.llm.Graph.kcorePeel(edges, k = k, rounds = rounds)
          .orderBy(col("round"))
      },
      Some(s"""WITH bk AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
          FROM lineitem),
        e0 AS (SELECT l.item AS a, r.item AS b FROM bk l JOIN bk r USING (ok)
          WHERE l.item < r.item GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        ed0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
          UNION SELECT b, a FROM e0),
        $steps
      SELECT CAST(round AS INT) AS round, CAST(n_nodes AS BIGINT) AS n_nodes,
        n_edges
      FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        UNION ALL SELECT * FROM r3)
      ORDER BY round"""))
  }

  val all: Seq[QueryDef] = Seq(huberIrls, kcorePeel)
}
