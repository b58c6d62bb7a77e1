package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.ml.Pca
import graft.operators.{Stats, Windows}

/** Batch 49 (round 11 depth, second wave): Theil–Sen robust slope,
  * interval-union coverage (gaps-and-islands), and multi-component PCA by
  * Hotelling deflation.
  */
object QueriesAW {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Per-user Theil–Sen slope of value over time ([[Stats.theilSen]]):
    * median of all pairwise slopes, per-group pair fan-out, boundary-rank
    * selection — never a global sort. Slope emitted unrounded (bit-
    * identical operands; a 6-dp round could land on a half boundary).
    */
  val tsTheilSen: QueryDef = QueryDef(
    "ts_theil_sen",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("x", unix_timestamp(col("ts")))
      Stats.theilSen(ev, "user_id", "x", "event_id", "value")
        .orderBy(col("user_id"))
    },
    Some("""WITH pts AS (SELECT user_id AS g, event_id AS t,
          CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS DOUBLE) AS x,
          CAST(value AS DOUBLE) AS y
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)),
      n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY g),
      pairs AS (SELECT a.g, (b.y - a.y) / (b.x - a.x) AS slope
        FROM pts a JOIN pts b ON a.g = b.g
        WHERE a.t < b.t AND a.x <> b.x),
      ranked AS (SELECT g, slope,
          ROW_NUMBER() OVER (PARTITION BY g ORDER BY slope) AS rn,
          COUNT(*) OVER (PARTITION BY g) AS m
        FROM pairs),
      med AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS k,
          SUM(slope) AS s, CAST(MAX(m) AS BIGINT) AS n_pairs
        FROM ranked
        WHERE rn = CAST(FLOOR(CAST(m + 1 AS DOUBLE) / 2.0) AS BIGINT)
           OR rn = CAST(FLOOR(CAST(m AS DOUBLE) / 2.0) AS BIGINT) + 1
        GROUP BY g)
      SELECT n.g AS user_id, n.n,
        COALESCE(med.n_pairs, 0) AS n_pairs,
        med.s / CAST(med.k AS DOUBLE) AS slope
      FROM n LEFT JOIN med ON n.g = med.g
      ORDER BY user_id"""))

  /** Per-user interval-union coverage ([[Windows.intervalCoverage]]) over
    * synthetic event intervals (each event holds (event_id%7)+1 minutes):
    * islands, union seconds, longest island — the gaps-and-islands pass.
    */
  val intervalCoverage: QueryDef = QueryDef(
    "interval_coverage",
    (s, dir) => {
      val iv = t(s, dir, "events")
        .withColumn("iv_end",
          expr("timestampadd(MINUTE, CAST(event_id % 7 + 1 AS INT), ts)"))
      Windows.intervalCoverage(iv, "user_id", "ts", "iv_end", "event_id")
        .orderBy(col("user_id"))
    },
    Some("""WITH iv AS (SELECT user_id AS k, ts AS st, event_id AS tie,
          CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s,
          CAST(FLOOR(EPOCH(ts + (event_id % 7 + 1) * INTERVAL 1 MINUTE)) AS BIGINT) AS e
        FROM events WHERE ts IS NOT NULL),
      f AS (SELECT k, st, tie, s, e,
          MAX(e) OVER (PARTITION BY k ORDER BY st, tie
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        FROM iv),
      g AS (SELECT k, s, e,
          SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END) OVER
            (PARTITION BY k ORDER BY st, tie
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM f),
      isl AS (SELECT k, island, COUNT(*) AS cnt, MIN(s) AS a, MAX(e) AS b
        FROM g GROUP BY k, island)
      SELECT k AS user_id, CAST(SUM(cnt) AS BIGINT) AS n_intervals,
        CAST(COUNT(*) AS BIGINT) AS n_islands,
        CAST(SUM(b - a) AS BIGINT) AS covered_secs,
        CAST(MAX(b - a) AS BIGINT) AS longest_island_secs
      FROM isl GROUP BY k ORDER BY user_id"""))

  private val dim = 64
  private val iters = 6

  /** One power-iteration CTE chain over Gram relation `g`, round names
    * prefixed so two chains can coexist (the deflation mirror).
    */
  private def roundsSql(g: String, p: String): String = {
    val head = s"""${p}v0 AS (SELECT t.i, 1.0 / SQRT(${dim.toDouble}) AS v
        FROM generate_series(1, $dim) t(i))"""
    val rounds = (1 to iters).map { r =>
      s"""${p}w$r AS (SELECT g.i, CAST(ROUND(SUM(CAST(g.g * v.v AS DECIMAL(27,10))), 6) AS DOUBLE) AS w
          FROM $g g JOIN ${p}v${r - 1} v ON g.j = v.i GROUP BY g.i),
        ${p}n$r AS (SELECT CAST(ROUND(SUM(CAST(w * w AS DECIMAL(27,10))), 6) AS DOUBLE) AS n2 FROM ${p}w$r),
        ${p}v$r AS (SELECT i, w / SQRT(n2) AS v FROM ${p}w$r CROSS JOIN ${p}n$r)"""
    }.mkString(",\n        ")
    s"$head,\n        $rounds"
  }

  /** The presentation stage of one component over Gram `g` and final
    * vector `v`: rounded Rayleigh lambda, sign CTE, (pc, comp, loading,
    * lambda) select — token-identical to [[Pca]]'s present().
    */
  private def presentSql(pc: Int, g: String, v: String, p: String): String =
    s"""${p}lam AS (SELECT CAST(ROUND(SUM(CAST(vi.v * g.g * vj.v AS DECIMAL(27,10))), 6) AS DOUBLE) AS lamhat
        FROM $g g JOIN $v vi ON g.i = vi.i JOIN $v vj ON g.j = vj.i),
      ${p}sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
        FROM $v ORDER BY ABS(v) DESC, i LIMIT 1),
      ${p}out AS (SELECT $pc AS pc, v.i AS comp, ROUND(v.v * sg, 6) AS loading,
        ROUND(lamhat * s, 6) AS lambda
        FROM $v v CROSS JOIN ${p}sgn CROSS JOIN ${p}lam CROSS JOIN sc)"""

  /** Top-2 principal components by Hotelling deflation
    * ([[Pca.topComponents]]): after the first component converges,
    * G ← G − λ·v·vᵀ (λ the UNROUNDED Rayleigh value) and the second chain
    * runs on the deflated Gram — still one corpus pass total.
    */
  val pcaDeflationTop2: QueryDef = QueryDef(
    "pca_deflation_top2",
    (s, dir) => {
      Pca.topComponentsFromGram(QueriesAV.gramShared(s, dir), dim,
        nComponents = 2, iters = iters)
        .orderBy(col("pc"), col("comp"))
    },
    // g/g2 are MATERIALIZED: the two unrolled chains reference each Gram
    // ~8 times, and an inlined CTE re-opens the parquet scan per reference
    // (DuckDB ran out of file handles at reference 15)
    Some(s"""WITH g AS MATERIALIZED (
        SELECT gi.i, gj.j,
          CAST(CAST(SUM(CAST(FLOOR((CAST(e.embedding[gi.i] AS DOUBLE) * CAST(e.embedding[gj.j] AS DOUBLE))
            * 1.0E8) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1.0E8 AS g
        FROM embeddings e, generate_series(1, $dim) gi(i), generate_series(1, $dim) gj(j)
        WHERE e.embedding IS NOT NULL AND len(e.embedding) = $dim
        GROUP BY gi.i, gj.j),
      sc AS (SELECT MAX(ABS(g)) AS s FROM g),
      gn AS MATERIALIZED (SELECT i, j, g / s AS g FROM g CROSS JOIN sc),
      ${roundsSql("gn", "a")},
      ${presentSql(1, "gn", s"av$iters", "a")},
      lamraw AS (SELECT CAST(SUM(CAST(vi.v * g.g * vj.v AS DECIMAL(27,10))) AS DOUBLE) AS l
        FROM gn g JOIN av$iters vi ON g.i = vi.i JOIN av$iters vj ON g.j = vj.i),
      g2 AS MATERIALIZED (SELECT g.i, g.j, g.g - lr.l * vi.v * vj.v AS g
        FROM gn g JOIN av$iters vi ON g.i = vi.i JOIN av$iters vj ON g.j = vj.i
        CROSS JOIN lamraw lr),
      ${roundsSql("g2", "b")},
      ${presentSql(2, "g2", s"bv$iters", "b")}
      SELECT * FROM aout UNION ALL SELECT * FROM bout
      ORDER BY pc, comp"""))

  val all: Seq[QueryDef] = Seq(tsTheilSen, intervalCoverage, pcaDeflationTop2)
}
