package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.Behavior

/** Batch 13: event-stream behavioral analytics — funnel conversion, cohort
  * retention, and truncated EWMA smoothing over the events table.
  */
object QueriesM {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** view → click → purchase ordered funnel with first-occurrence
    * semantics (step k clears at the earliest step-k event strictly after
    * the step-(k−1) clear).
    */
  val funnelConversion: QueryDef = QueryDef(
    "funnel_conversion",
    (s, dir) => Behavior.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy(col("step")),
    Some("""WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
          JOIN s1 ON s1.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
          JOIN s2 ON s2.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
      c AS (SELECT 1 AS step, 'view' AS event_type,
            (SELECT COUNT(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
      SELECT CAST(step AS INT) AS step, event_type, n_users,
        CASE WHEN b.b > 0 THEN ROUND(CAST(n_users AS DOUBLE) / b.b, 6)
             ELSE 0.0 END AS conversion
      FROM c CROSS JOIN (SELECT COUNT(*) AS b FROM s1) b ORDER BY step"""))

  /** Day-granularity cohort retention matrix over first-event cohorts. */
  val cohortRetention: QueryDef = QueryDef(
    "cohort_retention",
    (s, dir) => Behavior.cohortRetention(t(s, dir, "events"), "user_id", "ts")
      .orderBy(col("cohort"), col("day_offset")),
    Some("""WITH coh AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
          FROM events GROUP BY 1),
      act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      sz AS (SELECT cohort, COUNT(*) AS cohort_size FROM coh GROUP BY 1),
      m AS (SELECT c.cohort, datediff('day', c.cohort, a.day) AS day_offset,
          COUNT(*) AS n_active
        FROM act a JOIN coh c USING (user_id) GROUP BY 1, 2)
      SELECT m.cohort, CAST(m.day_offset AS INT) AS day_offset, m.n_active,
        ROUND(CAST(m.n_active AS DOUBLE) / sz.cohort_size, 6) AS retention
      FROM m JOIN sz USING (cohort) ORDER BY cohort, day_offset"""))

  /** 8-lag truncated EWMA (α = 1/2) per user in (ts, event_id) order. The
    * 2⁻ʲ weights are exact binary doubles, so both engines weight with
    * identical constants.
    */
  val ewmaSmooth: QueryDef = {
    val lags = 8
    def wStr(j: Int): String =
      new java.math.BigDecimal(math.pow(0.5, j)).toPlainString
    val lagCols = (0 until lags).map { j =>
      if (j == 0) "value AS x0"
      else s"LAG(value, $j) OVER w AS x$j"
    }.mkString(",\n          ")
    val num = (0 until lags).map(j =>
      s"CASE WHEN x$j IS NOT NULL THEN x$j * ${wStr(j)} ELSE 0.0 END")
      .mkString(" + ")
    val den = (0 until lags).map(j =>
      s"CASE WHEN x$j IS NOT NULL THEN ${wStr(j)} ELSE 0.0 END")
      .mkString(" + ")
    QueryDef(
      "w8_ewma",
      (s, dir) => Behavior.ewma(t(s, dir, "events"), "user_id", "ts",
          "event_id", "value", alpha = 0.5, lags = lags)
        // partition-aligned output bound (checker-footprint control)
        .filter(col("user_id") < 40)
        .orderBy(col("event_id")),
      Some(s"""WITH l AS (SELECT event_id, user_id, ts, value,
          $lagCols
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT event_id, user_id, ts, value,
        ROUND(($num) / ($den), 6) AS ewma
      FROM l WHERE user_id < 40 ORDER BY event_id"""))
  }

  /** Rolling z-score anomaly signal per user (current row scored against
    * its trailing 8-event window, self excluded; windows under 3
    * observations abstain with NULL).
    */
  val rollingZScore: QueryDef = QueryDef(
    "w9_rolling_zscore",
    (s, dir) => graft.operators.Windows.rollingZScore(t(s, dir, "events"),
        "user_id", "ts", "event_id", "value", lags = 8, minN = 3)
      .orderBy(col("event_id")),
    Some("""WITH l AS (SELECT event_id, user_id, ts, value,
          COUNT(value) OVER w AS n,
          CAST(SUM(CAST(value AS DECIMAL(27,10))) OVER w AS DOUBLE) AS s,
          CAST(SUM(CAST(value * value AS DECIMAL(27,10))) OVER w AS DOUBLE) AS sq,
          MIN(value) OVER w AS mn, MAX(value) OVER w AS mx
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id, ts, value,
        CASE WHEN n >= 3 AND mx > mn
             THEN ROUND((value - s/n) / SQRT((sq - s*s/n) / (n - 1.0)), 6)
             END AS zscore
      FROM l ORDER BY event_id"""))

  /** Adaptive 20-bin equi-width value histogram — the two-pass profiling
    * rollup (exact bounds, then one keyed bucket agg).
    */
  val valueHistogram: QueryDef = QueryDef(
    "a15_histogram",
    (s, dir) => graft.operators.Agg.histogram(t(s, dir, "events"),
        "value", nbins = 20)
      .orderBy(col("bucket")),
    Some("""WITH e AS (SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
      b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM e),
      w AS (SELECT lo, (hi - lo) / 20.0 AS wv FROM b),
      k AS (SELECT CAST(CASE WHEN wv > 0.0
              THEN LEAST(GREATEST(FLOOR((v - lo) / wv), 0.0), 19.0)
              ELSE 0.0 END AS INT) AS bucket, lo, wv
        FROM e, w)
      SELECT bucket, ROUND(lo + bucket * wv, 6) AS bucket_lo, COUNT(*) AS n
      FROM k GROUP BY bucket, lo, wv ORDER BY bucket"""))

  val all: Seq[QueryDef] = Seq(funnelConversion, cohortRetention, ewmaSmooth,
    rollingZScore, valueHistogram)
}
