package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.Stats

/** Batch 50 (round 11, third wave): deterministic Poisson-bootstrap
  * confidence intervals and split-conformal prediction intervals — the
  * uncertainty-quantification pair (resampling CI for an estimate,
  * distribution-free interval for a prediction).
  */
object QueriesAX {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  private val reps = 32
  private val tailK = 2

  /** The Poisson(1)-CDF CASE over the 60-bit-md5 uniform — identical
    * threshold literals to the Spark plan (Double.toString text).
    */
  private def poissonCaseSql: String = {
    val whens = Stats.poissonCdf.zipWithIndex.map { case (c, k) =>
      s"WHEN u < ${java.lang.Double.toString(c)} THEN CAST($k AS BIGINT)"
    }.mkString(" ")
    s"CASE $whens ELSE CAST(7 AS BIGINT) END"
  }

  /** Deterministic Poisson bootstrap of the per-user mean value
    * ([[Stats.poissonBootstrapCi]]): 32 hash-seeded Poisson(1)-weighted
    * replicate means per user, CI = [2nd lowest, 2nd highest]. Raw
    * (unrounded) outputs on bit-identical operands throughout.
    */
  val poissonBootstrap: QueryDef = QueryDef(
    "m21_poisson_bootstrap",
    (s, dir) => {
      Stats.poissonBootstrapCi(t(s, dir, "events"), "user_id", "event_id",
        "value", reps = reps, tailK = tailK)
        .orderBy(col("user_id"))
    },
    Some(s"""WITH base AS (SELECT user_id AS g, event_id AS id,
          CAST(value AS DOUBLE) AS x
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
      r AS (SELECT g, id, x, t.b FROM base, generate_series(0, ${reps - 1}) t(b)),
      wts AS (SELECT g, b, x, $poissonCaseSql AS w FROM (
        SELECT g, b, x,
          ${Ora.md5LongSql("CONCAT(CAST(id AS VARCHAR), ':', CAST(b AS VARCHAR))")}
            / ${java.lang.Double.toString(1152921504606846976.0)} AS u
        FROM r)),
      rep AS (SELECT g, b, CAST(SUM(w) AS BIGINT) AS wsum,
          CAST(ROUND(SUM(CAST(CAST(w AS DOUBLE) * x AS DECIMAL(27,10))), 6)
            AS DOUBLE) AS wx,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM wts GROUP BY g, b),
      mb AS (SELECT g, b, n, wx / CAST(wsum AS DOUBLE) AS mb
        FROM rep WHERE wsum > 0),
      rk AS (SELECT g, n, b, mb,
          ROW_NUMBER() OVER (PARTITION BY g ORDER BY mb, b) AS rn,
          COUNT(*) OVER (PARTITION BY g) AS nreps
        FROM mb)
      SELECT g AS user_id, CAST(MAX(n) AS BIGINT) AS n,
        CAST(MAX(nreps) AS BIGINT) AS n_reps,
        CAST(ROUND(SUM(CAST(mb AS DECIMAL(27,10))), 6) AS DOUBLE)
          / CAST(MAX(nreps) AS DOUBLE) AS boot_mean,
        MAX(CASE WHEN rn = $tailK THEN mb END) AS ci_lo,
        MAX(CASE WHEN rn = nreps - $tailK + 1 THEN mb END) AS ci_hi
      FROM rk GROUP BY g ORDER BY user_id"""))

  /** Split-conformal prediction intervals per user
    * ([[Stats.conformalInterval]]): OLS on the even-event calibration
    * half (x = DAYS since 2024-01-01 — small origin and scale so the x²
    * decimal sums stay within the exactly-castable range), conformal residual quantile at α = 0.1,
    * held-out coverage on the odd half.
    */
  val conformal: QueryDef = QueryDef(
    "m22_conformal_interval",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("x",
          (unix_timestamp(col("ts")) - lit(1704067200L)).cast("double") / 86400.0)
        .withColumn("cal", pmod(col("event_id"), lit(2)) === 0)
      Stats.conformalInterval(ev, "user_id", "x", "event_id", "value",
        "cal", alpha = 0.1)
        .orderBy(col("user_id"))
    },
    Some("""WITH base AS (SELECT user_id AS g, event_id AS t,
          CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) - 1704067200 AS DOUBLE)
            / 86400.0 AS x,
          CAST(value AS DOUBLE) AS y, event_id % 2 = 0 AS cal
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)),
      fit AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ncal,
          CAST(ROUND(SUM(CAST(x AS DECIMAL(27,10))), 6) AS DOUBLE) AS sx,
          CAST(ROUND(SUM(CAST(y AS DECIMAL(27,10))), 6) AS DOUBLE) AS sy,
          CAST(ROUND(SUM(CAST(x * x AS DECIMAL(27,10))), 6) AS DOUBLE) AS sxx,
          CAST(ROUND(SUM(CAST(x * y AS DECIMAL(27,10))), 6) AS DOUBLE) AS sxy,
          MIN(x) AS mnx, MAX(x) AS mxx
        FROM base WHERE cal GROUP BY g),
      m0 AS (SELECT g, ncal, sx, sy,
          CASE WHEN mxx > mnx THEN
            (CAST(ncal AS DOUBLE) * sxy - sx * sy)
              / (CAST(ncal AS DOUBLE) * sxx - sx * sx)
          ELSE 0.0 END AS slope
        FROM fit),
      model AS (SELECT g, ncal, slope,
          (sy - slope * sx) / CAST(ncal AS DOUBLE) AS icept
        FROM m0),
      q AS (SELECT g, r AS q_hat FROM (
          SELECT b.g, m.ncal,
            ABS(b.y - (m.icept + m.slope * b.x)) AS r,
            ROW_NUMBER() OVER (PARTITION BY b.g
              ORDER BY ABS(b.y - (m.icept + m.slope * b.x)), b.t) AS rn
          FROM base b JOIN model m ON b.g = m.g WHERE b.cal)
        WHERE rn = LEAST(CAST(CEIL((1.0 - 0.1)
          * CAST(ncal + 1 AS DOUBLE)) AS BIGINT), ncal)),
      tst AS (SELECT b.g, CAST(COUNT(*) AS BIGINT) AS ntest,
          CAST(SUM(CASE WHEN ABS(b.y - (m.icept + m.slope * b.x)) <= q.q_hat
            THEN 1 ELSE 0 END) AS BIGINT) AS covered
        FROM base b JOIN model m ON b.g = m.g JOIN q ON b.g = q.g
        WHERE NOT b.cal GROUP BY b.g)
      SELECT model.g AS user_id, ncal,
        COALESCE(tst.ntest, 0) AS ntest, q.q_hat,
        CAST(tst.covered AS DOUBLE) / CAST(tst.ntest AS DOUBLE) AS coverage
      FROM model LEFT JOIN q ON model.g = q.g
      LEFT JOIN tst ON model.g = tst.g
      ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(poissonBootstrap, conformal)
}
