package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 26 (round 8): GLM training as a query (logistic IRLS),
  * exponential time-decay scoring, and schema-evolution merge reads.
  * The IRLS mirror unrolls the Newton iterations as CTE pairs whose
  * arithmetic transcribes the Spark plan term for term (same Cramer
  * cofactor order, same 9-dp sigmoid round).
  */
object QueriesZ {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Logistic regression (purchase vs rest) on scaled (value, hour):
    * 3 unrolled IRLS steps, coefficient row gated.
    */
  val logregIrls: QueryDef = {
    val iters = 3
    val steps = Ora.irlsStepsSql(iters)
    QueryDef(
      "ml_logreg_irls",
      (s, dir) => graft.ml.Glm.logisticIrls(
        t(s, dir, "events")
          .filter(col("value").isNotNull)
          .select((col("event_type") === "purchase").cast("double").as("y"),
            (col("value") / lit(100.0)).as("x1"),
            (hour(col("ts")).cast("double") / lit(24.0)).as("x2")),
        "y", "x1", "x2", iters = iters),
      Some(s"""WITH base AS (SELECT
          CAST(event_type = 'purchase' AS DOUBLE) AS y,
          CAST(value AS DOUBLE) / 100.0 AS x1,
          CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) / 24.0 AS x2
          FROM events WHERE value IS NOT NULL),
        bet0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
        $steps
      SELECT n, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2
      FROM bet$iters"""))
  }

  /** Exponentially time-decayed engagement score per event type
    * (λ = 0.01/day against a fixed 2026-01-01 reference): each term is
    * exp-rounded at 9 dp — the libm determinism treatment — then
    * decimal-summed.
    */
  val timeDecay: QueryDef = {
    val refEpoch = 1767225600L // 2026-01-01T00:00:00Z
    val lambda = 0.01
    QueryDef(
      "w14_time_decay",
      (s, dir) => {
        val dd = (lit(refEpoch) - unix_timestamp(col("ts"))) / lit(86400.0)
        val term = round(col("value") * exp(lit(-lambda) * dd), 9)
        t(s, dir, "events").filter(col("value").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(term.cast("decimal(27,10)")), 6).cast("double")
              .as("decayed_sum"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(ROUND(SUM(CAST(ROUND(value *
            EXP(-$lambda * (($refEpoch - CAST(FLOOR(EPOCH(ts)) AS BIGINT))
              / 86400.0)), 9) AS DECIMAL(27,10))), 6) AS DOUBLE)
            AS decayed_sum
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type ORDER BY event_type"""))
  }

  /** Schema-evolution merge read: two parquet drops with different
    * schemas (the second adds a sum column) read back through
    * mergeSchema and re-aggregated — the lakehouse widening path.
    */
  val schemaEvolution: QueryDef = QueryDef(
    "s19_schema_evolution",
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val v1 = ev.filter(col("user_id") % 2 === 0)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val v2 = ev.filter(col("user_id") % 2 === 1)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
          Ora.dsum6(col("value")).as("sum_v"))
      val base = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_schema_evo")
      val p1 = new java.io.File(base, "v1").getAbsolutePath
      val p2 = new java.io.File(base, "v2").getAbsolutePath
      v1.write.mode("overwrite").parquet(p1)
      v2.write.mode("overwrite").parquet(p2)
      s.read.option("mergeSchema", "true").parquet(p1, p2)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_rows"),
          round(sum(coalesce(col("sum_v"), lit(0.0)).cast("decimal(27,10)")), 6)
            .cast("double").as("sum_v"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
      v1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(NULL AS DOUBLE) AS sum_v FROM ev WHERE user_id % 2 = 0
        GROUP BY 1),
      v2 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        ${Ora.dsum6Sql("value")} AS sum_v FROM ev WHERE user_id % 2 = 1
        GROUP BY 1),
      u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_rows,
      CAST(ROUND(SUM(CAST(COALESCE(sum_v, 0.0) AS DECIMAL(27,10))), 6)
        AS DOUBLE) AS sum_v
    FROM u GROUP BY 1 ORDER BY event_type"""))

  val all: Seq[QueryDef] = Seq(logregIrls, timeDecay, schemaEvolution)
}
