package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 35 (round 8): forecast backtesting, ordered string aggregation,
  * percentile-gated cohort selection.
  */
object QueriesAI {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Seasonal-naive forecast backtest: per (event_type, hour-of-day)
    * train-window mean predicts the held-out final day; per-type MAE +
    * bias gate the whole backtest loop (train/test split, baseline
    * build, scoring join, error rollup).
    */
  val forecastBacktest: QueryDef = {
    val testDay = "2024-01-30"
    QueryDef(
      "forecast_backtest",
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"), to_date(col("ts")).as("day"),
            hour(col("ts")).as("hr"), col("value"))
        val train = ev.filter(col("day") < lit(testDay).cast("date"))
          .groupBy(col("event_type"), col("hr"))
          .agg(Ora.dmean(col("value")).as("pred"))
        val test = ev.filter(col("day") === lit(testDay).cast("date"))
        test.join(train, Seq("event_type", "hr"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_test"),
            Ora.r6(Ora.dmean(abs(col("value") - col("pred")))).as("mae"),
            Ora.r6(Ora.dmean(col("value") - col("pred"))).as("bias"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        train AS (SELECT event_type, hr, ${Ora.dmeanSql("v")} AS pred
          FROM ev WHERE day < DATE '$testDay' GROUP BY 1, 2),
        test AS (SELECT * FROM ev WHERE day = DATE '$testDay')
      SELECT t.event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
        ROUND(${Ora.dmeanSql("ABS(t.v - tr.pred)")}, 6) AS mae,
        ROUND(${Ora.dmeanSql("t.v - tr.pred")}, 6) AS bias
      FROM test t JOIN train tr ON tr.event_type = t.event_type
        AND tr.hr = t.hr
      GROUP BY t.event_type ORDER BY t.event_type"""))
  }

  /** Ordered string aggregation: each user's distinct event types as a
    * sorted comma-joined list — deterministic on both engines because
    * the order is explicit (array_sort ↔ ORDER BY inside string_agg).
    */
  val listAgg: QueryDef = QueryDef(
    "a28_listagg",
    (s, dir) => t(s, dir, "events").filter(col("user_id") < 30)
      .groupBy(col("user_id"))
      .agg(concat_ws(",", array_sort(collect_set(col("event_type"))))
        .as("types_csv"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id,
        STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
        CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
      FROM events WHERE user_id < 30
      GROUP BY user_id ORDER BY user_id"""))

  /** Power-user selection above the exact interpolated p90 of per-user
    * event counts — percentile threshold on the CONTRACTED |users|
    * relation, then a filter; the "top decile cohort" every growth
    * dashboard defines.
    *
    * Scale shape: the threshold comes from
    * [[graft.operators.Agg.exactPercentilesMulti]] — shuffle-free
    * counting selection, never a global sort or single-partition window —
    * and is broadcast back as a LITERAL, so the plan over the per-user
    * relation is scan → hash-agg → filter at ANY table size (a
    * billion-user events table never single-partition-sorts |users| rows).
    */
  val powerUsers: QueryDef = {
    val p = 0.9
    QueryDef(
      "b9_power_users",
      (s, dir) => {
        val counts = t(s, dir, "events").groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .localCheckpoint() // threshold pass + final scan read it twice
        val n = counts.count()
        val thr = graft.operators.Agg.exactPercentilesMulti(
          counts, Seq("n_events"), Seq(p), Map("n_events" -> n))("n_events").head
        counts
          .filter(col("n_events").cast("double") > lit(thr))
          .select(col("user_id"), col("n_events"),
            round(lit(thr), 6).as("p90_threshold"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH counts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT)
          AS n_events FROM events GROUP BY 1),
        thr AS (SELECT quantile_cont(CAST(n_events AS DOUBLE), $p) AS thr
          FROM counts)
      SELECT c.user_id, c.n_events, ROUND(t.thr, 6) AS p90_threshold
      FROM counts c CROSS JOIN thr t
      WHERE CAST(c.n_events AS DOUBLE) > t.thr
      ORDER BY c.user_id"""))
  }

  val all: Seq[QueryDef] = Seq(forecastBacktest, listAgg, powerUsers)
}
