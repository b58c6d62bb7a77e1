package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.{Behavior, Relational, Stats, Windows}

/** Batch 27 (round 8): survival analysis, event-order analytics, rolling
  * medians, and cadence auditing.
  */
object QueriesAA {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Kaplan-Meier signup→purchase conversion curve in hours; users whose
    * first purchase never follows their first signup are right-censored
    * at a fixed horizon (2024-01-31T00:00Z, epoch 1706659200).
    */
  val survivalKm: QueryDef = {
    val horizon = 1706659200L
    QueryDef(
      "survival_km",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val sg = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
        val pu = ev.filter(col("event_type") === "purchase")
          .join(sg, Seq("user_id"))
          .filter(col("ts") > col("t0"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val subj = sg.join(pu, Seq("user_id"), "left")
          .select(floor((coalesce(unix_timestamp(col("t1")), lit(horizon)) -
              unix_timestamp(col("t0"))) / lit(3600.0)).cast("long").as("dur"),
            col("t1").isNotNull.as("obs"))
        Stats.kaplanMeier(subj, "dur", "obs").orderBy(col("dur"))
      },
      Some(s"""WITH sg AS (SELECT user_id, MIN(ts) AS t0 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        pu AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
          JOIN sg USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > sg.t0 GROUP BY 1),
        subj AS (SELECT CAST(FLOOR((COALESCE(${Ora.epochSql("t1")}, $horizon) -
            ${Ora.epochSql("t0")}) / 3600.0) AS BIGINT) AS dur,
            (t1 IS NOT NULL) AS obs
          FROM sg LEFT JOIN pu USING (user_id)),
        g AS (SELECT dur,
          CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
          CAST(SUM(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT) AS c
          FROM subj WHERE dur IS NOT NULL AND dur >= 0 GROUP BY 1),
        r AS (SELECT dur, d, c, CAST(SUM(d + c) OVER (ORDER BY dur
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
          AS n_risk FROM g),
        e AS (SELECT dur, d, c, n_risk,
          1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
          FROM r WHERE d > 0),
        st AS (SELECT dur, n_risk, d, c,
          MIN(CASE WHEN f > 0 THEN 1.0 ELSE 0.0 END) OVER (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
          CAST(SUM(CAST((CASE WHEN f > 0 THEN ROUND(LN(f), 9) ELSE 0.0 END)
            AS DECIMAL(27,10))) OVER (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS cum
          FROM e)
      SELECT dur, n_risk, d AS n_events, c AS n_censored,
        CASE WHEN dead > 0 THEN ROUND(EXP(cum), 6) ELSE 0.0 END AS survival
      FROM st ORDER BY dur"""))
  }

  /** First-occurrence ordering matrix: users whose first a preceded
    * their first b, for every ordered event-type pair.
    */
  val eventuallyFollows: QueryDef = QueryDef(
    "b7_eventually_follows",
    (s, dir) => Behavior.eventuallyFollows(t(s, dir, "events"),
        "user_id", "ts", "event_type")
      .orderBy(col("a"), col("b")),
    Some("""WITH f AS (SELECT user_id, event_type AS t, MIN(ts) AS ft
        FROM events GROUP BY 1, 2)
      SELECT a.t AS a, b.t AS b, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM f a JOIN f b ON a.user_id = b.user_id
        AND a.t <> b.t AND a.ft < b.ft
      GROUP BY 1, 2 ORDER BY a, b"""))

  /** Exact trailing rolling median (7-row frame) per user, output bounded
    * to user_id < 40 (the oracle-footprint lesson from round 7).
    */
  val rollingMedian: QueryDef = QueryDef(
    "w15_rolling_median",
    (s, dir) => Windows.rollingMedian(
        t(s, dir, "events")
          .filter(col("user_id") < 40 && col("value").isNotNull),
        "user_id", "ts", "event_id", "value", lags = 6)
      .orderBy(col("user_id"), col("ts"), col("event_id")),
    Some("""WITH b AS (SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS v
        FROM events WHERE user_id < 40 AND value IS NOT NULL),
      l AS (SELECT event_id, user_id, ts, v,
        list_sort(list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS vals FROM b)
    SELECT event_id, user_id, ts, v AS value,
      ROUND((vals[CAST(FLOOR((len(vals) + 1) / 2) AS INT)] +
             vals[CAST(FLOOR(len(vals) / 2) AS INT) + 1]) / 2.0, 6)
        AS rolling_median
    FROM l ORDER BY user_id, ts, event_id"""))

  /** Per-day cadence audit: event count + longest intra-day gap. */
  val dqFreshness: QueryDef = QueryDef(
    "dq_freshness_gaps",
    (s, dir) => Relational.dqFreshness(t(s, dir, "events"), "ts", "event_id")
      .orderBy(col("day")),
    Some(s"""WITH b AS (SELECT CAST(ts AS DATE) AS day, ts, event_id
        FROM events),
      l AS (SELECT day, ts, LAG(ts) OVER (PARTITION BY day
        ORDER BY ts, event_id) AS prev FROM b)
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
      MAX(${Ora.epochSql("ts")} - ${Ora.epochSql("prev")}) AS max_gap_s
    FROM l GROUP BY 1 ORDER BY day"""))

  val all: Seq[QueryDef] =
    Seq(survivalKm, eventuallyFollows, rollingMedian, dqFreshness)
}
