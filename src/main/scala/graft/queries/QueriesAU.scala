package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.Relational

/** Batch 47: view-maintenance depth — incremental aggregate maintenance
  * with retractions, and the point-in-time snapshot read over SCD2
  * history. Together they close the materialized-view loop: maintain an
  * aggregate without rescanning the base, and time-travel the dimension
  * the changelog built.
  */
object QueriesAU {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Incremental aggregate maintenance e2e
    * ([[Relational.buildAggState]] → [[Relational.maintainAgg]] →
    * [[Relational.rescanExtremes]]): per-user count/sum/min/max are
    * maintained from a base (event_id % 5 != 0) through a change batch —
    * inserts (event_id % 5 = 0, op +1) plus retractions (base rows with
    * event_id % 7 = 0, op −1) — then stale extremes are repaired against
    * the post-change base. The mirror computes the direct aggregate over
    * the post-change multiset, so hash equality proves the maintenance
    * algebra (additive cnt/sum, conservative min/max staleness + keyed
    * rescan) equals recomputation. cnt and sum maintain exactly (sum in
    * DECIMAL, retraction-exact and order-free); min/max repair touches
    * ONLY flagged groups — the 100 TB point: the delta and the stale key
    * set are small, the base is not rescanned wholesale.
    */
  val ivmAggMaintenance: QueryDef = QueryDef(
    "ivm_agg_maintenance",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"), col("value"))
      val base = ev.filter(pmod(col("event_id"), lit(5)) =!= 0)
      val inserts = ev.filter(pmod(col("event_id"), lit(5)) === 0)
        .withColumn("op", lit(1))
      val retractions = base.filter(pmod(col("event_id"), lit(7)) === 0)
        .withColumn("op", lit(-1))
      val current = ev.filter(
        pmod(col("event_id"), lit(5)) === 0 || pmod(col("event_id"), lit(7)) =!= 0)
      val state0 = Relational.buildAggState(base, Seq("user_id"), "value")
      val state1 = Relational.maintainAgg(state0,
        inserts.unionByName(retractions), Seq("user_id"), "value", "op")
      Relational.rescanExtremes(state1, current, Seq("user_id"), "value")
        .select(col("user_id"), col("cnt"),
          round(col("sum_v"), 6).cast("double").as("sum_v"),
          col("min_v"), col("max_v"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(27,10))), 6) AS DOUBLE) AS sum_v,
        MIN(value) AS min_v, MAX(value) AS max_v
      FROM events
      WHERE event_id % 5 = 0 OR event_id % 7 <> 0
      GROUP BY user_id ORDER BY user_id"""))

  /** Point-in-time dimension read ([[Relational.snapshotAt]] over the
    * [[Relational.cdcScd2]] history of cdc_scd2_e2e): the dimension as it
    * stood mid-month — the version whose validity interval covers the
    * probe instant, keys deleted-at-probe-time absent. A codegen'd
    * interval filter over the history; on a validity-partitioned layout
    * the predicate prunes row groups (time travel reads a slice).
    */
  val scd2SnapshotAt: QueryDef = QueryDef(
    "scd2_snapshot_at",
    (s, dir) => {
      val ops = t(s, dir, "events").filter(col("user_id") < 40)
        .withColumn("op",
          when(col("event_type") === "signup", lit("I"))
            .when(col("event_type") === "error", lit("D"))
            .otherwise(lit("U")))
      val hist = Relational.cdcScd2(ops, "user_id", "event_type",
        "ts", "event_id", "op")
      Relational.snapshotAt(hist, lit("2024-01-16 00:00:00").cast("timestamp"))
        .select(col("user_id"), col("version"), col("event_type"),
          col("valid_from"))
        .orderBy(col("user_id"))
    },
    Some("""WITH ops AS (SELECT user_id, event_id, ts,
          CASE WHEN event_type = 'signup' THEN 'I'
               WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
          event_type
        FROM events WHERE user_id < 40),
      st AS (SELECT user_id, ts, event_id,
          CASE WHEN op = 'D' THEN NULL ELSE event_type END AS s,
          LAG(CASE WHEN op = 'D' THEN NULL ELSE event_type END) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
          ROW_NUMBER() OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM ops),
      ch AS (SELECT user_id, ts, event_id, s FROM st
        WHERE rn = 1 OR s IS DISTINCT FROM prev),
      iv AS (SELECT user_id, ts, event_id, s, LEAD(ts) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM ch),
      hist AS (SELECT user_id, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS INT) AS version,
          s AS event_type, ts AS valid_from, valid_to
        FROM iv WHERE s IS NOT NULL)
      SELECT user_id, version, event_type, valid_from
      FROM hist
      WHERE valid_from <= TIMESTAMP '2024-01-16 00:00:00'
        AND (valid_to IS NULL OR TIMESTAMP '2024-01-16 00:00:00' < valid_to)
      ORDER BY user_id"""))

  /** Changelog generation ([[Relational.diffToChangelog]]): diff two
    * keyed per-user snapshots into the I/U/D change feed — the inverse of
    * s16_cdc_apply, and the CDF a lakehouse format would emit. Snapshot
    * v1 covers users with user_id % 7 != 0 aggregating even event_ids;
    * v2 covers users with user_id % 5 != 0 aggregating all events — so
    * inserts (%7=0, %5<>0), deletes (%5=0, %7<>0), updates (shared users
    * whose even-only max differs from the overall max), and silent
    * unchanged rows all occur. One full-outer key join; output sized by
    * the change. D tombstones carry null payloads on both engines.
    */
  val cdfDiff: QueryDef = QueryDef(
    "cdf_snapshot_diff",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val v1 = ev.filter(pmod(col("user_id"), lit(7)) =!= 0 &&
          pmod(col("event_id"), lit(2)) === 0)
        .groupBy(col("user_id")).agg(max(col("value")).as("value"))
      val v2 = ev.filter(pmod(col("user_id"), lit(5)) =!= 0)
        .groupBy(col("user_id")).agg(max(col("value")).as("value"))
      graft.operators.Relational.diffToChangelog(v1, v2, "user_id", Seq("value"))
        .orderBy(col("user_id"))
    },
    Some("""WITH v1 AS (SELECT user_id, MAX(value) AS value FROM events
        WHERE user_id % 7 <> 0 AND event_id % 2 = 0 GROUP BY user_id),
      v2 AS (SELECT user_id, MAX(value) AS value FROM events
        WHERE user_id % 5 <> 0 GROUP BY user_id),
      j AS (SELECT v1.user_id AS k1, v2.user_id AS k2,
          v1.value AS a, v2.value AS b
        FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id)
      SELECT COALESCE(k2, k1) AS user_id,
        CASE WHEN k1 IS NULL THEN 'I'
             WHEN k2 IS NULL THEN 'D'
             WHEN a IS DISTINCT FROM b THEN 'U' END AS op,
        CASE WHEN k2 IS NOT NULL AND (k1 IS NULL OR a IS DISTINCT FROM b)
             THEN b END AS value
      FROM j
      WHERE k1 IS NULL OR k2 IS NULL OR a IS DISTINCT FROM b
      ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(ivmAggMaintenance, scd2SnapshotAt, cdfDiff)
}
