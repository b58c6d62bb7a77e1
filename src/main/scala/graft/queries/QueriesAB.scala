package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.Stats

/** Batch 28 (round 8): multiset set operations, correlation matrices,
  * and GROUPING SETS — the remaining relational-algebra coverage rows.
  */
object QueriesAB {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Bag-semantics set ops: EXCEPT ALL and INTERSECT ALL between the full
    * event multiset and its even-event-id half (user_id < 30 slice keeps
    * the dump bounded). Multiplicities, not membership, are gated.
    */
  val multisetOps: QueryDef = QueryDef(
    "o13_multiset_ops",
    (s, dir) => {
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .select(col("user_id"), col("event_type"))
      val half = t(s, dir, "events")
        .filter(col("user_id") < 30 && col("event_id") % 2 === 0)
        .select(col("user_id"), col("event_type"))
      base.exceptAll(half).withColumn("tag", lit("except"))
        .unionAll(base.intersectAll(half).withColumn("tag", lit("intersect")))
        .orderBy(col("tag"), col("user_id"), col("event_type"))
    },
    Some("""WITH base AS (SELECT user_id, event_type FROM events
        WHERE user_id < 30),
      half AS (SELECT user_id, event_type FROM events
        WHERE user_id < 30 AND event_id % 2 = 0)
    SELECT user_id, event_type, 'except' AS tag
      FROM (SELECT * FROM base EXCEPT ALL SELECT * FROM half)
    UNION ALL
    SELECT user_id, event_type, 'intersect' AS tag
      FROM (SELECT * FROM base INTERSECT ALL SELECT * FROM half)
    ORDER BY tag, user_id, event_type"""))

  /** Pairwise Pearson correlations among (value, hour, day-of-month)
    * from one sufficient-statistics pass.
    */
  val corrMatrix: QueryDef = {
    val decS = (e: String) => s"CAST(SUM(CAST(($e) AS DECIMAL(27,10))) AS DOUBLE)"
    def pair(a: String, b: String) =
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
        CASE WHEN mx_$a > mn_$a AND mx_$b > mn_$b THEN
          ROUND((CAST(n AS DOUBLE) * sp_${a}_$b - s_$a * s_$b) /
            SQRT((CAST(n AS DOUBLE) * ss_$a - s_$a * s_$a) *
              (CAST(n AS DOUBLE) * ss_$b - s_$b * s_$b)), 6) END AS corr
        FROM m"""
    QueryDef(
      "a24_corr_pairs",
      (s, dir) => Stats.corrPairs(
          t(s, dir, "events")
            .select(col("value").as("v"),
              hour(col("ts")).cast("double").as("hr"),
              dayofmonth(col("ts")).cast("double").as("dom")),
          Seq("v", "hr", "dom"))
        .orderBy(col("col_a"), col("col_b")),
      Some(s"""WITH b AS (SELECT CAST(value AS DOUBLE) AS v,
          CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr,
          CAST(EXTRACT(DAY FROM ts) AS DOUBLE) AS dom
          FROM events
          WHERE value IS NOT NULL AND ts IS NOT NULL),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          ${decS("v")} AS s_v, ${decS("v * v")} AS ss_v,
          ${decS("hr")} AS s_hr, ${decS("hr * hr")} AS ss_hr,
          ${decS("dom")} AS s_dom, ${decS("dom * dom")} AS ss_dom,
          ${decS("v * hr")} AS sp_v_hr, ${decS("v * dom")} AS sp_v_dom,
          ${decS("hr * dom")} AS sp_hr_dom,
          MIN(v) AS mn_v, MAX(v) AS mx_v, MIN(hr) AS mn_hr, MAX(hr) AS mx_hr,
          MIN(dom) AS mn_dom, MAX(dom) AS mx_dom
          FROM b)
      ${pair("v", "hr")} UNION ALL ${pair("v", "dom")}
      UNION ALL ${pair("hr", "dom")}
      ORDER BY col_a, col_b"""))
  }

  /** GROUPING SETS with grouping_id — the arbitrary-combination variant
    * completing the cube (a16) / rollup (a19) family.
    */
  val groupingSets: QueryDef = QueryDef(
    "a25_grouping_sets",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("hr")), Seq.empty),
        col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"),
        Ora.dsum6(col("value")).as("sum_v"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("event_type"), col("hr")),
    Some(s"""SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr,
        CAST(COUNT(*) AS BIGINT) AS n, ${Ora.dsum6Sql("value")} AS sum_v,
        CAST(GROUPING(event_type, EXTRACT(HOUR FROM ts)) AS INT) AS gid
      FROM events
      GROUP BY GROUPING SETS ((event_type), (EXTRACT(HOUR FROM ts)), ())
      ORDER BY gid, event_type, hr"""))

  val all: Seq[QueryDef] = Seq(multisetOps, corrMatrix, groupingSets)
}
