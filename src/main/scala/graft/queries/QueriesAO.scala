package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 41 (round 8): period-over-period deltas, candidate-key
  * discovery, systematic sampling.
  */
object QueriesAO {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Day-over-day percentage change of daily per-type volume and value —
    * the period-over-period BI metric, with NULL on the first day and on
    * a zero base.
    */
  val pctChange: QueryDef = QueryDef(
    "w22_pct_change",
    (s, dir) => {
      val daily = t(s, dir, "events").filter(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), Ora.dsum6(col("value")).as("sum_v"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("__pn", lag(col("n"), 1).over(w))
        .withColumn("__pv", lag(col("sum_v"), 1).over(w))
        .select(col("event_type"), col("day"), col("n"), col("sum_v"),
          when(col("__pn") > 0,
            round((col("n") - col("__pn")).cast("double") /
              col("__pn").cast("double"), 6)).as("n_pct_change"),
          when(abs(col("__pv")) > 0,
            round((col("sum_v") - col("__pv")) / col("__pv"), 6))
            .as("v_pct_change"))
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(COUNT(*) AS BIGINT) AS n, ${Ora.dsum6Sql("value")} AS sum_v
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      l AS (SELECT event_type, day, n, sum_v,
        LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS pn,
        LAG(sum_v, 1) OVER (PARTITION BY event_type ORDER BY day) AS pv
        FROM d)
    SELECT event_type, day, n, sum_v,
      CASE WHEN pn > 0 THEN
        ROUND(CAST(n - pn AS DOUBLE) / CAST(pn AS DOUBLE), 6) END
        AS n_pct_change,
      CASE WHEN ABS(pv) > 0 THEN ROUND((sum_v - pv) / pv, 6) END
        AS v_pct_change
    FROM l ORDER BY event_type, day"""))

  /** Candidate-key discovery over the orders table: distinct-count ratio
    * per proposed key set — ratio 1 means the combination uniquely
    * identifies rows; the schema-inference audit.
    */
  val candidateKeys: QueryDef = {
    val combos = Seq(
      "o_orderkey" -> Seq("o_orderkey"),
      "o_custkey" -> Seq("o_custkey"),
      "o_custkey+o_orderdate" -> Seq("o_custkey", "o_orderdate"),
      "o_orderstatus+o_orderpriority" -> Seq("o_orderstatus", "o_orderpriority"))
    QueryDef(
      "dq_candidate_keys",
      (s, dir) => {
        val o = t(s, dir, "orders")
        combos.map { case (name, cols) =>
          o.agg(count(lit(1)).as("n_rows"),
              countDistinct(col(cols.head), cols.tail.map(col): _*)
                .as("n_distinct"))
            .select(lit(name).as("key_set"), col("n_rows"), col("n_distinct"),
              round(col("n_distinct").cast("double") /
                col("n_rows").cast("double"), 6).as("uniqueness"),
              (col("n_distinct") === col("n_rows")).as("is_candidate_key"))
        }.reduceLeft(_ unionAll _).orderBy(col("key_set"))
      },
      Some(combos.map { case (name, cols) =>
        s"""SELECT '$name' AS key_set, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(DISTINCT (${cols.mkString(", ")})) AS BIGINT)
            AS n_distinct,
          ROUND(CAST(COUNT(DISTINCT (${cols.mkString(", ")})) AS DOUBLE) /
            CAST(COUNT(*) AS DOUBLE), 6) AS uniqueness,
          (COUNT(DISTINCT (${cols.mkString(", ")})) = COUNT(*))
            AS is_candidate_key
        FROM orders"""
      }.mkString("", " UNION ALL ", " ORDER BY key_set")))
  }

  /** Systematic sampling: every 40th event in the (ts, event_id) total
    * order with a fixed anchor — the deterministic evenly-spaced sample
    * (contrast with the hash-Bernoulli and reservoir samplers already
    * gated). The rank runs per day so no global sort is ever needed; the
    * (day, rank) pair is the systematic index.
    */
  val systematicSample: QueryDef = {
    val k = 40
    QueryDef(
      "sample_systematic",
      (s, dir) => {
        val day = to_date(col("ts"))
        val w = Window.partitionBy(col("day")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), day.as("day"), col("ts"), col("user_id"),
            col("event_type"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") % k === 1)
          .select(col("event_id"), col("day"), col("user_id"),
            col("event_type"), col("__rn").cast("int").as("day_rank"))
          .orderBy(col("day"), col("day_rank"))
      },
      Some(s"""WITH r AS (SELECT event_id, CAST(ts AS DATE) AS day, user_id,
          event_type, ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
            ORDER BY ts, event_id) AS rn
          FROM events)
      SELECT event_id, day, user_id, event_type, CAST(rn AS INT) AS day_rank
      FROM r WHERE rn % $k = 1 ORDER BY day, day_rank"""))
  }

  val all: Seq[QueryDef] = Seq(pctChange, candidateKeys, systematicSample)
}
