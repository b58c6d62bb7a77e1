package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 40 (round 8): time-weighted averaging and drawdown — the
  * finance/IoT window family.
  */
object QueriesAN {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Time-weighted average value (TWAP) per (user, day): each
    * observation holds until the next one (the last until midnight), so
    * irregular sampling cannot bias the mean the way a row-average does.
    * One per-key lead window + decimal-weighted sums.
    */
  val twap: QueryDef = QueryDef(
    "w20_twap",
    (s, dir) => {
      val day = to_date(col("ts"))
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      val ev = t(s, dir, "events")
        .filter(col("value").isNotNull && col("user_id") < 60)
        .select(col("user_id"), day.as("day"), col("ts"), col("event_id"),
          col("value"))
        .withColumn("__end",
          coalesce(unix_timestamp(lead(col("ts"), 1).over(w)),
            unix_timestamp(date_add(col("day"), 1).cast("timestamp"))))
        .withColumn("__w",
          (col("__end") - unix_timestamp(col("ts"))).cast("double"))
      ev.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"),
          round(sum((col("value") * col("__w")).cast("decimal(27,10)"))
              .cast("double") /
            sum(col("__w").cast("decimal(27,10)")).cast("double"), 6)
            .as("twap"),
          Ora.r6(Ora.dmean(col("value"))).as("row_mean"))
        .orderBy(col("user_id"), col("day"))
    },
    Some(s"""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, ts,
        event_id, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL AND user_id < 60),
      wt AS (SELECT user_id, day, v,
        CAST(COALESCE(
            ${Ora.epochSql("LEAD(ts, 1) OVER (PARTITION BY user_id, day ORDER BY ts, event_id)")},
            ${Ora.epochSql("CAST(day + 1 AS TIMESTAMP)")}) -
          ${Ora.epochSql("ts")} AS DOUBLE) AS w
        FROM ev)
    SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n,
      ROUND(CAST(SUM(CAST((v * w) AS DECIMAL(27,10))) AS DOUBLE) /
        CAST(SUM(CAST(w AS DECIMAL(27,10))) AS DOUBLE), 6) AS twap,
      ROUND(${Ora.dmeanSql("v")}, 6) AS row_mean
    FROM wt GROUP BY 1, 2 ORDER BY user_id, day"""))

  /** Maximum drawdown of each user's cumulative (value − 50) series —
    * running peak minus running level, the classic risk metric, from two
    * stacked windows over one per-key sort.
    */
  val maxDrawdown: QueryDef = QueryDef(
    "w21_max_drawdown",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val ev = t(s, dir, "events")
        .filter(col("value").isNotNull && col("user_id") < 60)
        .withColumn("__cum",
          sum((col("value") - lit(50.0)).cast("decimal(27,10)")).over(w)
            .cast("double"))
        .withColumn("__peak", max(col("__cum")).over(w))
        // final_level order key: the per-key row number over the SAME
        // (ts, event_id) sort the running windows use (one WindowExec) —
        // bounded by group size, unlike a packed epoch·K + event_id key,
        // which silently aliases once event_id reaches K
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          round(max(col("__peak") - col("__cum")), 6).as("max_drawdown"),
          round(max_by(col("__cum"), col("__rn")), 6).as("final_level"))
        .orderBy(col("user_id"))
    },
    Some("""WITH ev AS (SELECT user_id, ts, event_id,
        CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL AND user_id < 60),
      c AS (SELECT user_id, ts, event_id,
        CAST(SUM(CAST((v - 50.0) AS DECIMAL(27,10))) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS cum
        FROM ev),
      p AS (SELECT user_id, ts, event_id, cum,
        MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS rn
        FROM c)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      ROUND(MAX(peak - cum), 6) AS max_drawdown,
      ROUND(MAX_BY(cum, rn), 6) AS final_level
    FROM p GROUP BY 1 ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(twap, maxDrawdown)
}
