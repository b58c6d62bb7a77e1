package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 46: time-series depth — per-group autocorrelation. The one
  * classical series diagnostic the engine lacked next to EWMA/rolling
  * z-score/seasonal decomposition: ACF at lags 1..k per event_type,
  * single-window single-aggregation shape (operators/Stats.acf).
  */
object QueriesAT {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Sample ACF at lags 1..4 of `value` per event_type in (ts, event_id)
    * order ([[graft.operators.Stats.acf]]). The estimator's numerator is
    * expanded to sufficient statistics (Σvₜvₜ₋ℓ, Σvₜ, Σvₜ₋ℓ, nℓ) so ONE
    * partitioned lag window + ONE map-combinable groupBy answer all lags
    * — no mean-first second pass over the data, no global window. Sums
    * accumulate in DECIMAL(27,10) (dsum rule) making the statistics
    * partition- and merge-order-independent; the closed form then runs
    * on exact scalars in the identical expression tree on both engines.
    */
  val tsAcf: QueryDef = {
    val maxLag = 4
    QueryDef(
      "ts_acf",
      (s, dir) => graft.operators.Stats.acf(t(s, dir, "events"),
          "event_type", "ts", "event_id", "value", maxLag)
        .orderBy(col("event_type"), col("lag")),
      Some {
        val lagCols = (1 to maxLag)
          .map(l => s"LAG(v, $l) OVER w AS v$l").mkString(",\n            ")
        val lagAggs = (1 to maxLag).map { l =>
          s"""CAST(COUNT(v$l) AS BIGINT) AS n$l,
            ${Ora.dsumSql(s"CASE WHEN v$l IS NOT NULL THEN v * v$l END")} AS sxy$l,
            ${Ora.dsumSql(s"CASE WHEN v$l IS NOT NULL THEN v END")} AS sx$l,
            ${Ora.dsumSql(s"v$l")} AS sy$l"""
        }.mkString(",\n          ")
        val branches = (1 to maxLag).map { l =>
          s"""SELECT event_type, CAST($l AS INT) AS lag, n$l AS n_pairs,
            CASE WHEN den > 0.0 AND n$l > 0
              THEN ROUND((sxy$l - m * sx$l - m * sy$l +
                CAST(n$l AS DOUBLE) * m * m) / den, 6) END AS acf
          FROM c"""
        }.mkString("\n          UNION ALL ")
        s"""WITH ev AS (SELECT event_type, ts, event_id,
              CAST(value AS DOUBLE) AS v
            FROM events WHERE value IS NOT NULL
              AND NOT isnan(CAST(value AS DOUBLE))),
          l AS (SELECT event_type, v,
            $lagCols
          FROM ev WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
          a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            ${Ora.dsumSql("v")} AS s, ${Ora.dsumSql("v * v")} AS ss,
          $lagAggs
          FROM l GROUP BY 1),
          b AS (SELECT *, s / CAST(n AS DOUBLE) AS m FROM a),
          c AS (SELECT *, ss - CAST(n AS DOUBLE) * m * m AS den FROM b)
        SELECT event_type, lag, n_pairs, acf FROM (
          $branches)
        ORDER BY event_type, lag"""
      })
  }

  val all: Seq[QueryDef] = Seq(tsAcf)
}
