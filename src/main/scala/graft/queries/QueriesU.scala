package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 21 (round 8): data-quality audits — the checks a pipeline runs
  * before trusting an ingest drop, as first-class gated queries.
  */
object QueriesU {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Column profile of the events table: per-column null / exact-distinct
    * counts plus the whole-row duplicate row. Count-only on purpose —
    * min/max would drag engine type formatting into the gate.
    */
  val dqProfile: QueryDef = {
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    def colSql(c: String): String =
      s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
        CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM events"""
    QueryDef(
      "dq_profile",
      (s, dir) => graft.operators.Relational.dqProfile(
          t(s, dir, "events"), cols)
        .orderBy(col("column_name")),
      Some(s"""WITH dr AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndr FROM
          (SELECT DISTINCT * FROM events))
      ${cols.map(colSql).mkString("\n      UNION ALL ")}
      UNION ALL SELECT '*' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - (SELECT ndr FROM dr) AS BIGINT) AS n_null,
        (SELECT ndr FROM dr) AS n_distinct FROM events
      ORDER BY column_name"""))
  }

  /** Referential-integrity orphan report: lineitem rows whose order key
    * misses a dimension slice (orders with o_orderkey % 5 = 0 removed, so
    * ~20% of facts really are orphans — the audit exercises non-zero
    * findings, not a vacuous pass).
    */
  val dqReferential: QueryDef = {
    val k = 10
    QueryDef(
      "dq_referential",
      (s, dir) => graft.operators.Relational.dqOrphans(
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders").filter(col("o_orderkey") % 5 =!= 0),
          "o_orderkey", k = k)
        .orderBy(col("rank")),
      Some(s"""WITH dim AS (SELECT DISTINCT o_orderkey FROM orders
          WHERE o_orderkey % 5 <> 0),
        orp AS (SELECT l_orderkey, COUNT(*) AS n_rows FROM lineitem l
          ANTI JOIN dim d ON l.l_orderkey = d.o_orderkey GROUP BY 1),
        r AS (SELECT l_orderkey, n_rows, ROW_NUMBER() OVER
          (ORDER BY n_rows DESC, l_orderkey) AS rank FROM orp)
      SELECT CAST(rank AS INT) AS rank, l_orderkey,
        CAST(n_rows AS BIGINT) AS n_rows
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  val all: Seq[QueryDef] = Seq(dqProfile, dqReferential)
}
