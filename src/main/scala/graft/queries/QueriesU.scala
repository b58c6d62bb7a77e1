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

  /** Key-skew diagnostic on the lineitem part key: top-10 keys with share
    * and decimal-exact cumulative share — the number that decides whether
    * the key needs salting before a join.
    */
  val dqSkewProfile: QueryDef = {
    val k = 10
    QueryDef(
      "dq_skew_profile",
      (s, dir) => graft.operators.Relational.keySkewProfile(
          t(s, dir, "lineitem"), "l_partkey", k = k)
        .orderBy(col("rank")),
      Some(s"""WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
        cnts AS (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
        top AS (SELECT l_partkey, cnt FROM cnts
          ORDER BY cnt DESC, l_partkey LIMIT $k),
        sh AS (SELECT l_partkey, cnt, ROW_NUMBER() OVER
            (ORDER BY cnt DESC, l_partkey) AS rank,
            ROUND(CAST(cnt AS DOUBLE) / (SELECT n FROM tot), 6) AS share
          FROM top)
      SELECT CAST(rank AS INT) AS rank, l_partkey, cnt, share,
        ROUND(CAST(SUM(CAST(share AS DECIMAL(27,10))) OVER
          (ORDER BY rank) AS DOUBLE), 6) AS cum_share
      FROM sh ORDER BY rank"""))
  }

  /** Label-propagation communities over the REPEAT co-purchase graph
    * (pairs sharing ≥ 2 orders — the single-basket noise pruned away):
    * 3 synchronous min-label-tie rounds, mirrored as unrolled steps; the
    * top-20 community sizes gate the whole labeling.
    */
  val graphLabelProp: QueryDef = {
    val iters = 3; val k = 20
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst, l.label, COUNT(*) AS c FROM ed e
          JOIN l${i - 1} l ON l.node = e.src GROUP BY 1, 2),
        l$i AS MATERIALIZED (SELECT dst AS node, label FROM
          (SELECT dst, label, ROW_NUMBER() OVER
            (PARTITION BY dst ORDER BY c DESC, label) AS rn FROM c$i)
          WHERE rn = 1)"""
    }.mkString(",\n        ")
    QueryDef(
      "graph_label_prop",
      (s, dir) => {
        val edges = Queries.coPurchasePairs(s, dir)
          .filter(col("n_ab") >= 2)
          .select(col("a"), col("b"))
        graft.llm.Graph.labelPropagation(edges, iters = iters, k = k)
          .orderBy(col("rank"))
      },
      Some(s"""WITH bk AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
          FROM lineitem),
        e0 AS (SELECT l.item AS a, r.item AS b FROM bk l JOIN bk r USING (ok)
          WHERE l.item < r.item GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
          UNION SELECT b, a FROM e0),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed),
        $steps,
        fin AS (SELECT label, COUNT(*) AS size FROM l$iters GROUP BY 1),
        r AS (SELECT label, size, ROW_NUMBER() OVER
          (ORDER BY size DESC, label) AS rank FROM fin)
      SELECT CAST(rank AS INT) AS rank, label AS community, size
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  val all: Seq[QueryDef] =
    Seq(dqProfile, dqReferential, dqSkewProfile, graphLabelProp)
}
