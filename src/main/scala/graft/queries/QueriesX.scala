package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.Stats

/** Batch 24 (round 8): graph reachability, lakehouse snapshot diff, and
  * A/B mean testing. The BFS mirror unrolls the frontier rounds as CTEs
  * (the graph_label_prop pattern); the diff mirror rebuilds the same
  * simulated v2 with identical arithmetic.
  */
object QueriesX {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** BFS layer census from seed items (item % 97 = 0) over the repeat
    * co-purchase graph (pairs sharing ≥ 2 orders), 3 hops; hop −1 counts
    * graph nodes unreached within the bound.
    */
  val graphBfsLayers: QueryDef = {
    val hops = 3
    val steps = (1 to hops).map { i =>
      s"""f$i AS (SELECT DISTINCT x.node FROM
          (SELECT e.dst AS node FROM ed e JOIN d${i - 1} s ON s.node = e.src) x
          ANTI JOIN d${i - 1} v ON x.node = v.node),
        d$i AS MATERIALIZED (SELECT * FROM d${i - 1}
          UNION ALL SELECT node, $i AS hop FROM f$i)"""
    }.mkString(",\n        ")
    QueryDef(
      "graph_bfs_layers",
      (s, dir) => {
        val edges = Queries.coPurchasePairs(s, dir)
          .filter(col("n_ab") >= 2)
          .select(col("a"), col("b"))
        val seeds = t(s, dir, "lineitem")
          .select(col("l_partkey").as("node")).distinct()
          .filter(col("node") % 97 === 0)
        graft.llm.Graph.bfsLayers(edges, seeds, maxHops = hops)
          .orderBy(col("hop"))
      },
      Some(s"""WITH bk AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
          FROM lineitem),
        e0 AS (SELECT l.item AS a, r.item AS b FROM bk l JOIN bk r USING (ok)
          WHERE l.item < r.item GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
          UNION SELECT b, a FROM e0),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ed),
        d0 AS MATERIALIZED (SELECT node, 0 AS hop FROM nodes
          WHERE node % 97 = 0),
        $steps
      SELECT CAST(hop AS INT) AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM d$hops GROUP BY 1
      UNION ALL SELECT -1,
        (SELECT COUNT(*) FROM nodes) - (SELECT COUNT(*) FROM d$hops)
      ORDER BY hop"""))
  }

  /** Lakehouse snapshot diff: orders v1 vs a simulated v2 (keys %7
    * removed, prices %5 changed by ×1.1, keys %11 re-added shifted by
    * 10M), classified per key with the differing-column set.
    */
  val snapshotDiff: QueryDef = {
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    def colsSql(pfx: String) = cols.map(c => s"$pfx$c").mkString(", ")
    val diffs = cols.map(c =>
      s"(a.$c IS DISTINCT FROM b.$c)").mkString(" OR ")
    val changedList = cols.map(c =>
      s"CASE WHEN a.$c IS DISTINCT FROM b.$c THEN '$c' END").mkString(", ")
    QueryDef(
      "s18_snapshot_diff",
      (s, dir) => {
        val v1 = t(s, dir, "orders")
        val base = v1.filter(col("o_orderkey") % 7 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 5 === 0, col("o_totalprice") * lit(1.1))
              .otherwise(col("o_totalprice")))
        val added = v1.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
        val v2 = base.unionByName(added)
        graft.operators.Relational.snapshotDiff(v1, v2, "o_orderkey", cols)
          .orderBy(col("status"), col("changed_cols"))
      },
      Some(s"""WITH v1 AS (SELECT o_orderkey, ${cols.mkString(", ")} FROM orders),
        v2 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice, o_orderpriority
          FROM orders WHERE o_orderkey % 7 <> 0
          UNION ALL
          SELECT o_orderkey + 10000000, ${cols.mkString(", ")}
          FROM orders WHERE o_orderkey % 11 = 0),
        j AS (SELECT
            CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN $diffs THEN 'changed'
              ELSE 'unchanged' END AS status,
            CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                AND ($diffs)
              THEN CONCAT_WS(',', $changedList) ELSE '' END AS changed_cols
          FROM v1 a FULL JOIN v2 b ON a.o_orderkey = b.o_orderkey)
      SELECT status, changed_cols, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM j GROUP BY 1, 2 ORDER BY status, changed_cols"""))
  }

  /** Welch z per event type for value means between user-id-parity arms. */
  val abWelchZ: QueryDef = {
    def armSql(arm: Int, c: String) = s"MAX(CASE WHEN arm = $arm THEN $c END)"
    def vrSql(i: Int) =
      s"((svv$i - sv$i * sv$i / CAST(n$i AS DOUBLE)) / (CAST(n$i AS DOUBLE) - 1.0))"
    val se2 = s"(${vrSql(0)} / CAST(n0 AS DOUBLE) + ${vrSql(1)} / CAST(n1 AS DOUBLE))"
    QueryDef(
      "ab_welch_z",
      (s, dir) => Stats.abWelchZ(
          t(s, dir, "events")
            .select(col("event_type"), (col("user_id") % 2).as("variant"),
              col("value")),
          "event_type", "variant", "value")
        .orderBy(col("event_type")),
      Some(s"""WITH b AS (SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
          CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL),
        s AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(v AS DECIMAL(27,10))) AS DOUBLE) AS sv,
          CAST(SUM(CAST((v * v) AS DECIMAL(27,10))) AS DOUBLE) AS svv,
          MIN(v) AS mn, MAX(v) AS mx
          FROM b GROUP BY 1, 2),
        p AS (SELECT event_type,
          ${armSql(0, "n")} AS n0, ${armSql(0, "sv")} AS sv0,
          ${armSql(0, "svv")} AS svv0,
          ${armSql(0, "mn")} AS mn0, ${armSql(0, "mx")} AS mx0,
          ${armSql(1, "n")} AS n1, ${armSql(1, "sv")} AS sv1,
          ${armSql(1, "svv")} AS svv1,
          ${armSql(1, "mn")} AS mn1, ${armSql(1, "mx")} AS mx1
          FROM s GROUP BY 1)
      SELECT event_type, n0, n1,
        ROUND(sv0 / CAST(n0 AS DOUBLE), 6) AS mean0,
        ROUND(sv1 / CAST(n1 AS DOUBLE), 6) AS mean1,
        CASE WHEN n0 >= 2 AND n1 >= 2 AND (mx0 > mn0 OR mx1 > mn1) THEN
          ROUND((sv1 / CAST(n1 AS DOUBLE) - sv0 / CAST(n0 AS DOUBLE)) /
            SQRT($se2), 6) END AS welch_z
      FROM p ORDER BY event_type"""))
  }

  val all: Seq[QueryDef] = Seq(graphBfsLayers, snapshotDiff, abWelchZ)
}
