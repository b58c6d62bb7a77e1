package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 29 (round 8): gaps-and-islands streaks, mergeable partial
  * aggregates, and HITS hubs/authorities.
  */
object QueriesAC {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Longest consecutive-day streak per user (user_id < 60 slice bounds
    * the dump) — the gaps-and-islands pattern under the gate.
    */
  val longestStreak: QueryDef = QueryDef(
    "w16_longest_streak",
    (s, dir) => graft.operators.Behavior.longestStreak(
        t(s, dir, "events").filter(col("user_id") < 60), "user_id", "ts")
      .orderBy(col("user_id")),
    Some("""WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE user_id < 60),
      isl AS (SELECT user_id,
          (day - DATE '1970-01-01') - ROW_NUMBER() OVER
            (PARTITION BY user_id ORDER BY day) AS grp
        FROM active),
      runs AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
      CAST(COUNT(*) AS BIGINT) AS n_streaks,
      CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY 1 ORDER BY user_id"""))

  /** Mergeable partial aggregates: per-day (n, decimal sum) partials
    * re-aggregated to per-type totals. The ORACLE is the DIRECT
    * single-pass aggregation — the gate proves the partial-merge algebra
    * is lossless, which is the contract every incremental/streaming
    * rollup in this engine leans on.
    */
  val partialMerge: QueryDef = QueryDef(
    "a26_partial_merge",
    (s, dir) => {
      val partials = t(s, dir, "events").filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(27,10)")).as("psum"))
      partials.groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"),
          round(sum(col("psum")), 6).cast("double").as("sum_v"))
        .orderBy(col("event_type"))
    },
    Some(s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        ${Ora.dsum6Sql("value")} AS sum_v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""))

  /** HITS authorities over the customer→part purchase graph, 2
    * max-normalized iterations, top-20 items.
    */
  val graphHits: QueryDef = {
    val iters = 2; val k = 20
    val steps = (1 to iters).map { i =>
      s"""ar$i AS (SELECT e.i,
          CAST(SUM(CAST(h.h AS DECIMAL(27,10))) AS DOUBLE) AS ar
          FROM ed e JOIN hub${i - 1} h ON h.u = e.u GROUP BY 1),
        am$i AS (SELECT MAX(ar) AS am FROM ar$i),
        auth$i AS MATERIALIZED (SELECT i, ar / (SELECT am FROM am$i) AS a
          FROM ar$i),
        hr$i AS (SELECT e.u,
          CAST(SUM(CAST(a.a AS DECIMAL(27,10))) AS DOUBLE) AS hr
          FROM ed e JOIN auth$i a ON a.i = e.i GROUP BY 1),
        hm$i AS (SELECT MAX(hr) AS hm FROM hr$i),
        hub$i AS MATERIALIZED (SELECT u, hr / (SELECT hm FROM hm$i) AS h
          FROM hr$i)"""
    }.mkString(",\n        ")
    QueryDef(
      "graph_hits",
      (s, dir) => {
        val edges = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("u"))
          .join(t(s, dir, "lineitem")
            .select(col("l_orderkey").as("o_orderkey"),
              col("l_partkey").as("i")), Seq("o_orderkey"))
          .select(col("u"), col("i"))
        graft.llm.Graph.hits(edges, iters = iters, k = k)
          .orderBy(col("rank"))
      },
      Some(s"""WITH ed AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS u,
          l.l_partkey AS i
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        hub0 AS (SELECT DISTINCT u, 1.0 AS h FROM ed),
        $steps,
        r AS (SELECT i, a, ROW_NUMBER() OVER (ORDER BY a DESC, i) AS rank
          FROM auth$iters)
      SELECT CAST(rank AS INT) AS rank, i AS authority,
        ROUND(a, 6) AS score
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  val all: Seq[QueryDef] = Seq(longestStreak, partialMerge, graphHits)
}
