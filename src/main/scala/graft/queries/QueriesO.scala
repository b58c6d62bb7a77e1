package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 15: OLAP surface widening — grouping sets (CUBE) and time-range
  * window frames, the two classic warehouse shapes not yet under the gate.
  */
object QueriesO {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** CUBE over (lang, source): all four grouping sets in one pass with
    * grouping_id disambiguating the NULL-as-total rows from genuine NULL
    * keys — the warehouse subtotal/total rollup as Catalyst plans it
    * (one Expand + one aggregate, not four scans).
    */
  val cubeAccounting: QueryDef = QueryDef(
    "a16_cube",
    (s, dir) => t(s, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        Ora.dsum6(col("n_chars")).as("sum_chars"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("lang"), col("source")),
    Some(s"""SELECT lang, source, COUNT(*) AS n_docs,
        ${Ora.dsum6Sql("n_chars")} AS sum_chars,
        CAST(GROUPING(lang) * 2 + GROUPING(source) AS INT) AS gid
      FROM documents GROUP BY CUBE (lang, source)
      ORDER BY gid, lang, source"""))

  /** Trailing one-hour RANGE window per user: the event-TIME frame (every
    * event within 3600 s, however many rows that is) — the frame family
    * the ROWS-based windows (W6, w8, w9) can't express. Ordered by epoch
    * seconds so both engines bound the identical frame.
    */
  val rangeFrame: QueryDef = QueryDef(
    "w10_range_frame",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val sec = Ora.epochS(col("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(sec)
        .rangeBetween(-3600L, 0L)
      ev.select(col("event_id"), col("user_id"), col("ts"), col("value"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("value").cast("decimal(27,10)")).over(w)
            .cast("double"), 6).as("sum_1h"))
        // partition-aligned output bound (checker-footprint control)
        .filter(col("user_id") < 40)
        .orderBy(col("event_id"))
    },
    Some(s"""SELECT event_id, user_id, ts, value,
        COUNT(*) OVER w AS n_1h,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(27,10))) OVER w AS DOUBLE), 6) AS sum_1h
      FROM events
      WHERE user_id < 40
      WINDOW w AS (PARTITION BY user_id ORDER BY ${Ora.epochSql("ts")}
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Dynamic pivot: per user-decile event-type counts as columns. The
    * pivot value list is passed EXPLICITLY (sorted) — Catalyst then plans
    * a single aggregate with one conditional count per column instead of
    * the values-discovery extra job, and the output schema is stable for
    * the mirror.
    */
  val pivotCounts: QueryDef = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    QueryDef(
      "a17_pivot",
      (s, dir) => t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("ub"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .orderBy(col("ub")),
      Some(s"""SELECT user_id % 10 AS ub,
          ${types.map(tp => s"COUNT(*) FILTER (event_type = '$tp') AS $tp")
            .mkString(",\n          ")}
        FROM events GROUP BY 1 ORDER BY ub"""))
  }

  /** Unpivot (melt) to long format — the inverse reshape, one map-side
    * Expand node, no shuffle before the final sort.
    */
  val unpivotMeasures: QueryDef = QueryDef(
    "o9_unpivot",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 50 === 0)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
    Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
          CAST(l_quantity AS DOUBLE) AS value
        FROM lineitem WHERE l_orderkey % 50 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice',
          CAST(l_extendedprice AS DOUBLE)
        FROM lineitem WHERE l_orderkey % 50 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount',
          CAST(l_discount AS DOUBLE)
        FROM lineitem WHERE l_orderkey % 50 = 0)
      ORDER BY l_orderkey, l_linenumber, metric"""))

  /** JSON property extraction + downstream aggregation: the semi-
    * structured scalar family (events.props is a JSON document) —
    * get_json_object stays inside codegen, and the extracted value feeds
    * a decimal-accumulated rollup like any native column.
    */
  val jsonExtract: QueryDef = QueryDef(
    "f21_json_extract",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type,
        COUNT(CAST(props->>'$.k' AS INT)) AS n,
        CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        MAX(CAST(props->>'$.k' AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** NTILE quartiles per event type over a (value, id) total order — the
    * ranked-bucketing window (both engines split remainder rows into the
    * leading tiles over the identical order, so the assignment is
    * deterministic and mirrorable).
    */
  val ntileQuartiles: QueryDef = QueryDef(
    "a18_ntile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          ntile(4).over(w).as("quartile"))
        // POST-window bound: event_id is not the partition key, so the
        // filter must stay above the window (Catalyst only pushes
        // partition-key predicates below a Window) — quartiles are still
        // assigned over the full table, the dump is just smaller
        .filter(col("event_id") < 2000)
        .orderBy(col("event_id"))
    },
    Some("""SELECT * FROM (
        SELECT event_id, event_type, value,
          CAST(NTILE(4) OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS INT) AS quartile
        FROM events)
      WHERE event_id < 2000 ORDER BY event_id"""))

  /** Batch hopping-window aggregation (10-min windows, 5-min hop): the
    * overlapping-window family — each event lands in TWO windows via
    * Spark's `window()` generator (one Expand, map-side), mirrored by a
    * two-offset union. Tumbling is the hop == width special case (P3).
    */
  val hoppingWindow: QueryDef = QueryDef(
    "w11_hopping_window",
    (s, dir) => t(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        Ora.dsum6(col("value")).as("sum_v"))
      .select(Ora.epochS(col("w.start")).as("w_start"), col("event_type"),
        col("n"), col("sum_v"))
      .orderBy(col("w_start"), col("event_type")),
    Some(s"""WITH e AS (SELECT event_type, value,
          ${Ora.epochSql("ts")} AS sec FROM events),
      x AS (SELECT event_type, value, sec - (sec % 300) AS w_start FROM e
        UNION ALL
        SELECT event_type, value,
          sec - (sec % 300) - 300 AS w_start FROM e)
      SELECT w_start, event_type, COUNT(*) AS n,
        ${Ora.dsum6Sql("value")} AS sum_v
      FROM x GROUP BY w_start, event_type ORDER BY w_start, event_type"""))

  /** ROLLUP over (lang, source): the hierarchical-subtotal grouping-set
    * shape (per-lang subtotals + grand total, no source-only sets) —
    * cube's ordered sibling, same one-Expand plan.
    */
  val rollupAccounting: QueryDef = QueryDef(
    "a19_rollup",
    (s, dir) => t(s, dir, "documents")
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("lang"), col("source")),
    Some("""SELECT lang, source, COUNT(*) AS n_docs,
        CAST(GROUPING(lang) * 2 + GROUPING(source) AS INT) AS gid
      FROM documents GROUP BY ROLLUP (lang, source)
      ORDER BY gid, lang, source"""))

  val all: Seq[QueryDef] =
    Seq(cubeAccounting, rangeFrame, pivotCounts, unpivotMeasures,
      jsonExtract, ntileQuartiles, hoppingWindow, rollupAccounting)
}
