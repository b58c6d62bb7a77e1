package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 20 (round 8): weighted sampling (the quality-weighted corpus
  * subsample) and robust MAD outlier detection — the A-ES and
  * Iglewicz-Hoaglin canon, both exact under the hash gate.
  */
object QueriesT {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Efraimidis-Spirakis weighted sample over documents, weight = n_chars:
    * top-50 by the rounded ln(u)/w key. The selection ORDER is gated, not
    * just the set — both engines must draw the identical sample.
    */
  val sampleWeighted: QueryDef = {
    val k = 50
    val powSql = s"CAST(${math.pow(2.0, 60).toString} AS DOUBLE)"
    val hSql = Ora.md5LongSql("'wrsgraft:' || CAST(doc_id AS VARCHAR)")
    QueryDef(
      "sample_weighted",
      (s, dir) => graft.llm.Curation.weightedSample(
          t(s, dir, "documents"), "doc_id", "n_chars", k = k)
        .orderBy(col("sample_rank")),
      Some(s"""WITH h AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
          $hSql AS hv
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        ks AS (SELECT doc_id, weight,
          ROUND(LN((CAST(hv AS DOUBLE) + 1.0) / $powSql) / weight, 10) AS wkey
        FROM h),
        r AS (SELECT doc_id, weight, wkey, ROW_NUMBER() OVER
          (ORDER BY wkey DESC, doc_id) AS sample_rank FROM ks)
      SELECT CAST(sample_rank AS INT) AS sample_rank, doc_id, weight, wkey
      FROM r WHERE sample_rank <= $k ORDER BY sample_rank"""))
  }

  /** Modified z-score outlier summary per event_type: exact rank-selected
    * median and MAD on both engines (no quantile-interpolation semantics
    * in play — AVG of the same one or two middle doubles), flag count at
    * the Iglewicz-Hoaglin 3.5 bound.
    */
  val madOutliers: QueryDef = {
    val zt = 3.5
    def medSql(src: String, vc: String, out: String): String =
      s"""SELECT event_type, AVG($vc) AS $out FROM (
          SELECT event_type, $vc, ROW_NUMBER() OVER
            (PARTITION BY event_type ORDER BY $vc) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n FROM $src)
        WHERE rn = CAST(FLOOR((n + 1) / 2) AS BIGINT)
           OR rn = CAST(FLOOR(n / 2) AS BIGINT) + 1
        GROUP BY event_type"""
    QueryDef(
      "a20_mad_outliers",
      (s, dir) => graft.operators.Agg.madOutliers(
          t(s, dir, "events"), "event_type", "value", zThresh = zt)
        .orderBy(col("event_type")),
      Some(s"""WITH b AS (SELECT event_type, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        med AS MATERIALIZED (${medSql("b", "v", "med")}),
        dev AS (SELECT b.event_type, b.v, m.med, ABS(b.v - m.med) AS d
          FROM b JOIN med m USING (event_type)),
        mad AS MATERIALIZED (${medSql("dev", "d", "mad")}),
        z AS (SELECT dv.event_type, dv.v, dv.med, md.mad,
            CASE WHEN md.mad > 0 THEN
              ROUND(CAST(0.6745 AS DOUBLE) * (dv.v - dv.med) / md.mad, 6)
            END AS zv
          FROM dev dv JOIN mad md USING (event_type))
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(ANY_VALUE(med), 6) AS med, ROUND(ANY_VALUE(mad), 6) AS mad,
        CAST(SUM(CASE WHEN (mad > 0 AND ABS(zv) > $zt)
                   OR (mad <= 0 AND v <> med) THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers,
        ROUND(MAX(ABS(zv)), 6) AS max_abs_z
      FROM z GROUP BY event_type ORDER BY event_type"""))
  }

  /** Association rules on the lineitem co-purchase baskets: top-20 directed
    * pairs by lift with support/confidence, pair support ≥ 3 baskets. The
    * rule ORDER (lift DESC, ante, cons) is gated along with all three
    * measures.
    */
  val assocRules: QueryDef = {
    val minCount = 3; val k = 20
    QueryDef(
      "assoc_rules",
      // r13: ride the session memos — the basket relation and the a<b
      // pair supports are the same constructions seven graph queries
      // share; rebuilding the basket self-join here was the query's
      // dominant cost (directed support derives from the undirected memo
      // by a union — identical integer counts, oracle-pinned)
      (s, dir) => graft.llm.Graph.associationRulesFromParts(
          Queries.basketItems(s, dir), Queries.coPurchasePairs(s, dir),
          minCount = minCount, k = k)
        .orderBy(col("rank")),
      Some(s"""WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
          l_partkey AS item FROM lineitem),
        nb AS (SELECT COUNT(DISTINCT ok) AS n FROM b),
        itn AS MATERIALIZED (SELECT item, COUNT(*) AS n_i FROM b GROUP BY item),
        pr AS (SELECT l.item AS ante, r.item AS cons, COUNT(*) AS n_ab
          FROM b l JOIN b r USING (ok) WHERE l.item <> r.item
          GROUP BY 1, 2 HAVING COUNT(*) >= $minCount),
        m AS (SELECT p.ante, p.cons, p.n_ab,
            ROUND(CAST(p.n_ab AS DOUBLE) / nb.n, 6) AS support,
            ROUND(CAST(p.n_ab AS DOUBLE) / CAST(a.n_i AS DOUBLE), 6)
              AS confidence,
            ROUND((CAST(p.n_ab AS DOUBLE) * nb.n) /
              (CAST(a.n_i AS DOUBLE) * CAST(c.n_i AS DOUBLE)), 6) AS lift
          FROM pr p JOIN itn a ON a.item = p.ante
          JOIN itn c ON c.item = p.cons CROSS JOIN nb),
        r AS (SELECT m.*, ROW_NUMBER() OVER
          (ORDER BY lift DESC, ante, cons) AS rank FROM m)
      SELECT CAST(rank AS INT) AS rank, ante, cons, n_ab, support,
        confidence, lift
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  /** CDC changelog application: events mapped to I/U/D ops on the user key
    * (signup inserts, errors delete, the rest update) collapsed to the
    * current snapshot — latest op per user wins, a winning delete removes
    * the user. The window tie-break (ts, then event_id) is part of the
    * gate.
    */
  val cdcApply: QueryDef = QueryDef(
    "s16_cdc_apply",
    (s, dir) => {
      val ops = t(s, dir, "events").withColumn("op",
        when(col("event_type") === "signup", lit("I"))
          .when(col("event_type") === "error", lit("D"))
          .otherwise(lit("U")))
      graft.operators.Relational.cdcApply(ops, "user_id", "ts", "event_id", "op")
        .select(col("user_id"), col("op"), col("ts").as("last_ts"),
          col("value").as("last_value"))
        .orderBy(col("user_id"))
    },
    Some("""WITH ops AS (SELECT user_id, event_id, ts, value,
          CASE WHEN event_type = 'signup' THEN 'I'
               WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM events),
      latest AS (SELECT user_id, op, ts, value, ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM ops)
      SELECT user_id, op, ts AS last_ts, value AS last_value
      FROM latest WHERE rn = 1 AND op <> 'D' ORDER BY user_id"""))

  /** DAU/WAU stickiness per ISO week (date_trunc week = Monday on both
    * engines): average daily actives over weekly actives, the engagement
    * ratio every behavioral dashboard carries.
    */
  val stickiness: QueryDef = QueryDef(
    "b5_stickiness",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(to_date(date_trunc("WEEK", col("ts"))).as("wk"),
          to_date(col("ts")).as("d"), col("user_id"))
      val daily = ev.groupBy(col("wk"), col("d"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val weekly = ev.groupBy(col("wk"))
        .agg(countDistinct(col("user_id")).as("wau"))
      daily.groupBy(col("wk"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("dau")).as("sum_dau"))
        .join(weekly, Seq("wk"))
        .select(col("wk"), col("n_days"), col("wau"),
          round((col("sum_dau").cast("double") / col("n_days")) /
            col("wau").cast("double"), 6).as("stickiness"))
        .orderBy(col("wk"))
    },
    Some("""WITH ev AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
          CAST(ts AS DATE) AS d, user_id FROM events),
      daily AS (SELECT wk, d, COUNT(DISTINCT user_id) AS dau
        FROM ev GROUP BY 1, 2),
      weekly AS (SELECT wk, COUNT(DISTINCT user_id) AS wau
        FROM ev GROUP BY 1)
      SELECT dy.wk, CAST(dy.n_days AS BIGINT) AS n_days,
        CAST(w.wau AS BIGINT) AS wau,
        ROUND((CAST(dy.sum_dau AS DOUBLE) / dy.n_days) /
          CAST(w.wau AS DOUBLE), 6) AS stickiness
      FROM (SELECT wk, COUNT(*) AS n_days, SUM(dau) AS sum_dau
            FROM daily GROUP BY wk) dy
      JOIN weekly w USING (wk) ORDER BY dy.wk"""))

  val all: Seq[QueryDef] =
    Seq(sampleWeighted, madOutliers, assocRules, cdcApply, stickiness)
}
