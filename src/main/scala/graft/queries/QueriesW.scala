package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core
import graft.operators.{Spatial, Stats}

/** Batch 23 (round 8): seasonal anomaly baselines, winsorization, phrase
  * index lookup, and a grid-blocked spatial join. The spatial mirror is
  * the quadratic reference semantics — the Spark side must reproduce it
  * exactly through the 9-cell blocking, which is the point of the gate.
  */
object QueriesW {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Seasonal robust anomaly baseline: median/MAD per (event_type,
    * hour-of-day) bucket, modified z-score flags at |z| > 3.5 — the
    * multi-key [[graft.operators.Agg.madOutliers]].
    */
  val anomalySeasonal: QueryDef = {
    val zt = 3.5
    def medSql(src: String, vcol: String, out: String): String =
      s"""SELECT event_type, hr, AVG($vcol) AS $out FROM
        (SELECT event_type, hr, $vcol, ROW_NUMBER() OVER
          (PARTITION BY event_type, hr ORDER BY $vcol) AS rn,
          COUNT(*) OVER (PARTITION BY event_type, hr) AS n FROM $src)
        WHERE rn = CAST(FLOOR((n + 1) / 2) AS BIGINT)
           OR rn = CAST(FLOOR(n / 2) AS BIGINT) + 1
        GROUP BY event_type, hr"""
    QueryDef(
      "anomaly_seasonal",
      (s, dir) => graft.operators.Agg.madOutliers(
          t(s, dir, "events")
            .select(col("event_type"), hour(col("ts")).as("hr"), col("value")),
          Seq("event_type", "hr"), "value", zThresh = zt)
        .orderBy(col("event_type"), col("hr")),
      Some(s"""WITH b AS (SELECT event_type,
          CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr,
          CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL),
        med AS MATERIALIZED (${medSql("b", "v", "med")}),
        dev AS (SELECT b.event_type, b.hr, b.v, m.med, ABS(b.v - m.med) AS d
          FROM b JOIN med m USING (event_type, hr)),
        mad AS MATERIALIZED (${medSql("dev", "d", "mad")}),
        z AS (SELECT dv.event_type, dv.hr, dv.v, dv.med, md.mad,
            CASE WHEN md.mad > 0 THEN
              ROUND(CAST(0.6745 AS DOUBLE) * (dv.v - dv.med) / md.mad, 6)
            END AS zv
          FROM dev dv JOIN mad md USING (event_type, hr))
      SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(ANY_VALUE(med), 6) AS med, ROUND(ANY_VALUE(mad), 6) AS mad,
        CAST(SUM(CASE WHEN (mad > 0 AND ABS(zv) > $zt)
                   OR (mad <= 0 AND v <> med) THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers,
        ROUND(MAX(ABS(zv)), 6) AS max_abs_z
      FROM z GROUP BY event_type, hr ORDER BY event_type, hr"""))
  }

  /** Winsorization audit per event type: exact interpolated [p05, p95]
    * clip bounds (quantile_cont semantics), per-tail clip counts, and the
    * decimal-exact winsorized sum.
    */
  val winsorize: QueryDef = QueryDef(
    "a22_winsorize",
    (s, dir) => Stats.winsorize(t(s, dir, "events"),
        "event_type", "value", pLo = 0.05, pHi = 0.95)
      .orderBy(col("event_type")),
    Some("""WITH b AS (SELECT event_type, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL),
      q AS MATERIALIZED (SELECT event_type,
        quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
        FROM b GROUP BY 1)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      ROUND(ANY_VALUE(lo), 6) AS p_lo, ROUND(ANY_VALUE(hi), 6) AS p_hi,
      CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
      CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
      CAST(ROUND(SUM(CAST(LEAST(GREATEST(v, lo), hi) AS DECIMAL(27,10))), 6)
        AS DOUBLE) AS sum_winsorized
    FROM b JOIN q USING (event_type)
    GROUP BY event_type ORDER BY event_type"""))

  /** Phrase-index lookup: top-20 documents by occurrence count of the
    * corpus phrase "table hash" (46 matching docs at sf0.01, some with
    * multiple occurrences — counts, not membership, are gated).
    */
  val phraseTopK: QueryDef = {
    val phrase = "table hash"; val k = 20
    QueryDef(
      "w13_phrase_topk",
      (s, dir) => graft.llm.TextAnalysis.phraseTopK(
          t(s, dir, "documents"), "doc_id", "text", phrase, k = k)
        .orderBy(col("rank")),
      Some(s"""WITH w AS (SELECT doc_id, ${Ora.toksSql} AS w FROM documents),
        g AS (SELECT doc_id, unnest([array_to_string(w[i : i + 1], ' ')
          for i in generate_series(1, len(w) - 1)]) AS sh FROM w),
        c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occur FROM g
          WHERE sh = '$phrase' GROUP BY 1),
        r AS (SELECT doc_id, n_occur, ROW_NUMBER() OVER
          (ORDER BY n_occur DESC, doc_id) AS rank FROM c)
      SELECT CAST(rank AS INT) AS rank, doc_id, n_occur
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  /** Grid-blocked spatial self-join: 30 closest point pairs within radius
    * 1.5 over deterministic planar coordinates derived from customer keys.
    * The mirror is the QUADRATIC reference join — the Spark side must
    * reproduce it exactly through 9-cell blocking.
    */
  val spatialGridJoin: QueryDef = {
    // quadratic (not linear-congruential) coordinate derivation: a linear
    // k·a mod m map puts the points on a sparse torus lattice whose
    // minimum pairwise distance exceeds any useful radius at small n —
    // sf0.001 produced ZERO pairs and failed the driver's rows>0 smoke
    val radius = 0.8; val k = 30
    QueryDef(
      "j11_spatial_grid_join",
      (s, dir) => {
        val ck = col("c_custkey")
        val pts = t(s, dir, "customer").select(
          ck.as("id"),
          (((ck * ck * 13 + ck * 7) % 293) / lit(10.0)).as("x"),
          (((ck * ck * 31 + ck * 11) % 307) / lit(10.0)).as("y"))
        val pairs = Spatial.neighborPairs(pts, "id", "x", "y", radius)
        // bounded closest-k by (dist2 ASC, id_a, id_b): k pairs per
        // partial buffer instead of a global single-partition sort of the
        // radius-join pair relation (which grows with data)
        val botk = udaf(new graft.functions.Aggregators.BottomKPair(k))
        pairs.agg(botk(col("dist2"), col("id_a"), col("id_b")).as("hits"))
          .select(posexplode(col("hits")))
          .select((col("pos") + 1).cast("int").as("rank"),
            col("col.a").as("id_a"), col("col.b").as("id_b"),
            col("col.score").as("dist2"))
          .orderBy(col("rank"))
      },
      Some(s"""WITH p AS (SELECT c_custkey AS id,
          ((c_custkey * c_custkey * 13 + c_custkey * 7) % 293) / 10.0 AS x,
          ((c_custkey * c_custkey * 31 + c_custkey * 11) % 307) / 10.0 AS y
          FROM customer),
        pr AS (SELECT a.id AS id_a, b.id AS id_b,
          ROUND((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y), 6)
            AS dist2
          FROM p a JOIN p b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= ${radius * radius}),
        r AS (SELECT id_a, id_b, dist2, ROW_NUMBER() OVER
          (ORDER BY dist2, id_a, id_b) AS rank FROM pr)
      SELECT CAST(rank AS INT) AS rank, id_a, id_b, dist2
      FROM r WHERE rank <= $k ORDER BY rank"""))
  }

  val all: Seq[QueryDef] =
    Seq(anomalySeasonal, winsorize, phraseTopK, spatialGridJoin)
}
