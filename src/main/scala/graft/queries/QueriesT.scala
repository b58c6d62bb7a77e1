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

  val all: Seq[QueryDef] = Seq(sampleWeighted, madOutliers)
}
