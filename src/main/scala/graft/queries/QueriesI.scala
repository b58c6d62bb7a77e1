package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.Similarity
import graft.queries.Queries.QueryDef

/** Round-6 oracle hardening: deterministic full-SQL mirrors for the two
  * stages that were previously rows-only because an MLlib fit sat upstream —
  * the IVF SEARCH stage (given fixed centroids, no KMeans) and M9's SCORING
  * stage (given fixed predictions, no RF). The fits themselves stay
  * rows-only by design (MLlib RNG has no cross-engine mirror); these queries
  * pin the deterministic majority of each pipeline to the DuckDB hash gate.
  */
object QueriesI {

  import Ora.{centDotSql, centMeanSql, centNormSql, dotArrSql, normArrSql}

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** The IVF pipeline with a DETERMINISTIC coarse quantizer: fixed seed
    * centroids (the first 8 corpus vectors), [[Similarity.assignCells]]
    * nearest-centroid assignment, then the same [[Similarity.ivfTopK]]
    * search stage `simsearch_ivf_kmeans` runs — proving the whole
    * assign→probe→search path against the exact DuckDB mirror. Only the
    * KMeans FIT is unmirrorable; it is exactly the piece swapped out here.
    */
  val simsearchIvfFixed: QueryDef = QueryDef(
    "simsearch_ivf_fixed",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val seeds = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("cv"))
      // materialize the assignment once: ivfTopK reads its corpus three
      // times (centroids, query side, search side) — same move as the
      // kmeans variant's localCheckpoint
      val cells = Similarity.assignCells(emb, "vec_id", "embedding",
          seeds, "cell", "cv", dim = 64)
        .localCheckpoint()
      Similarity.ivfTopK(cells, cells.filter(col("vec_id") < 10),
          "vec_id", "embedding", "ivf_cell", dim = 64, k = 5, nprobe = 2)
        .orderBy(col("qid"), col("rank"))
    },
    Some {
      val centCols = centMeanSql("e.embedding", 64)
      val qcDot = centDotSql("qv", 64)
      val cNorm = centNormSql(64)
      val qNorm = normArrSql("qv", 64)
      s"""WITH seeds AS (SELECT vec_id AS cell, embedding AS cv
            FROM embeddings WHERE vec_id < 8),
        asn AS (SELECT vec_id, cell AS ivf_cell FROM (
            SELECT e.vec_id, s.cell,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                (${dotArrSql("e.embedding", "s.cv", 64)}) /
                (SQRT(${normArrSql("e.embedding", 64)}) * SQRT(${normArrSql("s.cv", 64)})) DESC,
                s.cell) AS rn
            FROM embeddings e CROSS JOIN seeds s
            WHERE SQRT(${normArrSql("e.embedding", 64)}) * SQRT(${normArrSql("s.cv", 64)}) > 0)
          WHERE rn = 1),
        cent AS (SELECT a.ivf_cell, $centCols
          FROM embeddings e JOIN asn a ON a.vec_id = e.vec_id
          GROUP BY a.ivf_cell),
        q AS (SELECT e.vec_id AS qid, e.embedding AS qv
          FROM embeddings e JOIN asn a ON a.vec_id = e.vec_id
          WHERE e.vec_id < 10),
        probes AS (SELECT qid, qv, ivf_cell FROM (
            SELECT q.qid, q.qv, cent.ivf_cell,
              ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                ($qcDot) / (SQRT($qNorm) * SQRT($cNorm)) DESC, cent.ivf_cell) AS prn
            FROM q CROSS JOIN cent)
          WHERE prn <= 2),
        scored AS (SELECT qid, vb, cos,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vb) AS rank
          FROM (SELECT p.qid, e.vec_id AS vb,
              ROUND((${dotArrSql("p.qv", "e.embedding", 64)}) /
                (SQRT(${normArrSql("p.qv", 64)}) * SQRT(${normArrSql("e.embedding", 64)})), 6) AS cos
            FROM probes p
            JOIN asn a ON a.ivf_cell = p.ivf_cell
            JOIN embeddings e ON e.vec_id = a.vec_id
            WHERE e.vec_id <> p.qid))
        SELECT qid, CAST(rank AS INT) AS rank, vb, cos FROM scored
        WHERE rank <= 5 ORDER BY qid, rank"""
    })

  /** M9's scoring stage on FIXED predictions: the same skillScores pass
    * `m9_intercomparison` applies to RF output, fed deterministic est/ref
    * columns so every score (decimal power-sum corr/stde/mae, logbias,
    * energy distance, weighted-quantile scatter) hash-matches DuckDB. The
    * RF fit stays rows-only in m9_intercomparison by design.
    */
  val m9SkillScores: QueryDef = QueryDef(
    "m9_skill_scores",
    (s, dir) => {
      // deterministic 5% slice (the m9_intercomparison sampling key): keeps
      // every (phase, fold) group far below the EnergyDistance aggregator's
      // 2^20 exact-buffer bound at ANY driver sf — past it the aggregator
      // degrades to a sample whose membership is merge-order-dependent,
      // which would break the bit-exact mirror this query exists to prove
      val v = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 20 === 0)
        .select(
        lit("M1").as("model"), lit("10min").as("agg"),
        when(col("l_discount") * 100.0 - 5.0 < 2.0, lit("solid"))
          .otherwise(lit("liquid")).as("phase"),
        (col("l_partkey") % 2).cast("int").as("fold"),
        (col("l_extendedprice") / 10000.0).cast("double").as("est"),
        (col("l_quantity") / 10.0).cast("double").as("ref"))
      graft.ml.Intercomparison.skillScores(v)
        .orderBy(col("model"), col("agg"), col("phase"), col("fold"))
    },
    Some("""WITH v AS (SELECT
        CASE WHEN l_discount * 100.0 - 5.0 < 2.0 THEN 'solid' ELSE 'liquid' END AS phase,
        CAST(l_partkey % 2 AS INT) AS fold,
        CAST(l_extendedprice / 10000.0 AS DOUBLE) AS est,
        CAST(l_quantity / 10.0 AS DOUBLE) AS ref
      FROM lineitem WHERE l_orderkey % 20 = 0),
      base AS (SELECT phase, fold, COUNT(*) AS n,
        CAST(SUM(CAST(est AS DECIMAL(27,10))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(ref AS DECIMAL(27,10))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(est * est AS DECIMAL(32,14))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(ref * ref AS DECIMAL(32,14))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(est * ref AS DECIMAL(32,14))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST((est - ref) AS DECIMAL(27,10))) AS DOUBLE) AS sd,
        CAST(SUM(CAST((est - ref) * (est - ref) AS DECIMAL(32,14))) AS DOUBLE) AS sdd,
        CAST(SUM(CAST(ABS(est - ref) AS DECIMAL(27,10))) AS DOUBLE) AS sad
        FROM v GROUP BY phase, fold),
      m AS (SELECT phase, fold, est AS val, 1 AS isx FROM v
            UNION ALL SELECT phase, fold, ref, 0 FROM v),
      tot AS (SELECT phase, fold, COUNT(*) // 2 AS n FROM m GROUP BY phase, fold),
      ord AS (SELECT phase, fold, val,
          SUM(isx) OVER w AS cx,
          SUM(1 - isx) OVER w AS cy,
          LEAD(val) OVER (PARTITION BY phase, fold ORDER BY val, isx) AS nxt
        FROM m WINDOW w AS (PARTITION BY phase, fold ORDER BY val, isx ROWS UNBOUNDED PRECEDING)),
      eds AS (SELECT o.phase, o.fold, ANY_VALUE(t.n) AS n,
          SUM((nxt - val) * (cx * (t.n - cy) + cy * (t.n - cx))) AS gxy,
          SUM((nxt - val) * 2 * cx * (t.n - cx)) AS gxx,
          SUM((nxt - val) * 2 * cy * (t.n - cy)) AS gyy
        FROM ord o JOIN tot t ON o.phase = t.phase AND o.fold = t.fold
        WHERE nxt IS NOT NULL
        GROUP BY o.phase, o.fold),
      edv AS (SELECT phase, fold, ROUND(SQRT(GREATEST(
          2.0 * gxy / (n*n) - gxx / (n*n) - gyy / (n*n), 0.0)), 6) AS ed
        FROM eds),
      cond AS (SELECT phase, fold, LOG10(est / ref) * 10.0 AS ratio_db, ref AS w
               FROM v WHERE est > 0.1 AND ref > 0.1),
      cum AS (SELECT phase, fold, ratio_db,
        CAST(SUM(CAST(w AS DECIMAL(27,10))) OVER (PARTITION BY phase, fold ORDER BY ratio_db
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cumw,
        CAST(SUM(CAST(w AS DECIMAL(27,10))) OVER (PARTITION BY phase, fold) AS DOUBLE) AS totw
        FROM cond),
      qs AS (SELECT phase, fold,
        MIN(CASE WHEN cumw >= totw * 0.16 THEN ratio_db END) AS q16,
        MIN(CASE WHEN cumw >= totw * 0.84 THEN ratio_db END) AS q84
        FROM cum GROUP BY phase, fold)
      SELECT 'M1' AS model, '10min' AS agg, b.phase, b.fold, b.n,
        ROUND(CASE WHEN SQRT(GREATEST((b.n * b.sxx - b.sx * b.sx) * (b.n * b.syy - b.sy * b.sy), 0.0)) > 0
          THEN (b.n * b.sxy - b.sx * b.sy)
               / SQRT(GREATEST((b.n * b.sxx - b.sx * b.sx) * (b.n * b.syy - b.sy * b.sy), 0.0)) END, 6) AS corr,
        ROUND(CASE WHEN b.n > 1
          THEN SQRT(GREATEST((b.sdd - b.sd * b.sd / b.n) / (b.n - 1), 0.0)) END, 6) AS stde,
        ROUND(b.sad / b.n, 6) AS mae,
        ROUND(LOG10(b.sx / b.sy) * 10.0, 6) AS logbias_db,
        e.ed,
        ROUND((qs.q84 - qs.q16) / 2.0, 6) AS scatter_db
      FROM base b
      JOIN edv e ON e.phase = b.phase AND e.fold = b.fold
      LEFT JOIN qs ON qs.phase = b.phase AND qs.fold = b.fold
      ORDER BY model, agg, b.phase, b.fold"""))

  val all: Seq[QueryDef] = Seq(simsearchIvfFixed, m9SkillScores)
}
