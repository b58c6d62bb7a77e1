package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.Similarity
import graft.queries.Queries.QueryDef

/** Round-6 batch: deterministic full-SQL mirrors for the two stages that
  * were previously rows-only because an MLlib fit sat upstream — the IVF
  * SEARCH stage (given fixed centroids, no KMeans) and M9's SCORING stage
  * (given fixed predictions, no RF); the fits themselves stay rows-only by
  * design (MLlib RNG has no cross-engine mirror). Plus three curation-side
  * operators: ANN recall@k as a measured number, unigram-LM surprisal
  * quality scoring, and the composite quality-filter verdict.
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
    Some(s"""WITH $ivfFixedCtes
        SELECT qid, CAST(rank AS INT) AS rank, vb, cos FROM scored
        WHERE rank <= 5 ORDER BY qid, rank"""))

  /** The WITH-chain both IVF-fixed mirrors share (assignment → centroids →
    * probes → scored ranking); ONE definition so the search mirror and the
    * recall evaluator cannot drift apart.
    */
  /** The fixed-seed quantizer assignment (seeds → nearest-centroid asn) that
    * every deterministic-quantizer mirror shares: the IVF-fixed search, the
    * recall evaluator, and the SemDeDup pruning.
    */
  private[queries] lazy val fixedAsnCtes: String =
    s"""seeds AS MATERIALIZED (SELECT vec_id AS cell, embedding AS cv
            FROM embeddings WHERE vec_id < 8),
        asn AS MATERIALIZED (SELECT vec_id, cell AS ivf_cell FROM (
            SELECT e.vec_id, s.cell,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                (${dotArrSql("e.embedding", "s.cv", 64)}) /
                (SQRT(${normArrSql("e.embedding", 64)}) * SQRT(${normArrSql("s.cv", 64)})) DESC,
                s.cell) AS rn
            FROM embeddings e CROSS JOIN seeds s
            WHERE SQRT(${normArrSql("e.embedding", 64)}) * SQRT(${normArrSql("s.cv", 64)}) > 0)
          WHERE rn = 1)"""

  private lazy val ivfFixedCtes: String = {
      val centCols = centMeanSql("e.embedding", 64)
      val qcDot = centDotSql("qv", 64)
      val cNorm = centNormSql(64)
      val qNorm = normArrSql("qv", 64)
      s"""$fixedAsnCtes,
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
            WHERE e.vec_id <> p.qid))"""
  }

  /** SemDeDup (cluster-then-prune semantic dedup) under the deterministic
    * fixed-seed quantizer: assignCells → within-cell pair cosine → drop
    * non-smallest ids of each near-dup pair → survivors. The whole
    * pipeline — assignment included — hash-matches the DuckDB mirror; with
    * a KMeans quantizer only the fit would be unmirrorable (the
    * simsearch_ivf_fixed precedent applied to curation).
    */
  val dedupSemantic: QueryDef = QueryDef(
    "dedup_semantic",
    (s, dir) => {
      import graft.llm.Dedup
      val emb = t(s, dir, "embeddings")
      val seeds = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("cv"))
      // materialized once: the pair join reads the assignment twice
      val cells = Similarity.assignCells(emb, "vec_id", "embedding",
          seeds, "cell", "cv", dim = 64)
        .localCheckpoint()
      Dedup.semanticDedup(cells, "vec_id", "embedding", "ivf_cell",
          dim = 64, minCos = 0.4)
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH $fixedAsnCtes,
        vec AS (SELECT a.ivf_cell, e.vec_id, e.embedding
                FROM asn a JOIN embeddings e USING (vec_id)),
        dropped AS (SELECT DISTINCT b.vec_id
            FROM vec a JOIN vec b
              ON a.ivf_cell = b.ivf_cell AND a.vec_id < b.vec_id
            WHERE ROUND((${dotArrSql("a.embedding", "b.embedding", 64)}) /
                (SQRT(${normArrSql("a.embedding", 64)}) *
                 SQRT(${normArrSql("b.embedding", 64)})), 6) >= 0.4)
        SELECT a.vec_id, a.ivf_cell FROM asn a
        ANTI JOIN dropped d ON a.vec_id = d.vec_id
        ORDER BY a.vec_id"""))

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

  /** ANN recall@k as a first-class measured number: the deterministic IVF
    * pipeline's top-5 vs the exact brute-force top-5 on the same queries —
    * the FAISS-bench quality metric, fully oracle-mirrored (the recall math
    * AND both result sets).
    */
  val simsearchRecall: QueryDef = QueryDef(
    "simsearch_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val seeds = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("cv"))
      val cells = Similarity.assignCells(emb, "vec_id", "embedding",
          seeds, "cell", "cv", dim = 64)
        .localCheckpoint()
      val approx = Similarity.ivfTopK(cells, cells.filter(col("vec_id") < 10),
        "vec_id", "embedding", "ivf_cell", dim = 64, k = 5, nprobe = 2)
      val exact = Similarity.bruteForceTopKAgg(emb, queries,
        "vec_id", "embedding", dim = 64, k = 5)
      Similarity.recallAtK(approx, exact).orderBy(col("qid"))
    },
    Some(s"""WITH $ivfFixedCtes,
      approx AS (SELECT qid, vb FROM scored WHERE rank <= 5),
      exact AS MATERIALIZED (SELECT qid, vb FROM (${Ora.bruteForceTopKSql(10, 5, 64)})),
      hit AS (SELECT e.qid, COUNT(*) AS n_hit
        FROM exact e JOIN approx a ON a.qid = e.qid AND a.vb = e.vb
        GROUP BY e.qid),
      ex AS (SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY qid)
      SELECT ex.qid, ex.n_exact, COALESCE(hit.n_hit, 0) AS n_hit,
        ROUND(CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / ex.n_exact, 6) AS recall
      FROM ex LEFT JOIN hit ON hit.qid = ex.qid ORDER BY ex.qid"""))

  /** Unigram-LM surprisal (mean −log10 p(token) under the corpus's own
    * unigram distribution) — the cheap LM-perplexity quality proxy.
    */
  val textSurprisal: QueryDef = QueryDef(
    "text_surprisal",
    (s, dir) => graft.llm.TextAnalysis.unigramSurprisal(
        t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (SELECT doc_id, unnest(${Ora.toksSql}) AS tok FROM documents),
      freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
      tot AS (SELECT SUM(cnt) AS tot FROM freq),
      sv AS (SELECT doc_id,
          -LOG10(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) AS s
        FROM tok JOIN freq USING (tok) CROSS JOIN tot),
      agg AS (SELECT doc_id, COUNT(*) AS n_tok,
          ROUND(CAST(SUM(CAST(s AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS surprisal
        FROM sv GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(agg.n_tok, 0) AS n_tok, agg.surprisal
      FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id"""))

  /** The composite quality verdict over the documents table: per-rule flags
    * plus the keep decision, thresholds chosen to split the synthetic corpus
    * both ways.
    */
  val curationQualityFilter: QueryDef = QueryDef(
    "curation_quality_filter",
    (s, dir) => graft.llm.Curation.qualityFilter(
        t(s, dir, "documents"), "doc_id", "text",
        minTokens = 40, maxTokens = 80, maxRepetition = 0.1,
        minStopRatio = 0.01)
      .orderBy(col("doc_id")),
    Some("""WITH b AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
          FROM documents),
      g AS (SELECT doc_id, w,
          [array_to_string(w[i : i + 1], ' ')
           for i in generate_series(1, len(w) - 1)] AS grams
        FROM b),
      m AS (SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_tokens,
          CASE WHEN len(grams) > 0
               THEN ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
               ELSE 0.0 END AS rep_ratio,
          CASE WHEN len(w) > 0
               THEN CAST(len([t for t in w if t IN
                 ('the','a','of','and','to','in','is','on','for','with')]) AS DOUBLE) / len(w)
               ELSE 0.0 END AS stop_raw
        FROM g)
      SELECT doc_id, n_tokens, rep_ratio, ROUND(stop_raw, 6) AS stopword_ratio,
        n_tokens < 40 AS flag_short,
        n_tokens > 80 AS flag_long,
        rep_ratio > 0.1 AS flag_repetitive,
        stop_raw < 0.01 AS flag_no_stopwords,
        (NOT n_tokens < 40 AND NOT n_tokens > 80 AND NOT rep_ratio > 0.1
         AND NOT stop_raw < 0.01) AS keep
      FROM m ORDER BY doc_id"""))

  /** Substring-class exact dedup signal: per-document profile of word
    * 8-gram windows repeated verbatim in other documents.
    */
  val dedupWindowStats: QueryDef = QueryDef(
    "dedup_window_stats",
    (s, dir) => graft.llm.Dedup.windowDupStats(
        t(s, dir, "documents"), "doc_id", "text", n = 8)
      .orderBy(col("doc_id")),
    Some(s"""WITH sh AS (${Ora.shinglesSql(8)}),
      c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY sh) AS docs FROM sh),
      per AS (SELECT doc_id, COUNT(*) AS n_windows,
          CAST(SUM(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
        FROM c GROUP BY doc_id)
      SELECT d.doc_id,
        COALESCE(per.n_windows, 0) AS n_windows,
        COALESCE(per.n_dup_windows, 0) AS n_dup_windows,
        CASE WHEN COALESCE(per.n_windows, 0) > 0
             THEN ROUND(CAST(COALESCE(per.n_dup_windows, 0) AS DOUBLE) / per.n_windows, 6)
             ELSE 0.0 END AS dup_fraction
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id"""))

  /** Int8 embedding quantization, flattened to (vec_id, pos, qv, scale) rows
    * so the element codes themselves sit under the hash gate.
    */
  val simsearchQuantize: QueryDef = QueryDef(
    "simsearch_quantize_int8",
    (s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 100)
      Similarity.quantizeInt8(emb, "vec_id", "embedding")
        .select(col("vec_id"), col("scale"), posexplode(col("q")).as(Seq("pos", "qv")))
        .select(col("vec_id"), col("pos"), col("qv"), col("scale"))
        .orderBy(col("vec_id"), col("pos"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))) / 127.0 AS scale
        FROM embeddings WHERE vec_id < 100)
      SELECT vec_id, CAST(i - 1 AS INT) AS pos,
        CASE WHEN scale > 0
             THEN CAST(FLOOR(CAST(embedding[i] AS DOUBLE) / scale + 0.5) AS INT)
             ELSE 0 END AS qv,
        scale
      FROM e CROSS JOIN generate_series(1, 64) AS t(i)
      ORDER BY vec_id, pos"""))

  /** P4 under the hash gate: plant the reference's -9999 sentinel into a
    * real column, normalize through `Relational.naReplace`, and prove the
    * nulls land where the sentinels were (spec-only until now).
    */
  val p4NaReplace: QueryDef = QueryDef(
    "p4_na_replace",
    (s, dir) => {
      val planted = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          when(col("l_quantity") < 3.0, lit(-9999.0))
            .otherwise(col("l_quantity")).as("qty"),
          when(col("l_discount") > 0.09, lit(-9999.0))
            .otherwise(col("l_discount")).as("disc"))
      graft.operators.Relational.naReplace(planted, -9999.0, Seq("qty", "disc"))
        .groupBy((col("l_orderkey") % 100).as("bucket"))
        .agg(count(lit(1)).as("n"),
             count(col("qty")).as("n_qty"),
             count(col("disc")).as("n_disc"),
             Ora.dsum6(col("qty")).as("sum_qty"))
        .orderBy(col("bucket"))
    },
    Some("""WITH planted AS (SELECT l_orderkey,
        CASE WHEN l_quantity < 3.0 THEN -9999.0 ELSE l_quantity END AS qty,
        CASE WHEN l_discount > 0.09 THEN -9999.0 ELSE l_discount END AS disc
      FROM lineitem),
      norm AS (SELECT l_orderkey,
        CASE WHEN qty = -9999.0 THEN NULL ELSE qty END AS qty,
        CASE WHEN disc = -9999.0 THEN NULL ELSE disc END AS disc
      FROM planted)
      SELECT l_orderkey % 100 AS bucket, COUNT(*) AS n,
        COUNT(qty) AS n_qty, COUNT(disc) AS n_disc,
        CAST(ROUND(SUM(CAST(qty AS DECIMAL(27,10))), 6) AS DOUBLE) AS sum_qty
      FROM norm GROUP BY 1 ORDER BY 1"""))

  /** F3/F4/F5 under the hash gate: the radar mask chain
    * (noisedBZ range-dependent floor → snrMask → visibCorrect) on
    * lineitem-derived proxies, previously spec-only — including the NULL
    * floor at range ≤ 0 now masking the gate.
    */
  val f3MaskChain: QueryDef = QueryDef(
    "f3_mask_chain",
    (s, dir) => {
      import graft.functions.Phys
      val d = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") * 4000.0 - 10000.0).as("r_m"),     // some ≤ 0
        (col("l_extendedprice") / 2000.0).as("zh"),
        (col("l_discount") * 1000.0).as("visib"))             // 0..100
      val noise = Phys.noisedBZ(col("r_m"), lit(-31.0))
      val masked = Phys.snrMask(col("zh"), noise, 23.0)
      // NO round(,6) on zh_vis: the chain is pure IEEE ops on identical
      // inputs, so the raw doubles already match bit-for-bit — rounding
      // would REINTRODUCE engine skew (Spark rounds the exact binary
      // expansion, DuckDB the scaled multiply; 224 rows landed on ties)
      d.select(col("l_orderkey"), col("l_linenumber"),
          masked.as("zh_snr"),
          Phys.visibCorrect(masked, col("visib"), 40.0, 1.5).as("zh_vis"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""WITH v AS (SELECT l_orderkey, l_linenumber,
        l_quantity * 4000.0 - 10000.0 AS r_m,
        l_extendedprice / 2000.0 AS zh,
        l_discount * 1000.0 AS visib
      FROM lineitem),
      n AS (SELECT *, CASE WHEN r_m > 0.0
          THEN -31.0 + LOG10(r_m / 1000.0 / 100.0) * 20.0 END AS noise
        FROM v),
      m AS (SELECT *, CASE WHEN noise IS NULL OR zh - noise < 23.0
          THEN NULL ELSE zh END AS zh_snr
        FROM n)
      SELECT l_orderkey, l_linenumber, zh_snr,
        CASE WHEN visib < 40.0 THEN NULL
          ELSE zh_snr * LEAST(100.0 / visib, 1.5) END AS zh_vis
      FROM m ORDER BY l_orderkey, l_linenumber"""))

  val all: Seq[QueryDef] = Seq(simsearchIvfFixed, m9SkillScores,
    simsearchRecall, textSurprisal, curationQualityFilter,
    dedupWindowStats, simsearchQuantize, p4NaReplace, f3MaskChain,
    dedupSemantic)
}
