package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.Dedup

/** Batch 12: corpus-cleanup and classifier ops — duplicated-span removal
  * (the C4-style rebuild step), a deterministic trainable classifier, and
  * product-quantization ANN.
  */
object QueriesL {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Corpus-duplicated span removal: segments repeated verbatim in more
    * than one document are deleted and the cleaned text is rebuilt in
    * order — the REMOVAL counterpart of dedup_window_stats' measurement.
    * n = 3 non-overlapping token segments over the synthetic corpus give a
    * real mix (~34% of segment instances removed at sf0.01).
    */
  val dedupSpanRemoval: QueryDef = QueryDef(
    "dedup_span_removal",
    (s, dir) => Dedup.removeDupSpans(t(s, dir, "documents"),
        "doc_id", "text", n = 3, maxDocs = 1)
      .orderBy(col("doc_id")),
    Some(s"""WITH base AS (SELECT doc_id, ${Ora.toksSql} AS w FROM documents),
      g AS (SELECT doc_id, w,
          unnest(generate_series(1, CAST(CEIL(len(w) / 3.0) AS BIGINT))) AS g
        FROM base),
      seg AS (SELECT doc_id, g - 1 AS pos,
          array_to_string(w[(g-1)*3+1 : g*3], ' ') AS seg
        FROM g),
      freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS nd FROM seg GROUP BY seg),
      k AS (SELECT s.doc_id, s.pos, s.seg, f.nd > 1 AS dup
        FROM seg s JOIN freq f USING (seg)),
      per AS (SELECT doc_id, COUNT(*) AS n_segments,
          CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          string_agg(CASE WHEN NOT dup THEN seg END, ' ' ORDER BY pos) AS clean_text
        FROM k GROUP BY doc_id)
      SELECT d.doc_id,
        COALESCE(per.n_segments, 0) AS n_segments,
        COALESCE(per.n_removed, 0) AS n_removed,
        COALESCE(per.clean_text, '') AS clean_text
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id"""))

  /** Multinomial Naive Bayes language classifier, trained on the
    * doc_id % 5 != 0 slice and scoring the held-out fifth — the RNG-free
    * core of the fastText-style supervised filters, so the ENTIRE
    * train+score pipeline sits under the exact hash gate (unlike the
    * RF/KMeans fits, which are rows-only by RNG).
    */
  val textNbLangid: QueryDef = QueryDef(
    "text_nb_langid",
    (s, dir) => graft.llm.Classify.nbTrainScore(t(s, dir, "documents"),
        "doc_id", "text", "lang", col("doc_id") % 5 =!= 0)
      .orderBy(col("doc_id")),
    Some(s"""WITH base AS (SELECT doc_id, lang, (doc_id % 5 != 0) AS is_train,
          ${Ora.toksSql} AS w FROM documents),
      ttok AS (SELECT lang AS label, unnest(w) AS tok FROM base WHERE is_train),
      cls AS (SELECT lang AS label, COUNT(*) AS nd FROM base WHERE is_train GROUP BY 1),
      tot AS (SELECT COUNT(*) AS td FROM base WHERE is_train),
      cnt AS (SELECT label, tok, COUNT(*) AS cnt FROM ttok GROUP BY 1, 2),
      ct AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS ct FROM cnt GROUP BY 1),
      voc AS (SELECT DISTINCT tok FROM ttok),
      v AS (SELECT COUNT(*) AS v FROM voc),
      stok AS (SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(w) AS tok FROM base WHERE NOT is_train)
        JOIN voc USING (tok)),
      pairs AS (SELECT s.doc_id, cl.label,
          LOG10(CAST(COALESCE(cn.cnt, 0) + 1 AS DOUBLE) /
                CAST(ct.ct + v.v AS DOUBLE)) AS lp
        FROM stok s CROSS JOIN cls cl
        LEFT JOIN cnt cn ON cn.label = cl.label AND cn.tok = s.tok
        JOIN ct ON ct.label = cl.label CROSS JOIN v),
      pdc AS (SELECT doc_id, label, SUM(CAST(lp AS DECIMAL(27,10))) AS sdec,
          COUNT(*) AS n_used
        FROM pairs GROUP BY 1, 2),
      pri AS (SELECT label, LOG10(CAST(nd AS DOUBLE) / CAST(td AS DOUBLE)) AS pr
        FROM cls CROSS JOIN tot),
      scored AS (SELECT sd.doc_id, sd.lang, p.label,
          COALESCE(pdc.sdec, CAST(0 AS DECIMAL(27,10))) + CAST(p.pr AS DECIMAL(27,10)) AS score_dec,
          COALESCE(pdc.n_used, 0) AS n_used
        FROM (SELECT doc_id, lang FROM base WHERE NOT is_train) sd
        CROSS JOIN pri p
        LEFT JOIN pdc ON pdc.doc_id = sd.doc_id AND pdc.label = p.label),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY score_dec DESC, label) AS rk FROM scored)
      SELECT doc_id, lang, label AS pred,
        CAST(ROUND(score_dec, 6) AS DOUBLE) AS score,
        CAST(n_used AS BIGINT) AS n_used,
        (label = lang) AS correct
      FROM r WHERE rk = 1 ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(dedupSpanRemoval, textNbLangid)
}
