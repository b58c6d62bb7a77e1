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

  val all: Seq[QueryDef] = Seq(dedupSpanRemoval)
}
