package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.functions.Layout
import graft.llm.Curation

/** Batch 14: curation gates and layout keys — wordlist screening,
  * deterministic split assignment, z-order layout keys.
  */
object QueriesN {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  private val DenyList = Seq("error", "slow", "big")

  /** Deny-list screening over the documents table: zero-shuffle map-side
    * token membership against an inlined wordlist.
    */
  val curationWordlistScreen: QueryDef = QueryDef(
    "curation_wordlist_screen",
    (s, dir) => Curation.wordlistScreen(t(s, dir, "documents"),
        "doc_id", "text", DenyList, maxFraction = 0.05)
      .orderBy(col("doc_id")),
    Some(s"""WITH b AS (SELECT doc_id, ${Ora.toksSql} AS w FROM documents),
      c AS (SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(w, x -> list_contains(['big','error','slow'], x)))
            AS BIGINT) AS n_hits,
          CAST(len(list_filter(list_distinct(w),
            x -> list_contains(['big','error','slow'], x)))
            AS BIGINT) AS n_distinct_hits
        FROM b)
      SELECT doc_id, n_tokens, n_hits, n_distinct_hits,
        CASE WHEN n_tokens > 0
             THEN ROUND(CAST(n_hits AS DOUBLE) / n_tokens, 6)
             ELSE 0.0 END AS hit_fraction,
        (CASE WHEN n_tokens > 0
              THEN ROUND(CAST(n_hits AS DOUBLE) / n_tokens, 6)
              ELSE 0.0 END) > 0.05 AS flagged
      FROM c ORDER BY doc_id"""))

  /** Deterministic 80/10/10 train/val/test assignment by salted hash
    * bucket, rolled up per (split, lang) so the whole partition sits under
    * one small hash-gated result.
    */
  val sampleSplitAssign: QueryDef = QueryDef(
    "sample_split_assign",
    (s, dir) => Curation.splitAssign(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang")),
    Some(s"""WITH a AS (SELECT lang,
          CASE WHEN ${Ora.md5LongSql("CONCAT(CAST(doc_id AS VARCHAR), 'graft')")}
                 % 1000000 < 800000 THEN 'train'
               WHEN ${Ora.md5LongSql("CONCAT(CAST(doc_id AS VARCHAR), 'graft')")}
                 % 1000000 < 900000 THEN 'val'
               ELSE 'test' END AS split
        FROM documents)
      SELECT split, lang, COUNT(*) AS n_docs
      FROM a GROUP BY split, lang ORDER BY split, lang"""))

  /** Z-order layout key over (customer, order) buckets — the lakehouse
    * OPTIMIZE ZORDER key as an exact bit-interleave expression.
    */
  val layoutZorder: QueryDef = {
    val bits = 10; val n = 2
    val terms = (for {
      b <- 0 until bits
      (c, i) <- Seq("x", "y").zipWithIndex
    } yield s"((($c >> $b) & 1) << ${b * n + i})").mkString(" | ")
    QueryDef(
      "layout_zorder",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(col("o_orderkey"),
            Layout.zorderKey(Seq(col("o_custkey") % 1024,
              col("o_orderkey") % 1024), bits).as("zkey"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""WITH b AS (SELECT o_orderkey,
            CAST(o_custkey % 1024 AS BIGINT) AS x,
            CAST(o_orderkey % 1024 AS BIGINT) AS y
          FROM orders)
        SELECT o_orderkey, CAST($terms AS BIGINT) AS zkey
        FROM b ORDER BY o_orderkey"""))
  }

  /** The full corpus-curation pipeline as ONE composed oracle (the
    * m11_prepare_input precedent for the LLM domain): quality gate →
    * exact-dedup canonicalization → benchmark decontamination →
    * deterministic split assignment → per-(split, lang) doc/token
    * accounting. Every stage is an already-gated operator; this query
    * proves they compose in one plan with the hash gate over the end
    * result.
    */
  val curationPipelineE2e: QueryDef = QueryDef(
    "curation_pipeline_e2e",
    (s, dir) => {
      import graft.llm.{Curation => Cur, Dedup, TextAnalysis}
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 20 =!= 0)
      val bench = docs.filter(col("doc_id") % 20 === 0)
      // n_tokens rides along from the quality pass so the final
      // accounting never re-tokenizes the kept documents. The flag
      // relation MATERIALIZES before the keep-filter: pushing the
      // predicate through the operator's staged projections re-inlines
      // the token split / n-gram transform into every flag term of the
      // pushed conjunction (15 regexp instances, interpreted — measured
      // ~25x the staged cost), so the fence here IS the optimization
      val keepQ = Cur.qualityFilter(corpus, "doc_id", "text",
          minTokens = 40, maxTokens = 80, maxRepetition = 0.1,
          minStopRatio = 0.01)
        .localCheckpoint()
        .filter(col("keep")).select(col("doc_id"), col("n_tokens"))
      // digest variant: the canonicalization shuffle carries 16-byte keys
      // instead of whole documents (identical keep set, the 100 TB shape)
      val keepers = Dedup.exactByDigest(corpus, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val clean = Cur.contaminationScore(corpus, bench, "doc_id", "text",
          n = 3, threshold = 0.2)
        .filter(!col("contaminated")).select(col("doc_id"))
      val kept = corpus.join(keepQ, Seq("doc_id"))
        .join(keepers, Seq("doc_id"))
        .join(clean, Seq("doc_id"))
      Cur.splitAssign(kept, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
        .orderBy(col("split"), col("lang"))
    },
    Some(s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
      bench AS (SELECT * FROM documents WHERE doc_id % 20 = 0),
      b AS (SELECT doc_id, ${Ora.toksSql} AS w FROM corpus),
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
        FROM g),
      q AS (SELECT doc_id FROM m
        WHERE NOT n_tokens < 40 AND NOT n_tokens > 80
          AND NOT rep_ratio > 0.1 AND NOT stop_raw < 0.01),
      keepers AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text),
      csh AS (${QueriesH.shinglesFromSql("corpus", 3)}),
      bsh AS (SELECT DISTINCT sh FROM (${QueriesH.shinglesFromSql("bench", 3)})),
      agg AS (SELECT doc_id, COUNT(*) AS n_grams,
          CAST(SUM(CASE WHEN sh IN (SELECT sh FROM bsh)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        FROM csh GROUP BY doc_id),
      clean AS (SELECT c.doc_id FROM corpus c LEFT JOIN agg a USING (doc_id)
        WHERE NOT ((CASE WHEN COALESCE(a.n_grams, 0) > 0
                    THEN ROUND(CAST(a.n_hit AS DOUBLE) / a.n_grams, 6)
                    ELSE 0.0 END) >= 0.2)),
      kept AS (SELECT c.* FROM corpus c
        JOIN q USING (doc_id) JOIN keepers USING (doc_id)
        JOIN clean USING (doc_id)),
      sp AS (SELECT lang, ${Ora.toksSql} AS w,
          CASE WHEN ${Ora.md5LongSql("CONCAT(CAST(doc_id AS VARCHAR), 'graft')")}
                 % 1000000 < 800000 THEN 'train'
               WHEN ${Ora.md5LongSql("CONCAT(CAST(doc_id AS VARCHAR), 'graft')")}
                 % 1000000 < 900000 THEN 'val'
               ELSE 'test' END AS split
        FROM kept)
      SELECT split, lang, COUNT(*) AS n_docs,
        CAST(SUM(len(w)) AS BIGINT) AS n_tokens
      FROM sp GROUP BY split, lang ORDER BY split, lang"""))

  /** SymSpell-style vocabulary typo pairs: deletion-neighborhood blocking
    * (a word is its own 0-deletion variant) + exact Levenshtein verify on
    * candidates only — never an all-pairs vocabulary join.
    */
  val textTypoPairs: QueryDef = QueryDef(
    "text_typo_pairs",
    (s, dir) => {
      // the synthetic vocabulary has no natural lev-1 neighbors, so the
      // corpus is augmented with a deterministic typo slice (first char of
      // each document dropped → a deletion typo of its first word),
      // mirrored identically
      val docs = t(s, dir, "documents")
      val aug = docs.select(col("text"))
        .unionAll(docs.select(expr("substring(text, 2)").as("text")))
      graft.llm.Dedup.typoPairs(aug, "text")
        .orderBy(col("wa"), col("wb"))
    },
    Some(s"""WITH corpus AS (SELECT text FROM documents
          UNION ALL SELECT substr(text, 2) AS text FROM documents),
      vocab AS (SELECT w AS word, COUNT(*) AS freq
          FROM (SELECT unnest(${Ora.toksSql}) AS w FROM corpus)
          WHERE LENGTH(w) <= 24 GROUP BY 1),
      vr AS (SELECT word, freq, unnest(list_distinct(list_append(
            [substr(word, 1, i - 1) || substr(word, i + 1, LENGTH(word) - i)
             for i in generate_series(1, LENGTH(word))],
            word))) AS v
        FROM vocab),
      cand AS (SELECT DISTINCT a.word AS wa, b.word AS wb,
          a.freq AS freq_a, b.freq AS freq_b
        FROM vr a JOIN vr b ON a.v = b.v AND a.word < b.word)
      SELECT wa, wb, CAST(levenshtein(wa, wb) AS INT) AS dist,
        freq_a, freq_b
      FROM cand WHERE levenshtein(wa, wb) <= 1 ORDER BY wa, wb"""))

  val all: Seq[QueryDef] =
    Seq(curationWordlistScreen, sampleSplitAssign, layoutZorder,
      curationPipelineE2e, textTypoPairs)
}
