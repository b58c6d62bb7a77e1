package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.Unigram

/** Batch 16: the unigram-LM (SentencePiece-style) tokenizer family —
  * Viterbi max-likelihood segmentation with relational DP, mirrored by an
  * unrolled-step DuckDB WITH chain (the bpe_train precedent applied to
  * dynamic programming).
  */
object QueriesP {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  private val MaxPiece = 4
  private val MaxLen = 8

  /** One Viterbi DP chain: CTEs `${p}s1..${p}s$MaxLen` over word relation
    * `wf` and piece-score relation `scoresCte`, plus the collected
    * `${p}res` at each word's full length.
    */
  private def viterbiCtes(p: String, scoresCte: String): String =
    viterbiCtesOver(p, scoresCte, "wf")

  private def viterbiCtesOver(p: String, scoresCte: String,
                              wordsCte: String): String = {
    val steps = (1 to MaxLen).map { i =>
      val branches = (1 to math.min(MaxPiece, i)).map { l =>
        val prev = if (i - l == 0) s"${p}s0" else s"${p}s${i - l}"
        s"""SELECT pv.word, pv.freq,
            CAST(pv.sc + ps.pscore AS DECIMAL(27,10)) AS sc,
            CASE WHEN pv.seg = '' THEN ps.piece
                 ELSE pv.seg || '|' || ps.piece END AS seg,
            $l AS plen
          FROM $prev pv JOIN $scoresCte ps
            ON ps.piece = substr(pv.word, ${i - l + 1}, $l)
          WHERE LENGTH(pv.word) >= $i"""
      }.mkString("\n          UNION ALL\n          ")
      s"""${p}s$i AS MATERIALIZED (SELECT word, freq, sc, seg FROM (
          SELECT word, freq, sc, seg, ROW_NUMBER() OVER (PARTITION BY word
            ORDER BY sc DESC, plen DESC, seg DESC) AS rn FROM (
          $branches))
        WHERE rn = 1)"""
    }
    val all = (1 to MaxLen)
      .map(i => s"SELECT word, freq, sc, seg, $i AS i FROM ${p}s$i")
      .mkString("\n          UNION ALL\n          ")
    s"""${p}s0 AS (SELECT word, freq, CAST(0 AS DECIMAL(27,10)) AS sc,
          '' AS seg FROM $wordsCte),
        ${steps.mkString(",\n        ")},
        ${p}res AS (SELECT word, freq, sc, seg FROM (
          $all) WHERE i = LENGTH(word))"""
  }

  /** (word, freq) CTE over a filtered documents slice. */
  private def wordsCte(name: String, where: String): String =
    s"""$name AS MATERIALIZED (SELECT w AS word, COUNT(*) AS freq
          FROM (SELECT unnest(${Ora.toksSql}) AS w FROM documents
                WHERE $where)
          WHERE LENGTH(w) <= $MaxLen GROUP BY 1)"""

  private val initCtes: String =
    s"""wf AS MATERIALIZED (SELECT w AS word, COUNT(*) AS freq
          FROM (SELECT unnest(${Ora.toksSql}) AS w FROM documents)
          WHERE LENGTH(w) <= $MaxLen GROUP BY 1),
        p1 AS (SELECT word, freq,
            unnest(generate_series(1, LENGTH(word))) AS s FROM wf),
        p2 AS (SELECT word, freq, s,
            unnest(generate_series(1, $MaxPiece)) AS l FROM p1),
        pieces AS MATERIALIZED (SELECT substr(word, s, l) AS piece,
            CAST(SUM(freq) AS BIGINT) AS cnt
          FROM p2 WHERE s + l - 1 <= LENGTH(word) GROUP BY 1),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM pieces),
        ps0 AS MATERIALIZED (SELECT piece,
            CAST(ROUND(LOG10(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 6)
              AS DECIMAL(27,10)) AS pscore
          FROM pieces, tot)"""

  private val emCtes: String =
    s"""em AS (SELECT unnest(string_split(seg, '|')) AS piece, freq
          FROM vres),
        pieces1 AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM em GROUP BY 1),
        tot1 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM pieces1),
        ps1 AS MATERIALIZED (SELECT piece,
            CAST(ROUND(LOG10(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 6)
              AS DECIMAL(27,10)) AS pscore
          FROM pieces1, tot1)"""

  /** Unigram tokenizer train + segment with one hard-EM (Viterbi-EM)
    * refinement: frequency-initialized piece scores, Viterbi segmentation,
    * re-count from the chosen pieces, re-score, re-segment.
    */
  val unigramSegment: QueryDef = QueryDef(
    "unigram_segment",
    (s, dir) => Unigram.trainSegment(t(s, dir, "documents"), "text",
        maxPiece = MaxPiece, maxLen = MaxLen, emRounds = 1)
      .orderBy(col("word")),
    Some(s"""WITH $initCtes,
        ${viterbiCtes("v", "ps0")},
        $emCtes,
        ${viterbiCtes("e", "ps1")}
      SELECT word, freq,
        CAST(len(string_split(seg, '|')) AS INT) AS n_pieces,
        CAST(sc AS DOUBLE) AS score, seg
      FROM eres ORDER BY word"""))

  /** Piece-candidate counting + frequency scores over an existing word CTE. */
  private def modelCtes(wfName: String): String =
    s"""p1 AS (SELECT word, freq,
            unnest(generate_series(1, LENGTH(word))) AS s FROM $wfName),
        p2 AS (SELECT word, freq, s,
            unnest(generate_series(1, $MaxPiece)) AS l FROM p1),
        pieces AS MATERIALIZED (SELECT substr(word, s, l) AS piece,
            CAST(SUM(freq) AS BIGINT) AS cnt
          FROM p2 WHERE s + l - 1 <= LENGTH(word) GROUP BY 1),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM pieces),
        ps0 AS MATERIALIZED (SELECT piece,
            CAST(ROUND(LOG10(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 6)
              AS DECIMAL(27,10)) AS pscore
          FROM pieces, tot)"""

  /** Fixed-model replay (the bpe_encode precedent): train on the
    * doc_id % 5 != 0 slice (init + one hard-EM round), freeze the piece
    * scores, Viterbi-segment the held-out fifth's words. Held-out words
    * with no full-cover path under the trained pieces drop (honest OOV).
    */
  val unigramEncode: QueryDef = QueryDef(
    "unigram_encode",
    (s, dir) => Unigram.trainEncode(t(s, dir, "documents"), "text",
        isTrain = col("doc_id") % 5 =!= 0,
        maxPiece = MaxPiece, maxLen = MaxLen, emRounds = 1)
      .orderBy(col("word")),
    Some(s"""WITH ${wordsCte("wf", "doc_id % 5 != 0")},
        ${modelCtes("wf")},
        ${viterbiCtes("v", "ps0")},
        $emCtes,
        ${wordsCte("hf", "doc_id % 5 = 0")},
        ${viterbiCtesOver("h", "ps1", "hf")}
      SELECT word, freq,
        CAST(len(string_split(seg, '|')) AS INT) AS n_pieces,
        CAST(sc AS DOUBLE) AS score, seg
      FROM hres ORDER BY word"""))

  /** Corpus n-gram diversity for n = 1..3 — the templated-text signal. */
  val textNgramDiversity: QueryDef = QueryDef(
    "text_ngram_diversity",
    (s, dir) => graft.llm.TextAnalysis.ngramDiversity(
        t(s, dir, "documents"), "doc_id", "text", ns = Seq(1, 2, 3))
      .orderBy(col("n")),
    Some((1 to 3).map { n =>
      s"""SELECT $n AS n,
          (SELECT CAST(SUM(GREATEST(len(${Ora.toksSql}) - ${n - 1}, 0)) AS BIGINT)
           FROM documents) AS total_ngrams,
          (SELECT COUNT(*) FROM (SELECT DISTINCT sh
             FROM (${Ora.shinglesSql(n)}))) AS distinct_ngrams,
          ROUND(CAST((SELECT COUNT(*) FROM (SELECT DISTINCT sh
              FROM (${Ora.shinglesSql(n)}))) AS DOUBLE) /
            (SELECT SUM(GREATEST(len(${Ora.toksSql}) - ${n - 1}, 0))
             FROM documents), 6) AS diversity"""
    }.mkString("\n      UNION ALL\n      ") + "\n      ORDER BY n"))

  val all: Seq[QueryDef] =
    Seq(unigramSegment, unigramEncode, textNgramDiversity)
}
