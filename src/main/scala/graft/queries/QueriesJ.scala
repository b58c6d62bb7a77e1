package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.{Curation, Dedup, TextAnalysis}

/** Batch 10: corpus-preparation widening — RAG chunking, temperature-
  * smoothed mixture weights, containment (subset-duplicate) dedup, and
  * Unicode text normalization through the native NfcNormalize expression.
  */
object QueriesJ {
  import Ora._
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Overlapping fixed-size character chunks with offsets — the exploded
    * (doc, chunk) relation a retrieval index consumes. size=120 stride=80
    * (overlap 40); empty docs keep one empty chunk.
    */
  val chunkDocuments: QueryDef = QueryDef(
    "chunk_documents",
    (s, dir) => Curation.chunkDocuments(t(s, dir, "documents"),
        "doc_id", "text", chunkSize = 120, overlap = 40)
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH s AS (SELECT doc_id, text,
          unnest(generate_series(1, GREATEST(LENGTH(text), 1), 80)) AS st
        FROM documents)
      SELECT doc_id, CAST((st - 1) // 80 AS INT) AS chunk_idx,
        CAST(st AS INT) AS chunk_start,
        substring(text, st, 120) AS chunk,
        CAST(LENGTH(substring(text, st, 120)) AS INT) AS chunk_len
      FROM s ORDER BY doc_id, chunk_idx"""))

  /** XLM-R/mT5-style temperature-smoothed source sampling weights
    * (alpha = 0.3): weight ∝ (source share)^alpha, decimal-accumulated so
    * aggregation order can't perturb the published weights.
    */
  val mixtureWeights: QueryDef = QueryDef(
    "mixture_weights",
    (s, dir) => Curation.mixtureWeights(t(s, dir, "documents"),
        "source", alpha = 0.3)
      .orderBy(col("source")),
    Some("""WITH c AS (SELECT source, COUNT(*) AS n_docs
             FROM documents GROUP BY 1),
        t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS tot FROM c),
        u AS (SELECT source, n_docs, CAST(n_docs AS DOUBLE) / tot AS p
              FROM c, t),
        w AS (SELECT source, n_docs, p, POWER(p, 0.3) AS pw FROM u),
        sm AS (SELECT CAST(SUM(CAST(pw AS DECIMAL(27,10))) AS DOUBLE) AS ws
               FROM w)
      SELECT source, n_docs, ROUND(p, 6) AS p, ROUND(pw / ws, 6) AS weight
      FROM w, sm ORDER BY source"""))

  /** N-gram containment pairs — the subset-duplicate detector (a document
    * quoted wholesale inside a larger one clears containment while Jaccard
    * stays near zero). Same capped inverted-index mechanics as
    * dedup_ngram_jaccard; both directions emitted.
    */
  val dedupContainment: QueryDef = QueryDef(
    "dedup_containment",
    (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, minContainment = 0.6, maxDf = 1000)
      .orderBy(col("da"), col("db")),
    Some(s"""WITH sh_all AS (${shinglesSql(3)}),
      sh AS (SELECT sh_all.* FROM sh_all
             JOIN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
             USING (sh)),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      ct AS (SELECT da, db, ROUND(c / sa.sz, 6) AS cont_ab,
                    ROUND(c / sb.sz, 6) AS cont_ba
             FROM pairs JOIN sizes sa ON da = sa.doc_id
                        JOIN sizes sb ON db = sb.doc_id)
      SELECT da, db, cont_ab, cont_ba FROM ct
      WHERE GREATEST(cont_ab, cont_ba) >= 0.6 ORDER BY da, db"""))

  /** Canonical normalization through the native NfcNormalize codegen
    * expression. The query INJECTS a denormalized suffix (decomposed
    * e + U+0301, doubled spaces, a tab, trailing space) so the oracle
    * genuinely pins NFC recomposition + lowercasing + whitespace collapse
    * on every row — the corpus text alone is ASCII-clean and would
    * exercise only the identity fast path.
    */
  val textNormalize: QueryDef = QueryDef(
    "text_normalize",
    (s, dir) => TextAnalysis.normalizeText(
        t(s, dir, "documents")
          .withColumn("txt2", // the suffix's first e carries a combining acute (decomposed)
            concat(col("text"), lit(" Cafe\u0301  du\tMonde "))),
        "doc_id", "txt2")
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id,
          text || ' Cafe' || chr(769) || '  du' || chr(9) || 'Monde ' AS txt2
        FROM documents),
      n AS (SELECT doc_id,
          TRIM(regexp_replace(lower(nfc_normalize(txt2)),
               '[ \t\n\r\f]+', ' ', 'g')) AS normalized
        FROM d)
      SELECT doc_id, normalized,
        CAST(LENGTH(normalized) AS INT) AS n_chars_norm
      FROM n ORDER BY doc_id"""))

  /** CCNet-style bigram-LM perplexity: add-one-smoothed bigram model
    * trained on the doc_id % 5 != 0 slice, every document scored by mean
    * −log10 P(w2|w1) and the derived perplexity — the reference-LM
    * quality-filter pattern (held-out docs scored by a model that never
    * saw them).
    */
  val textPerplexity: QueryDef = QueryDef(
    "text_perplexity",
    (s, dir) => TextAnalysis.bigramPerplexity(
        t(s, dir, "documents"), "doc_id", "text",
        isTrain = col("doc_id") % 5 =!= 0)
      .orderBy(col("doc_id")),
    Some(s"""WITH base AS (SELECT doc_id, doc_id % 5 <> 0 AS is_train,
          ${Ora.toksSql} AS w
        FROM documents),
      g AS (SELECT doc_id, is_train,
          [{'w1': w[i], 'w2': w[i + 1]} for i in generate_series(1, len(w) - 1)] AS bgs
        FROM base),
      bi AS (SELECT doc_id, is_train, unnest(bgs, recursive := true) FROM g),
      bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bi WHERE is_train GROUP BY 1, 2),
      pc AS (SELECT w1, COUNT(*) AS cw FROM bi WHERE is_train GROUP BY 1),
      voc AS (SELECT COUNT(DISTINCT tok) AS v
              FROM (SELECT unnest(w) AS tok FROM base WHERE is_train)),
      sv AS (SELECT doc_id,
          -LOG10(CAST(COALESCE(cb, 0) + 1 AS DOUBLE)
                 / CAST(COALESCE(cw, 0) + v AS DOUBLE)) AS s
        FROM bi LEFT JOIN bc USING (w1, w2) LEFT JOIN pc USING (w1) CROSS JOIN voc),
      agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
          ROUND(CAST(SUM(CAST(s AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6)
            AS neg_logp10
        FROM sv GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(agg.n_bigrams, 0) AS n_bigrams, agg.neg_logp10,
        ROUND(POWER(10, agg.neg_logp10), 6) AS ppl
      FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id"""))

  /** BPE tokenizer training (Sennrich 2015): k merge steps over the corpus
    * word-frequency table, each step = weighted overlapping-pair count →
    * (freq DESC, lexicographic) argmax → literal left-to-right merge. The
    * mirror unrolls the k steps as MATERIALIZED CTEs (each s_i feeds both
    * the next pair count and the next rewrite — without MATERIALIZED the
    * inlining re-executes the whole prefix per reference, 2^k blowup).
    */
  val bpeTrain: QueryDef = {
    val k = 4
    val stepCtes = (1 to k).map { i =>
      s"""p$i AS (
        -- CAST: DuckDB SUM(BIGINT) is HUGEINT; the driver's hash is
        -- type-tagged, so an uncast freq hash-mismatches Spark's long
        -- even when values compare equal
        SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
          SELECT cnt, unnest([{'l': a[j], 'r': a[j + 1]}
                              for j in generate_series(1, len(a) - 1)],
                             recursive := true)
          FROM (SELECT cnt, string_split(sym, ' ') AS a FROM s${i - 1}))
        GROUP BY l, r),
      b$i AS (SELECT l, r, freq FROM p$i ORDER BY freq DESC, l, r LIMIT 1),
      s$i AS MATERIALIZED (
        -- double-spacing trick = exact greedy left-to-right merge (see
        -- Bpe.applyMerge): widen gaps to two spaces so consecutive pair
        -- occurrences stop sharing a boundary space, literal-replace,
        -- collapse back
        SELECT s.cnt, trim(replace(replace(
            ' ' || replace(s.sym, ' ', '  ') || ' ',
            ' ' || b.l || '  ' || b.r || ' ',
            ' ' || b.l || b.r || ' '), '  ', ' ')) AS sym
        FROM s${i - 1} s CROSS JOIN b$i b)"""
    }.mkString(",\n      ")
    val unionSteps = (1 to k).map(i =>
      s"SELECT $i AS step, l AS l_sym, r AS r_sym, l || r AS merged, freq FROM b$i")
      .mkString("\n        UNION ALL ")
    QueryDef(
      "bpe_train",
      (s, dir) => graft.llm.Bpe.train(t(s, dir, "documents"), "text", numMerges = k)
        .orderBy(col("step")),
      Some(s"""WITH s0 AS MATERIALIZED (
          SELECT cnt,
            array_to_string([w[j] for j in generate_series(1, len(w))], ' ')
              || ' </w>' AS sym
          FROM (SELECT w, COUNT(*) AS cnt
                FROM (SELECT unnest(${Ora.toksSql}) AS w FROM documents)
                GROUP BY w)),
      $stepCtes
      SELECT * FROM ($unionSteps) ORDER BY step"""))
  }

  /** BPE encode with a FIXED merge table (the fixed-quantizer precedent:
    * the train step's RNG-free output is gated by bpe_train above; this
    * gates the REPLAY mechanics — ordered literal merges over symbolized
    * tokens — end to end on a corpus slice).
    */
  val bpeEncode: QueryDef = {
    val merges = Seq(("e", "r"), ("t", "h"), ("th", "e"))
    // same double-spacing greedy merge as Bpe.applyMerge, folded per merge
    val replayed = merges.foldLeft("sym0") { case (s, (l, r)) =>
      s"trim(replace(replace(' ' || replace($s, ' ', '  ') || ' ', " +
        s"' $l  $r ', ' $l$r '), '  ', ' '))"
    }
    QueryDef(
      "bpe_encode",
      (s, dir) => graft.llm.Bpe.encode(
          t(s, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", merges)
        .select(col("doc_id"), col("tok_idx"), col("w"),
          array_join(col("pieces"), "|").as("pieces_str"), col("n_pieces"))
        .orderBy(col("doc_id"), col("tok_idx")),
      Some(s"""WITH tok AS (
          SELECT doc_id, unnest([{'tok_idx': CAST(j - 1 AS INT), 'w': t[j]}
                                 for j in generate_series(1, len(t))],
                                recursive := true)
          FROM (SELECT doc_id, ${Ora.toksSql} AS t FROM documents
                WHERE doc_id < 100)),
        sym AS (SELECT doc_id, tok_idx, w,
            array_to_string([w[j] for j in generate_series(1, len(w))], ' ')
              || ' </w>' AS sym0
          FROM tok),
        enc AS (SELECT doc_id, tok_idx, w,
            string_split(trim($replayed), ' ') AS pieces
          FROM sym)
        SELECT doc_id, tok_idx, w, array_to_string(pieces, '|') AS pieces_str,
          CAST(len(pieces) AS INT) AS n_pieces
        FROM enc ORDER BY doc_id, tok_idx"""))
  }

  /** Cross-corpus incremental dedup: the doc_id % 4 = 0 slice plays the
    * refreshed-crawl "new" snapshot, checked against the rest as the
    * accepted reference corpus. Candidates only from new-bands × ref-bands
    * (never new×new / ref×ref); verified by exact Jaccard.
    */
  val dedupCross: QueryDef = QueryDef(
    "dedup_cross_corpus",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.crossCorpusDedup(
          docs.filter(col("doc_id") % 4 === 0),
          docs.filter(col("doc_id") % 4 =!= 0),
          "doc_id", "text", n = 3, k = 16, r = 4, minJaccard = 0.5)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH sh AS (${shinglesSql(3)}),
      hm AS (SELECT doc_id, sh, ${md5LongSql("sh")} % 1000000007 AS hm FROM sh),
      params AS (SELECT g AS i, (654435747 * (g + 1)) % 1000000007 AS a,
                        (654602297 * (g + 1)) % 1000000007 AS b
                 FROM generate_series(0, 15) t(g)),
      mh AS (SELECT doc_id, i, MIN((a * hm + b) % 1000000007) AS mh
             FROM hm CROSS JOIN params GROUP BY 1, 2),
      sig AS (SELECT doc_id, i // 4 AS band,
                     string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS sig
              FROM mh GROUP BY 1, 2),
      sign AS (SELECT doc_id, band, sig FROM (
            SELECT doc_id, band, sig,
              COUNT(*) OVER (PARTITION BY band, sig) AS n
            FROM sig WHERE doc_id % 4 = 0) WHERE n <= 1000),
      sigr AS (SELECT doc_id, band, sig FROM (
            SELECT doc_id, band, sig,
              COUNT(*) OVER (PARTITION BY band, sig) AS n
            FROM sig WHERE doc_id % 4 <> 0) WHERE n <= 1000),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM sign a JOIN sigr b ON a.band = b.band AND a.sig = b.sig),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      common AS (SELECT c.da, c.db, COUNT(*) AS c
                 FROM cand c JOIN sh a ON a.doc_id = c.da
                             JOIN sh b ON b.doc_id = c.db AND b.sh = a.sh
                 GROUP BY 1, 2),
      j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
            FROM common JOIN sizes sa ON da = sa.doc_id
                        JOIN sizes sb ON db = sb.doc_id),
      per AS (SELECT da, MIN(db) AS dup_of, MAX(jac) AS best_jac
              FROM j WHERE jac >= 0.5 GROUP BY da)
      SELECT d.doc_id, per.dup_of, per.best_jac, per.dup_of IS NULL AS keep
      FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) d
      LEFT JOIN per ON d.doc_id = per.da
      ORDER BY d.doc_id"""))

  /** Markup stripping with INJECTED markup (the text_normalize precedent:
    * corpus text is markup-free, so the query wraps every row in tags +
    * entities to genuinely pin the strip → decode → collapse order on
    * every row).
    */
  val textHtmlStrip: QueryDef = QueryDef(
    "text_html_strip",
    (s, dir) => TextAnalysis.stripMarkup(
        t(s, dir, "documents").withColumn("txt2",
          concat(lit("<div id=\"x\"><p>"), col("text"),
            lit(" &amp; <b>bold</b> &lt;i&gt;</p></div>"))),
        "doc_id", "txt2")
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id,
          '<div id="x"><p>' || text || ' &amp; <b>bold</b> &lt;i&gt;</p></div>' AS txt2
        FROM documents),
      n AS (SELECT doc_id,
          TRIM(regexp_replace(
            replace(replace(replace(replace(replace(
              regexp_replace(txt2, '<[^>]*>', ' ', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', chr(39)), '&amp;', '&'),
            '[ \t\n\r\f]+', ' ', 'g')) AS clean
        FROM d)
      SELECT doc_id, clean, CAST(LENGTH(clean) AS INT) AS n_chars_clean
      FROM n ORDER BY doc_id"""))

  /** Deterministic epoch shuffle into 8 training shards: shard = hash mod
    * 8, pos = rank by (hash, id) within the shard — same salt replays
    * bit-identically, per-shard rank window never sorts globally.
    */
  val corpusShuffle: QueryDef = QueryDef(
    "corpus_shuffle",
    (s, dir) => Curation.shuffleShards(t(s, dir, "documents"),
        "doc_id", numShards = 8)
      .orderBy(col("doc_id")),
    Some(s"""WITH h AS (SELECT doc_id,
          ${md5LongSql("CAST(doc_id AS VARCHAR)")} AS h
        FROM documents),
      s AS (SELECT doc_id, h, CAST(h % 8 AS INT) AS shard FROM h)
      SELECT doc_id, shard,
        CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
          AS INT) AS pos
      FROM s ORDER BY doc_id"""))

  /** Matryoshka-embedding retrieval (arXiv:2205.13147): search on the
    * first-16 prefix of the 64-dim embedding (cosine needs no
    * renormalization — it normalizes by the prefix norms), measure
    * recall@5 against full-dim exact search. The dimension-truncation
    * quality/cost tradeoff as a measured, oracle-mirrored number;
    * composes slice → bruteForceTopKAgg (bounded TopK aggregator) →
    * recallAtK, all individually gated.
    */
  val simsearchMatryoshka: QueryDef = QueryDef(
    "simsearch_matryoshka_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val sliced = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("emb16"))
      val approx = graft.llm.Similarity.bruteForceTopKAgg(
        sliced, sliced.filter(col("vec_id") < 10), "vec_id", "emb16",
        dim = 16, k = 5)
      val exact = graft.llm.Similarity.bruteForceTopKAgg(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 5)
      graft.llm.Similarity.recallAtK(approx, exact).orderBy(col("qid"))
    },
    Some(s"""WITH approx AS (SELECT qid, vb FROM (${Ora.bruteForceTopKSql(10, 5, 16)})),
      exact AS (SELECT qid, vb FROM (${Ora.bruteForceTopKSql(10, 5, 64)})),
      hit AS (SELECT e.qid, COUNT(*) AS n_hit
        FROM exact e JOIN approx a ON a.qid = e.qid AND a.vb = e.vb
        GROUP BY e.qid),
      ex AS (SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY qid)
      SELECT ex.qid, ex.n_exact, COALESCE(hit.n_hit, 0) AS n_hit,
        ROUND(CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / ex.n_exact, 6) AS recall
      FROM ex LEFT JOIN hit ON hit.qid = ex.qid ORDER BY ex.qid"""))

  val all: Seq[QueryDef] = Seq(chunkDocuments, mixtureWeights,
    dedupContainment, textNormalize, textPerplexity, bpeTrain, bpeEncode,
    dedupCross, textHtmlStrip, corpusShuffle, simsearchMatryoshka)
}
