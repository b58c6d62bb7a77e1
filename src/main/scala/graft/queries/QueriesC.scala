package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Batch 3: LLM-training-data-pipeline operators — dedup (exact / n-gram
  * Jaccard / MinHash-LSH / SimHash / embedding-cosine), similarity search
  * (brute-force + IVF), text analysis (quality, tokens, language-ID,
  * fingerprint), multimodal-column plumbing.
  */
object QueriesC {
  import Ora._
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  // shingle/dot/norm mirrors come from Ora (shinglesSql, dotSql/normSql,
  // dotArrSql/normArrSql) — one definition shared across every oracle

  /** Exact dedup: hash-groupBy on content. */
  val dedupExact: QueryDef = QueryDef(
    "dedup_exact",
    (s, dir) => Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("keep_id")),
    Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_id"""))

  /** Exact dedup through the digest key — the 100 TB shuffle-width variant:
    * 16-byte md5 keys instead of whole documents through the exchange.
    */
  val dedupExactDigest: QueryDef = QueryDef(
    "dedup_exact_digest",
    (s, dir) => Dedup.exactByDigest(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("keep_id")),
    Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY keep_id"""))

  /** Audio-style overlapped window sampling over the payload (64-byte
    * windows, stride 48; short docs yield one truncated window).
    */
  val multimodalChunks: QueryDef = QueryDef(
    "multimodal_chunks",
    (s, dir) => Multimodal.chunkWindows(t(s, dir, "documents"), "doc_id", "text",
        size = 64, stride = 48)
      .orderBy(col("doc_id")),
    Some("""WITH c AS (SELECT doc_id,
        CASE WHEN LENGTH(text) >= 64
             THEN [substring(text, s, 64) for s in generate_series(1, LENGTH(text) - 63, 48)]
             ELSE [substring(text, 1, 64)] END AS chunks
        FROM documents)
      SELECT doc_id, CAST(LEN(chunks) AS INT) AS n_chunks,
        chunks[1] AS chunk_first, chunks[LEN(chunks)] AS chunk_last
      FROM c ORDER BY doc_id"""))

  /** N-gram Jaccard near-dup via inverted-index join (no all-pairs), with the
    * hot-shingle document-frequency cap mirrored on both engines.
    */
  val dedupJaccard: QueryDef = QueryDef(
    "dedup_ngram_jaccard",
    (s, dir) => Queries.jaccardPairsShared(s, dir)
      .orderBy(col("da"), col("db")),
    Some(s"""WITH sh_all AS (${shinglesSql(3)}),
      sh AS (SELECT sh_all.* FROM sh_all
             JOIN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
             USING (sh)),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
            FROM pairs JOIN sizes sa ON da = sa.doc_id
                       JOIN sizes sb ON db = sb.doc_id)
      SELECT da, db, jac FROM j WHERE jac >= 0.5 ORDER BY da, db"""))

  /** MinHash + LSH banding: shingle → k=16 signature → 4 bands of 4 →
    * bucket-join candidates → exact-Jaccard verification.
    */
  val dedupMinhash: QueryDef = QueryDef(
    "dedup_minhash",
    (s, dir) => Queries.minhashPairsShared(s, dir)
      .orderBy(col("da"), col("db")),
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
      sigc AS (SELECT doc_id, band, sig FROM (
            SELECT doc_id, band, sig,
              COUNT(*) OVER (PARTITION BY band, sig) AS n FROM sig)
          WHERE n <= 1000),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM sigc a JOIN sigc b ON a.band = b.band AND a.sig = b.sig
                                       AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      common AS (SELECT c.da, c.db, COUNT(*) AS c
                 FROM cand c JOIN sh a ON a.doc_id = c.da
                             JOIN sh b ON b.doc_id = c.db AND b.sh = a.sh
                 GROUP BY 1, 2),
      j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
            FROM common JOIN sizes sa ON da = sa.doc_id
                        JOIN sizes sb ON db = sb.doc_id)
      SELECT da, db, jac FROM j WHERE jac >= 0.5 ORDER BY da, db"""))

  /** 16-bit SimHash per document (bitwise majority of token hashes). */
  val dedupSimhash: QueryDef = {
    val bitSumsSql = (0 until 16)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(", ")
    val valueSql = (0 until 16)
      .map(b => s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    QueryDef(
      "dedup_simhash",
      (s, dir) => Dedup.simhash16(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        h AS (SELECT doc_id, ${md5LongSql("tok")} % 65536 AS h FROM tok),
        bits AS (SELECT doc_id, $bitSumsSql FROM h GROUP BY doc_id)
        SELECT doc_id, CAST($valueSql AS BIGINT) AS simhash
        FROM bits ORDER BY doc_id"""))
  }

  /** Embedding-cosine near-dup with label blocking. */
  val dedupEmbedding: QueryDef = QueryDef(
    "dedup_embedding_cosine",
    (s, dir) => Dedup.embeddingNearDup(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label", dim = 64, minCos = 0.4)
      .orderBy(col("va"), col("vb")),
    Some(s"""SELECT va, vb, cos FROM (
        SELECT a.vec_id AS va, b.vec_id AS vb,
          ROUND((${dotSql("a", "b", 64)}) /
            (SQRT(${normSql("a", 64)}) * SQRT(${normSql("b", 64)})), 6) AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id)
      WHERE cos >= 0.4 ORDER BY va, vb"""))

  /** Near-dup cluster resolution: connected components over the Jaccard
    * pair graph by min-label propagation; the oracle computes the same
    * components with a recursive transitive-closure CTE.
    */
  val dedupClusters: QueryDef = QueryDef(
    "dedup_clusters",
    (s, dir) => Dedup.resolveClusters(Queries.jaccardPairsShared(s, dir))
      .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE sh_all AS (${shinglesSql(3)}),
      sh AS (SELECT sh_all.* FROM sh_all
             JOIN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
             USING (sh)),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      prs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
            FROM prs JOIN sizes sa ON da = sa.doc_id
                     JOIN sizes sb ON db = sb.doc_id),
      pairs AS (SELECT da, db FROM j WHERE jac >= 0.5),
      e AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs),
      reach AS (
        SELECT a, a AS b FROM (SELECT DISTINCT a FROM e)
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
      SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach
      GROUP BY a ORDER BY doc_id"""))

  /** Random-hyperplane LSH near-dup — the corpus-scale path (no label
    * blocking, no O(block²)); the oracle mirrors the integer-LCG hyperplanes
    * and the banding exactly.
    */
  val dedupEmbeddingLsh: QueryDef = QueryDef(
    "dedup_embedding_lsh",
    (s, dir) => Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"),
        "vec_id", "embedding", dim = 64, nBits = 32, r = 8, minCos = 0.4)
      .orderBy(col("va"), col("vb")),
    Some(s"""WITH sigs AS (
        SELECT vec_id,
          [array_to_string([CASE WHEN list_sum([
             (CAST((654435747 * (j*64 + i + 1)) % 1000000007 AS DOUBLE) - 500000003.0)
               * CAST(embedding[i+1] AS DOUBLE)
             for i in generate_series(0, 63)]) > 0 THEN '1' ELSE '0' END
             for j in generate_series(bd*8, bd*8+7)], '')
           for bd in generate_series(0, 3)] AS sigl
        FROM embeddings),
      bands AS (SELECT vec_id, g AS band, sigl[g+1] AS sig
                FROM sigs, generate_series(0, 3) t(g)),
      cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
      v AS (SELECT va, vb,
              ROUND((${dotSql("a", "b", 64)}) /
                (SQRT(${normSql("a", 64)}) * SQRT(${normSql("b", 64)})), 6) AS cos
            FROM cand JOIN embeddings a ON a.vec_id = va
                      JOIN embeddings b ON b.vec_id = vb)
      SELECT va, vb, cos FROM v WHERE cos >= 0.4 ORDER BY va, vb"""))

  /** Brute-force cosine top-k for the first 10 vectors as queries. */
  val simsearchTopK: QueryDef = QueryDef(
    "simsearch_bruteforce_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", dim = 64, k = 5)
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"${bruteForceTopKSql(10, 5, 64)} ORDER BY qid, rank"))

  /** Brute-force top-k through the bounded TopK aggregator — same oracle as
    * the window variant (results are identical); the plan shuffles |Q|×k
    * partial buffers instead of every scored pair.
    */
  val simsearchTopKAgg: QueryDef = QueryDef(
    "simsearch_topk_agg",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopKAgg(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", dim = 64, k = 5)
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"${bruteForceTopKSql(10, 5, 64)} ORDER BY qid, rank"))

  /** IVF-style ANN (coarse quantizer = label centroids, nprobe=3). Fully
    * oracle-mirrored: centroids are decimal-accumulated elementwise means
    * (order-independent), probe ranking and the in-cell search both
    * tie-break deterministically, so DuckDB reproduces the exact result.
    */
  val simsearchIvf: QueryDef = QueryDef(
    "simsearch_ivf",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", dim = 64, k = 5, nprobe = 3)
        .orderBy(col("qid"), col("rank"))
    },
    Some(Ora.ivfLabelSql(maxQid = 10, k = 5, nprobe = 3, dim = 64)))

  /** The pairs → clusters → corpus composition, ending in [[Dedup.canonicalize]]:
    * the deduplicated corpus itself (one canonical doc per near-dup cluster,
    * all unclustered docs kept).
    */
  val dedupCanonicalize: QueryDef = QueryDef(
    "dedup_canonicalize",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val clusters = Dedup.resolveClusters(Queries.jaccardPairsShared(s, dir))
      Dedup.canonicalize(docs, clusters, "doc_id")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE sh_all AS (${shinglesSql(3)}),
      sh AS (SELECT sh_all.* FROM sh_all
             JOIN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) <= 1000)
             USING (sh)),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      prs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      j AS (SELECT da, db, ROUND(c / (sa.sz + sb.sz - c), 6) AS jac
            FROM prs JOIN sizes sa ON da = sa.doc_id
                     JOIN sizes sb ON db = sb.doc_id),
      pairs AS (SELECT da, db FROM j WHERE jac >= 0.5),
      e AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs),
      reach AS (
        SELECT a, a AS b FROM (SELECT DISTINCT a FROM e)
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (
        SELECT a FROM (SELECT a, MIN(b) AS cluster_id FROM reach GROUP BY a)
        WHERE a <> cluster_id)
      ORDER BY doc_id"""))

  /** Per-document quality features. */
  val textQuality: QueryDef = QueryDef(
    "text_quality",
    (s, dir) => TextAnalysis.qualityFeatures(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""WITH f AS (SELECT doc_id,
        CAST(LENGTH(text) AS INT) AS n_chars,
        CAST(LEN($toksSql) AS INT) AS n_tokens,
        LENGTH(regexp_replace(text, '[ \\t\\n\\r\\f]', '', 'g')) AS n_chars_nows,
        LEN(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
        LEN(list_filter($toksSql,
          x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS n_stop
        FROM documents)
      SELECT doc_id, n_chars, n_tokens,
        ROUND(CAST(n_chars_nows AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
        ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
        ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio
      FROM f ORDER BY doc_id"""))

  /** Token counting: whitespace tokens + BPE-ish sub-tokens. */
  val textTokens: QueryDef = QueryDef(
    "text_token_count",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_ws_tokens"),
        size(TextAnalysis.bpeishTokens(col("text"))).as("n_bpeish_tokens"))
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
      CAST(LEN($toksSql) AS INT) AS n_ws_tokens,
      CAST(LEN(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f]')) AS INT) AS n_bpeish_tokens
      FROM documents ORDER BY doc_id"""))

  /** Language-ID by marker-word voting. */
  val textLangId: QueryDef = QueryDef(
    "text_langid",
    (s, dir) => TextAnalysis.langId(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some {
      val values = TextAnalysis.LangMarkers
        .map { case (l, w) => s"('$l','$w')" }.mkString(", ")
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
      m(mlang, mword) AS (VALUES $values),
      hits AS (SELECT doc_id, mlang, COUNT(*) AS n FROM tok
               JOIN m ON tok = mword GROUP BY 1, 2),
      best AS (SELECT doc_id, mlang, n,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, mlang) AS rn
               FROM hits)
      SELECT d.doc_id, COALESCE(b.mlang, 'und') AS pred_lang,
             CAST(COALESCE(b.n, 0) AS BIGINT) AS n_hits
      FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        ON d.doc_id = b.doc_id
      ORDER BY d.doc_id"""
    })

  /** Corpus vocabulary top-100: occurrence + document frequency per token,
    * global top-n as TakeOrderedAndProject (partition-local candidates, no
    * global sort).
    */
  val textVocab: QueryDef = QueryDef(
    "text_vocab",
    (s, dir) => TextAnalysis.vocabulary(t(s, dir, "documents"), "doc_id", "text",
        n = 100)
      .orderBy(col("n_total").desc, col("tok")),
    Some(s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
      SELECT tok, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
      FROM tok GROUP BY tok
      ORDER BY n_total DESC, tok LIMIT 100"""))

  /** Winnowing-style document fingerprint (min hash over 5-gram shingles). */
  val textFingerprint: QueryDef = QueryDef(
    "text_fingerprint",
    (s, dir) => graft.llm.TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
        list_min([${md5LongSql("g")}
                  for g in [array_to_string(w[i : i + 4], ' ')
                            for i in generate_series(1, len(w) - 4)]]) AS fingerprint
      FROM (SELECT doc_id, $toksSql AS w FROM documents)
      WHERE len(w) >= 5
      ORDER BY doc_id"""))

  /** Multimodal plumbing: payload metadata + frame-sampling stub. */
  val multimodal: QueryDef = QueryDef(
    "multimodal_frames",
    (s, dir) => Multimodal.frameSamples(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, CAST(LENGTH(text) AS INT) AS n_bytes,
      md5(text) AS content_hash,
      SUBSTRING(text, 1, 8) AS frame_head,
      SUBSTRING(text, GREATEST(1, LENGTH(text) // 2), 8) AS frame_mid,
      SUBSTRING(text, GREATEST(1, LENGTH(text) - 7), 8) AS frame_tail
      FROM documents ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(
    dedupExact, dedupExactDigest, dedupJaccard, dedupMinhash, dedupSimhash,
    dedupEmbedding, dedupEmbeddingLsh, dedupClusters, dedupCanonicalize,
    simsearchTopK, simsearchTopKAgg, simsearchIvf, textQuality, textTokens,
    textLangId, textVocab, textFingerprint, multimodal, multimodalChunks)
}
