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

  /** Left-associated squared-L2 between subspace j of two array columns —
    * the SQL twin of pqTopK's l2j fold (identical IEEE term order).
    */
  private def l2SubSql(a: String, b: String, j: Int, sub: Int): String =
    (1 to sub).map { d =>
      val i = j * sub + d
      s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE)) * " +
        s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE))"
    }.mkString(" + ")

  /** Product-quantization ANN under a deterministic training-free codebook
    * (first 16 vectors), m = 4 subspaces of 16 dims: encode every vector to
    * 4 codes, rank candidates for the first 5 queries by the asymmetric
    * distance. The whole pipeline — codebook, codes, ADC ranking — sits
    * under the exact hash gate (the simsearch_ivf_fixed precedent).
    */
  val simsearchPqAdc: QueryDef = {
    val m = 4; val sub = 16
    val codesSql = (0 until m).map { j =>
      s"""SELECT vec_id, $j AS j, cw FROM (
          SELECT e.vec_id, c.cw, ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY (${l2SubSql("e.embedding", "c.cv", j, sub)}) ASC, c.cw) AS rn
          FROM embeddings e CROSS JOIN cb c) WHERE rn = 1"""
    }.mkString("\n        UNION ALL\n        ")
    val djSql = (0 until m).map { j =>
      s"WHEN $j THEN (${l2SubSql("q.qv", "c.cv", j, sub)})"
    }.mkString(" ")
    QueryDef(
      "simsearch_pq_adc",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.llm.Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, m = m,
            codewords = emb.filter(col("vec_id") < 16), k = 10)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""WITH cb AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cw,
            embedding AS cv FROM embeddings WHERE vec_id < 16),
        codes AS MATERIALIZED (
        $codesSql),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id < 5),
        pd AS (SELECT q.qid, cd.vec_id AS vb,
            CASE cd.j $djSql END AS dj
          FROM q CROSS JOIN codes cd
          JOIN cb c ON c.cw = cd.cw
          WHERE cd.vec_id <> q.qid),
        dist AS (SELECT qid, vb,
            CAST(ROUND(SUM(CAST(dj AS DECIMAL(27,10))), 6) AS DOUBLE) AS dist
          FROM pd GROUP BY qid, vb),
        r AS (SELECT qid, vb, dist, ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY dist ASC, vb) AS rank FROM dist)
        SELECT qid, CAST(rank AS INT) AS rank, vb, dist
        FROM r WHERE rank <= 10 ORDER BY qid, rank"""))
  }

  /** IVF-PQ (the flagship FAISS composition): fixed-seed coarse cells,
    * PQ over RESIDUALS v − seed(cell) with a training-free codebook (the
    * residuals of vec_ids 8..23 — non-seed rows, so no zero-vector
    * codewords), nprobe = 2 probed cells per query, ADC ranking. The
    * entire index build + search hash-matches the mirror.
    */
  /** The WITH-chain of the IVF-PQ mirror up through the ranked `r`
    * relation — shared by the search query and the rerank composition so
    * the index-build mirror cannot drift between them.
    */
  private lazy val ivfPqCtes: String = {
    val m = 4; val sub = 16
    val resList =
      "[CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE) " +
        "for i in generate_series(1, 64)]"
    val codesSql = (0 until m).map { j =>
      s"""SELECT vec_id, cell, $j AS j, cw FROM (
          SELECT r0.vec_id, r0.cell, c.cw, ROW_NUMBER() OVER (
              PARTITION BY r0.vec_id
              ORDER BY (${l2SubSql("r0.r", "c.cv", j, sub)}) ASC, c.cw) AS rn
          FROM res r0 CROSS JOIN cb c) WHERE rn = 1"""
    }.mkString("\n        UNION ALL\n        ")
    val djSql = (0 until m).map { j =>
      s"WHEN $j THEN (${l2SubSql("qr.r", "c.cv", j, sub)})"
    }.mkString(" ")
    s"""${QueriesI.fixedAsnCtes},
        res AS MATERIALIZED (SELECT a.vec_id, a.ivf_cell AS cell, $resList AS r
          FROM embeddings e JOIN asn a USING (vec_id)
          JOIN seeds s ON s.cell = a.ivf_cell),
        cb AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cw, r AS cv
          FROM res WHERE vec_id >= 8 AND vec_id < 24),
        codes AS MATERIALIZED (
        $codesSql),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id < 5),
        probes AS (SELECT qid, cell FROM (
            SELECT q.qid, s.cell, ROW_NUMBER() OVER (PARTITION BY q.qid
              ORDER BY (${Ora.dotArrSql("q.qv", "s.cv", 64)}) /
                (SQRT(${Ora.normArrSql("q.qv", 64)}) *
                 SQRT(${Ora.normArrSql("s.cv", 64)})) DESC, s.cell) AS rn
            FROM q CROSS JOIN seeds s
            WHERE SQRT(${Ora.normArrSql("q.qv", 64)}) *
                  SQRT(${Ora.normArrSql("s.cv", 64)}) > 0)
          WHERE rn <= 2),
        qr AS (SELECT p.qid, p.cell,
            [CAST(q.qv[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE)
             for i in generate_series(1, 64)] AS r
          FROM probes p JOIN q USING (qid)
          JOIN seeds s ON s.cell = p.cell),
        pd AS (SELECT qr.qid, cd.vec_id AS vb, CASE cd.j $djSql END AS dj
          FROM qr JOIN codes cd ON cd.cell = qr.cell
          JOIN cb c ON c.cw = cd.cw
          WHERE cd.vec_id <> qr.qid),
        dist AS (SELECT qid, vb,
            CAST(ROUND(SUM(CAST(dj AS DECIMAL(27,10))), 6) AS DOUBLE) AS dist
          FROM pd GROUP BY qid, vb),
        r AS (SELECT qid, vb, dist, ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY dist ASC, vb) AS rank FROM dist)"""
  }

  private def ivfPqSpark(s: SparkSession, dir: String, k: Int): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    graft.llm.Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim = 64, m = 4,
      seeds = seeds, cellCol = "cell", cvecCol = "cv",
      isCodeword = col("vec_id") >= 8 && col("vec_id") < 24,
      k = k, nprobe = 2)
  }

  val simsearchIvfPq: QueryDef = QueryDef(
    "simsearch_ivfpq",
    (s, dir) => ivfPqSpark(s, dir, k = 10).orderBy(col("qid"), col("rank")),
    Some(s"""WITH $ivfPqCtes
        SELECT qid, CAST(rank AS INT) AS rank, vb, dist
        FROM r WHERE rank <= 10 ORDER BY qid, rank"""))

  /** The production retrieval stack's final stage: the PQ shortlist
    * (cheap, approximate, k' = 50) re-ranked by EXACT cosine on the
    * shortlisted candidates only — the corpus is touched at full precision
    * for |Q|·k' rows however large it is (the hybrid_rerank precedent with
    * an ANN first stage instead of BM25).
    */
  val simsearchIvfPqRerank: QueryDef = QueryDef(
    "simsearch_ivfpq_rerank",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val shortlist = ivfPqSpark(s, dir, k = 50)
        .select(col("qid"), col("vb"))
      val withVecs = shortlist
        .join(emb.select(col("vec_id").as("vb"), col("embedding").as("eb")), Seq("vb"))
        .join(broadcast(emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))), Seq("qid"))
      val topk = udaf(new graft.functions.Aggregators.TopK(10))
      withVecs
        .select(col("qid"),
          round(graft.llm.Similarity.cosine("qv", "eb", 64), 6).as("cos"),
          col("vb"))
        .filter(col("cos").isNotNull)
        .groupBy(col("qid"))
        .agg(topk(col("cos"), col("vb")).as("hits"))
        .select(col("qid"), posexplode(col("hits")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          col("col.id").as("vb"), col("col.score").as("cos"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH $ivfPqCtes,
        short AS (SELECT qid, vb FROM r WHERE rank <= 50),
        rer AS (SELECT s.qid, s.vb,
            ROUND((${Ora.dotArrSql("qe.embedding", "ce.embedding", 64)}) /
              (SQRT(${Ora.normArrSql("qe.embedding", 64)}) *
               SQRT(${Ora.normArrSql("ce.embedding", 64)})), 6) AS cos
          FROM short s
          JOIN embeddings qe ON qe.vec_id = s.qid
          JOIN embeddings ce ON ce.vec_id = s.vb
          WHERE SQRT(${Ora.normArrSql("qe.embedding", 64)}) *
                SQRT(${Ora.normArrSql("ce.embedding", 64)}) > 0),
        rr AS (SELECT qid, vb, cos, ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY cos DESC, vb) AS rank FROM rer)
        SELECT qid, CAST(rank AS INT) AS rank, vb, cos
        FROM rr WHERE rank <= 10 ORDER BY qid, rank"""))

  val all: Seq[QueryDef] =
    Seq(dedupSpanRemoval, textNbLangid, simsearchPqAdc, simsearchIvfPq,
      simsearchIvfPqRerank)
}
