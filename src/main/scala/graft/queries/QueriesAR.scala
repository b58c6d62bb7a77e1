package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 44 (round 9): DSIR importance weighting for data selection and
  * the Zipf-law corpus fit — training-data-pipeline depth.
  */
object QueriesAR {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Distinct word-bigram shingles of a named CTE (the Ora.shinglesSql
    * shape parameterized over the source relation).
    */
  private def shSql(src: String): String =
    s"""SELECT DISTINCT doc_id, unnest([array_to_string(w[g : g + 1], ' ')
        for g in generate_series(1, len(w) - 1)]) AS sh
        FROM (SELECT doc_id, ${Ora.toksSql} AS w FROM $src)"""

  /** DSIR importance weights: the non-English pool scored against the
    * English target distribution over 10k hashed bigram buckets —
    * documents whose feature bag looks more target-like than pool-like
    * get `selected`. The whole method (hashing, smoothed distributions,
    * log-likelihood-ratio sum, threshold selection) under the exact gate.
    */
  val dsirImportance: QueryDef = {
    val nBuckets = 10000
    val bSql = (shExpr: String) =>
      s"${Ora.md5LongSql(s"'dsir:' || $shExpr")} % $nBuckets"
    QueryDef(
      "curation_dsir",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.llm.Curation.dsirWeights(
            corpus = docs.filter(col("lang") =!= "en"),
            target = docs.filter(col("lang") === "en"),
            "doc_id", "text", n = 2, nBuckets = nBuckets)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH corpus AS (SELECT * FROM documents WHERE lang <> 'en'),
        target AS (SELECT * FROM documents WHERE lang = 'en'),
        tsh AS (${shSql("target")}),
        csh AS MATERIALIZED (${shSql("corpus")}),
        ctb AS MATERIALIZED (SELECT ${bSql("sh")} AS b, COUNT(*) AS ct
          FROM tsh GROUP BY 1),
        crb AS MATERIALIZED (SELECT ${bSql("sh")} AS b, COUNT(*) AS cr
          FROM csh GROUP BY 1),
        tot AS (SELECT (SELECT SUM(ct) FROM ctb) AS nt,
                       (SELECT SUM(cr) FROM crb) AS nr),
        w AS MATERIALIZED (SELECT b,
            LN((CAST(COALESCE(ct, 0) + 1 AS DOUBLE) /
                CAST(nt + $nBuckets AS DOUBLE)) /
               (CAST(COALESCE(cr, 0) + 1 AS DOUBLE) /
                CAST(nr + $nBuckets AS DOUBLE))) AS lw
          FROM ctb FULL JOIN crb USING (b) CROSS JOIN tot),
        pd AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
            ROUND(CAST(SUM(CAST(lw AS DECIMAL(27,10))) AS DOUBLE), 6)
              AS weight
          FROM (SELECT doc_id, ${bSql("sh")} AS b FROM csh) c
          JOIN w USING (b) GROUP BY 1)
      SELECT d.doc_id, COALESCE(pd.n_feats, 0) AS n_feats,
        COALESCE(pd.weight, 0.0) AS weight,
        COALESCE(pd.weight, 0.0) > 0.0 AS selected
      FROM corpus d LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id"""))
  }

  /** Zipf slope of the corpus token distribution over the top-100 ranks
    * (natural text ≈ −1) — OLS on (ln rank, ln freq) from one
    * sufficient-statistics pass; the rank window runs on the
    * vocabulary-bounded distinct-token relation (census-allowlisted).
    */
  val zipfFit: QueryDef = QueryDef(
    "text_zipf_fit",
    (s, dir) => graft.llm.TextAnalysis.zipfFit(
      t(s, dir, "documents"), "text", topN = 100),
    Some(s"""WITH freq AS (SELECT tok, COUNT(*) AS cnt
          FROM (SELECT unnest(${Ora.toksSql}) AS tok FROM documents)
          GROUP BY 1),
        r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
          FROM freq),
        xy AS (SELECT LN(CAST(rank AS DOUBLE)) AS x,
            LN(CAST(cnt AS DOUBLE)) AS y
          FROM r WHERE rank <= 100),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(27,10))) AS DOUBLE) AS sy,
          CAST(SUM(CAST((x * x) AS DECIMAL(27,10))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST((x * y) AS DECIMAL(27,10))) AS DOUBLE) AS sxy
          FROM xy)
      SELECT n AS n_ranks,
        ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
              (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
        ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) /
              (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) /
              CAST(n AS DOUBLE), 6) AS intercept
      FROM m"""))

  /** Filtered ANN: label-centroid IVF search with a candidate predicate
    * (vec_id % 3 = 0 — the tenant/language filter shape). Centroids and
    * probing use the FULL corpus (the index layout); the predicate prunes
    * candidates inside the probed cells — the FAISS post-probe-pre-filter
    * semantics, whole pipeline under the hash gate.
    */
  val simsearchFiltered: QueryDef = QueryDef(
    "simsearch_filtered",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.llm.Similarity.ivfTopKFiltered(emb,
          emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", dim = 64, k = 5, nprobe = 3,
          candidateFilter = col("vec_id") % 3 === 0)
        .orderBy(col("qid"), col("rank"))
    },
    Some(Ora.ivfLabelSql(maxQid = 10, k = 5, nprobe = 3, dim = 64,
      extraCandPred = "e.vec_id % 3 = 0")))

  /** Vocabulary coverage curve: the share of total token OCCURRENCES the
    * top-N most frequent tokens cover, for N ∈ {10, 100, 1000} — the
    * number that sizes a tokenizer vocabulary. One rank window on the
    * vocabulary-bounded distinct-token relation (census-allowlisted), one
    * aggregation for all three thresholds.
    */
  val vocabCoverage: QueryDef = {
    val thresholds = Seq(10, 100, 1000)
    QueryDef(
      "text_vocab_coverage",
      (s, dir) => {
        val freq = Core.fanOut(t(s, dir, "documents"))
          .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))
        val ranked = freq.withColumn("rank", row_number().over(w))
        val covAggs = thresholds.map(n =>
          sum(when(col("rank") <= n, col("cnt")).otherwise(0L)).as(s"c$n"))
        val m = ranked.agg(sum(col("cnt")).as("total"), covAggs: _*)
        val entries = thresholds.map(n =>
          struct(lit(n).as("n_top"), col(s"c$n").as("covered")))
        m.select(col("total"), explode(array(entries: _*)).as("e"))
          .select(col("e.n_top"), col("e.covered"), col("total"),
            round(col("e.covered").cast("double") /
              col("total").cast("double"), 6).as("share"))
          .orderBy(col("n_top"))
      },
      Some {
        val cases = thresholds.map(n =>
          s"CAST(SUM(CASE WHEN rank <= $n THEN cnt ELSE 0 END) AS BIGINT) AS c$n")
          .mkString(", ")
        val rows = thresholds.map(n =>
          s"SELECT $n AS n_top, c$n AS covered, total FROM m")
          .mkString("\n          UNION ALL ")
        s"""WITH freq AS (SELECT tok, COUNT(*) AS cnt
            FROM (SELECT unnest(${Ora.toksSql}) AS tok FROM documents)
            GROUP BY 1),
          r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
            FROM freq),
          m AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, $cases FROM r)
        SELECT n_top, covered, total,
          ROUND(CAST(covered AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
        FROM ($rows) ORDER BY n_top"""
      })
  }

  /** Quality-classifier pipeline (the CCNet/GPT-style corpus filter as
    * ONE gated dataflow): train a logistic model on per-doc features
    * (scaled token count, scaled char count) against a weak source-based
    * label via the unrolled IRLS dataflow, then SCORE every document
    * with the fitted (6-dp-rounded, hence engine-identical) coefficients
    * — training AND inference both under the exact hash gate. The
    * coefficient collect is 1 row (model scale); scoring is one map-side
    * projection over the corpus.
    */
  val qualityClassifier: QueryDef = {
    val iters = 3
    QueryDef(
      "curation_quality_classifier",
      (s, dir) => {
        import graft.llm.TextAnalysis
        val base = t(s, dir, "documents")
          .select(col("doc_id"),
            (substring(col("source"), 4, 10).cast("int") < 5)
              .cast("double").as("y"),
            (size(TextAnalysis.tokens(col("text"))).cast("double") / 100.0)
              .as("x1"),
            (col("n_chars").cast("double") / 1000.0).as("x2"))
          .localCheckpoint() // the fit scans it per iteration + the scorer
        val b = graft.ml.Glm.logisticIrls(base, "y", "x1", "x2",
          iters = iters).collect()(0)
        val (b0, b1, b2) = (b.getDouble(1), b.getDouble(2), b.getDouble(3))
        // score = the LOGIT, not the sigmoid: monotone-equivalent (same
        // ranking, predicted_pos = logit >= 0 ⟺ p >= 0.5) and pure
        // arithmetic over 6-dp coefficient literals — identical IEEE bits
        // on both engines, where exp()'s 1-ulp cross-engine divergence
        // flipped one document's rounded sigmoid at sf0.1
        val logit = lit(b0) + lit(b1) * col("x1") + lit(b2) * col("x2")
        base.select(col("doc_id"), round(logit, 6).as("score"),
            (logit >= 0.0).as("predicted_pos"), (col("y") === 1.0).as("is_pos"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS MATERIALIZED (SELECT doc_id,
          CAST(CAST(substr(source, 4) AS INT) < 5 AS DOUBLE) AS y,
          CAST(len(${Ora.toksSql}) AS DOUBLE) / 100.0 AS x1,
          CAST(n_chars AS DOUBLE) / 1000.0 AS x2
          FROM documents),
        bet0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
        ${Ora.irlsStepsSql(iters)},
        fin AS (SELECT ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1,
          ROUND(b2, 6) AS b2 FROM bet$iters),
        sc AS (SELECT doc_id, y,
          f.b0 + f.b1 * x1 + f.b2 * x2 AS logit
          FROM base CROSS JOIN fin f)
      SELECT doc_id, ROUND(logit, 6) AS score, logit >= 0.0 AS predicted_pos,
        (y = 1.0) AS is_pos
      FROM sc ORDER BY doc_id"""))
  }

  val all: Seq[QueryDef] =
    Seq(dsirImportance, zipfFit, simsearchFiltered, vocabCoverage,
      qualityClassifier)
}
