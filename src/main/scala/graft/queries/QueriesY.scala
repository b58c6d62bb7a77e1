package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.llm.Similarity
import graft.ml.Scores

/** Batch 25 (round 8): model-evaluation metrics — AUC-ROC, calibration
  * error, a Gaussian NB confusion matrix, and retrieval NDCG@k. The NDCG
  * discount constants are computed ONCE in Scala and injected as
  * identical double literals into both the Spark plan and the mirror, so
  * no engine log function ever enters the gate.
  */
object QueriesY {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** AUC-ROC of the event-id-derived score against the value>50 label —
    * Mann-Whitney rank-sum on the contracted per-score relation.
    */
  val aucRoc: QueryDef = QueryDef(
    "m13_auc_roc",
    (s, dir) => Scores.aucRoc(
      t(s, dir, "events")
        .select((abs(col("event_id") % 100).cast("double") / 100.0).as("score"),
          (col("value") > 50.0).as("pos")),
      "score", "pos"),
    Some("""WITH b AS (SELECT CAST(abs(event_id % 100) AS DOUBLE) / 100.0 AS s,
        (value > 50.0) AS pos FROM events
        WHERE value IS NOT NULL),
      g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
        FROM b GROUP BY 1),
      r AS (SELECT s, n, np,
        COALESCE(SUM(n) OVER (ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        FROM g),
      a AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        CAST(SUM(n - np) AS BIGINT) AS n_neg,
        CAST(SUM(CAST((CAST(np AS DOUBLE) *
          (CAST(cum AS DOUBLE) + (n + 1) / 2.0)) AS DECIMAL(27,10)))
          AS DOUBLE) AS spr
        FROM r)
    SELECT n_pos, n_neg,
      CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        ROUND((spr - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0) /
          (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) END AS auc
    FROM a"""))

  /** ECE + MCE over 10 equal-width probability bins (m12's diagram
    * reduced to its headline numbers).
    */
  val calibrationEce: QueryDef = QueryDef(
    "m15_calibration_ece",
    (s, dir) => Scores.calibrationEce(
      t(s, dir, "events")
        .select((abs(col("event_id") % 100).cast("double") / 100.0).as("est"),
          (col("value") > 50.0).as("pos")),
      "est", "pos", bins = 10),
    Some("""WITH e AS (SELECT CAST(abs(event_id % 100) AS DOUBLE) / 100.0 AS est,
        CAST((value > 50.0) AS DOUBLE) AS pos FROM events
        WHERE value IS NOT NULL),
      b AS (SELECT CAST(LEAST(FLOOR(est * 10), 9) AS INT) AS bin,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(est AS DECIMAL(27,10))) AS DOUBLE) AS se,
        CAST(SUM(CAST(pos AS DECIMAL(27,10))) AS DOUBLE) AS sp
        FROM e GROUP BY 1),
      a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
        CAST(SUM(n) AS BIGINT) AS n,
        CAST(SUM(CAST((CAST(n AS DOUBLE) * ABS(sp / n - se / n))
          AS DECIMAL(27,10))) AS DOUBLE) AS wg,
        ROUND(MAX(ABS(sp / n - se / n)), 6) AS mce
        FROM b)
    SELECT n_bins, n, ROUND(wg / CAST(n AS DOUBLE), 6) AS ece, mce FROM a"""))

  /** Gaussian NB on the value feature: train on event_id %5 != 0, score
    * the held-out fifth, gate the confusion matrix.
    */
  val gaussianNb: QueryDef = QueryDef(
    "ml_gaussian_nb",
    (s, dir) => graft.llm.Classify.gaussianNbConfusion(
        t(s, dir, "events"), "event_id", "event_type", "value",
        col("event_id") % 5 =!= 0)
      .orderBy(col("actual"), col("predicted")),
    Some("""WITH b AS (SELECT event_id, event_type AS label,
        CAST(value AS DOUBLE) AS v, (event_id % 5 <> 0) AS is_train
        FROM events WHERE value IS NOT NULL),
      m AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(v AS DECIMAL(27,10))) AS DOUBLE) AS sv,
        CAST(SUM(CAST((v * v) AS DECIMAL(27,10))) AS DOUBLE) AS svv,
        MIN(v) AS mn, MAX(v) AS mx
        FROM b WHERE is_train GROUP BY 1),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS td FROM b WHERE is_train),
      p AS (SELECT label AS cls,
        LN(CAST(n AS DOUBLE) / CAST(td AS DOUBLE)) AS prior,
        sv / CAST(n AS DOUBLE) AS mu,
        (svv - sv * sv / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vr,
        mx > mn AS varies
        FROM m CROSS JOIN t),
      sc AS (SELECT b.event_id, b.label, p.cls,
        ROUND(p.prior + CASE WHEN p.varies THEN
          -0.5 * LN(p.vr) - (b.v - p.mu) * (b.v - p.mu) / (2.0 * p.vr)
          ELSE 0.0 END, 6) AS score
        FROM b CROSS JOIN p WHERE NOT is_train),
      pr AS (SELECT event_id, label AS actual, cls AS predicted,
        ROW_NUMBER() OVER (PARTITION BY event_id
          ORDER BY score DESC, cls) AS rn FROM sc)
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pr WHERE rn = 1 GROUP BY 1, 2 ORDER BY actual, predicted"""))

  /** NDCG@10 of the 16-dim Matryoshka-prefix cosine ranking against the
    * full-64-dim exact ranking (graded relevance 11 − exact rank).
    */
  val ndcgMatryoshka: QueryDef = {
    val k = 10; val maxQid = 10; val dimFull = 64; val dimPrefix = 16
    val disc = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val idcg = (1 to k).map(i => (k + 1 - i) * disc(i - 1)).sum
    val discCase = (1 to k)
      .map(i => s"WHEN $i THEN ${disc(i - 1).toString}")
      .mkString("CASE a.rank ", " ", " END")
    QueryDef(
      "m14_ndcg",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        // cosine() runs over the FULL array whatever `dim` says — the
        // prefix ranking needs a physically sliced column (the
        // simsearch_matryoshka_recall precedent)
        val sliced = emb.select(col("vec_id"),
          slice(col("embedding"), 1, dimPrefix).as("emb_p"))
        val ap = Similarity.bruteForceTopKAgg(sliced,
          sliced.filter(col("vec_id") < maxQid), "vec_id", "emb_p",
          dim = dimPrefix, k = k)
        val ex = Similarity.bruteForceTopKAgg(emb,
            emb.filter(col("vec_id") < maxQid), "vec_id", "embedding",
            dim = dimFull, k = k)
          .select(col("qid"), col("vb"), col("rank").as("er"))
        val discArr = typedLit(disc.toArray)
        val gain = ap.join(ex, Seq("qid", "vb"), "left")
          .select(col("qid"),
            (coalesce(lit(k + 1) - col("er"), lit(0)).cast("double") *
              element_at(discArr, col("rank"))).as("g"))
        gain.groupBy(col("qid"))
          .agg(sum(col("g").cast("decimal(27,10)")).cast("double").as("dcg"))
          .select(col("qid"), round(col("dcg") / lit(idcg), 6).as("ndcg"))
          .orderBy(col("qid"))
      },
      Some(s"""WITH ex AS (SELECT qid, rank, vb FROM
          (${Ora.bruteForceTopKSql(maxQid, k, dimFull)})),
        ap AS (SELECT qid, rank, vb FROM
          (${Ora.bruteForceTopKSql(maxQid, k, dimPrefix)})),
        g AS (SELECT a.qid,
          CAST(COALESCE(${k + 1} - e.rank, 0) AS DOUBLE) *
            ($discCase) AS g
          FROM ap a LEFT JOIN ex e ON e.qid = a.qid AND e.vb = a.vb),
        d AS (SELECT qid, CAST(SUM(CAST(g AS DECIMAL(27,10)))
          AS DOUBLE) AS dcg FROM g GROUP BY 1)
      SELECT qid, ROUND(dcg / ${idcg.toString}, 6) AS ndcg
      FROM d ORDER BY qid"""))
  }

  val all: Seq[QueryDef] =
    Seq(aucRoc, calibrationEce, gaussianNb, ndcgMatryoshka)
}
