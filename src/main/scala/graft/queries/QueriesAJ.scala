package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 36 (round 8): Kneser-Ney LM evaluation, k-anonymity auditing,
  * and HAVING-subquery coverage.
  */
object QueriesAJ {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Interpolated Kneser-Ney bigram perplexity on the held-out tenth of
    * the corpus (doc_id % 10 = 0), D = 0.75.
    */
  val knPerplexity: QueryDef = {
    val d = 0.75
    QueryDef(
      "text_kn_perplexity",
      (s, dir) => graft.llm.TextAnalysis.knBigramPerplexity(
          t(s, dir, "documents"), "doc_id", "text",
          col("doc_id") % 10 =!= 0, d = d)
        .orderBy(col("doc_id")),
      Some(s"""WITH base AS (SELECT doc_id, (doc_id % 10 <> 0) AS is_train,
          ${Ora.toksSql} AS toks FROM documents),
        bi AS (SELECT doc_id, is_train,
          unnest([{'w1': toks[i - 1], 'w2': toks[i]}
                  for i in generate_series(2, len(toks))],
                 recursive := true)
          FROM base WHERE len(toks) >= 2),
        bc AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
          FROM bi WHERE is_train GROUP BY 1, 2),
        pf AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw,
          CAST(COUNT(*) AS BIGINT) AS n1p FROM bc GROUP BY 1),
        ct AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc FROM bc GROUP BY 1),
        tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS tb FROM bc),
        sc AS (SELECT b.doc_id,
          CASE WHEN pf.cw IS NULL THEN
            COALESCE(CAST(ct.nc AS DOUBLE) / CAST(tb.tb AS DOUBLE), 0.0)
          ELSE
            GREATEST(CAST(COALESCE(bc.cb, 0) AS DOUBLE) - $d, 0.0)
              / CAST(pf.cw AS DOUBLE) +
            $d * CAST(pf.n1p AS DOUBLE) / CAST(pf.cw AS DOUBLE) *
              COALESCE(CAST(ct.nc AS DOUBLE) / CAST(tb.tb AS DOUBLE), 0.0)
          END AS p
          FROM bi b
          LEFT JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
          LEFT JOIN pf ON pf.w1 = b.w1
          LEFT JOIN ct ON ct.w2 = b.w2
          CROSS JOIN tb
          WHERE NOT b.is_train),
        pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          CAST(SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
          ROUND(CAST(SUM(CASE WHEN p > 0 THEN
              CAST(-LOG10(p) AS DECIMAL(27,10)) END) AS DOUBLE) /
            SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END), 6) AS neg_logp10
          FROM sc GROUP BY 1)
      SELECT d.doc_id, COALESCE(pd.n_bigrams, 0) AS n_bigrams,
        COALESCE(pd.n_scored, 0) AS n_scored, pd.neg_logp10
      FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
      LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id"""))
  }

  /** k-anonymity / l-diversity audit over the quasi-identifier
    * (event_type, day, hour) with user_id as the sensitive attribute:
    * equivalence-class census, rows in classes below k, and classes
    * without sensitive-value diversity — the data-governance numbers a
    * release review asks for.
    */
  val kAnonymity: QueryDef = {
    val k = 5
    QueryDef(
      "privacy_k_anonymity",
      (s, dir) => {
        val classes = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"),
            hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("sz"),
            countDistinct(col("user_id")).as("n_sensitive"))
        classes.agg(count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          min(col("sz")).as("min_class_size"),
          sum(when(col("sz") < k, 1L).otherwise(0L)).as("classes_below_k"),
          sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_below_k"),
          sum(when(col("n_sensitive") < 2, 1L).otherwise(0L))
            .as("classes_without_diversity"))
      },
      Some(s"""WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr,
          CAST(COUNT(*) AS BIGINT) AS sz,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_sensitive
          FROM events GROUP BY 1, 2, 3)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(sz) AS BIGINT) AS n_rows,
        CAST(MIN(sz) AS BIGINT) AS min_class_size,
        CAST(SUM(CASE WHEN sz < $k THEN 1 ELSE 0 END) AS BIGINT)
          AS classes_below_k,
        CAST(SUM(CASE WHEN sz < $k THEN sz ELSE 0 END) AS BIGINT)
          AS rows_below_k,
        CAST(SUM(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS classes_without_diversity
      FROM c"""))
  }

  /** HAVING with a scalar subquery: event types busier than the average
    * per-type volume.
    */
  val havingSubquery: QueryDef = QueryDef(
    "q21_having_subquery",
    (s, dir) => {
      val counts = t(s, dir, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      val avgN = counts.agg(Ora.dmean(col("n").cast("double")).as("avg_n"))
      counts.crossJoin(broadcast(avgN))
        .filter(col("n").cast("double") > col("avg_n"))
        .select(col("event_type"), col("n"), Ora.r6(col("avg_n")).as("avg_n"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1),
      a AS (SELECT ${Ora.dmeanSql("CAST(n AS DOUBLE)")} AS avg_n FROM c)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      ROUND((SELECT avg_n FROM a), 6) AS avg_n
    FROM events GROUP BY event_type
    HAVING CAST(COUNT(*) AS DOUBLE) > (SELECT avg_n FROM a)
    ORDER BY event_type"""))

  val all: Seq[QueryDef] = Seq(knPerplexity, kAnonymity, havingSubquery)
}
