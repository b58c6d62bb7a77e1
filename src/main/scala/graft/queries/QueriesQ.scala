package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 17: evaluation + window-family completion — probability
  * calibration (reliability diagram), the remaining rank metrics, and a
  * syllable-density readability heuristic.
  */
object QueriesQ {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Reliability diagram (probability calibration): deterministic
    * pseudo-probabilities from the events table (the m9_skill_scores
    * fixed-inputs pattern — upstream model fits are RNG-gated, the
    * EVALUATION math is not), bucketed into deciles with per-bin mean
    * prediction and observed positive rate, decimal-accumulated.
    */
  val reliability: QueryDef = QueryDef(
    "m12_reliability",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select((abs(col("event_id") % 100).cast("double") / 100.0).as("est"),
          (col("value") > 50.0).as("pos"))
      e.groupBy(floor(col("est") * 10).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          Ora.r6(Ora.dmean(col("est"))).as("mean_est"),
          Ora.r6(Ora.dmean(col("pos").cast("double"))).as("pos_rate"))
        .orderBy(col("bin"))
    },
    Some(s"""WITH e AS (SELECT
          CAST(abs(event_id % 100) AS DOUBLE) / 100.0 AS est,
          (value > 50.0) AS pos
        FROM events)
      SELECT CAST(FLOOR(est * 10) AS INT) AS bin, COUNT(*) AS n,
        ROUND(${Ora.dmeanSql("est")}, 6) AS mean_est,
        ROUND(${Ora.dmeanSql("CAST(pos AS DOUBLE)")}, 6) AS pos_rate
      FROM e GROUP BY 1 ORDER BY bin"""))

  /** percent_rank + cume_dist over a (value, id) total order — the two
    * normalized rank metrics completing the window-rank family (NTILE is
    * a18); both are pure functions of the row's position so they mirror
    * exactly.
    */
  val rankMetrics: QueryDef = QueryDef(
    "w12_rank_metrics",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type,
        ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        ROUND(CUME_DIST() OVER w, 6) AS cd
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_id"""))

  /** Syllable-density readability proxy: vowel-group count approximates
    * syllables (the Flesch-family building block that needs no dictionary);
    * per doc the token count, vowel-group count, and density.
    */
  val syllableDensity: QueryDef = QueryDef(
    "text_syllable_density",
    (s, dir) => {
      val toks = graft.llm.TextAnalysis.tokens(col("text"))
      val syl = size(regexp_extract_all(lower(col("text")),
        lit("[aeiouy]+"), lit(0)))
      t(s, dir, "documents").select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          syl.cast("long").as("n_syllables"))
        .withColumn("density",
          when(col("n_tokens") > 0,
            round(col("n_syllables").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id,
        CAST(len(${Ora.toksSql}) AS BIGINT) AS n_tokens,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
          AS n_syllables,
        CASE WHEN len(${Ora.toksSql}) > 0
             THEN ROUND(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS DOUBLE) / len(${Ora.toksSql}), 6)
             ELSE 0.0 END AS density
      FROM documents ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(reliability, rankMetrics, syllableDensity)
}
