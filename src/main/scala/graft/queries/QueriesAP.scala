package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 42 (round 8): deterministic uncertainty quantification and
  * ingest-completeness auditing.
  */
object QueriesAP {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Delete-one-group jackknife confidence interval for the mean value,
    * over 10 deterministic hash splits: the event's md5-derived bucket
    * replaces RNG resampling, so the whole uncertainty estimate sits
    * under the exact cross-engine gate. Per event type: the full-sample
    * mean, the jackknife standard error
    *   se = √((g−1)/g · Σ(m̄₋ᵢ − m̄)²)  over leave-one-bucket-out means,
    * and the ±1.96·se interval.
    *
    * Scale shape: ONE (type, bucket) sufficient-statistics agg; the
    * leave-one-out means are algebra on the g-row per-type relation —
    * resampling without ever touching the corpus twice.
    */
  val jackknifeCi: QueryDef = {
    val g = 10
    QueryDef(
      "m20_jackknife_ci",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(27,10)")
        val b = t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            (graft.llm.TextAnalysis.md5Long(col("event_id").cast("string"))
              % g).as("bkt"),
            col("value"))
          .groupBy(col("event_type"), col("bkt"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"))
        val tot = b.groupBy(col("event_type"))
          .agg(sum(col("n")).as("tn"), sum(col("sv")).as("tsv"),
            count(lit(1)).as("ng"))
        val loo = b.join(tot, Seq("event_type"))
          .select(col("event_type"), col("tn"), col("tsv"), col("ng"),
            ((col("tsv") - col("sv")).cast("double") /
              (col("tn") - col("n")).cast("double")).as("m_loo"),
            (col("tsv").cast("double") / col("tn").cast("double")).as("m_full"))
        loo.groupBy(col("event_type"))
          .agg(first(col("tn")).as("n"),
            round(first(col("m_full")), 6).as("mean"),
            round(sqrt(
              (first(col("ng")).cast("double") - lit(1.0)) /
                first(col("ng")).cast("double") *
              sum(dec((col("m_loo") - col("m_full")) *
                (col("m_loo") - col("m_full")))).cast("double")), 6).as("se"))
          .select(col("event_type"), col("n"), col("mean"), col("se"),
            round(col("mean") - lit(1.96) * col("se"), 6).as("ci_lo"),
            round(col("mean") + lit(1.96) * col("se"), 6).as("ci_hi"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH b AS (SELECT event_type,
          ${Ora.md5LongSql("CAST(event_id AS VARCHAR)")} % $g AS bkt,
          CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(value AS DECIMAL(27,10))) AS sv
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        tt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn,
          CAST(SUM(sv) AS DECIMAL(27,10)) AS tsv,
          CAST(COUNT(*) AS BIGINT) AS ng FROM b GROUP BY 1),
        loo AS (SELECT b.event_type, t.tn, t.ng,
          CAST(t.tsv - b.sv AS DOUBLE) / CAST(t.tn - b.n AS DOUBLE) AS m_loo,
          CAST(t.tsv AS DOUBLE) / CAST(t.tn AS DOUBLE) AS m_full
          FROM b JOIN tt t USING (event_type)),
        agg AS (SELECT event_type, ANY_VALUE(tn) AS n,
          ROUND(ANY_VALUE(m_full), 6) AS mean,
          ROUND(SQRT(
            (CAST(ANY_VALUE(ng) AS DOUBLE) - 1.0) /
              CAST(ANY_VALUE(ng) AS DOUBLE) *
            CAST(SUM(CAST(((m_loo - m_full) * (m_loo - m_full))
              AS DECIMAL(27,10))) AS DOUBLE)), 6) AS se
          FROM loo GROUP BY 1)
      SELECT event_type, n, mean, se,
        ROUND(mean - 1.96 * se, 6) AS ci_lo,
        ROUND(mean + 1.96 * se, 6) AS ci_hi
      FROM agg ORDER BY event_type"""))
  }

  /** Ingest-completeness checkerboard: per day, which event types
    * arrived and which are missing — the pivot every ingestion dashboard
    * shows, with the per-day missing count as the alarm column.
    */
  val completenessMatrix: QueryDef = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    QueryDef(
      "dq_completeness_matrix",
      (s, dir) => {
        val hasCols = types.map(tp =>
          max(when(col("event_type") === tp, 1L).otherwise(0L))
            .as(s"has_$tp"))
        val present = t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(hasCols.head, hasCols.tail: _*)
        present.withColumn("n_missing",
            types.map(tp => lit(1L) - col(s"has_$tp")).reduceLeft(_ + _))
          .orderBy(col("day"))
      },
      Some(s"""SELECT CAST(ts AS DATE) AS day,
        ${types.map(tp =>
          s"CAST(MAX(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS BIGINT) AS has_$tp")
          .mkString(",\n        ")},
        CAST(${types.map(tp =>
          s"(1 - MAX(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END))")
          .mkString(" + ")} AS BIGINT) AS n_missing
      FROM events GROUP BY 1 ORDER BY day"""))
  }

  val all: Seq[QueryDef] = Seq(jackknifeCi, completenessMatrix)
}
