package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Core

/** Batch 30 (round 8): correlated-subquery semantics, sentence-level text
  * stats, and running distinct counts.
  */
object QueriesAD {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  /** Correlated-subquery semantics: each customer's most expensive
    * order(s) — the mirror states it as a correlated scalar subquery, the
    * Spark side as the equivalent max-join (what Catalyst rewrites the
    * subquery to anyway). Ties keep every maximal order.
    */
  val correlatedMax: QueryDef = QueryDef(
    "q2_correlated_max",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val mx = o.groupBy(col("o_custkey"))
        .agg(max(col("o_totalprice")).as("__mx"))
      o.join(mx, Seq("o_custkey"))
        .filter(col("o_totalprice") === col("__mx"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice
      FROM orders o
      WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_custkey, o_orderkey"""))

  /** Sentence-level stats per document: sentence count and 6-dp mean
    * sentence length in words. Sentences split on [.!?] runs; empty
    * segments (leading punctuation, trailing terminator) are dropped on
    * both sides.
    */
  val textSentences: QueryDef = QueryDef(
    "text_sentences",
    (s, dir) => {
      val segs = split(col("text"), "[.!?]+")
      val sents = filter(transform(segs, t => trim(t)), t => t =!= "")
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(sents).as("n_sentences"),
          round(
            aggregate(sents, lit(0L),
              (acc, x) => acc + size(split(x, "[ \\t\\n\\r\\f]+")))
              .cast("double") / greatest(size(sents), lit(1)).cast("double"),
            6).as("mean_sentence_words"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH segs AS (SELECT doc_id,
        [t FOR t IN list_transform(string_split_regex(text, '[.!?]+'),
          x -> trim(x)) IF t <> ''] AS sents
        FROM documents)
    SELECT doc_id, CAST(len(sents) AS INT) AS n_sentences,
      ROUND(CAST(list_sum([CAST(len(string_split_regex(x, '[ \t\n\r\f]+')) AS BIGINT)
          FOR x IN sents]) AS DOUBLE) /
        CAST(GREATEST(len(sents), 1) AS DOUBLE), 6) AS mean_sentence_words
    FROM segs ORDER BY doc_id"""))

  /** Running distinct-so-far count per user over their event stream:
    * exact, via the first-occurrence flag + cumulative sum — the pattern
    * that computes an otherwise "impossible" windowed COUNT(DISTINCT)
    * with two ordinary windows.
    */
  val runningDistinct: QueryDef = QueryDef(
    "w17_running_distinct",
    (s, dir) => {
      val wt = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events").filter(col("user_id") < 40)
        .withColumn("__first",
          when(row_number().over(wt) === 1, 1L).otherwise(0L))
        .withColumn("n_distinct_types", sum(col("__first")).over(wc))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("n_distinct_types"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""WITH f AS (SELECT event_id, user_id, ts,
        CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS fst
        FROM events WHERE user_id < 40)
    SELECT event_id, user_id, ts,
      CAST(SUM(fst) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS n_distinct_types
    FROM f ORDER BY user_id, ts, event_id"""))

  val all: Seq[QueryDef] = Seq(correlatedMax, textSentences, runningDistinct)
}
