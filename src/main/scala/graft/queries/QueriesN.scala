package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Core
import graft.functions.Layout
import graft.llm.Curation

/** Batch 14: curation gates and layout keys — wordlist screening,
  * deterministic split assignment, z-order layout keys.
  */
object QueriesN {
  import Queries.QueryDef

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Core.table(s, dir, name)

  private val DenyList = Seq("error", "slow", "big")

  /** Deny-list screening over the documents table: zero-shuffle map-side
    * token membership against an inlined wordlist.
    */
  val curationWordlistScreen: QueryDef = QueryDef(
    "curation_wordlist_screen",
    (s, dir) => Curation.wordlistScreen(t(s, dir, "documents"),
        "doc_id", "text", DenyList, maxFraction = 0.05)
      .orderBy(col("doc_id")),
    Some(s"""WITH b AS (SELECT doc_id, ${Ora.toksSql} AS w FROM documents),
      c AS (SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(w, x -> list_contains(['big','error','slow'], x)))
            AS BIGINT) AS n_hits,
          CAST(len(list_filter(list_distinct(w),
            x -> list_contains(['big','error','slow'], x)))
            AS BIGINT) AS n_distinct_hits
        FROM b)
      SELECT doc_id, n_tokens, n_hits, n_distinct_hits,
        CASE WHEN n_tokens > 0
             THEN ROUND(CAST(n_hits AS DOUBLE) / n_tokens, 6)
             ELSE 0.0 END AS hit_fraction,
        (CASE WHEN n_tokens > 0
              THEN ROUND(CAST(n_hits AS DOUBLE) / n_tokens, 6)
              ELSE 0.0 END) > 0.05 AS flagged
      FROM c ORDER BY doc_id"""))

  /** Deterministic 80/10/10 train/val/test assignment by salted hash
    * bucket, rolled up per (split, lang) so the whole partition sits under
    * one small hash-gated result.
    */
  val sampleSplitAssign: QueryDef = QueryDef(
    "sample_split_assign",
    (s, dir) => Curation.splitAssign(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang")),
    Some(s"""WITH a AS (SELECT lang,
          CASE WHEN ${Ora.md5LongSql("CONCAT(CAST(doc_id AS VARCHAR), 'graft')")}
                 % 1000000 < 800000 THEN 'train'
               WHEN ${Ora.md5LongSql("CONCAT(CAST(doc_id AS VARCHAR), 'graft')")}
                 % 1000000 < 900000 THEN 'val'
               ELSE 'test' END AS split
        FROM documents)
      SELECT split, lang, COUNT(*) AS n_docs
      FROM a GROUP BY split, lang ORDER BY split, lang"""))

  /** Z-order layout key over (customer, order) buckets — the lakehouse
    * OPTIMIZE ZORDER key as an exact bit-interleave expression.
    */
  val layoutZorder: QueryDef = {
    val bits = 10; val n = 2
    val terms = (for {
      b <- 0 until bits
      (c, i) <- Seq("x", "y").zipWithIndex
    } yield s"((($c >> $b) & 1) << ${b * n + i})").mkString(" | ")
    QueryDef(
      "layout_zorder",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(col("o_orderkey"),
            Layout.zorderKey(Seq(col("o_custkey") % 1024,
              col("o_orderkey") % 1024), bits).as("zkey"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""WITH b AS (SELECT o_orderkey,
            CAST(o_custkey % 1024 AS BIGINT) AS x,
            CAST(o_orderkey % 1024 AS BIGINT) AS y
          FROM orders)
        SELECT o_orderkey, CAST($terms AS BIGINT) AS zkey
        FROM b ORDER BY o_orderkey"""))
  }

  val all: Seq[QueryDef] =
    Seq(curationWordlistScreen, sampleSplitAssign, layoutZorder)
}
