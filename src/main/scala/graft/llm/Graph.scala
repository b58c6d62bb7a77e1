package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus graph analytics: TextRank (Mihalcea & Tarau 2004) keyword
  * scoring — weighted PageRank over the adjacent-token co-occurrence
  * graph, the classic iterative-graph workload expressed as k unrolled
  * relational steps.
  */
object Graph {

  private val Dec = "decimal(27,10)"

  /** Build the undirected weighted co-occurrence edge relation from
    * adjacent tokens: one map-side pass (adjacent array slots — the
    * text_perplexity precedent, no window), symmetrized by a union, then
    * one keyed count aggregation. Edge count is vocabulary-bounded however
    * large the corpus.
    */
  def cooccurrenceEdges(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val pairs = df
      .select(toks.as("w"))
      .select(explode(expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)), (x, i) -> struct(x AS src, w[i + 1] AS dst))"))
        .as("e"))
      .select(col("e.src"), col("e.dst"))
    pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  /** TextRank scores: `iters` damped iterations over the co-occurrence
    * graph, r⁰ = 1, rᵢ = (1−d) + d·Σ_j (w_ji / outw_j)·r_j (the TextRank
    * normalization — no 1/N term).
    *
    * Determinism contract (what makes this hash-gateable): per-edge
    * contributions are correctly-rounded IEEE ops on identical inputs on
    * both engines, rounded to 10 dp BEFORE the order-sensitive part; the
    * per-node sum then accumulates in DECIMAL (exact, associative), and
    * each iteration re-rounds the rank to 10 dp — so ranks are identical
    * bits on both engines at every step. Output rounded to 6 dp.
    *
    * Scale shape: each iteration is one broadcast-or-shuffle join of the
    * |V|-row rank relation against the |E|-row edge relation plus one
    * keyed agg — vocabulary-bounded relations throughout; iterations are
    * materialized (localCheckpoint) so the plan stays LINEAR in k instead
    * of nesting (the unigram relational-DP lesson: each step here feeds
    * the next step once, but checkpointing also keeps analysis time flat
    * for larger k).
    */
  def textRank(df: DataFrame, textCol: String, iters: Int = 3,
               damping: Double = 0.85, k: Int = 20): DataFrame = {
    require(iters >= 1 && k > 0, s"textRank: bad shape iters=$iters k=$k")
    val edges = cooccurrenceEdges(df, textCol)
      .withColumn("outw", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint() // consumed once per iteration
    val nodes = edges.select(col("src").as("tok")).distinct()
    var r = nodes.withColumn("rank_v", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.withColumnRenamed("tok", "src"), Seq("src"))
        .select(col("dst").as("tok"),
          round(col("rank_v") * (col("w").cast("double") / col("outw").cast("double")), 10)
            .as("c"))
        .groupBy(col("tok"))
        .agg(sum(col("c").cast(Dec)).cast("double").as("s"))
      r = nodes.join(contrib, Seq("tok"), "left")
        .select(col("tok"),
          round(lit(1.0 - damping) +
            lit(damping) * coalesce(col("s"), lit(0.0)), 10).as("rank_v"))
        .localCheckpoint()
    }
    r.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rank_v").desc, col("tok"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("tok"), round(col("rank_v"), 6).as("score"))
  }
}
