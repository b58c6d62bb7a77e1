package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, IntegerType, StructField, StructType}

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2015,
  * arXiv:1508.07909) — the merge-table learner every from-scratch LLM
  * pipeline runs before tokenization.
  *
  * Scale shape: the ONLY corpus-scale operation is the initial word-count
  * aggregation (one shuffle over exploded tokens). Every merge iteration
  * then runs on the compact (distinct-word, count, symbol-string) relation
  * — |vocab| rows however big the corpus is — exactly how reference BPE
  * trainers operate on word-frequency tables rather than raw text. Per
  * iteration: one keyed pair-count aggregation (weighted by word count,
  * overlapping pairs counted as BPE does), a 1-ROW driver collect for the
  * argmax pick (coefficient-sized by construction, like the IVF centroid
  * pulls), and a map-side literal replace applying the merge. The relation
  * is localCheckpointed per step so the lineage stays flat across
  * iterations.
  *
  * Determinism: ties on pair frequency break lexicographically (left then
  * right symbol); [[applyMerge]] implements the exact greedy left-to-right
  * scan with pure LITERAL string ops, so the whole training loop
  * hash-matches a SQL mirror with k unrolled steps.
  */
object Bpe {

  /** "cat" → "c a t </w>": space-joined characters plus the end-of-word
    * marker (keeps word-final merges distinct from word-internal ones).
    * Shared by train and encode — the two MUST stay identical or encode
    * replays a table over different symbols than train learned it on.
    */
  private def symbolize(w: Column): Column =
    concat(array_join(transform(sequence(lit(1), length(w)),
      i => w.substr(i, lit(1))), " "), lit(" </w>"))

  /** One greedy left-to-right merge pass of (l, r) over a space-joined
    * symbol string — EXACT Sennrich semantics via the double-spacing
    * trick: after every gap is widened to two spaces, consecutive
    * occurrences of the pair no longer share a boundary space ("a a a a"
    * → " a  a  a  a " matches " a  a " twice), so plain non-overlapping
    * literal replace merges runs correctly where single-space padding
    * under-merges (" a a a a " would match " a a " only once). Literal
    * (non-regex) ops only: safe for any symbol content (quotes,
    * backslashes) and portable to the DuckDB mirror, whose RE2 has no
    * lookarounds to express the reference's `(?<!\S)l r(?!\S)` sub.
    */
  private def applyMerge(sym: Column, l: String, r: String): Column = {
    val doubled = concat(lit(" "),
      call_function("replace", sym, lit(" "), lit("  ")), lit(" "))
    val replaced = call_function("replace", doubled,
      lit(s" $l  $r "), lit(s" $l$r "))
    trim(call_function("replace", replaced, lit("  "), lit(" ")))
  }

  /** Train `numMerges` BPE merges over the corpus' token stream. Returns
    * the merge table: (step, l_sym, r_sym, merged, freq) — one row per
    * learned merge, freq = the weighted pair count at selection time.
    * (`left`/`right` would need quoting as SQL column names — the mirror
    * shares these names, so they are spelled l_sym/r_sym.)
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    require(numMerges >= 1 && numMerges <= 64,
      s"bpeTrain: numMerges must be in [1, 64], got $numMerges")
    // the one corpus-scale pass: token → distinct-word counts
    val words = graft.Core.fanOut(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var syms = words.select(col("cnt"), symbolize(col("w")).as("sym"))
      .localCheckpoint()
    val picks = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      // overlapping adjacent pairs weighted by word count (BPE counts both
      // (a,a) pairs of "a a a"; the merge application is the greedy
      // left-to-right scan — both choices match the reference algorithm)
      val toks = split(col("sym"), " ")
      val best = syms
        .select(col("cnt"), explode(when(size(toks) >= 2,
            transform(sequence(lit(2), size(toks)),
              i => struct(element_at(toks, i - 1).as("l"),
                          element_at(toks, i).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, freq) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        picks += Row(step, l, r, l + r, freq)
        syms = syms.select(col("cnt"), applyMerge(col("sym"), l, r).as("sym"))
          .localCheckpoint()
        step += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(picks.toSeq, 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("l_sym", StringType, nullable = false),
        StructField("r_sym", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
  }

  /** Apply a learned merge table to tokenize text: each token is symbolized
    * then the merges replay IN ORDER (the BPE encode step). Pure map-side
    * projection — merges arrive as a local Seq (coefficient-sized, like a
    * broadcast LUT); the corpus is never shuffled. Bounded at 64 merges:
    * the fold builds a nested expression tree (3 replace nodes per merge),
    * and a production-scale table (30k merges) belongs in a mapPartitions
    * tokenizer, not a Catalyst expression.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 64,
      s"bpeEncode: merge table must have 1..64 entries for the expression " +
        s"fold, got ${merges.size} — use a mapPartitions tokenizer beyond that")
    val tok = graft.Core.fanOut(df)
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol))))
      .select(col(idCol), col("pos").as("tok_idx"), col("col").as("w"))
    val applied = merges.foldLeft(symbolize(col("w"))) {
      case (s, (l, r)) => applyMerge(s, l, r)
    }
    tok.select(col(idCol), col("tok_idx"), col("w"),
      split(applied, " ").as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("int"))
  }
}
