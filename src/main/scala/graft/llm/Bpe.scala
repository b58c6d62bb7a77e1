package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * right symbol), and the merge application is non-regex LITERAL
  * replacement on space-padded symbol strings — left-to-right
  * non-overlapping in both Spark and DuckDB (`" a a a "` merging `(a,a)`
  * yields `"aa a"`, the Sennrich scan order), so the whole training loop
  * can hash-match a SQL mirror with k unrolled steps.
  */
object Bpe {

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
    // compact per-word symbol strings: "c a t </w>"
    var syms = words.select(col("cnt"),
        concat(array_join(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))), " "), lit(" </w>")).as("sym"))
      .localCheckpoint()
    val picks = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      // overlapping adjacent pairs weighted by word count (BPE counts both
      // (a,a) pairs of "a a a"; the merge below still applies left-to-right
      // non-overlapping — both choices match the reference algorithm)
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
        // literal (non-regex) replace on the space-padded string: safe for
        // any symbol content, identical left-to-right semantics in DuckDB
        syms = syms.select(col("cnt"),
            expr(s"trim(replace(' ' || sym || ' ', ${sq(s" $l $r ")}, ${sq(s" $l$r ")}))")
              .as("sym"))
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
    * broadcast LUT); the corpus is never shuffled.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val tok = graft.Core.fanOut(df)
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol))))
      .select(col(idCol), col("pos").as("tok_idx"), col("col").as("w"))
    // symbolize ("cat" → "c a t </w>" — the end-of-word marker keeps
    // word-final merges distinct from word-internal ones), pad, then
    // literal-replace per merge IN ORDER, trim once at the end
    val sym0 = concat(array_join(transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1))), " "), lit(" </w>"))
    val padded = concat(lit(" "), sym0, lit(" "))
    val applied = merges.foldLeft(padded) { case (s, (l, r)) =>
      call_function("replace", s, lit(s" $l $r "), lit(s" $l$r "))
    }
    tok.select(col(idCol), col("tok_idx"), col("w"),
      split(trim(applied), " ").as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("int"))
  }

  /** Single-quote a SQL string literal (symbols can't contain quotes — they
    * come from \S+ tokens — but escape anyway for safety).
    */
  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"
}
