package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenization (Schuster & Nakajima 2012; the BERT
  * tokenizer's inference scheme): greedy longest-match-first segmentation
  * over a position-aware vocabulary — word-initial pieces and continuation
  * pieces (the "##" space) are distinct entries. Third tokenizer family
  * next to BPE (merge replay) and unigram-LM (Viterbi): greedy is a
  * different decision rule than either, so it gets its own gate.
  */
object WordPiece {

  /** Position-aware piece vocabulary from the corpus word-frequency
    * relation: every substring of length ≤ `maxPiece` of every word
    * (≤ `maxLen` chars), keyed by whether it starts the word, kept when
    * its freq-weighted occurrence count reaches `minCount`. One explode +
    * one keyed agg — vocabulary-bounded output.
    */
  def vocab(wf: DataFrame, maxPiece: Int, minCount: Long): DataFrame =
    wf.select(
        col("word"), col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)), s ->
              transform(sequence(1, least($maxPiece, length(word) - s + 1)), l ->
                struct(substring(word, s, l) AS piece, s = 1 AS is_start))))"""
        )).as("p"))
      .groupBy(col("p.piece").as("piece"), col("p.is_start").as("is_start"))
      .agg(sum(col("freq")).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Greedy longest-match-first encode of the corpus's word relation under
    * the corpus-derived vocabulary: at each position take the LONGEST
    * vocab piece (word-initial table at position 0, continuation table
    * after); a word with any unmatchable position is [UNK] (the BERT
    * convention — no backtracking, greedy is not Viterbi).
    *
    * Scale shape: word frequencies are one corpus aggregation; the
    * vocabulary is collected under a byte-budget guard and broadcast; the
    * per-word greedy scan runs in mapPartitions (the unigram kernel
    * lesson: per-row DP/scans belong in a kernel, not in k self-joined
    * relational steps — the MIRROR unrolls relational steps because SQL
    * has no kernels, the ENGINE should not).
    */
  def encode(df: DataFrame, textCol: String, maxPiece: Int = 4,
             maxLen: Int = 8, minCount: Long = 3L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wf = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val voc = vocab(wf, maxPiece, minCount)
    val sz = voc.agg(count(lit(1)),
      coalesce(sum(length(col("piece"))), lit(0L))).head()
    val estBytes = sz.getLong(1) * 2 + sz.getLong(0) * 150
    require(estBytes <= (256L << 20),
      s"wordpiece encode broadcasts the vocabulary — ~${estBytes >> 20} MB " +
        s"estimated (${sz.getLong(0)} pieces) exceeds the 256 MB budget")
    val vocSet: Set[(String, Boolean)] = voc.select(col("piece"), col("is_start"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    val bc = spark.sparkContext.broadcast(vocSet)
    wf.select(col("word"), col("freq")).as[(String, Long)]
      .mapPartitions { rows =>
        val v = bc.value
        rows.map { case (word, freq) =>
          val segs = scala.collection.mutable.ArrayBuffer.empty[String]
          var pos = 0
          var dead = false
          while (pos < word.length && !dead) {
            var l = math.min(maxPiece, word.length - pos)
            var taken = 0
            while (l >= 1 && taken == 0) {
              val piece = word.substring(pos, pos + l)
              if (v((piece, pos == 0))) {
                segs += (if (pos == 0) piece else "##" + piece)
                taken = l
              }
              l -= 1
            }
            if (taken == 0) dead = true else pos += taken
          }
          if (dead) (word, freq, true, None: Option[Int], None: Option[String])
          else (word, freq, false, Some(segs.length), Some(segs.mkString("|")))
        }
      }
      .toDF("word", "freq", "is_unk", "n_pieces", "seg")
  }
}
