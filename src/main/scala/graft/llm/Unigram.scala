package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword segmentation — the second
  * tokenizer family next to [[Bpe]]: instead of greedy merges, every word
  * is segmented into the maximum-likelihood piece sequence under a unigram
  * piece model (Kudo 2018, arXiv:1804.10959), computed by Viterbi dynamic
  * programming.
  *
  * The whole trainer is RNG-free and relational, so — like bpe_train — it
  * sits under the exact cross-engine hash gate:
  *   - model init: piece candidates are ALL substrings (length ≤ maxPiece)
  *     of the corpus vocabulary, counted weighted by word frequency;
  *     score(p) = round(log10(cnt/total), 6) held as DECIMAL;
  *   - Viterbi: the DP runs RELATIONALLY over the compact word-frequency
  *     relation — `maxLen` unrolled steps, each a bounded join of the
  *     previous best states against the piece table, then an argmax by
  *     (score, last-piece length, segmentation) struct-max. Scores are
  *     exact decimal sums, so the argmax is engine-independent;
  *   - optional hard-EM refinement (Viterbi-EM): re-count pieces from the
  *     chosen segmentations, re-score, re-segment.
  *
  * Scale shape: the corpus is touched ONCE (the word-frequency agg —
  * map-side combinable); everything downstream is vocabulary-bounded
  * (|vocab| · maxLen · maxPiece candidate rows per DP pass), the classic
  * "train on the compact word relation" tokenizer property. Words longer
  * than `maxLen` are dropped from the model build (document-level encode
  * would pass them through unsegmented).
  */
object Unigram {

  private val Dec = "decimal(27,10)"

  /** (word, freq) relation of the corpus, bounded to maxLen. */
  def wordFreq(df: DataFrame, textCol: String, maxLen: Int): DataFrame =
    graft.Core.fanOut(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Frequency-weighted substring piece counts (model init). */
  def pieceCounts(wf: DataFrame, maxPiece: Int): DataFrame =
    wf.select(col("word"), col("freq"),
        posexplode(sequence(lit(1), length(col("word")))))
      .select(col("word"), col("freq"), col("col").as("s"),
        explode(sequence(lit(1), lit(maxPiece))).as("l"))
      .filter(col("s") + col("l") - 1 <= length(col("word")))
      .select(expr("substring(word, s, l)").as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** log10 piece scores as exact decimals. */
  private def scores(pc: DataFrame): DataFrame = {
    val tot = pc.agg(sum(col("cnt")).as("tot"))
    pc.crossJoin(broadcast(tot))
      .select(col("piece"),
        round(log10(col("cnt").cast("double") / col("tot").cast("double")), 6)
          .cast(Dec).as("pscore"))
  }

  /** One Viterbi pass: per word the max-likelihood segmentation under the
    * given piece scores. Returns (word, freq, score DECIMAL, seg).
    */
  def viterbi(wf: DataFrame, pieceScores: DataFrame, maxPiece: Int,
              maxLen: Int): DataFrame = {
    val ps = broadcast(pieceScores)
    val s0 = wf.select(col("word"), col("freq"),
      lit(0).cast(Dec).as("sc"), lit("").as("seg"), lit(0).as("i"))
    val states = (1 to maxLen).foldLeft(List(s0)) { case (acc, i) =>
      val cands = (1 to math.min(maxPiece, i)).map { l =>
        val prev = acc(i - l) // best states at position i − l (acc(0) = s0)
        prev.filter(length(col("word")) >= i)
          .withColumn("piece", expr(s"substring(word, ${i - l + 1}, $l)"))
          .join(ps, Seq("piece"))
          // the re-cast keeps every union branch (and every DP depth) at
          // one decimal width — lossless at these magnitudes, and the
          // mirror casts identically
          .select(col("word"), col("freq"),
            (col("sc") + col("pscore")).cast(Dec).as("sc"),
            when(col("seg") === "", col("piece"))
              .otherwise(concat(col("seg"), lit("|"), col("piece"))).as("seg"),
            lit(l).as("plen"))
      }.reduceLeft(_ unionAll _)
      val best = cands
        .groupBy(col("word"))
        .agg(first(col("freq")).as("freq"),
          max(struct(col("sc"), col("plen"), col("seg"))).as("b"))
        .select(col("word"), col("freq"), col("b.sc").as("sc"),
          col("b.seg").as("seg"), lit(i).as("i"))
        .localCheckpoint() // keep the unrolled-DP lineage flat (bpe_train precedent)
      acc :+ best
    }
    states.tail.reduceLeft(_ unionAll _)
      .filter(col("i") === length(col("word")))
      .select(col("word"), col("freq"), col("sc"), col("seg"))
  }

  /** Piece counts implied by a Viterbi segmentation (the hard-EM count). */
  def emCounts(seg: DataFrame): DataFrame =
    seg.select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** The trained piece-score model: frequency init plus `emRounds`
    * hard-EM refinements over the given word relation.
    */
  def trainScores(wf: DataFrame, maxPiece: Int, maxLen: Int,
                  emRounds: Int): DataFrame = {
    require(emRounds >= 0, s"emRounds must be >= 0; got $emRounds")
    var ps = scores(pieceCounts(wf, maxPiece))
    (1 to emRounds).foreach { _ =>
      ps = scores(emCounts(viterbi(wf, ps, maxPiece, maxLen)))
    }
    ps
  }

  private def out(seg: DataFrame): DataFrame =
    seg.select(col("word"), col("freq"),
      size(split(col("seg"), "\\|")).cast("int").as("n_pieces"),
      col("sc").cast("double").as("score"), col("seg"))

  /** Full train+segment: frequency init, `emRounds` hard-EM refinements,
    * final segmentation table (word, freq, n_pieces, score, seg).
    */
  def trainSegment(df: DataFrame, textCol: String, maxPiece: Int = 4,
                   maxLen: Int = 8, emRounds: Int = 1): DataFrame = {
    val wf = wordFreq(df, textCol, maxLen).localCheckpoint()
    out(viterbi(wf, trainScores(wf, maxPiece, maxLen, emRounds),
      maxPiece, maxLen))
  }

  /** Train on the `isTrain` slice, FREEZE the model, segment the held-out
    * slice's words under it (the bpe_encode precedent: fixed-model replay
    * on unseen data). A held-out word whose every full-cover path needs a
    * piece the train slice never produced has no DP solution and drops
    * from the output — the honest OOV behavior of an inner-join DP (a
    * char-fallback vocabulary would be the production mitigation).
    */
  def trainEncode(df: DataFrame, textCol: String, isTrain: Column,
                  maxPiece: Int = 4, maxLen: Int = 8,
                  emRounds: Int = 1): DataFrame = {
    val wfTrain = wordFreq(df.filter(isTrain), textCol, maxLen).localCheckpoint()
    val ps = trainScores(wfTrain, maxPiece, maxLen, emRounds)
    val wfHeld = wordFreq(df.filter(!isTrain), textCol, maxLen)
    out(viterbi(wfHeld, ps, maxPiece, maxLen))
  }
}
