package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL gateway for the LLM/analytics operator family (the reference's P1
  * surface exposes every operator through the SQL gateway,
  * database.py:202-266; here the Spark-side analogue is TABLE-VALUED
  * FUNCTIONS registered through [[GraftExtensions]]): each wrapper
  * resolves its table-name argument against the session catalog (temp
  * views included), applies the Scala operator, and hands the resulting
  * logical plan back to the analyzer — so
  *
  *   `SELECT * FROM dedup_minhash('corpus', 'doc_id', 'text', 0.5)`
  *
  * composes with the rest of the query like any relation (joins, CTEs,
  * further filters all work, and Catalyst optimizes across the seam).
  *
  * Table and column arguments must be string LITERALS (the builder runs
  * at analysis time — there is no row context to evaluate expressions
  * in); violations raise a loud IllegalArgumentException naming the
  * function and position rather than a resolution error deep in the
  * analyzer.
  */
object TableFunctions {

  private def fail(fn: String, pos: Int, want: String, got: Expression): Nothing =
    throw new IllegalArgumentException(
      s"$fn: argument $pos must be $want, got ${got.sql}")

  private def str(fn: String, args: Seq[Expression], pos: Int): String =
    args(pos) match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => fail(fn, pos, "a string literal", other)
    }

  private def intOf(fn: String, args: Seq[Expression], pos: Int): Int =
    args(pos) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) if v.isValidInt => v.toInt
      case other => fail(fn, pos, "an Int-ranged integer literal", other)
    }

  private def dbl(fn: String, args: Seq[Expression], pos: Int): Double =
    args(pos) match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: Int, IntegerType) => v.toDouble
      case Literal(v: Long, LongType) => v.toDouble
      case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => fail(fn, pos, "a numeric literal", other)
    }

  private def table(fn: String, args: Seq[Expression], pos: Int) =
    SparkSession.active.table(str(fn, args, pos))

  private def arity(fn: String, args: Seq[Expression], lo: Int, hi: Int): Unit =
    require(args.length >= lo && args.length <= hi,
      s"$fn takes $lo to $hi arguments, got ${args.length}")

  /** dedup_exact(table, idCol, textCol) →
    * [[graft.llm.Dedup.exact]] (id, canonical_id).
    */
  private def dedupExact(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_exact", args, 3, 3)
    graft.llm.Dedup.exact(table("dedup_exact", args, 0),
        str("dedup_exact", args, 1), str("dedup_exact", args, 2))
      .queryExecution.logical
  }

  /** dedup_minhash(table, idCol, textCol[, minJaccard]) →
    * [[graft.llm.Dedup.minhashDedup]] (da, db, jac).
    */
  private def dedupMinhash(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_minhash", args, 3, 4)
    val minJ = if (args.length > 3) dbl("dedup_minhash", args, 3) else 0.5
    graft.llm.Dedup.minhashDedup(table("dedup_minhash", args, 0),
        str("dedup_minhash", args, 1), str("dedup_minhash", args, 2),
        minJaccard = minJ)
      .queryExecution.logical
  }

  /** dedup_cross_corpus(newTable, refTable, idCol, textCol[, minJaccard])
    * → [[graft.llm.Dedup.crossCorpusDedup]] (id, dup_of, best_jac, keep).
    */
  private def dedupCrossCorpus(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_cross_corpus", args, 4, 5)
    val minJ = if (args.length > 4) dbl("dedup_cross_corpus", args, 4) else 0.5
    graft.llm.Dedup.crossCorpusDedup(
        table("dedup_cross_corpus", args, 0),
        table("dedup_cross_corpus", args, 1),
        str("dedup_cross_corpus", args, 2),
        str("dedup_cross_corpus", args, 3), minJaccard = minJ)
      .queryExecution.logical
  }

  /** quality_filter(table, idCol, textCol[, minTokens]) →
    * [[graft.llm.Curation.qualityFilter]] per-rule audit flags.
    */
  private def qualityFilter(args: Seq[Expression]): LogicalPlan = {
    arity("quality_filter", args, 3, 4)
    val minTok = if (args.length > 3) intOf("quality_filter", args, 3) else 10
    graft.llm.Curation.qualityFilter(table("quality_filter", args, 0),
        str("quality_filter", args, 1), str("quality_filter", args, 2),
        minTokens = minTok)
      .queryExecution.logical
  }

  /** text_features(table, idCol, textCol) →
    * [[graft.llm.TextAnalysis.qualityFeatures]] signal columns.
    */
  private def textFeatures(args: Seq[Expression]): LogicalPlan = {
    arity("text_features", args, 3, 3)
    graft.llm.TextAnalysis.qualityFeatures(table("text_features", args, 0),
        str("text_features", args, 1), str("text_features", args, 2))
      .queryExecution.logical
  }

  /** simsearch_topk(corpusTable, queriesTable, idCol, vecCol, dim, k) →
    * [[graft.llm.Similarity.bruteForceTopKAgg]] (qid, rank, vb, cos) —
    * the bounded-aggregator ranking, the 100 TB shape.
    */
  private def simsearchTopK(args: Seq[Expression]): LogicalPlan = {
    arity("simsearch_topk", args, 6, 6)
    graft.llm.Similarity.bruteForceTopKAgg(
        table("simsearch_topk", args, 0),
        table("simsearch_topk", args, 1),
        str("simsearch_topk", args, 2), str("simsearch_topk", args, 3),
        intOf("simsearch_topk", args, 4), intOf("simsearch_topk", args, 5))
      .queryExecution.logical
  }

  // ---- serve-path TVFs over PERSISTED index layouts ---------------------

  /** dedup_index_probe(path, probeTable, idCol, textCol[, minJaccard]) →
    * [[graft.llm.DedupIndex.query]] (id, dup_of, best_jac, keep) against
    * the persisted band index at `path`.
    */
  private def dedupIndexProbe(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_index_probe", args, 4, 5)
    val minJ = if (args.length > 4) dbl("dedup_index_probe", args, 4) else 0.5
    graft.llm.DedupIndex.query(SparkSession.active,
        str("dedup_index_probe", args, 0),
        table("dedup_index_probe", args, 1),
        str("dedup_index_probe", args, 2),
        str("dedup_index_probe", args, 3), minJaccard = minJ)
      .queryExecution.logical
  }

  /** ann_probe(path, queriesTable, idCol, vecCol, dim, k, nprobe) →
    * [[graft.llm.Similarity.probeIndex]] (qid, rank, vb, cos) against the
    * persisted IVF layout at `path`.
    */
  private def annProbe(args: Seq[Expression]): LogicalPlan = {
    arity("ann_probe", args, 7, 7)
    graft.llm.Similarity.probeIndex(SparkSession.active,
        str("ann_probe", args, 0), table("ann_probe", args, 1),
        str("ann_probe", args, 2), str("ann_probe", args, 3),
        intOf("ann_probe", args, 4), intOf("ann_probe", args, 5),
        intOf("ann_probe", args, 6))
      .queryExecution.logical
  }

  /** graph_ann_probe(path, queriesTable, idCol, vecCol, k, beam, rounds)
    * → [[graft.llm.GraphAnnIndex.probe]] (qid, rank, vb, cos) against the
    * persisted HNSW layout at `path`.
    */
  private def graphAnnProbe(args: Seq[Expression]): LogicalPlan = {
    arity("graph_ann_probe", args, 7, 7)
    graft.llm.GraphAnnIndex.probe(SparkSession.active,
        str("graph_ann_probe", args, 0), table("graph_ann_probe", args, 1),
        str("graph_ann_probe", args, 2), str("graph_ann_probe", args, 3),
        intOf("graph_ann_probe", args, 4), intOf("graph_ann_probe", args, 5),
        intOf("graph_ann_probe", args, 6))
      .queryExecution.logical
  }

  // ---- list-typed literal arguments --------------------------------------

  /** Comma-separated string-list literal ('w1,w2,w3' → Seq). */
  private def csv(fn: String, args: Seq[Expression], pos: Int): Seq[String] = {
    val items = str(fn, args, pos).split(",").map(_.trim).filter(_.nonEmpty)
    if (items.isEmpty) fail(fn, pos, "a non-empty 'a,b,c' list literal",
      args(pos))
    items.toSeq
  }

  /** 'name:weight,name:weight' literal → ordered (name, Double) pairs. */
  private def kvDoubles(fn: String, args: Seq[Expression],
                        pos: Int): Seq[(String, Double)] =
    csv(fn, args, pos).map { item =>
      item.split(":", 2) match {
        case Array(k, v) if k.nonEmpty =>
          try k -> v.trim.toDouble
          catch { case _: NumberFormatException =>
            fail(fn, pos, s"a 'name:weight' list literal (bad weight in '$item')",
              args(pos)) }
        case _ =>
          fail(fn, pos, s"a 'name:weight' list literal (bad item '$item')",
            args(pos))
      }
    }

  /** A timestamp-valued string literal, as the Column the point-read
    * operators take ('2024-03-01 10:00:00' or '2024-03-01' → cast
    * literal). Parse-validated at analysis time: an unparseable string
    * cast to timestamp yields NULL, and a NULL point read silently
    * returns an EMPTY snapshot — a typo must fail loud instead.
    */
  private def tsLit(fn: String, args: Seq[Expression],
                    pos: Int): org.apache.spark.sql.Column = {
    val s = str(fn, args, pos)
    val ok = scala.util.Try(java.sql.Timestamp.valueOf(s)).isSuccess ||
      scala.util.Try(java.time.LocalDate.parse(s)).isSuccess
    if (!ok) fail(fn, pos,
      "a 'yyyy-MM-dd[ HH:mm:ss[.f]]' timestamp literal", args(pos))
    org.apache.spark.sql.functions.lit(s).cast("timestamp")
  }

  // ---- curation / text-analysis TVFs --------------------------------------

  /** chunk_documents(table, idCol, textCol, chunkSize, overlap) →
    * [[graft.llm.Curation.chunkDocuments]] (id, chunk_id, chunk).
    */
  private def chunkDocuments(args: Seq[Expression]): LogicalPlan = {
    arity("chunk_documents", args, 5, 5)
    graft.llm.Curation.chunkDocuments(table("chunk_documents", args, 0),
        str("chunk_documents", args, 1), str("chunk_documents", args, 2),
        intOf("chunk_documents", args, 3), intOf("chunk_documents", args, 4))
      .queryExecution.logical
  }

  /** text_langid(table, idCol, textCol) → [[graft.llm.TextAnalysis.langId]]. */
  private def textLangid(args: Seq[Expression]): LogicalPlan = {
    arity("text_langid", args, 3, 3)
    graft.llm.TextAnalysis.langId(table("text_langid", args, 0),
        str("text_langid", args, 1), str("text_langid", args, 2))
      .queryExecution.logical
  }

  /** text_normalize(table, idCol, textCol) →
    * [[graft.llm.TextAnalysis.normalizeText]].
    */
  private def textNormalize(args: Seq[Expression]): LogicalPlan = {
    arity("text_normalize", args, 3, 3)
    graft.llm.TextAnalysis.normalizeText(table("text_normalize", args, 0),
        str("text_normalize", args, 1), str("text_normalize", args, 2))
      .queryExecution.logical
  }

  /** text_strip_markup(table, idCol, textCol) →
    * [[graft.llm.TextAnalysis.stripMarkup]].
    */
  private def textStripMarkup(args: Seq[Expression]): LogicalPlan = {
    arity("text_strip_markup", args, 3, 3)
    graft.llm.TextAnalysis.stripMarkup(table("text_strip_markup", args, 0),
        str("text_strip_markup", args, 1), str("text_strip_markup", args, 2))
      .queryExecution.logical
  }

  /** text_tfidf(table, idCol, textCol) → [[graft.llm.TextAnalysis.tfidf]]
    * (id, tok, tf, df, n_corpus, tfidf).
    */
  private def textTfidf(args: Seq[Expression]): LogicalPlan = {
    arity("text_tfidf", args, 3, 3)
    graft.llm.TextAnalysis.tfidf(table("text_tfidf", args, 0),
        str("text_tfidf", args, 1), str("text_tfidf", args, 2))
      .queryExecution.logical
  }

  /** text_bm25(table, idCol, textCol, 'term1,term2'[, k1, b]) →
    * [[graft.llm.TextAnalysis.bm25]] per-document scores.
    */
  private def textBm25(args: Seq[Expression]): LogicalPlan = {
    arity("text_bm25", args, 4, 6)
    val k1 = if (args.length > 4) dbl("text_bm25", args, 4) else 1.2
    val b = if (args.length > 5) dbl("text_bm25", args, 5) else 0.75
    graft.llm.TextAnalysis.bm25(table("text_bm25", args, 0),
        str("text_bm25", args, 1), str("text_bm25", args, 2),
        csv("text_bm25", args, 3), k1, b)
      .queryExecution.logical
  }

  /** text_fingerprint(table, idCol, textCol[, n]) →
    * [[graft.llm.TextAnalysis.fingerprint]] rolling-hash doc fingerprints.
    */
  private def textFingerprint(args: Seq[Expression]): LogicalPlan = {
    arity("text_fingerprint", args, 3, 4)
    val n = if (args.length > 3) intOf("text_fingerprint", args, 3) else 5
    graft.llm.TextAnalysis.fingerprint(table("text_fingerprint", args, 0),
        str("text_fingerprint", args, 1), str("text_fingerprint", args, 2), n)
      .queryExecution.logical
  }

  /** pii_redact(table, idCol, textCol) → [[graft.llm.Curation.redactPii]]
    * per-document PII counts + redacted text.
    */
  private def piiRedact(args: Seq[Expression]): LogicalPlan = {
    arity("pii_redact", args, 3, 3)
    graft.llm.Curation.redactPii(table("pii_redact", args, 0),
        str("pii_redact", args, 1), str("pii_redact", args, 2))
      .queryExecution.logical
  }

  /** dedup_exact_digest(table, idCol, textCol) →
    * [[graft.llm.Dedup.exactByDigest]] (keep_id, n_copies).
    */
  private def dedupExactDigest(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_exact_digest", args, 3, 3)
    graft.llm.Dedup.exactByDigest(table("dedup_exact_digest", args, 0),
        str("dedup_exact_digest", args, 1), str("dedup_exact_digest", args, 2))
      .queryExecution.logical
  }

  /** curation_domain_cap(table, idCol, domainCol, scoreCol, cap) →
    * [[graft.llm.Curation.domainCap]].
    */
  private def curationDomainCap(args: Seq[Expression]): LogicalPlan = {
    arity("curation_domain_cap", args, 5, 5)
    graft.llm.Curation.domainCap(table("curation_domain_cap", args, 0),
        str("curation_domain_cap", args, 1),
        str("curation_domain_cap", args, 2),
        str("curation_domain_cap", args, 3),
        intOf("curation_domain_cap", args, 4))
      .queryExecution.logical
  }

  /** curation_wordlist_screen(table, idCol, textCol, 'w1,w2', maxFraction)
    * → [[graft.llm.Curation.wordlistScreen]].
    */
  private def curationWordlistScreen(args: Seq[Expression]): LogicalPlan = {
    arity("curation_wordlist_screen", args, 5, 5)
    graft.llm.Curation.wordlistScreen(
        table("curation_wordlist_screen", args, 0),
        str("curation_wordlist_screen", args, 1),
        str("curation_wordlist_screen", args, 2),
        csv("curation_wordlist_screen", args, 3),
        dbl("curation_wordlist_screen", args, 4))
      .queryExecution.logical
  }

  /** curation_pack_sequences(table, idCol, textCol, shardCol, maxTokens) →
    * [[graft.llm.Curation.packSequences]].
    */
  private def curationPackSequences(args: Seq[Expression]): LogicalPlan = {
    arity("curation_pack_sequences", args, 5, 5)
    graft.llm.Curation.packSequences(
        table("curation_pack_sequences", args, 0),
        str("curation_pack_sequences", args, 1),
        str("curation_pack_sequences", args, 2),
        str("curation_pack_sequences", args, 3),
        intOf("curation_pack_sequences", args, 4))
      .queryExecution.logical
  }

  // ---- sampling TVFs -------------------------------------------------------

  /** sample_split_assign(table, idCol, 'train:0.8,val:0.1,test:0.1'
    * [, salt]) → [[graft.llm.Curation.splitAssign]].
    */
  private def sampleSplitAssign(args: Seq[Expression]): LogicalPlan = {
    arity("sample_split_assign", args, 3, 4)
    val salt = if (args.length > 3) str("sample_split_assign", args, 3)
               else "graft"
    graft.llm.Curation.splitAssign(table("sample_split_assign", args, 0),
        str("sample_split_assign", args, 1),
        kvDoubles("sample_split_assign", args, 2), salt)
      .queryExecution.logical
  }

  /** sample_stratified(table, idCol, strataCol, 'a:0.5,b:0.1', defaultRate
    * [, salt]) → [[graft.llm.Curation.stratifiedSample]].
    */
  private def sampleStratified(args: Seq[Expression]): LogicalPlan = {
    arity("sample_stratified", args, 5, 6)
    val salt = if (args.length > 5) str("sample_stratified", args, 5)
               else "graft"
    graft.llm.Curation.stratifiedSample(table("sample_stratified", args, 0),
        str("sample_stratified", args, 1), str("sample_stratified", args, 2),
        kvDoubles("sample_stratified", args, 3).toMap,
        dbl("sample_stratified", args, 4), salt)
      .queryExecution.logical
  }

  // ---- CDC / dimension-history TVFs ---------------------------------------

  /** cdc_apply(table, keyCol, tsCol, ordCol, opCol) →
    * [[graft.operators.Relational.cdcApply]] latest live row per key.
    */
  private def cdcApplyFn(args: Seq[Expression]): LogicalPlan = {
    arity("cdc_apply", args, 5, 5)
    graft.operators.Relational.cdcApply(table("cdc_apply", args, 0),
        str("cdc_apply", args, 1), str("cdc_apply", args, 2),
        str("cdc_apply", args, 3), str("cdc_apply", args, 4))
      .queryExecution.logical
  }

  /** scd2(table, keyCol, attrCol, tsCol, ordCol, opCol) →
    * [[graft.operators.Relational.cdcScd2]] versioned dimension history.
    */
  private def scd2Fn(args: Seq[Expression]): LogicalPlan = {
    arity("scd2", args, 6, 6)
    graft.operators.Relational.cdcScd2(table("scd2", args, 0),
        str("scd2", args, 1), str("scd2", args, 2), str("scd2", args, 3),
        str("scd2", args, 4), str("scd2", args, 5))
      .queryExecution.logical
  }

  /** scd2_snapshot_at(historyTable, 'ts') →
    * [[graft.operators.Relational.snapshotAt]] point read of an SCD2
    * history (valid_from/valid_to columns).
    */
  private def scd2SnapshotAt(args: Seq[Expression]): LogicalPlan = {
    arity("scd2_snapshot_at", args, 2, 2)
    graft.operators.Relational.snapshotAt(
        table("scd2_snapshot_at", args, 0),
        tsLit("scd2_snapshot_at", args, 1))
      .queryExecution.logical
  }

  /** scd2_bitemporal(table, keyCol, attrCol, validTsCol, txTsCol, ordCol,
    * opCol[, maxErasPerKey]) →
    * [[graft.operators.Relational.cdcScd2Bitemporal]] transaction-era
    * dimension history.
    */
  private def scd2BitemporalFn(args: Seq[Expression]): LogicalPlan = {
    arity("scd2_bitemporal", args, 7, 8)
    val maxEras = if (args.length > 7) intOf("scd2_bitemporal", args, 7)
                  else 1000
    graft.operators.Relational.cdcScd2Bitemporal(
        table("scd2_bitemporal", args, 0),
        str("scd2_bitemporal", args, 1), str("scd2_bitemporal", args, 2),
        str("scd2_bitemporal", args, 3), str("scd2_bitemporal", args, 4),
        str("scd2_bitemporal", args, 5), str("scd2_bitemporal", args, 6),
        maxEras)
      .queryExecution.logical
  }

  /** snapshot_as_of_log(opsTable, keyCol, attrCol, validTsCol, txTsCol,
    * ordCol, opCol, 'validTs', 'txTs') →
    * [[graft.operators.Relational.snapshotAsOfLog]] — the bitemporal
    * point read pushed down to the changelog.
    */
  private def snapshotAsOfLogFn(args: Seq[Expression]): LogicalPlan = {
    arity("snapshot_as_of_log", args, 9, 9)
    graft.operators.Relational.snapshotAsOfLog(
        table("snapshot_as_of_log", args, 0),
        str("snapshot_as_of_log", args, 1), str("snapshot_as_of_log", args, 2),
        str("snapshot_as_of_log", args, 3), str("snapshot_as_of_log", args, 4),
        str("snapshot_as_of_log", args, 5), str("snapshot_as_of_log", args, 6),
        tsLit("snapshot_as_of_log", args, 7),
        tsLit("snapshot_as_of_log", args, 8))
      .queryExecution.logical
  }

  // ---- second widening wave: dedup variants / vocab / sampling /
  // ---- sessionization / sketches ------------------------------------------

  /** dedup_simhash(table, idCol, textCol) → [[graft.llm.Dedup.simhash16]]
    * per-document 16-bit simhash fingerprints.
    */
  private def dedupSimhash(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_simhash", args, 3, 3)
    graft.llm.Dedup.simhash16(table("dedup_simhash", args, 0),
        str("dedup_simhash", args, 1), str("dedup_simhash", args, 2))
      .queryExecution.logical
  }

  /** dedup_prefix_jaccard(table, idCol, textCol[, n, minJaccard]) →
    * [[graft.llm.Dedup.prefixJaccardPairs]] exact verified pairs.
    */
  private def dedupPrefixJaccard(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_prefix_jaccard", args, 3, 5)
    val n = if (args.length > 3) intOf("dedup_prefix_jaccard", args, 3) else 3
    val mj = if (args.length > 4) dbl("dedup_prefix_jaccard", args, 4) else 0.5
    graft.llm.Dedup.prefixJaccardPairs(table("dedup_prefix_jaccard", args, 0),
        str("dedup_prefix_jaccard", args, 1),
        str("dedup_prefix_jaccard", args, 2), n, mj)
      .queryExecution.logical
  }

  /** dedup_containment(table, idCol, textCol[, n, minContainment, maxDf])
    * → [[graft.llm.Dedup.containmentPairs]].
    */
  private def dedupContainment(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_containment", args, 3, 6)
    val n = if (args.length > 3) intOf("dedup_containment", args, 3) else 3
    val mc = if (args.length > 4) dbl("dedup_containment", args, 4) else 0.8
    val maxDf = if (args.length > 5) intOf("dedup_containment", args, 5)
                else 1000
    graft.llm.Dedup.containmentPairs(table("dedup_containment", args, 0),
        str("dedup_containment", args, 1), str("dedup_containment", args, 2),
        n, mc, maxDf)
      .queryExecution.logical
  }

  /** dedup_clusters(pairsTable[, aCol, bCol]) →
    * [[graft.llm.Dedup.resolveClusters]] (doc_id, cluster_id) connected
    * components over a near-dup pair relation.
    */
  private def dedupClusters(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_clusters", args, 1, 3)
    val a = if (args.length > 1) str("dedup_clusters", args, 1) else "da"
    val b = if (args.length > 2) str("dedup_clusters", args, 2) else "db"
    graft.llm.Dedup.resolveClusters(table("dedup_clusters", args, 0), a, b)
      .queryExecution.logical
  }

  /** dedup_canonicalize(table, clustersTable, idCol) →
    * [[graft.llm.Dedup.canonicalize]] — keep one doc per cluster.
    */
  private def dedupCanonicalize(args: Seq[Expression]): LogicalPlan = {
    arity("dedup_canonicalize", args, 3, 3)
    graft.llm.Dedup.canonicalize(table("dedup_canonicalize", args, 0),
        table("dedup_canonicalize", args, 1),
        str("dedup_canonicalize", args, 2))
      .queryExecution.logical
  }

  /** text_vocabulary(table, idCol, textCol[, topN]) →
    * [[graft.llm.TextAnalysis.vocabulary]].
    */
  private def textVocabulary(args: Seq[Expression]): LogicalPlan = {
    arity("text_vocabulary", args, 3, 4)
    val n = if (args.length > 3) intOf("text_vocabulary", args, 3) else 100
    graft.llm.TextAnalysis.vocabulary(table("text_vocabulary", args, 0),
        str("text_vocabulary", args, 1), str("text_vocabulary", args, 2), n)
      .queryExecution.logical
  }

  /** text_zipf_fit(table, textCol[, topN]) →
    * [[graft.llm.TextAnalysis.zipfFit]] corpus-health slope.
    */
  private def textZipfFit(args: Seq[Expression]): LogicalPlan = {
    arity("text_zipf_fit", args, 2, 3)
    val n = if (args.length > 2) intOf("text_zipf_fit", args, 2) else 100
    graft.llm.TextAnalysis.zipfFit(table("text_zipf_fit", args, 0),
        str("text_zipf_fit", args, 1), n)
      .queryExecution.logical
  }

  /** sample_reservoir(table, idCol, strataCol, k[, salt]) →
    * [[graft.llm.Curation.hashReservoir]] deterministic per-stratum
    * reservoir.
    */
  private def sampleReservoir(args: Seq[Expression]): LogicalPlan = {
    arity("sample_reservoir", args, 4, 5)
    val salt = if (args.length > 4) str("sample_reservoir", args, 4)
               else "graft"
    graft.llm.Curation.hashReservoir(table("sample_reservoir", args, 0),
        str("sample_reservoir", args, 1), str("sample_reservoir", args, 2),
        intOf("sample_reservoir", args, 3), salt)
      .queryExecution.logical
  }

  /** sample_weighted(table, idCol, weightCol, k[, salt]) →
    * [[graft.llm.Curation.weightedSample]].
    */
  private def sampleWeighted(args: Seq[Expression]): LogicalPlan = {
    arity("sample_weighted", args, 4, 5)
    val salt = if (args.length > 4) str("sample_weighted", args, 4)
               else "graft"
    graft.llm.Curation.weightedSample(table("sample_weighted", args, 0),
        str("sample_weighted", args, 1), str("sample_weighted", args, 2),
        intOf("sample_weighted", args, 3), salt)
      .queryExecution.logical
  }

  /** corpus_mixture(table, srcCol, alpha) →
    * [[graft.llm.Curation.mixtureWeights]] temperature-scaled source
    * sampling weights.
    */
  private def corpusMixture(args: Seq[Expression]): LogicalPlan = {
    arity("corpus_mixture", args, 3, 3)
    graft.llm.Curation.mixtureWeights(table("corpus_mixture", args, 0),
        str("corpus_mixture", args, 1), dbl("corpus_mixture", args, 2))
      .queryExecution.logical
  }

  /** corpus_shuffle(table, idCol, numShards[, salt]) →
    * [[graft.llm.Curation.shuffleShards]] deterministic corpus shuffle.
    */
  private def corpusShuffle(args: Seq[Expression]): LogicalPlan = {
    arity("corpus_shuffle", args, 3, 4)
    val salt = if (args.length > 3) str("corpus_shuffle", args, 3) else ""
    graft.llm.Curation.shuffleShards(table("corpus_shuffle", args, 0),
        str("corpus_shuffle", args, 1), intOf("corpus_shuffle", args, 2),
        salt)
      .queryExecution.logical
  }

  /** sessionize(table, keyCol, tsCol, maxGapSeconds) →
    * [[graft.operators.Windows.sessionize]].
    */
  private def sessionizeFn(args: Seq[Expression]): LogicalPlan = {
    arity("sessionize", args, 4, 4)
    graft.operators.Windows.sessionize(table("sessionize", args, 0),
        str("sessionize", args, 1), str("sessionize", args, 2),
        intOf("sessionize", args, 3).toLong)
      .queryExecution.logical
  }

  /** sketch_hll_distinct(table, groupCol, valCol[, m]) →
    * [[graft.operators.Sketch.hllDistinct]].
    */
  private def sketchHllDistinct(args: Seq[Expression]): LogicalPlan = {
    arity("sketch_hll_distinct", args, 3, 4)
    val m = if (args.length > 3) intOf("sketch_hll_distinct", args, 3)
            else 64
    graft.operators.Sketch.hllDistinct(table("sketch_hll_distinct", args, 0),
        str("sketch_hll_distinct", args, 1),
        str("sketch_hll_distinct", args, 2), m)
      .queryExecution.logical
  }

  /** sketch_cms_topk(table, textCol[, d, width, k]) →
    * [[graft.operators.Sketch.cmsTopK]].
    */
  private def sketchCmsTopK(args: Seq[Expression]): LogicalPlan = {
    arity("sketch_cms_topk", args, 2, 5)
    val d = if (args.length > 2) intOf("sketch_cms_topk", args, 2) else 3
    val w = if (args.length > 3) intOf("sketch_cms_topk", args, 3) else 256
    val k = if (args.length > 4) intOf("sketch_cms_topk", args, 4) else 20
    graft.operators.Sketch.cmsTopK(table("sketch_cms_topk", args, 0),
        str("sketch_cms_topk", args, 1), d, w, k)
      .queryExecution.logical
  }

  /** The (identifier, info, builder) tuples [[GraftExtensions]] injects —
    * also registrable at runtime on an existing session via
    * `spark.sessionState.tableFunctionRegistry`.
    */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    ("dedup_exact", dedupExact _),
    ("dedup_minhash", dedupMinhash _),
    ("dedup_cross_corpus", dedupCrossCorpus _),
    ("quality_filter", qualityFilter _),
    ("text_features", textFeatures _),
    ("simsearch_topk", simsearchTopK _),
    ("dedup_index_probe", dedupIndexProbe _),
    ("ann_probe", annProbe _),
    ("graph_ann_probe", graphAnnProbe _),
    ("chunk_documents", chunkDocuments _),
    ("text_langid", textLangid _),
    ("text_normalize", textNormalize _),
    ("text_strip_markup", textStripMarkup _),
    ("text_tfidf", textTfidf _),
    ("text_bm25", textBm25 _),
    ("text_fingerprint", textFingerprint _),
    ("pii_redact", piiRedact _),
    ("dedup_exact_digest", dedupExactDigest _),
    ("curation_domain_cap", curationDomainCap _),
    ("curation_wordlist_screen", curationWordlistScreen _),
    ("curation_pack_sequences", curationPackSequences _),
    ("sample_split_assign", sampleSplitAssign _),
    ("sample_stratified", sampleStratified _),
    ("cdc_apply", cdcApplyFn _),
    ("scd2", scd2Fn _),
    ("scd2_bitemporal", scd2BitemporalFn _),
    ("scd2_snapshot_at", scd2SnapshotAt _),
    ("snapshot_as_of_log", snapshotAsOfLogFn _),
    ("dedup_simhash", dedupSimhash _),
    ("dedup_prefix_jaccard", dedupPrefixJaccard _),
    ("dedup_containment", dedupContainment _),
    ("dedup_clusters", dedupClusters _),
    ("dedup_canonicalize", dedupCanonicalize _),
    ("text_vocabulary", textVocabulary _),
    ("text_zipf_fit", textZipfFit _),
    ("sample_reservoir", sampleReservoir _),
    ("sample_weighted", sampleWeighted _),
    ("corpus_mixture", corpusMixture _),
    ("corpus_shuffle", corpusShuffle _),
    ("sessionize", sessionizeFn _),
    ("sketch_hll_distinct", sketchHllDistinct _),
    ("sketch_cms_topk", sketchCmsTopK _)
  ).map { case (name, builder) =>
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.TableFunctions", name), builder)
  }
}
