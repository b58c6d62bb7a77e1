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
    ("graph_ann_probe", graphAnnProbe _)
  ).map { case (name, builder) =>
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.TableFunctions", name), builder)
  }
}
