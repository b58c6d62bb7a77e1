package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A frozen decision forest compiled to native expressions — the M1/M4
  * predict path (reference ml/rfdefinitions.py:205-242 predict: forest
  * mean → 'cdf' bias correction → non-negativity clamp) with the RNG
  * removed: the trees are DATA in this file, extracted once from a seeded
  * `RF.fit` by [[graft.tools.FreezeRf]] (which verifies the compiled
  * scorer reproduces MLlib's transform bit-for-bit before printing the
  * fixture).
  *
  * Spark-first scale shape: scoring is a pure `when`-chain expression per
  * tree — whole-stage-codegen'd, no UDF, no MLlib transformer state, no
  * vector assembly — so a 100 TB scoring pass is a map-only projection.
  * The same tree data renders the DuckDB mirror (nested CASE WHEN), which
  * is what puts the frozen predict stage under the exact cross-engine
  * hash gate (m1_rf_predict_frozen), leaving only `fit` RNG-bound.
  */
object FrozenRf {

  sealed trait TNode
  final case class TLeaf(v: Double) extends TNode
  /** MLlib ContinuousSplit semantics: feature(f) <= thr goes left. */
  final case class TSplit(f: Int, thr: Double, left: TNode, right: TNode)
      extends TNode

  def treeColumn(n: TNode, features: Seq[Column]): Column = n match {
    case TLeaf(v) => lit(v)
    case TSplit(f, thr, l, r) =>
      when(features(f) <= lit(thr), treeColumn(l, features))
        .otherwise(treeColumn(r, features))
  }

  /** Shortest round-trip double literal — Scala's Double.toString, which
    * both scalac and DuckDB parse back to the identical IEEE value.
    */
  private def fmt(d: Double): String = d.toString

  def treeSql(n: TNode, features: Seq[String]): String = n match {
    case TLeaf(v) => fmt(v)
    case TSplit(f, thr, l, r) =>
      s"CASE WHEN ${features(f)} <= ${fmt(thr)} " +
        s"THEN ${treeSql(l, features)} ELSE ${treeSql(r, features)} END"
  }

  /** Forest mean: left-associated tree sum / numTrees — the same order
    * MLlib's predict uses, and the same order [[forestSql]] renders.
    */
  def forestColumn(ts: Seq[TNode], features: Seq[Column]): Column =
    ts.map(treeColumn(_, features)).reduce(_ + _) / lit(ts.length.toDouble)

  def forestSql(ts: Seq[TNode], features: Seq[String]): String =
    "(" + ts.map(t => s"(${treeSql(t, features)})").mkString(" + ") +
      s") / ${ts.length}.0"

  /** The committed m1 freeze (see [[graft.tools.FreezeRf]] header for the
    * exact recipe): 3 trees, depth 4, seed 42, trained on the sf0.01
    * lineitem `l_orderkey % 10 == 0` slice with features
    * (l_quantity, l_discount, l_tax) and label l_extendedprice/1000.
    */
  val bcSlope: Double = 1.0172734819342217

  private[ml] val trees: Seq[TNode] = Seq(
    TSplit(1, 0.095, TSplit(0, 31.5, TSplit(1, 0.08499999999999999, TSplit(0, 19.5, TLeaf(54.22493345499999), TLeaf(56.21663228314238)), TSplit(2, 0.035, TLeaf(64.89580655844156), TLeaf(54.72148627027027))), TSplit(0, 39.5, TSplit(0, 36.5, TLeaf(52.36863799019609), TLeaf(47.42993148264984)), TSplit(2, 0.065, TLeaf(53.735818818181805), TLeaf(59.28199644688643)))), TSplit(2, 0.055, TSplit(0, 9.5, TSplit(2, 0.005, TLeaf(79.19199499999999), TLeaf(33.1543536)), TSplit(2, 0.005, TLeaf(31.674456923076924), TLeaf(49.18334048780488))), TSplit(0, 17.5, TSplit(0, 5.5, TLeaf(68.29797666666666), TLeaf(43.023309677419356)), TSplit(0, 22.5, TLeaf(79.97214285714287), TLeaf(58.29073192982456))))),
    TSplit(1, 0.005, TSplit(2, 0.005, TSplit(0, 45.5, TSplit(0, 20.5, TLeaf(14.090085), TLeaf(28.296143636363638)), TSplit(0, 47.5, TLeaf(88.60171000000001), TLeaf(71.18747))), TSplit(0, 5.5, TSplit(2, 0.065, TLeaf(34.98492379310345), TLeaf(56.968839999999986)), TSplit(0, 11.5, TLeaf(64.06077343749999), TLeaf(47.506964973544974)))), TSplit(0, 31.5, TSplit(1, 0.095, TSplit(1, 0.08499999999999999, TLeaf(54.498632642927156), TLeaf(59.54801968023254)), TSplit(0, 26.5, TLeaf(46.4265147150259), TLeaf(61.64931724137932))), TSplit(0, 47.5, TSplit(2, 0.045, TLeaf(52.52765943502825), TLeaf(50.28443154450263)), TSplit(2, 0.055, TLeaf(52.01396559633027), TLeaf(62.84359346153846))))),
    TSplit(0, 48.5, TSplit(1, 0.025, TSplit(0, 2.5, TSplit(1, 0.005, TLeaf(64.2536511111111), TLeaf(34.19463723404255)), TSplit(2, 0.015, TLeaf(46.467120822510815), TLeaf(52.72606981691367))), TSplit(1, 0.035, TSplit(0, 34.5, TLeaf(60.400535539906116), TLeaf(50.811406726190505)), TSplit(1, 0.095, TLeaf(53.82957304054053), TLeaf(50.13901128048782)))), TSplit(2, 0.005, TSplit(1, 0.045, TLeaf(31.564648), TSplit(1, 0.055, TLeaf(67.65709), TLeaf(39.107477499999995))), TSplit(2, 0.055, TSplit(1, 0.005, TLeaf(33.61122666666667), TLeaf(59.462182014388475)), TSplit(1, 0.095, TLeaf(69.22954376811593), TLeaf(40.41228857142856)))))
)

  def frozenColumn(features: Seq[Column]): Column =
    forestColumn(trees, features)
  def frozenSql(features: Seq[String]): String = forestSql(trees, features)
  /** The fixture trees, exposed read-only for replay/parity specs. */
  def frozenTrees: Seq[TNode] = trees
}
