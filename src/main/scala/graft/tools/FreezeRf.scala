package graft.tools

import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.functions._

import graft.ml.{FrozenRf, RF}

/** One-off (but reproducible) freeze of the m1 RandomForest: fits the same
  * pipeline as the m1_rf_train_predict query on the sf0.01 train slice
  * (seed 42), extracts every tree into [[FrozenRf.TNode]] data, VERIFIES
  * the compiled-expression scorer reproduces MLlib's transform on the full
  * slice, and prints the Scala source of the frozen fixture
  * (ml/FrozenRfModel.scala). Re-run after changing the recipe:
  *
  *   sbt "runMain graft.tools.FreezeRf /root/testdata/sf0.01"
  *
  * The committed fixture is what m1_rf_predict_frozen scores with — the
  * RNG stays confined to `fit` (this tool), and the predict+BC+clamp stage
  * becomes an exact cross-engine oracle query.
  */
object FreezeRf {
  private def convert(n: Node): FrozenRf.TNode = n match {
    case l: LeafNode => FrozenRf.TLeaf(l.prediction)
    case i: InternalNode => i.split match {
      case s: ContinuousSplit =>
        FrozenRf.TSplit(s.featureIndex, s.threshold,
          convert(i.leftChild), convert(i.rightChild))
      case other => sys.error(s"unexpected split type: $other")
    }
  }

  private def render(n: FrozenRf.TNode): String = n match {
    case FrozenRf.TLeaf(v) => s"TLeaf($v)"
    case FrozenRf.TSplit(f, t, l, r) =>
      s"TSplit($f, $t, ${render(l)}, ${render(r)})"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Core.harnessSession("8")
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Core.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").as("f1"),
        col("l_discount").as("f2"), col("l_tax").as("f3"),
        (col("l_extendedprice") / 1000.0).as("label"))
    val train = li.filter(pmod(col("l_orderkey"), lit(10)) === 0)
    val model = RF.fit(train, Seq("f1", "f2", "f3"), "label",
      numTrees = 3, maxDepth = 4)
    val trees = model.rf.trees.map(t => convert(t.rootNode)).toSeq

    // parity check: the compiled expression must reproduce MLlib's own
    // transform bit-for-bit on the full table (same per-tree doubles, same
    // left-assoc sum, same /numTrees)
    val scored = RF.predict(model, li)
      .withColumn("__frozen", FrozenRf.forestColumn(trees,
        Seq(col("f1"), col("f2"), col("f3"))))
    val nDiff = scored.filter(col("prediction") =!= col("__frozen")).count()
    require(nDiff == 0, s"frozen scorer diverges from MLlib on $nDiff rows")

    println(s"// bcSlope = ${model.bcSlope}")
    println("private[ml] val trees: Seq[TNode] = Seq(")
    println(trees.map(t => "    " + render(t)).mkString(",\n"))
    println(")")
    spark.stop()
  }
}
