package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two float/double array columns: one pass
  * accumulating dot, ‖a‖² and ‖b‖² together, where the composed form
  * `dot/(sqrt(norm2)·sqrt(norm2))` traverses both arrays three times per
  * pair — and the pair join is exactly the hot path (|Q|×|C| evaluations).
  *
  * Result is BIT-IDENTICAL to [[graft.llm.Similarity.cosine]]'s composition
  * (ArrayCosineSpec asserts it): the three sums accumulate left-to-right
  * from 0.0 exactly as three separate [[ArrayDot]] passes would, and the
  * final `dot / (sqrt(na) * sqrt(nb))` is the same IEEE expression the
  * DuckDB mirrors encode. NULL when: either array is NULL, lengths differ,
  * any element is NULL (the zip_with semantics), or the denominator is not
  * `> 0` (zero-norm guard — ANSI-safe, no division).
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression with ArrayPairKernel {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_cosine"
  override protected def kernelName: String = "array_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemIsFloat(left)
    val yf = elemIsFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = evalGet(x, i, xf)
      val yv = evalGet(y, i, yf)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) dot / denom else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      def get(arr: String, child: Expression) = genGet(arr, i, child)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = ${get(a, left)};
         |    double $yv = ${get(b, right)};
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom > 0.0) { ${ev.value} = $dot / $denom; }
         |    else { ${ev.isNull} = true; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayCosine {
  import org.apache.spark.sql.Column

  /** Function descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_cosine"),
    new ExpressionInfo(classOf[ArrayCosine].getName, "array_cosine"),
    ArrayPairKernel.binaryBuilder("array_cosine", ArrayCosine(_, _)))

  /** Column-API entry point (ColumnBridge hops Spark 4's split Column API). */
  def arrayCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ArrayCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
