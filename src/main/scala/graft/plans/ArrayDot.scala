package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float/double array columns — the hot kernel
  * of every similarity operator (brute-force/IVF search, embedding dedup,
  * rerank), which previously ran as `aggregate(zip_with(...))` higher-order
  * functions whose per-element lambdas evaluate INTERPRETED. This
  * expression compiles to a tight element loop inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the HOF form it replaces (the DuckDB
  * oracle mirrors depend on it, and ArrayDotSpec asserts it on random
  * vectors): elements cast to double and accumulate left-to-right from a
  * 0.0 seed — the same association order — and the NULL cases match
  * `aggregate(zip_with(...))` exactly: NULL input array, mismatched
  * lengths (zip_with pads with nulls), or any NULL element all yield NULL.
  * norm2(a) is `ArrayDot(a, a)`.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ArrayPairKernel {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  override protected def kernelName: String = "array_dot"
  // NULL can arise from non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemIsFloat(left)
    val yf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += evalGet(x, i, xf) * evalGet(y, i, yf)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, child: Expression) = genGet(arr, i, child)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (${get(a, left)}) * (${get(b, right)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  import org.apache.spark.sql.Column

  /** Function descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    ArrayPairKernel.binaryBuilder("array_dot", ArrayDot(_, _)))

  /** Column-API entry point (ColumnBridge hops Spark 4's split Column API). */
  def arrayDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
