package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.catalyst.util.ArrayData

/** O4: native `searchsorted(boundaries, value)` Catalyst expression —
  * numpy side='right' bisection against a sorted double array (reference:
  * qpe/qpe.py:276 np.searchsorted(SCALE_CPC); io_data.py:246). O(log n)
  * with real codegen, vs the O(n) generated CASE chain of
  * functions.Phys.searchSorted — use this one when the scale array is large
  * (the 256-entry SCALE_CPC DN encode).
  */
case class SearchSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs: (ArrayType(DoubleType) boundaries, DoubleType value) — enforced
  // by the Column/SQL entry points (AbstractDataType is private[sql], so no
  // ExpectsInputTypes here)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "searchsorted"

  override def nullSafeEval(arr: Any, value: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val v = value.asInstanceOf[Double]
    var lo = 0
    var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getDouble($mid) <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SearchSorted {
  import org.apache.spark.sql.Column

  /** Function descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("searchsorted"),
    new ExpressionInfo(classOf[SearchSorted].getName, "searchsorted"),
    (children: Seq[Expression]) => SearchSorted(children.head, children(1)))

  /** Column-API entry point (ColumnBridge hops Spark 4's split Column API). */
  def searchsorted(boundaries: Column, value: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SearchSorted(
      ColumnBridge.expression(boundaries), ColumnBridge.expression(value)))
  }
}
