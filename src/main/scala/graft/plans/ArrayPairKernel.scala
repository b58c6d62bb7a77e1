package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Shared plumbing for the binary array-kernel expressions ([[ArrayDot]],
  * [[ArrayCosine]]): analysis-time input validation and the element
  * accessors for float/double arrays — ONE definition so a widening or
  * null-handling change lands in both kernels or neither.
  *
  * The element-type restriction is load-bearing, not cosmetic: these
  * kernels read elements via `ArrayData.getFloat/getDouble`, and on
  * UnsafeArrayData a getDouble over (say) a 4-byte int element region reads
  * 8-byte strides — silently wrong values, no error. The HOF forms they
  * replaced cast any numeric element; here anything but float/double is
  * rejected at ANALYSIS time instead.
  */
trait ArrayPairKernel extends BinaryExpression {

  protected def kernelName: String

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$kernelName requires two array<float> / array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Java source for reading element `i` of `arr` as double. */
  protected def genGet(arr: String, i: String, child: Expression): String =
    if (elemIsFloat(child)) s"(double) $arr.getFloat($i)"
    else s"$arr.getDouble($i)"

  /** Scala-side element read for the interpreted path. */
  protected def evalGet(a: org.apache.spark.sql.catalyst.util.ArrayData,
                        i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

object ArrayPairKernel {
  /** Arity-checked descriptor builder: a wrong argument count surfaces as
    * the registry's clear error instead of an IndexOutOfBoundsException
    * from `children(1)`.
    */
  def binaryBuilder(name: String, make: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => make(a, b)
    case other => throw new IllegalArgumentException(
      s"$name requires exactly 2 arguments, got ${other.length}")
  }
}
