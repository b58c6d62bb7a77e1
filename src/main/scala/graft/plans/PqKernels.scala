package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels as compact codegen expressions.
  *
  * The composed-expression forms (an unrolled m·ks·sub tree of element_at /
  * arithmetic nodes) are bit-identical but create megabyte-scale plans:
  * at m=4, ks=16, sub=16 the encode projection alone is ~1024 fused
  * multiply-adds per output column — Janino compile time and task-binary
  * serialization (7.9 MiB measured) dwarf the actual scan at bench scale,
  * and the cost recurs per plan, not per row. These kernels carry the
  * codebook as ONE referenced flat double[] and loop over it in a static
  * JIT-compiled method: constant-size generated code, identical IEEE
  * arithmetic (left-to-right accumulation, Double.compare argmin with
  * first-wins ties — PqKernelsSpec asserts bit-identity to the composed
  * forms).
  *
  * NULL semantics: NULL input array, wrong length, or ANY NULL element →
  * NULL result (the composed forms' null-poisoning, made explicit).
  */
object PqKernels {

  private def get(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** PQ codes: per subspace j the 1-based index of the nearest codeword
    * (squared L2, left-assoc accumulation), first codeword wins ties
    * (Double.compare, so NaN distances rank greatest — exactly the
    * struct-min ordering of the composed form).
    */
  def encode(v: ArrayData, cbFlat: Array[Double], m: Int, sub: Int,
             isFloat: Boolean): ArrayData = {
    if (v == null) return null
    val dim = m * sub
    if (v.numElements() != dim) return null
    val ks = cbFlat.length / dim
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestD = 0.0
      var bestC = 0
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val x = get(v, j * sub + d, isFloat) - cbFlat(c * dim + j * sub + d)
          acc += x * x
          d += 1
        }
        if (c == 0 || java.lang.Double.compare(acc, bestD) < 0) {
          bestD = acc; bestC = c
        }
        c += 1
      }
      codes(j) = bestC + 1
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup tables: m arrays of ks subspace distances (same kernel
    * arithmetic as [[encode]], all candidates retained).
    */
  def lut(v: ArrayData, cbFlat: Array[Double], m: Int, sub: Int,
          isFloat: Boolean): ArrayData = {
    if (v == null) return null
    val dim = m * sub
    if (v.numElements() != dim) return null
    val ks = cbFlat.length / dim
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val dists = new Array[Double](ks)
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val x = get(v, j * sub + d, isFloat) - cbFlat(c * dim + j * sub + d)
          acc += x * x
          d += 1
        }
        dists(c) = acc
        c += 1
      }
      rows(j) = new GenericArrayData(dists)
      j += 1
    }
    new GenericArrayData(rows)
  }
}

/** Shared analysis/codegen plumbing for the unary PQ kernel expressions. */
trait PqKernelExpr extends UnaryExpression {
  def cbFlat: Array[Double]
  def m: Int
  protected def kernelName: String
  protected def kernelMethod: String

  def subWidth: Int

  require(m > 0 && subWidth > 0 && cbFlat.nonEmpty &&
    cbFlat.length % (m * subWidth) == 0,
    s"$kernelName needs a codebook of whole dim-wide codewords " +
      s"(got ${cbFlat.length} values for m=$m, sub=$subWidth)")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$kernelName requires an array<float>/array<double> argument, got " +
        other.simpleString)
  }

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    evalKernel(input.asInstanceOf[ArrayData])

  protected def evalKernel(v: ArrayData): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cbRef = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
      s"""
         |${ev.value} = graft.plans.PqKernels.$kernelMethod(
         |  $c, $cbRef, $m, $subWidth, $elemIsFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
}

/** See [[PqKernels.encode]]. */
case class PqEncode(child: Expression, cbFlat: Array[Double], m: Int,
                    subWidth: Int) extends PqKernelExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def kernelName: String = "pq_encode"
  override protected def kernelMethod: String = "encode"
  override protected def evalKernel(v: ArrayData): Any =
    PqKernels.encode(v, cbFlat, m, subWidth, elemIsFloat)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** See [[PqKernels.lut]]. */
case class PqAdcLut(child: Expression, cbFlat: Array[Double], m: Int,
                    subWidth: Int) extends PqKernelExpr {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_lut"
  override protected def kernelName: String = "pq_adc_lut"
  override protected def kernelMethod: String = "lut"
  override protected def evalKernel(v: ArrayData): Any =
    PqKernels.lut(v, cbFlat, m, subWidth, elemIsFloat)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqEncode {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pqEncode(v: Column, cb: Array[Array[Double]], m: Int): Column = {
    val dim = cb.head.length
    require(dim % m == 0, s"pq_encode: dim $dim not divisible by m=$m")
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v),
      cb.flatten, m, dim / m))
  }

  def pqAdcLut(v: Column, cb: Array[Array[Double]], m: Int): Column = {
    val dim = cb.head.length
    require(dim % m == 0, s"pq_adc_lut: dim $dim not divisible by m=$m")
    ColumnBridge.column(PqAdcLut(ColumnBridge.expression(v),
      cb.flatten, m, dim / m))
  }
}
