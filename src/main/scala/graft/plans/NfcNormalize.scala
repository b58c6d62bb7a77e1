package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen Expression — the first
  * step of any text-normalization pipeline over web-scale corpora (the
  * same byte sequence can arrive precomposed U+00E9 or decomposed
  * e+U+0301; exact dedup, shingling, and tokenization all need ONE
  * canonical form). Spark has no built-in for it, and a Scala UDF would
  * break whole-stage codegen on the hottest projection in the pipeline;
  * this stays inside codegen and fast-paths the common case: ASCII and
  * already-normalized strings return the INPUT UTF8String unchanged (no
  * transcode, no allocation) via `Normalizer.isNormalized`.
  *
  * Mirrors DuckDB's `nfc_normalize` (both implement Unicode NFC, so the
  * oracle comparison is exact). NULL in → NULL out.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = child.dataType // StringType, collation-preserving
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NfcNormalize.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.Column

  /** The kernel, static so generated code can call it directly (Scala 2.13
    * emits a static forwarder on the companion class). Pure-ASCII input —
    * the dominant case in a web corpus — returns the input UTF8String off a
    * byte scan with NO UTF-16 transcode or allocation; only strings with
    * non-ASCII bytes pay the toString + `isNormalized` check, and only
    * actually-denormalized ones pay the recompose.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  /** Function descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    {
      case Seq(a) => NfcNormalize(a)
      case other => throw new IllegalArgumentException(
        s"nfc_normalize requires exactly 1 argument, got ${other.length}")
    })

  /** Column-API entry point (ColumnBridge hops Spark 4's split Column API). */
  def nfcNormalize(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  }
}
