package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization support for text pipelines: web-crawled corpora
  * mix composed (é, U+00E9) and decomposed (e + U+0301) forms of the same
  * text, which breaks exact dedup, token equality, and fingerprint joins.
  * Normalizing to NFC before hashing/deduping is the standard first pass.
  */
object StringImpl {
  /** NFC-normalize a UTF8String. The String round-trip is unavoidable
    * (java.text.Normalizer works on CharSequence), but the call stays a
    * single static hop inside whole-stage codegen — no UDF serialization,
    * no Row boxing. Returns the input object unchanged when already
    * normalized (the common case — zero allocation).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)` → the NFC (canonical composition) form of `str`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override protected def nullSafeEval(s: Any): Any =
    StringImpl.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringImpl.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object StringExprs {
  def nfcNormalize(s: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(s)))
}
