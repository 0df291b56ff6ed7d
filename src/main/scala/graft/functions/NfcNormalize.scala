package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the text
  * hygiene pass an LLM corpus needs before tokenization/dedup: visually
  * identical strings with different code-point sequences (decomposed
  * accents, legacy combining forms — the classic scrape artifacts) hash
  * and shingle DIFFERENTLY, so un-normalized corpora under-dedup and
  * fragment token statistics. NFC is the W3C-recommended canonical form.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that succeeds
  * immediately for ASCII and already-composed text (the overwhelming
  * majority of real corpora), returning the INPUT UTF8String with zero
  * allocation — the expensive compose pass runs only on rows that
  * actually need it. Per-row, zero shuffle, one virtual call from inside
  * whole-stage codegen (the FloatDotQ/addReferenceObj pattern).
  * SQL-callable as `nfc_normalize(text)` — same name as DuckDB's, which
  * is what lets q134's oracle value-prove Java's normalizer against
  * utf8proc's engine-against-engine.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.simpleString)

  override def nullSafeEval(input: Any): Any =
    normalizeRow(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it through the referenced object. */
  def normalizeRow(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.normalizeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
