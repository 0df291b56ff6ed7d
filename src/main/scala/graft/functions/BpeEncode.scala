package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document BPE encoding as ONE native Catalyst expression:
  * `lower(trim(text))`, whitespace-split, per-word character symbols, then
  * every learned merge applied in order as a left-to-right non-overlapping
  * pass — the exact semantics of [[graft.operators.Bpe.applyMerge]]'s SQL
  * fold, value-proven equal by BpeSpec.
  *
  * Exists because the fold form is structurally quadratic per merge: SQL
  * `aggregate` rebuilds the accumulator array on every element
  * (`concat(acc, array(s))` copies acc), so a word of L symbols costs
  * O(L²) array copies per merge, interpreted — and the whole document
  * column pays it once per merge in the learned list. This expression does
  * the same merges imperatively over one reusable symbol buffer: O(L) per
  * merge, zero allocation per step, one virtual call per row from inside
  * whole-stage codegen (q118's 4-merge encode over sf0.1: 9.6 s → sub-
  * second). Encoding stays embarrassingly per-row — nothing shuffles at
  * any corpus size.
  *
  * Symbols are CODE POINTS (matching SQL `substring(w, i, 1)` and the
  * DuckDB oracle's `substr`), words come from the engine's own
  * `UTF8String.split/trim/toLowerCase`, so results are bit-identical to
  * the SQL pipeline they replace.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.simpleString)

  @transient private lazy val splitPat = UTF8String.fromString("\\s+")
  @transient private lazy val mergeA = merges.map(_._1).toArray
  @transient private lazy val mergeB = merges.map(_._2).toArray
  @transient private lazy val mergeAB =
    merges.map { case (a, b) => a + b }.toArray

  override def nullSafeEval(input: Any): Any =
    encodeRow(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it through the referenced
    * expression object (the FloatDotQ/addReferenceObj pattern).
    */
  def encodeRow(s: UTF8String): ArrayData = {
    val words = s.trim().toLowerCase().split(splitPat, -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // reusable symbol buffer: grown to the longest word seen, never per-step
    var syms = new Array[String](16)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi).toString
      if (w.nonEmpty) {
        // split into code-point symbols
        val cps = w.codePointCount(0, w.length)
        if (syms.length < cps) syms = new Array[String](cps)
        var n = 0
        var off = 0
        while (off < w.length) {
          val next = w.offsetByCodePoints(off, 1)
          syms(n) = w.substring(off, next)
          n += 1
          off = next
        }
        // each merge: one in-place left-to-right non-overlapping pass,
        // replicating the fold "if last == a && cur == b then last = ab"
        var mi = 0
        while (mi < mergeA.length) {
          val a = mergeA(mi); val b = mergeB(mi); val ab = mergeAB(mi)
          var outN = 0
          var i = 0
          while (i < n) {
            val cur = syms(i)
            if (outN > 0 && syms(outN - 1) == a && cur == b)
              syms(outN - 1) = ab
            else { syms(outN) = cur; outN += 1 }
            i += 1
          }
          n = outN
          mi += 1
        }
        var i = 0
        while (i < n) { out += UTF8String.fromString(syms(i)); i += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
