package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical raw filesystem path of `_metadata.file_path` — the tagged-
  * read key every deletion-vector scan computes per row. Semantically
  * identical to the SQL chain
  * `url_decode(regexp_replace(regexp_replace(p, "^file:/+", "/"), "\\+", "%2B"))`
  * (scheme stripped, %XX percent-decoded, '+' preserved), but:
  *
  *  - one tight byte loop instead of two regex engines + URLDecoder
  *    (r15 measured the SQL chain at +50% on a 150k-row tagged scan);
  *  - a LAST-VALUE cache: `file_path` is constant within a file split,
  *    so after the first row of a split the decode is one UTF8String
  *    equality check (memcmp) — per-row cost collapses to ~0.
  *
  * Malformed %XX throws IllegalArgumentException, matching url_decode's
  * error contract (Spark paths are always well-formed).
  */
case class CanonicalPath(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_path"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  @transient private var lastIn: UTF8String = _
  @transient private var lastOut: UTF8String = _

  override def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[UTF8String]
    if (lastIn != null && lastIn.equals(in)) return lastOut
    val out = CanonicalPath.decode(in)
    // clone: the input buffer may be reused by the scanner across rows
    lastIn = in.clone()
    lastOut = out
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lastInRef = ctx.addMutableState("UTF8String", "canonLastIn")
    val lastOutRef = ctx.addMutableState("UTF8String", "canonLastOut")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($lastInRef != null && $lastInRef.equals($a)) {
         |  ${ev.value} = $lastOutRef;
         |} else {
         |  ${ev.value} = graft.functions.CanonicalPath.decode($a);
         |  $lastInRef = $a.clone();
         |  $lastOutRef = ${ev.value};
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CanonicalPath {

  /** Strip a leading `file:/+` to `/`, then percent-decode %XX byte
    * sequences (UTF-8 composes byte-wise, so decoding bytes is exact).
    * '+' passes through — URI paths never encode space as '+', which is
    * why the SQL chain pre-escaped it before url_decode.
    */
  def decode(in: UTF8String): UTF8String = {
    val bytes = in.getBytes
    var start = 0
    if (bytes.length >= 6 &&
        bytes(0) == 'f' && bytes(1) == 'i' && bytes(2) == 'l' &&
        bytes(3) == 'e' && bytes(4) == ':' && bytes(5) == '/') {
      start = 5 // position of the first '/'
      var i = 6
      while (i < bytes.length && bytes(i) == '/') i += 1
      start = i - 1 // keep exactly one '/'
    }
    var hasPct = false
    var i = start
    while (i < bytes.length && !hasPct) {
      if (bytes(i) == '%') hasPct = true
      i += 1
    }
    if (!hasPct) return UTF8String.fromBytes(bytes, start, bytes.length - start)
    val out = new Array[Byte](bytes.length - start)
    var o = 0
    i = start
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '%') {
        if (i + 2 >= bytes.length)
          throw new IllegalArgumentException(
            s"malformed percent escape in path: $in")
        val hi = hexVal(bytes(i + 1))
        val lo = hexVal(bytes(i + 2))
        if (hi < 0 || lo < 0)
          throw new IllegalArgumentException(
            s"malformed percent escape in path: $in")
        out(o) = ((hi << 4) | lo).toByte
        o += 1
        i += 3
      } else {
        out(o) = b
        o += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private def hexVal(b: Byte): Int = b match {
    case c if c >= '0' && c <= '9' => c - '0'
    case c if c >= 'a' && c <= 'f' => c - 'a' + 10
    case c if c >= 'A' && c <= 'F' => c - 'A' + 10
    case _ => -1
  }
}
