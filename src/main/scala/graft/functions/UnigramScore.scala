package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family, Kudo ACL'18) Viterbi segmentation of
  * ONE word as a native codegen expression: given a vocabulary of pieces
  * with INTEGER scores (quantized log-probs, trained offline) and a
  * per-code-point unknown floor, find the segmentation maximizing total
  * score (ties → fewest pieces) and return `[best_score, piece_count]`.
  *
  * Returning the optimal VALUE rather than the piece sequence is what
  * makes the operator cross-engine exact: the max-(score, −count) value
  * is unique even when several segmentations achieve it, so no
  * tie-breaking rule has to be replicated in the oracle — DuckDB re-runs
  * the same DP as a recursive CTE over integer arithmetic and must land
  * on the identical pair.
  *
  * The DP is O(|word| × maxPieceLen) over a reusable buffer, one virtual
  * call per row inside whole-stage codegen (the FloatDotQ pattern).
  * Symbols are CODE POINTS (matching SQL `substr`), so supplementary
  * characters count as one unit in both engines. The intended plan shape
  * feeds DISTINCT words (vocabulary-sized), never the token stream —
  * q70's collapse-before-the-expensive-step discipline.
  */
case class UnigramScore(child: Expression, pieces: Seq[(String, Long)],
    unkScore: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_score"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.simpleString)

  // Boxed values on purpose: a primitive-typed Scala map would silently
  // unbox a missing key's null to 0 — scoring unknown pieces as free.
  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1
    else math.max(1, pieces.map(p => p._1.codePointCount(0, p._1.length)).max)

  override def nullSafeEval(input: Any): Any =
    scoreRow(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it through the referenced object. */
  def scoreRow(s: UTF8String): ArrayData = {
    val w = s.toString
    // code-point boundaries: cp(i) = UTF-16 offset of code point i
    val n = w.codePointCount(0, w.length)
    val cp = new Array[Int](n + 1)
    var i = 0
    var off = 0
    while (i < n) { cp(i) = off; off = w.offsetByCodePoints(off, 1); i += 1 }
    cp(n) = w.length
    // DP: bs(p) = best score over the first p code points; bc(p) = piece
    // count of that best (ties resolved to the minimum count — additive,
    // so lexicographic (score, −count) keeps optimal substructure)
    val bs = new Array[Long](n + 1)
    val bc = new Array[Long](n + 1)
    var p = 1
    while (p <= n) {
      var bestS = Long.MinValue
      var bestC = Long.MaxValue
      var len = 1
      val lim = math.min(p, maxLen)
      while (len <= lim) {
        val piece = w.substring(cp(p - len), cp(p))
        val sc = vocab.get(piece)
        val scored: java.lang.Long =
          if (sc != null) sc
          else if (len == 1) java.lang.Long.valueOf(unkScore)
          else null
        if (scored != null) {
          val cs = bs(p - len) + scored.longValue()
          val cc = bc(p - len) + 1L
          if (cs > bestS || (cs == bestS && cc < bestC)) {
            bestS = cs; bestC = cc
          }
        }
        len += 1
      }
      bs(p) = bestS
      bc(p) = bestC
      p += 1
    }
    new GenericArrayData(Array[Any](bs(n), bc(n)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigram", this, classOf[UnigramScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scoreRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramScore {
  /** Parse the SQL-literal vocab spec `"piece:score,piece:score|unk:floor"`.
    * Pieces MAY contain the separators (`:`/`,`/`|` are legal vocabulary
    * fragments — ADVICE r7 caught the old parser silently mis-splitting
    * them): escape as `\:` / `\,` / `\|` (`\\` for a backslash). Scores
    * are numbers, so the piece/score cut is the LAST unescaped colon.
    */
  def parseSpec(spec: String): (Seq[(String, Long)], Long) = {
    val parts = SpecFormat.splitKeepEscapes(spec, '|')
    require(parts.length == 2 && parts(1).startsWith("unk:"),
      s"unigram spec must be 'p:s,p:s|unk:floor', got '$spec'")
    val ps = SpecFormat.splitKeepEscapes(parts(0), ',')
      .filter(_.nonEmpty).map { kv =>
        val i = SpecFormat.lastUnescaped(kv, ':')
        require(i > 0, s"bad piece entry '$kv' (escape a literal ':' in a " +
          "piece as '\\:')")
        (SpecFormat.unescape(kv.substring(0, i)), kv.substring(i + 1).toLong)
      }
    (ps, parts(1).stripPrefix("unk:").toLong)
  }
}
