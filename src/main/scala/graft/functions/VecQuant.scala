package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** The ANN quantization family's array-native kernel (r15 optimization,
  * guide §2.3 "shuffle fewer bytes" / §1.2 "the distributed algorithm"):
  * the learned-quantizer pipelines (q88/q92/q94) historically exploded
  * every 64-dim embedding into 64 (vec_id, pos, vq) rows and rebuilt each
  * distance as a join-on-pos + groupBy sum — 64× the rows and one shuffle
  * per distance pass. These three expressions keep vectors as arrays:
  *
  *  - [[QuantizeVec]]: `array<float>` → `array<long>` on the 1e6 grid —
  *    elementwise `floor(CAST(x AS DOUBLE) * 1000000.0)`, bit-identical
  *    to the exploded form's per-row expression;
  *  - [[SqDistQ]]: exact BIGINT squared distance Σ(a[i]−b[i])² — the sum
  *    the exploded form computed with a groupBy; integer addition is
  *    order-independent, so the value is bit-identical;
  *  - [[VecSumL]]: elementwise BIGINT vector-sum aggregate — the Lloyd
  *    update's per-dimension `sum(vq)` in ONE buffer instead of 64 rows.
  *
  * All follow [[FloatDotQ]]'s discipline: whole-stage-codegen scalar loops
  * (no boxing, no interpreted lambdas), exact integer arithmetic for
  * cross-engine oracle equality. Arrays are treated as DENSE (no null
  * elements) — embeddings are non-null by construction, as FloatDotQ
  * already assumes.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(x.getFloat(i).toDouble * 1000000.0).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (long) java.lang.Math.floor(
         |    ((double) $a.getFloat($i)) * 1000000.0D);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact BIGINT squared euclidean distance of two long arrays:
  * `sum_i (a[i]-b[i])^2` over the first min(|a|,|b|) elements.
  */
case class SqDistQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sqdist_q"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Elementwise sum of `array<long>` rows — the Lloyd centroid update's 64
  * per-dimension sums in one aggregation buffer (the [[SimHash60]]
  * one-buffer pattern). Buffer width adopts the first row seen; rows of a
  * different width fail loudly (the quantizer never produces them).
  * Returns NULL on an empty group (no members — matches per-pos `sum`'s
  * null-on-empty, though callers always aggregate non-empty groups).
  */
case class VecSumL(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "vec_sum_q"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
  }

  // empty sentinel = "no input yet" (adopts the first row's width)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length == 0) new Array[Long](n) else buf
    require(b.length == n,
      s"$prettyName: mixed array widths in one group (${b.length} vs $n)")
    var i = 0
    while (i < n) { b(i) += arr.getLong(i); i += 1 }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"$prettyName: mixed array widths across partials")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumL =
    copy(child = newChild)
}

/** Elementwise min/max of `array<long>` rows — the SQ8 trainer's 64
  * per-dimension ranges (q159/q164) in one aggregation buffer instead of a
  * 64-row-per-vector explode + per-pos min/max groupBy. `isMin` selects
  * the reduction; [[VecSumL]]'s buffer discipline (adopt first width, fail
  * loudly on a mismatch, NULL on an empty group) carries over unchanged.
  */
case class VecExtremeL(
    child: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = if (isMin) "vec_min_q" else "vec_max_q"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
  }

  @inline private def pick(a: Long, b: Long): Long =
    if (isMin) math.min(a, b) else math.max(a, b)

  // empty sentinel = "no input yet" (adopts the first row's values)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.length == 0) {
      val b = new Array[Long](n)
      var i = 0
      while (i < n) { b(i) = arr.getLong(i); i += 1 }
      return b
    }
    require(buf.length == n,
      s"$prettyName: mixed array widths in one group (${buf.length} vs $n)")
    var i = 0
    while (i < n) { buf(i) = pick(buf(i), arr.getLong(i)); i += 1 }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"$prettyName: mixed array widths across partials")
    var i = 0
    while (i < buf.length) { buf(i) = pick(buf(i), other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecExtremeL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecExtremeL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecExtremeL =
    copy(child = newChild)
}

/** SQ8 encode+dequantize in one elementwise pass (q159/q164):
  * `dec[i] = mn[i] + (code[i]·span) div 255` with
  * `code[i] = ((vq[i]−mn[i])·255) div span` (0 when `span = 0`),
  * `span = mx[i]−mn[i]`. Bit-identical to the exploded per-pos SQL
  * (`CASE WHEN span = 0 …` + `div`): every operand is nonnegative
  * (mn/mx are the corpus per-dimension extremes, so vq−mn ≥ 0 and
  * span ≥ 0), hence Java's truncating `/` ≡ SQL's `div` ≡ DuckDB's `//`.
  */
case class Sq8Dec(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with TernaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sq8_dec"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (Seq(first, second, third).forall(e => isLongArray(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires three array<bigint> arguments (vq, mn, mx), got " +
          s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val vq = a.asInstanceOf[ArrayData]
    val mn = b.asInstanceOf[ArrayData]
    val mx = c.asInstanceOf[ArrayData]
    val n = vq.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val m = mn.getLong(i)
      val span = mx.getLong(i) - m
      val code = if (span == 0L) 0L else (vq.getLong(i) - m) * 255L / span
      out(i) = m + code * span / 255L
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val span = ctx.freshName("span")
      val code = ctx.freshName("code")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $m = $b.getLong($i);
         |  long $span = $c.getLong($i) - $m;
         |  long $code = ($span == 0L) ? 0L : ($a.getLong($i) - $m) * 255L / $span;
         |  $out[$i] = $m + $code * $span / 255L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
