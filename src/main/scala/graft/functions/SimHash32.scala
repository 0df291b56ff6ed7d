package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash as ONE native aggregate: input is a 32-hex-digit hash per
  * element (md5 of a shingle); the 32-bit fingerprint sets bit i iff the
  * +1/−1 vote of hex digit i (≥ '8') summed over the group is positive.
  *
  * Semantically identical to the declarative 32-column formulation
  * (`sum(when(substring(h, i+1, 1) >= "8", 1).otherwise(-1))` × 32, then a
  * bit-fold) — proven by the shared q14/q47 oracles — but with ONE int[32]
  * aggregation buffer instead of 32 separate sum buffers and 32 substring
  * expressions per row: one pass over the bytes per input, partial buffers
  * merge by vector addition (map-side combine preserved). Votes compare
  * raw ASCII bytes, which for single hex chars equals UTF8String/substring
  * ordering.
  *
  * This is the third Catalyst extension kind in the repo, alongside the
  * codegen scalar [[FloatDotQ]] and the optimizer rule
  * [[graft.plans.RewriteFloatDotProduct]].
  */
case class SimHash32(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash32"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string (hex digest) argument, got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](32)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    // Exactly the declarative semantics for the FULL input domain:
    // `when(substring(h, i+1, 1) >= "8", 1).otherwise(-1)` votes −1 when
    // the comparison is null (null input) or false ("" for positions past
    // the end) — so a null row and every missing position vote −1, never
    // abstain.
    val v = child.eval(input).asInstanceOf[UTF8String]
    val bytes = if (v == null) Array.emptyByteArray else v.getBytes
    var i = 0
    while (i < 32) {
      if (i < bytes.length && bytes(i) >= '8') buf(i) += 1 else buf(i) -= 1
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 32) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var i = 0
    while (i < 32) { if (buf(i) > 0) fp |= 1L << i; i += 1 }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(128)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(32)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHash32 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHash32 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
