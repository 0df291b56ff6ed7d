package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Size-capped distinct-set aggregate over int64 keys: the group's distinct
  * values as a SORTED array, or NULL once the distinct count exceeds `cap`.
  *
  * This is the one-pass form of the "DF cap" every inverted-index near-dup
  * pipeline needs (drop stop-shingles before posting lists materialize,
  * q15): semantically identical to the two-pass
  * `HAVING count(*) <= cap` + semi-join + `sort_array(collect_set(...))`
  * formulation — proven by the unchanged q15 oracle — but in ONE
  * aggregation over the input. The buffer is bounded at `cap` longs by
  * construction, and SATURATES: a stop-shingle appearing in 10⁹ documents
  * costs one boolean + an empty buffer from its cap+1-th distinct value
  * on, in the partial aggregate too — map-side combine keeps its memory
  * bound without any pre-filter pass.
  *
  * Inputs are not assumed pre-deduplicated: values are distinct-checked on
  * insert (O(cap) linear probe per row — the cap is small by design) and
  * on merge, exactly like `collect_set`. Null inputs are skipped
  * (`collect_set` semantics).
  */
case class CappedLongSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongSet.Buffer]
    with UnaryLike[Expression] {

  require(cap > 0, "cap must be positive")

  override def prettyName: String = "capped_long_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): CappedLongSet.Buffer =
    new CappedLongSet.Buffer(false, ArrayBuffer.empty)

  private def insert(buf: CappedLongSet.Buffer, v: Long): Unit = {
    if (buf.saturated || buf.items.contains(v)) return
    if (buf.items.size >= cap) {
      buf.saturated = true
      buf.items.clear() // free immediately — saturated groups hold nothing
    } else buf.items += v
  }

  override def update(buf: CappedLongSet.Buffer, input: InternalRow): CappedLongSet.Buffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CappedLongSet.Buffer, other: CappedLongSet.Buffer): CappedLongSet.Buffer = {
    if (other.saturated) { buf.saturated = true; buf.items.clear() }
    else other.items.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: CappedLongSet.Buffer): Any =
    if (buf.saturated) null
    else new GenericArrayData(buf.items.sorted.toArray)

  override def serialize(buf: CappedLongSet.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.items.size)
    bb.put(if (buf.saturated) 1.toByte else 0.toByte)
    bb.putInt(buf.items.size)
    buf.items.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongSet.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val sat = bb.get() == 1.toByte
    val n = bb.getInt
    new CappedLongSet.Buffer(sat, ArrayBuffer.fill(n)(bb.getLong))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedLongSet =
    copy(child = newChild)
}

object CappedLongSet {
  /** Mutable aggregation state: `saturated` latches once the distinct
    * count exceeds the cap; `items` is empty from that point on.
    */
  final class Buffer(var saturated: Boolean, val items: ArrayBuffer[Long])
}
