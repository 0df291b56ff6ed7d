package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg's `bucket[N]` partition-transform hash, exactly as the
  * published Iceberg table spec defines it (spec "Appendix B: 32-bit
  * Hash Requirements"): `bucket = (murmur3_x86_32(encode(v)) &
  * Integer.MAX_VALUE) % N` with the spec's type encodings —
  * int/long/date/timestamp widen to LONG and hash its 8-byte
  * LITTLE-ENDIAN form, strings hash their UTF-8 bytes, decimals hash
  * the minimal two's-complement BIG-endian bytes of the unscaled value,
  * binary hashes raw bytes. Seed 0.
  *
  * This is NOT Spark's `hash()` (Murmur3 seed 42 over Spark's internal
  * encodings) — the two agree on nothing, which is why
  * [[graft.sources.interop.IcebergExport]] historically refused to
  * declare `bucket` specs: a reader probing with the wrong hash silently
  * drops rows. With the spec's own hash available as a native
  * expression, a table hidden-partitioned by `iceberg_bucket(N, col)`
  * lays out files exactly where an Iceberg reader expects them, so the
  * export can declare the bucket spec honestly and engine-side reads
  * still prune through the same function (CommitLog.transformPrune).
  *
  * Scale: one tight branch-free hash over ≤ a few bytes per row, inside
  * whole-stage codegen — partition derivation rides the write scan.
  */
object IcebergHash {

  /** murmur3_x86_32 (public algorithm), seed 0 per the Iceberg spec. */
  def murmur3(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val len = data.length
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date/timestamp hash: the LONG value's 8 little-endian
    * bytes (ints WIDEN first — the spec's rule, so int 34 and long 34
    * land in the same bucket across schema evolution).
    */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b, 0)
  }

  def hashBytes(b: Array[Byte]): Int = murmur3(b, 0)

  /** decimal: minimal two's-complement big-endian unscaled bytes —
    * exactly `BigInteger.toByteArray`.
    */
  def hashDecimal(d: java.math.BigDecimal): Int =
    murmur3(d.unscaledValue.toByteArray, 0)

  def bucketOf(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  // typed entry points shared by interpreted eval, codegen, and the
  // manifest-prune probe
  def bucketLong(v: Long, n: Int): Int = bucketOf(hashLong(v), n)
  def bucketUtf8(s: UTF8String, n: Int): Int = bucketOf(hashBytes(s.getBytes), n)
  def bucketString(s: String, n: Int): Int =
    bucketOf(hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)), n)
  def bucketBytes(b: Array[Byte], n: Int): Int = bucketOf(hashBytes(b), n)
  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, n: Int): Int =
    bucketOf(hashDecimal(d.toJavaBigDecimal), n)

  /** The probe face: bucket of an EXTERNAL value under its Spark type —
    * what transformPrune computes from a query literal to decide which
    * partition directories can hold it. Must equal what the expression
    * computed at write for the same value (IcebergBucketSpec pins both
    * against the spec's published test vectors).
    */
  def bucketOfValue(v: Any, dt: DataType, n: Int): Option[Int] = (dt, v) match {
    case (_, null) => None
    case (IntegerType | LongType | ShortType | ByteType, x: Number) =>
      Some(bucketLong(x.longValue(), n))
    case (DateType, d: java.sql.Date) => Some(bucketLong(d.toLocalDate.toEpochDay, n))
    case (DateType, d: java.time.LocalDate) => Some(bucketLong(d.toEpochDay, n))
    case (DateType, d: java.lang.Integer) => Some(bucketLong(d.longValue(), n))
    case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
      // floorDiv, not /: for pre-1970 fractional seconds getTime is
      // negative and truncation-toward-zero would land one second above
      // the micros the write-side expression hashed (silent over-prune).
      Some(bucketLong(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000, n))
    case (TimestampType, t: java.time.Instant) =>
      Some(bucketLong(t.getEpochSecond * 1000000L + t.getNano / 1000, n))
    case (TimestampType | TimestampNTZType, t: java.lang.Long) =>
      Some(bucketLong(t.longValue(), n))
    case (StringType, s: String) => Some(bucketString(s, n))
    case (StringType, s: UTF8String) => Some(bucketUtf8(s, n))
    case (BinaryType, b: Array[Byte]) => Some(bucketBytes(b, n))
    case (dt: DecimalType, d: java.math.BigDecimal) =>
      // The spec hashes the unscaled value AT THE TYPE'S SCALE; a pushed
      // literal at its own scale (14.2 vs DECIMAL(9,2)) would hash 142
      // where derive() wrote 1420. Rescale exactly; a literal that can't
      // be represented at the column scale matches no stored value, but
      // we conservatively keep the file (None) rather than prune.
      try Some(bucketOf(hashDecimal(d.setScale(dt.scale, java.math.RoundingMode.UNNECESSARY)), n))
      catch { case _: ArithmeticException => None }
    case (dt: DecimalType, d: Decimal) =>
      bucketOfValue(d.toJavaBigDecimal, dt, n)
    case _ => None
  }
}

/** `iceberg_bucket(N, col)` as a native codegen expression (registered
  * by [[graft.plans.GraftExtensions]]). Null in → null out; N must be a
  * positive INT literal (enforced at registration).
  */
case class IcebergBucket(n: Int, child: Expression) extends UnaryExpression {
  require(n > 0, "iceberg_bucket needs N > 0")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | ShortType | ByteType | DateType |
        TimestampType | TimestampNTZType | StringType | BinaryType |
        _: DecimalType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports int/long/date/timestamp/string/binary/decimal, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | ShortType | ByteType =>
      IcebergHash.bucketLong(v.asInstanceOf[Number].longValue(), n)
    case DateType => IcebergHash.bucketLong(v.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergHash.bucketLong(v.asInstanceOf[Long], n)
    case StringType => IcebergHash.bucketUtf8(v.asInstanceOf[UTF8String], n)
    case BinaryType => IcebergHash.bucketBytes(v.asInstanceOf[Array[Byte]], n)
    case _: DecimalType => IcebergHash.bucketDecimal(v.asInstanceOf[Decimal], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = "graft.functions.IcebergHash"
      val call = child.dataType match {
        case IntegerType | ShortType | ByteType | DateType =>
          s"$h.bucketLong((long) $c, $n)"
        case LongType | TimestampType | TimestampNTZType =>
          s"$h.bucketLong($c, $n)"
        case StringType => s"$h.bucketUtf8($c, $n)"
        case BinaryType => s"$h.bucketBytes($c, $n)"
        case _: DecimalType => s"$h.bucketDecimal($c, $n)"
      }
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
