package graft.functions

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** [[IcebergHash]] pinned against the Iceberg table spec's OWN published
  * test vectors (spec "Appendix B: 32-bit Hash Requirements" — the table
  * of `hash(value)` results every conforming implementation must
  * reproduce), plus codegen/interpreted/probe three-way agreement for
  * the `iceberg_bucket` expression. A wrong hash here is not a wrong
  * number — it is silent row loss in every Iceberg reader that prunes a
  * bucket layout this engine wrote.
  */
class IcebergBucketSpec extends SparkTestBase {

  test("the spec's published hash vectors reproduce exactly") {
    // int and long 34 — ints widen to long before hashing (the spec's
    // rule, so bucket assignment survives int→long schema evolution)
    assert(IcebergHash.hashLong(34L) == 2017239379)
    // decimal 14.20 → minimal two's-complement big-endian of 1420
    assert(IcebergHash.hashDecimal(new java.math.BigDecimal("14.20"))
      == -500754589)
    // date 2017-11-16 → 17486 days from epoch, hashed as long
    assert(java.time.LocalDate.of(2017, 11, 16).toEpochDay == 17486L)
    assert(IcebergHash.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 → 1510871468000000 micros
    assert(IcebergHash.hashLong(1510871468000000L) == -2047944441)
    // string "iceberg" → UTF-8 bytes
    assert(IcebergHash.hashBytes("iceberg".getBytes("UTF-8")) == 1210000089)
    // fixed/binary 00 01 02 03
    assert(IcebergHash.hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
    // bucket = (hash & Integer.MAX_VALUE) % N
    assert(IcebergHash.bucketOf(-653330422, 16)
      == ((-653330422 & Integer.MAX_VALUE) % 16))
  }

  test("iceberg_bucket: codegen, interpreted eval, and the prune probe " +
      "agree for every supported type") {
    // through SQL (whole-stage codegen path)
    def sql1(e: String): Int =
      spark.sql(s"SELECT iceberg_bucket(16, $e)").collect()(0).getInt(0)
    assert(sql1("CAST(34 AS INT)") == IcebergHash.bucketLong(34L, 16))
    assert(sql1("CAST(34 AS BIGINT)") == IcebergHash.bucketLong(34L, 16))
    assert(sql1("'iceberg'") == IcebergHash.bucketString("iceberg", 16))
    assert(sql1("DATE'2017-11-16'") == IcebergHash.bucketLong(17486L, 16))
    assert(sql1("TIMESTAMP'2017-11-16 22:31:08'")
      == IcebergHash.bucketLong(1510871468000000L, 16))
    assert(sql1("CAST(14.20 AS DECIMAL(9,2))") == IcebergHash.bucketOf(
      IcebergHash.hashDecimal(new java.math.BigDecimal("14.20")), 16))
    assert(sql1("X'00010203'")
      == IcebergHash.bucketBytes(Array[Byte](0, 1, 2, 3), 16))
    // int widening: int 34 and long 34 share a bucket
    assert(sql1("CAST(34 AS INT)") == sql1("CAST(34 AS BIGINT)"))
    // null in → null out
    assert(spark.sql("SELECT iceberg_bucket(16, CAST(NULL AS INT))")
      .collect()(0).isNullAt(0))

    // interpreted eval (no codegen) agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    def interp(v: Any, dt: DataType): Int =
      IcebergBucket(16, Literal.create(v, dt)).eval(null).asInstanceOf[Int]
    assert(interp(34, IntegerType) == IcebergHash.bucketLong(34L, 16))
    assert(interp(UTF8String.fromString("iceberg"), StringType)
      == IcebergHash.bucketString("iceberg", 16))

    // the probe face (what transformPrune computes from query literals)
    assert(IcebergHash.bucketOfValue(34L, LongType, 16)
      .contains(IcebergHash.bucketLong(34L, 16)))
    assert(IcebergHash.bucketOfValue("iceberg", StringType, 16)
      .contains(IcebergHash.bucketString("iceberg", 16)))
    assert(IcebergHash.bucketOfValue(
      java.sql.Date.valueOf("2017-11-16"), DateType, 16)
      .contains(IcebergHash.bucketLong(17486L, 16)))
    assert(IcebergHash.bucketOfValue(null, LongType, 16).isEmpty)

    // unsupported type fails at ANALYSIS, not with garbage buckets
    val err = intercept[Exception] {
      spark.sql("SELECT iceberg_bucket(4, array(1, 2))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("iceberg_bucket"))
  }

  test("probe: pre-1970 fractional-second timestamps floor to the " +
      "write-side micros (no off-by-one-second over-prune)") {
    // 1969-12-31 23:59:59.5 UTC = -500ms epoch → -500000 micros. A
    // truncating getTime/1000 would compute 0*1e6 + 500000 = +500000 —
    // one full second above the micros the write expression hashed, so
    // the probe would prune the file actually holding the row.
    val ts = new java.sql.Timestamp(-500L) // getTime -500, nanos 500000000
    assert(ts.getNanos == 500000000)
    val want = spark.sql(
      "SELECT iceberg_bucket(16, TIMESTAMP'1969-12-31 23:59:59.5')")
      .collect()(0).getInt(0)
    assert(IcebergHash.bucketOfValue(ts, TimestampType, 16).contains(want))
    // and the direct micros identity
    assert(IcebergHash.bucketOfValue(ts, TimestampType, 16)
      .contains(IcebergHash.bucketLong(-500000L, 16)))
  }

  test("probe: decimal literals rescale to the column's declared scale " +
      "before hashing (spec: unscaled value under the type's scale)") {
    // 14.2 pushed against DECIMAL(9,2): unscaled must be 1420, not 142
    val d = new java.math.BigDecimal("14.2")
    assert(IcebergHash.bucketOfValue(d, DecimalType(9, 2), 16)
      .contains(IcebergHash.bucketOf(
        IcebergHash.hashDecimal(new java.math.BigDecimal("14.20")), 16)))
    // a wider-scale literal that IS representable at the column scale
    assert(IcebergHash.bucketOfValue(new java.math.BigDecimal("14.2000"),
      DecimalType(9, 2), 16)
      .contains(IcebergHash.bucketOf(
        IcebergHash.hashDecimal(new java.math.BigDecimal("14.20")), 16)))
    // non-representable at the column scale → None (keep the file;
    // never a wrong bucket)
    assert(IcebergHash.bucketOfValue(new java.math.BigDecimal("14.205"),
      DecimalType(9, 2), 16).isEmpty)
  }
}
