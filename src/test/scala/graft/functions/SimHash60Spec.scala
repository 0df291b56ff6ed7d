package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimHash60Spec extends SparkTestBase {

  // The declarative twin: digit d (substring position d+1) carries bits
  // 4*(14-d)+3 .. 4*(14-d) of H (first-15-hex-digits alignment); per-bit
  // vote is ±1, missing/null digits vote −1 (conv(null/'') is null/0 —
  // both fall to the otherwise(-1) / zero-bit branch, matching the
  // native aggregate's -1-for-missing rule).
  private def declVotes: Seq[Column] = (0 until 60).map { i =>
    val d = 14 - i / 4
    val b = i % 4
    val nib = conv(substring(col("h"), d + 1, 1), 16, 10).cast("int")
    sum(when(shiftright(nib, b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
      .as(s"s$i")
  }

  private def declFold: Column = (0 until 60)
    .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
    .reduce(_ + _)

  test("simhash60 ≡ the declarative 60-column per-bit vote formulation") {
    GraftFunctions.register(spark)
    // many groups, multi-partition input → partial buffers + merges
    val d = spark.range(2000)
      .select((col("id") % 37).as("g"), md5(col("id").cast("string")).as("h"))
      .repartition(7)
    val native = d.groupBy("g")
      .agg(call_function("simhash60", col("h")).as("fp"))
    val declarative = d.groupBy("g").agg(declVotes.head, declVotes.tail: _*)
      .select(col("g"), declFold.as("fp"))
    val joined = native.toDF("g", "fp_n").join(declarative.toDF("g", "fp_d"), "g")
    assert(joined.filter(col("fp_n") =!= col("fp_d")).isEmpty)
    assert(native.count() == 37)
    // 60-bit: the sign bit is never set, fingerprints stay non-negative
    assert(native.filter(col("fp") < 0 || col("fp") >= (1L << 60)).isEmpty)
  }

  test("null and short inputs vote −1 like the declarative form; bad type fails analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    def declarative(d: DataFrame): Long =
      d.groupBy("g").agg(declVotes.head, declVotes.tail: _*)
        .select(declFold.as("fp")).collect()(0).getLong(0)
    def native(d: DataFrame): Long =
      d.groupBy("g").agg(call_function("simhash60", col("h")).as("fp"))
        .collect()(0).getLong(1)
    // a null must vote −1 everywhere, so {null, all-high} cancels to no
    // bits set (votes sum to 0, and only strictly-positive sums set bits)
    val withNull = Seq(Option.empty[String], Some("f" * 32)).toDF("h")
      .select(lit(1).as("g"), col("h"))
    assert(native(withNull) == declarative(withNull))
    assert(native(withNull) == 0L)
    // positions past a short string's end vote −1; the present digits are
    // LEFT-aligned (digit 0 = most significant nibble of H)
    val short = Seq(Some("ffff"), Some("ff")).toDF("h")
      .select(lit(1).as("g"), col("h"))
    assert(native(short) == declarative(short))
    assert(native(short) == (0xffL << 52)) // only the first two digits agree
    intercept[Exception](
      spark.range(1).select(call_function("simhash60", col("id"))).collect())
  }
}
