package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimHash32Spec extends SparkTestBase {

  test("simhash32 ≡ the declarative 32-column vote formulation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // many groups, multi-partition input → partial buffers + merges
    val d = spark.range(2000)
      .select((col("id") % 37).as("g"), md5(col("id").cast("string")).as("h"))
      .repartition(7)
    val native = d.groupBy("g")
      .agg(call_function("simhash32", col("h")).as("fp"))
    val votes = (0 until 32).map(i =>
      sum(when(substring(col("h"), i + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$i"))
    val fpCol = (0 until 32)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    val declarative = d.groupBy("g").agg(votes.head, votes.tail: _*)
      .select(col("g"), fpCol.as("fp"))
    val joined = native.toDF("g", "fp_n").join(declarative.toDF("g", "fp_d"), "g")
    assert(joined.filter(col("fp_n") =!= col("fp_d")).isEmpty)
    assert(native.count() == 37)
  }

  test("null and short inputs vote −1 like the declarative form; bad type fails analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    def declarative(d: org.apache.spark.sql.DataFrame) = {
      val votes = (0 until 32).map(i =>
        sum(when(substring(col("h"), i + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$i"))
      val fpCol = (0 until 32)
        .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
        .reduce(_ + _)
      d.groupBy("g").agg(votes.head, votes.tail: _*)
        .select(fpCol.as("fp")).collect()(0).getLong(0)
    }
    def native(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(call_function("simhash32", col("h")).as("fp"))
        .collect()(0).getLong(1)
    // a null must vote −1 everywhere (when().otherwise(-1) semantics), so
    // {null, all-high} cancels to no bits set — not the skip-null 0xFFFFFFFF
    val withNull = Seq(Option.empty[String], Some("f" * 32)).toDF("h")
      .select(lit(1).as("g"), col("h"))
    assert(native(withNull) == declarative(withNull))
    assert(native(withNull) == 0L)
    // positions past a short string's end vote −1 ("" >= "8" is false)
    val short = Seq(Some("ffff"), Some("ff")).toDF("h")
      .select(lit(1).as("g"), col("h"))
    assert(native(short) == declarative(short))
    assert(native(short) == 0x3L) // only the first two high chars agree
    intercept[Exception](
      spark.range(1).select(call_function("simhash32", col("id"))).collect())
  }
}
