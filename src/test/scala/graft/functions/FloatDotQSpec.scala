package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class FloatDotQSpec extends SparkTestBase {

  test("float_dot_q equals the higher-order aggregate/zip_with formulation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, -0.5f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(1.25e-4f, -3.5f, 0.125f), Array(7.5f, 1.5e-3f, -2.0f)))
      .toDF("a", "b")
    val out = df.select(
      expr("float_dot_q(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> floor((CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) * 1000000000.0)), CAST(0 AS BIGINT), (acc, p) -> acc + p)").as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("float_dot_q null propagation and empty arrays") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0f)), None: Option[Array[Float]]),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
    val out = df.select(expr("float_dot_q(a, b)")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getLong(0) == 0L)
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.5f, -2.25f, 3.0f))
    val b = ArrayData.toArrayData(Array(0.5f, 4.0f, -1.0f))
    val e = FloatDotQ(
      Literal.create(a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      Literal.create(b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val expected = Seq(1.5 * 0.5, -2.25 * 4.0, 3.0 * -1.0)
      .map(p => math.floor(p * 1e9).toLong).sum
    assert(e.eval(null) == expected)
  }
}
