package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.FloatDotQ

class GraftExtensionsSpec extends SparkTestBase {

  private val naive =
    """aggregate(zip_with(a, b,
      |  (x, y) -> CAST(FLOOR((CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) * 1000000000.0) AS BIGINT)),
      |  0L, (acc, p) -> acc + p)""".stripMargin

  private lazy val df = {
    import spark.implicits._
    // parquet round-trip: a LocalRelation of literals would be folded away
    // by ConvertToLocalRelation before the rewrite could be observed
    val p = java.nio.file.Files.createTempDirectory("fdq").resolve("t").toString
    Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, 0.25f, -1.0f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.4f)))
      .toDF("a", "b").write.parquet(p)
    spark.read.parquet(p)
  }

  test("rewrite rule turns the higher-order dot product into FloatDotQ") {
    GraftExtensions.install(spark)
    val q = df.select(expr(naive).as("dot"))
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[FloatDotQ])),
      s"FloatDotQ not found in:\n$optimized")
    // and the rewrite preserves values (vs the direct expression)
    val direct = df.select(expr("float_dot_q(a, b)").as("dot"))
    assert(q.collect().toSeq == direct.collect().toSeq)
  }

  test("rule does NOT capture semantically different aggregates") {
    GraftExtensions.install(spark)
    // different zero → not our pattern
    val other = df.select(expr(
      """aggregate(zip_with(a, b,
        |  (x, y) -> CAST(FLOOR((CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) * 1000000000.0) AS BIGINT)),
        |  1L, (acc, p) -> acc + p)""".stripMargin).as("dot"))
    assert(!other.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[FloatDotQ])))
    // different scale → not our pattern
    val scaled = df.select(expr(
      """aggregate(zip_with(a, b,
        |  (x, y) -> CAST(FLOOR((CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) * 1000.0) AS BIGINT)),
        |  0L, (acc, p) -> acc + p)""".stripMargin).as("dot"))
    assert(!scaled.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[FloatDotQ])))
  }

  test("extensions class wires the functions and rule without error") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e) // builder-time injection path
  }

  test("all native functions resolve after install()") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val r = Seq((1L, 2L), (1L, 3L)).toDF("g", "v").groupBy("g")
      .agg(org.apache.spark.sql.functions.expr("capped_long_set(v, 5)").as("ds"))
      .head.getSeq[Long](1)
    assert(r == Seq(2L, 3L))
    assert(spark.sql("SELECT float_dot_q(array(CAST(1 AS FLOAT)), array(CAST(2 AS FLOAT)))")
      .head.getLong(0) == 2000000000L)
    // the bloom pair composes end-to-end in ONE SQL statement: the sketch
    // arrives via scalar subquery — the exact InjectRuntimeFilter shape
    assert(spark.sql(
      """SELECT bloom_might_contain(
        |  (SELECT bloom_agg(xxhash64(id), 64, 1024) FROM range(10)),
        |  xxhash64(5L))""".stripMargin).head.getBoolean(0))
  }

  private lazy val dblDf = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("fdqd").resolve("t").toString
    Seq((Array(1.0, 2.0, 3.0), Array(0.5, 0.25, -1.0)))
      .toDF("a", "b").write.parquet(p)
    spark.read.parquet(p)
  }

  test("rewrite skips array<double> — getFloat on double arrays reads garbage") {
    GraftExtensions.install(spark)
    // the SAME higher-order pattern over array<double> is a legitimate user
    // query; the rule must leave it alone and Spark must evaluate it honestly
    val q = dblDf.select(expr(naive).as("dot"))
    assert(!q.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[FloatDotQ])))
    assert(q.collect()(0).getLong(0) == // floor(.5e9)+floor(.5e9)+floor(-3e9)
      500000000L + 500000000L - 3000000000L)
  }

  test("float_dot_q on non-float arrays fails at analysis, not with garbage") {
    GraftExtensions.install(spark)
    val ex = intercept[Exception] {
      dblDf.select(expr("float_dot_q(a, b)")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>") ||
      ex.getMessage.toLowerCase.contains("data type mismatch"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
  }
}
