package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The ANN array-formulation kernel (r15): each expression must be
  * bit-identical to the exploded/higher-order formulation it replaced —
  * that equality is what lets q88/q92/q94 keep their oracle hashes.
  */
class VecQuantSpec extends SparkTestBase {

  test("quantize_vec equals the per-element floor(x * 1e6) explode") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      Array(0.123f, -0.999f, 0.0f, 1.0f),
      Array(-1.5e-7f, 0.25f, -0.25f, 3.25f))
      .toDF("e")
    val out = df.select(
      expr("quantize_vec(e)").as("native"),
      expr("transform(e, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        .as("hof"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("sqdist_q equals the exploded per-pos (a-b)^2 sum") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1L, -2L, 3L, 1000000L), Array(4L, 2L, -3L, -999999L)),
      (Array(0L, 0L), Array(0L, 0L)),
      (Array(42L), Array(41L)))
      .toDF("a", "b")
    val out = df.select(
      expr("sqdist_q(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, p) -> acc + p)")
        .as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("vec_sum_q equals the per-pos grouped sum (the Lloyd update)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (0L, Array(1L, 10L, -5L)),
      (0L, Array(2L, -20L, 7L)),
      (1L, Array(100L, 200L, 300L)))
      .toDF("g", "v")
    df.createOrReplaceTempView("vecsum_in")
    val native = spark.sql(
      "SELECT g, vec_sum_q(v) AS s FROM vecsum_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val exploded = spark.sql(
      """SELECT g, pos, sum(x) AS s FROM (
        |  SELECT g, posexplode(v) AS (pos, x) FROM vecsum_in)
        |GROUP BY g, pos ORDER BY g, pos""".stripMargin)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    native.foreach { case (g, s) => assert(s == exploded(g), s"group $g") }
    // partial-buffer merge path: force >1 partition
    val merged = df.repartition(3).groupBy("g")
      .agg(expr("vec_sum_q(v)").as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    native.foreach { case (g, s) => assert(merged(g) == s, s"merged group $g") }
  }

  test("vec_min_q/vec_max_q equal the per-pos grouped min/max (the SQ8 trainer)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (0L, Array(1L, 10L, -5L)),
      (0L, Array(2L, -20L, 7L)),
      (0L, Array(-3L, 0L, 7L)),
      (1L, Array(100L, -200L, 300L)))
      .toDF("g", "v")
    df.createOrReplaceTempView("vecext_in")
    val native = spark.sql(
      "SELECT g, vec_min_q(v) AS mn, vec_max_q(v) AS mx FROM vecext_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), (r.getSeq[Long](1), r.getSeq[Long](2))))
    val exploded = spark.sql(
      """SELECT g, pos, min(x) AS mn, max(x) AS mx FROM (
        |  SELECT g, posexplode(v) AS (pos, x) FROM vecext_in)
        |GROUP BY g, pos ORDER BY g, pos""".stripMargin)
      .collect().groupBy(_.getLong(0)).view
      .mapValues { rs =>
        val s = rs.sortBy(_.getInt(1))
        (s.map(_.getLong(2)).toSeq, s.map(_.getLong(3)).toSeq)
      }.toMap
    native.foreach { case (g, mm) => assert(mm == exploded(g), s"group $g") }
    // partial-buffer merge path: force >1 partition
    val merged = df.repartition(3).groupBy("g")
      .agg(expr("vec_min_q(v)").as("mn"), expr("vec_max_q(v)").as("mx"))
      .collect().map(r => (r.getLong(0), (r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    native.foreach { case (g, mm) => assert(merged(g) == mm, s"merged group $g") }
  }

  test("sq8_dec equals the exploded per-pos CASE/div encode+dequant chain") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // rows span: span=0 dims, vq=mn, vq=mx, negative grids, large spans
    val df = Seq(
      (0L, Array(-999999L, 0L, 42L, 1000000L)),
      (1L, Array(-999999L, 5L, 42L, -1000000L)),
      (2L, Array(500000L, -3L, 42L, 999999L)))
      .toDF("vec_id", "v")
    df.createOrReplaceTempView("sq8_in")
    val native = spark.sql(
      """SELECT vec_id, sq8_dec(v, mn, mx) AS dec
        |FROM sq8_in CROSS JOIN (
        |  SELECT vec_min_q(v) AS mn, vec_max_q(v) AS mx FROM sq8_in)
        |ORDER BY vec_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val exploded = spark.sql(
      """SELECT vec_id, pos, mn + (code * span) div 255 AS dec FROM (
        |  SELECT vec_id, pos, mn, span,
        |    CASE WHEN span = 0 THEN 0 ELSE ((vq - mn) * 255) div span END AS code
        |  FROM (
        |    SELECT vec_id, pos, vq, mn, mx - mn AS span FROM (
        |      SELECT vec_id, posexplode(v) AS (pos, vq) FROM sq8_in) t
        |    JOIN (SELECT pos2, min(vq2) AS mn, max(vq2) AS mx FROM (
        |            SELECT posexplode(v) AS (pos2, vq2) FROM sq8_in)
        |          GROUP BY pos2) r ON t.pos = r.pos2))
        |ORDER BY vec_id, pos""".stripMargin)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    native.foreach { case (g, dec) => assert(dec == exploded(g), s"vec $g") }
  }

  test("centroid update: vec_sum_q + transform div equals exploded sum div count") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // negative residual sums exercise BIGINT `div` truncation semantics
    val df = Seq(
      (0L, Array(-7L, 7L, -1L)),
      (0L, Array(-8L, 8L, 2L)),
      (0L, Array(3L, -3L, 0L)))
      .toDF("g", "v")
    df.createOrReplaceTempView("cent_in")
    val arrayForm = spark.sql(
      """SELECT g, transform(s, x -> x div cnt) AS c FROM (
        |  SELECT g, vec_sum_q(v) AS s, count(1) AS cnt FROM cent_in GROUP BY g)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val explodedForm = spark.sql(
      """SELECT g, pos, sum(x) div count(1) AS c FROM (
        |  SELECT g, posexplode(v) AS (pos, x) FROM cent_in)
        |GROUP BY g, pos ORDER BY pos""".stripMargin)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    arrayForm.foreach { case (g, c) => assert(c == explodedForm(g), s"group $g") }
  }
}
