package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CappedLongSetSpec extends SparkTestBase {

  test("capped_long_set ≡ the two-pass HAVING-cap + sorted collect_set form") {
    GraftFunctions.register(spark)
    // skewed group sizes straddling the cap; multi-partition input so
    // partial buffers saturate and merge across partitions
    val d = spark.range(5000)
      .select((col("id") % 97).as("g"), (col("id") % 403).as("v"))
      .repartition(7)
    val native = d.groupBy("g")
      .agg(expr("capped_long_set(v, 30)").as("ds"))
      .filter(col("ds").isNotNull)
    val light = d.groupBy("g").agg(countDistinct(col("v")).as("nd"))
      .filter(col("nd") <= 30).select("g")
    val twoPass = d.join(light, Seq("g"), "left_semi")
      .groupBy("g").agg(sort_array(collect_set(col("v"))).as("ds"))
    val j = native.toDF("g", "ds_n").join(twoPass.toDF("g", "ds_t"), "g", "full_outer")
    assert(j.filter(col("ds_n").isNull || col("ds_t").isNull ||
      col("ds_n") =!= col("ds_t")).isEmpty)
  }

  test("saturation: groups past the cap return null; duplicates don't count") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val d = Seq.tabulate(300)(i => ("big", (i % 150).toLong)) ++ // 150 distinct
      Seq.tabulate(300)(i => ("dup", (i % 3).toLong)) ++ // 3 distinct, many dups
      Seq.tabulate(100)(i => ("exact", i.toLong)) // exactly cap distinct
    val r = d.toDF("g", "v").repartition(5).groupBy("g")
      .agg(expr("capped_long_set(v, 100)").as("ds"))
      .collect().map(x => x.getString(0) -> Option(x.getSeq[Long](1))).toMap
    assert(r("big").isEmpty) // 150 > cap → null
    assert(r("dup").contains(Seq(0L, 1L, 2L))) // dedup'd, sorted
    assert(r("exact").get.size == 100) // == cap survives
  }

  test("nulls are skipped; non-bigint argument fails analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq[(String, java.lang.Long)](("g", 5L), ("g", null), ("g", 1L))
      .toDF("g", "v").groupBy("g")
      .agg(expr("capped_long_set(v, 10)").as("ds")).head.getSeq[Long](1)
    assert(r == Seq(1L, 5L))
    val err = intercept[Exception] {
      Seq(("a", "x")).toDF("g", "v")
        .groupBy("g").agg(expr("capped_long_set(v, 10)")).collect()
    }
    assert(err.getMessage.contains("BIGINT"))
  }
}
