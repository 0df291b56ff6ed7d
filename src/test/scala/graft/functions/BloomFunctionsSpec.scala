package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The bloom_agg / bloom_might_contain registration (Spark's own
  * BloomFilterAggregate / BloomFilterMightContain exposed as callable
  * functions — see GraftFunctions.register): the q95 prescreen contract is
  * "no false negatives, bounded false positives, partials merge", so the
  * tests drive a multi-partition build (map-side partial sketches must
  * merge losslessly) and probe with disjoint member/non-member sets.
  */
class BloomFunctionsSpec extends SparkTestBase {

  test("no false negatives across merged partials; FP rate inside the sizing") {
    GraftFunctions.register(spark)
    // members = multiples of 7 below 14000, built across 6 partitions so
    // the sketch is a merge of partial aggregation buffers
    val members = spark.range(2000).select((col("id") * 7).as("k"))
      .repartition(6)
    val bloom: Array[Byte] = members
      .agg(call_function("bloom_agg", expr("xxhash64(k)"),
        lit(4096), lit(65536)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probe = spark.range(20000).select(col("id").as("k"))
      .withColumn("hit",
        call_function("bloom_might_contain", lit(bloom), expr("xxhash64(k)")))
      .withColumn("member", col("k") % 7 === 0 && col("k") < 14000)
    // every true member must pass the probe — a false negative would make
    // the q95 prescreen LOSE matches, not just verify extra ones
    assert(probe.filter(col("member") && !col("hit")).isEmpty)
    // 2000 keys in 65536 bits = 32 bits/key → FP far under 5%
    val nonMembers = probe.filter(!col("member"))
    val fp = nonMembers.filter(col("hit")).count()
    assert(fp < nonMembers.count() * 5 / 100, s"FP rate too high: $fp")
  }

  test("prescreen + exact verify ≡ exact semi-join (the q95 shape)") {
    GraftFunctions.register(spark)
    val small = spark.range(500).select((col("id") * 3).as("k"))
    val big = spark.range(5000).select(col("id").as("k")).repartition(4)
    val bloom: Array[Byte] = small
      .agg(call_function("bloom_agg", expr("xxhash64(k)"),
        lit(1024), lit(8192)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val prescreened = big
      .filter(call_function("bloom_might_contain", lit(bloom), expr("xxhash64(k)")))
      .join(small, Seq("k"), "left_semi")
    val exact = big.join(small, Seq("k"), "left_semi")
    assert(prescreened.exceptAll(exact).isEmpty)
    assert(exact.exceptAll(prescreened).isEmpty)
  }

  test("bloom_agg rejects non-literal sizing arguments at analysis") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.range(3).agg(expr("bloom_agg(xxhash64(id), id, 1024)")).collect()
    }
    assert(e.getMessage.contains("integral literal"))
  }
}
