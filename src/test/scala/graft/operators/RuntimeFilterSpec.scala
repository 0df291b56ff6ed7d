package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** Join-time file skipping: the dim key set prunes fact FILES (range
  * stats + bloom sidecars), the join result equals the plain join, empty
  * dims read nothing, and an unbounded dim side is refused.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-rtf").toString

  test("selective dim keys open a strict subset of fact files; result " +
      "equals the plain join") {
    val root = tmp()
    val fact = spark.range(8000).selectExpr("id AS k", "id * 3 AS v")
    spark.conf.set("spark.graft.bloom.columns", "k")
    try CommitLog.append(fact.repartitionByRange(8, col("k")), root)
    finally spark.conf.unset("spark.graft.bloom.columns")
    val total = CommitLog.readManifest(root,
      CommitLog.currentVersion(root).get).files.size
    assert(total >= 8)
    // dim keys all land in one narrow range
    val dim = spark.range(100, 140).selectExpr("id AS dk", "'x' AS tag")
    val opened = RuntimeFilter.prunedFactFiles(spark, root, dim, "k", "dk")
    assert(opened.nonEmpty && opened.size < total,
      s"opened ${opened.size} of $total")
    val got = RuntimeFilter.keyPrunedJoin(spark, root, dim, "k", "dk")
      .select(col("k"), col("v"), col("tag")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = CommitLog.read(spark, root)
      .join(dim, col("k") === col("dk"))
      .select(col("k"), col("v"), col("tag")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == want.toSeq && got.length == 40)
  }

  test("runtime-filter-scale IN lists plan without stack overflow") {
    // ~6k dim keys once overflowed the stack: the per-file survival
    // condition chained one Or per key (left-leaning reduce); it now
    // folds as a balanced tree (found by the sf1 sweep — q131 died with
    // StackOverflowError at 10× the gate scale)
    val root = tmp()
    val fact = spark.range(20000).selectExpr("id AS k", "id * 3 AS v")
    CommitLog.append(fact.repartitionByRange(4, col("k")), root)
    val dim = spark.range(0, 18000, 3).selectExpr("id AS dk", "'x' AS tag")
    val got = RuntimeFilter.keyPrunedJoin(spark, root, dim, "k", "dk")
      .agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(got.getLong(0) == 6000L)
    assert(got.getLong(1) == (0L until 18000L by 3).map(_ * 3).sum)
  }

  test("scattered keys survive the range layout through bloom sidecars") {
    val root = tmp()
    // bucketed (hash) layout: ranges overlap fully, so min/max can't
    // prune — only the per-file blooms can
    val fact = spark.range(4000).selectExpr("id AS k", "id AS v")
    spark.conf.set("spark.graft.bloom.columns", "k")
    try (0 until 8).foreach { i =>
      CommitLog.append(fact.filter(pmod(hash(col("k")), lit(8)) === i)
        .coalesce(1), root)
    } finally spark.conf.unset("spark.graft.bloom.columns")
    val total = CommitLog.readManifest(root,
      CommitLog.currentVersion(root).get).files.size
    val dim = spark.createDataFrame(Seq(Tuple1(17L), Tuple1(2311L)))
      .toDF("dk")
    val opened = RuntimeFilter.prunedFactFiles(spark, root, dim, "k", "dk")
    assert(opened.size < total, s"opened ${opened.size} of $total")
    assert(RuntimeFilter.keyPrunedJoin(spark, root, dim, "k", "dk")
      .count() == 2)
  }

  test("empty dim reads no files; oversized dim is refused") {
    val root = tmp()
    CommitLog.append(spark.range(100).selectExpr("id AS k", "id AS v"), root)
    val empty = spark.range(0).selectExpr("id AS dk")
    assert(RuntimeFilter.prunedFactFiles(spark, root, empty, "k", "dk").isEmpty)
    assert(RuntimeFilter.keyPrunedJoin(spark, root, empty, "k", "dk")
      .count() == 0)
    val wide = spark.range(500).selectExpr("id AS dk")
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.keyPrunedJoin(spark, root, wide, "k", "dk", maxKeys = 100)
    }
    assert(e.getMessage.contains("distinct join keys"))
  }
}
