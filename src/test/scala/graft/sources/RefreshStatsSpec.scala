package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** refreshStats: one metadata commit computes min/max for stats-less
  * (imported) files so skipping lights up in place; deletion vectors and
  * existing stats survive a full refresh.
  */
class RefreshStatsSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-refresh").toString

  private def writeOne(df: org.apache.spark.sql.DataFrame,
      target: Path): Unit = {
    val t = Files.createTempDirectory("graft-rs")
    df.coalesce(1).write.mode("overwrite").parquet(t.toString)
    val part = Files.list(t).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.createDirectories(target.getParent)
    Files.move(part, target)
  }

  test("an imported by-reference snapshot prunes nothing until " +
      "refreshStats, then min/max skipping works over the same files") {
    val ext = tmp(); val root = tmp()
    val lowDf = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    val highDf = spark.range(1000, 1100).selectExpr("id", "id AS v")
    writeOne(lowDf, java.nio.file.Paths.get(ext, "low.parquet"))
    writeOne(highDf, java.nio.file.Paths.get(ext, "high.parquet"))
    CommitLog.importSnapshot(root, lowDf.schema, Seq(
      CommitLog.FileStat(s"$ext/low.parquet", 100L, 1L),
      CommitLog.FileStat(s"$ext/high.parquet", 100L, 1L)))
    val pred = col("id") < 50L
    def m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    // stats-less files never prune (conservative)
    assert(CommitLog.prunedFiles(spark, root, m, pred).size == 2)
    CommitLog.refreshStats(spark, root)
    assert(CommitLog.prunedFiles(spark, root, m, pred).size == 1)
    // data identical, still zero-copy
    assert(CommitLog.read(spark, root).count() == 200)
    assert(!Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
    // a second onlyMissing refresh is a no-op commit-wise
    val v = CommitLog.currentVersion(root)
    CommitLog.refreshStats(spark, root)
    assert(CommitLog.currentVersion(root) == v)
  }

  test("a full refresh carries deletion vectors and partition tuples " +
      "through unchanged") {
    val t = tmp()
    CommitLog.append(spark.range(100).selectExpr(
      "id", "CASE WHEN id < 50 THEN 'a' ELSE 'b' END AS part"), t,
      partitionBy = Seq("part"))
    CommitLog.deleteDV(spark, t, col("id") === 7L)
    val before = CommitLog.read(spark, t).orderBy("id").collect().map(_.toSeq)
    CommitLog.refreshStats(spark, t, onlyMissing = false)
    val after = CommitLog.read(spark, t).orderBy("id").collect().map(_.toSeq)
    assert(before.toSeq == after.toSeq)
    assert(CommitLog.read(spark, t).filter(col("id") === 7L).count() == 0)
    // partition pruning still works after the refresh
    val m = CommitLog.readManifest(t, CommitLog.currentVersion(t).get)
    assert(CommitLog.prunedFiles(spark, t, m, col("part") === "a").size <
      m.files.size)
  }
}
