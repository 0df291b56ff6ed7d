package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CommitLogSourceSpec extends SparkTestBase {

  private def table(): String = {
    val root = Files.createTempDirectory("graft-dsv1").toString
    (0 until 4).foreach { i =>
      CommitLog.append(spark.range(i * 100, i * 100 + 100)
        .selectExpr("id", s"'tag$i' AS tag"), root)
    }
    root
  }

  test("format('graft-commitlog') reads snapshots and time travel") {
    val root = table()
    val df = spark.read.format("graft-commitlog").load(root)
    assert(df.count() == 400)
    assert(df.schema.fieldNames.toSeq == Seq("id", "tag"))
    val v1 = spark.read.format("graft-commitlog")
      .option("version", 1).load(root)
    assert(v1.count() == 100)
    assert(v1.agg(max("id")).collect()(0).getLong(0) == 99L)
  }

  test("WHERE clauses push down and skip files; results stay exact") {
    val root = table()
    val df = spark.read.format("graft-commitlog").load(root)
    // value correctness through the format API under pushed filters
    assert(df.filter(col("id") >= 150 && col("id") < 250).count() == 100)
    assert(df.filter(col("tag") === "tag0").agg(sum("id")).collect()(0).getLong(0) ==
      (0L until 100L).sum)
    // the pushed filters reach the manifest pruner: only matching file
    // sets are opened (commit 2's files for this range)
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    val pruned = CommitLog.pruneForSourceFilters(spark, m, Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("id", 150L),
      org.apache.spark.sql.sources.LessThan("id", 250L)))
    assert(pruned.size < m.files.size)
    assert(pruned.nonEmpty)
    // unsupported shapes prune nothing and stay correct
    val odd = df.filter((col("id") % 2) === 1)
    assert(odd.count() == 200)
  }

  test("streaming source tails commits: versions are offsets, batches are changes()") {
    val root = Files.createTempDirectory("graft-dsv1-stream").toString
    CommitLog.append(spark.range(3).toDF("id"), root)
    val q = spark.readStream.format("graft-commitlog").load(root)
      .writeStream.format("memory").queryName("cl_tail")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dsv1-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cl_tail").collect()(0).getLong(0) == 3)
      // new commits stream through as fresh micro-batches
      CommitLog.append(spark.range(3, 7).toDF("id"), root)
      CommitLog.append(spark.range(7, 8).toDF("id"), root)
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cl_tail").collect()(0).getLong(0) == 8)
      assert(spark.sql("SELECT sum(id) FROM cl_tail").collect()(0).getLong(0) ==
        (0L until 8L).sum)
    } finally q.stop()
  }

  test("SQL DDL: CREATE TEMPORARY VIEW ... USING graft-commitlog") {
    val root = table()
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW commitlog_sql
                 |USING `graft-commitlog` OPTIONS (path '$root')""".stripMargin)
    val n = spark.sql(
      "SELECT count(*) AS n FROM commitlog_sql WHERE id < 100")
      .collect()(0).getLong(0)
    assert(n == 100)
  }
}
