package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Auto-compaction policy: the `autocompact.files` table property caps
  * small-file debt — once an append leaves more than N sub-half-target
  * live files, an optimize commit follows immediately; content and
  * exactly-once watermarks are unaffected.
  */
class AutoCompactSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-autocompact").toString

  private def liveFiles(t: String): Int =
    CommitLog.currentVersion(t)
      .map(v => CommitLog.readManifest(t, v).files.size).getOrElse(0)

  test("appends past the small-file cap trigger a compaction commit; " +
      "without the property the debt accumulates") {
    val capped = tmp(); val bare = tmp()
    CommitLog.append(spark.range(10).toDF("id"), capped)
    CommitLog.setTableProperties(capped, Map(
      CommitLog.AutoCompactFilesProp -> "4"))
    (1 to 6).foreach { i =>
      CommitLog.append(spark.range(10).toDF("id")
        .withColumn("id", col("id") + i * 10), capped)
      CommitLog.append(spark.range(10).toDF("id")
        .withColumn("id", col("id") + i * 10), bare)
    }
    assert(liveFiles(capped) <= 5, s"capped table holds ${liveFiles(capped)}")
    assert(liveFiles(bare) >= 6, s"bare table holds ${liveFiles(bare)}")
    // content survives the compactions untouched
    assert(CommitLog.read(spark, capped).agg(count(lit(1)), sum(col("id")))
      .collect().head.toSeq ==
      CommitLog.read(spark, bare)
        .unionByName(spark.range(10).toDF("id"))
        .agg(count(lit(1)), sum(col("id"))).collect().head.toSeq)
  }

  test("a streaming appendTxn sink honors the policy and keeps its " +
      "replay watermark through the compaction commits") {
    val t = tmp()
    CommitLog.append(spark.range(5).toDF("id"), t)
    CommitLog.setTableProperties(t, Map(
      CommitLog.AutoCompactFilesProp -> "3"))
    (0L to 5L).foreach { b =>
      CommitLog.appendTxn(spark.range(5).toDF("id")
        .withColumn("id", col("id") + (b + 1) * 100), t, "ac-app", b)
    }
    assert(liveFiles(t) <= 4)
    // replay of an already-committed batch is still a no-op
    val v = CommitLog.currentVersion(t)
    CommitLog.appendTxn(spark.range(5).toDF("id"), t, "ac-app", 3L)
    assert(CommitLog.currentVersion(t) == v)
    assert(CommitLog.read(spark, t).count() == 35)
  }
}
