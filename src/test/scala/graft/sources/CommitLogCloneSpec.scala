package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SHALLOW CLONE: zero-copy snapshot branch. Covers the metadata-only
  * create, divergence in both directions, localization through rewrites,
  * DV and constraint carry-over, time-travel clones, and the vacuum
  * safety property (a clone's vacuum can never touch source files).
  */
class CommitLogCloneSpec extends SparkTestBase {
  import CommitLog._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-clone").toString

  private def ids(root: String): Seq[Long] =
    read(spark, root).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("clone is metadata-only and reads the source snapshot verbatim") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(100).selectExpr("id", "id * 3 AS v"), src)
    shallowClone(src, dst)
    // zero data under the clone's root — only the log
    assert(!Files.isDirectory(Paths.get(dst, "data")))
    assert(read(spark, dst).count() == 100)
    assert(read(spark, dst).agg(sum("v")).collect()(0).getLong(0) ==
      read(spark, src).agg(sum("v")).collect()(0).getLong(0))
    assert(readManifest(dst, 1L).op == "clone")
  }

  test("clone and source diverge independently after the branch point") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(10).toDF("id"), src)
    shallowClone(src, dst)
    append(spark.range(10, 15).toDF("id"), dst) // clone-only rows
    delete(spark, src, col("id") < 5) // source-only delete
    assert(ids(dst) == (0L until 15L)) // clone untouched by source DML
    assert(ids(src) == (5L until 10L)) // source untouched by clone append
  }

  test("a time-travel clone branches from the pinned version") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(5).toDF("id"), src) // v1
    append(spark.range(5, 10).toDF("id"), src) // v2
    shallowClone(src, dst, version = Some(1L))
    assert(ids(dst) == (0L until 5L))
  }

  test("clone carries deletion vectors and CHECK constraints") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(20).coalesce(1).toDF("id"), src)
    deleteDV(spark, src, col("id") % 4 === 1)
    addConstraint(spark, src, "nonneg", "id >= 0")
    shallowClone(src, dst)
    assert(ids(dst) == (0L until 20L).filter(_ % 4 != 1)) // DV applied
    assert(constraintsOf(dst) == Map("nonneg" -> "id >= 0"))
    // the carried constraint gates clone writes
    intercept[IllegalStateException](
      append(spark.range(-3, 0).toDF("id"), dst))
    // DV DML works on the clone's absolute-path references
    deleteDV(spark, dst, col("id") === 2)
    assert(ids(dst) == (0L until 20L).filter(i => i % 4 != 1 && i != 2))
    // ...and never touches the source
    assert(ids(src) == (0L until 20L).filter(_ % 4 != 1))
  }

  test("rewrites localize the clone; the source files stay untouched") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(50).toDF("id"), src)
    val srcFiles = readManifest(src, 1L).files
    shallowClone(src, dst)
    assert(readManifest(dst, 1L).files.forall(_.startsWith("/"))) // absolute refs
    compact(spark, dst) // localizing rewrite
    val m = readManifest(dst, 2L)
    assert(m.files.forall(f => !f.startsWith("/"))) // now clone-local
    assert(ids(dst) == (0L until 50L))
    // clone vacuum reclaims nothing of the source (files live elsewhere)
    vacuum(dst, keepVersions = 1, retentionMs = 0L)
    srcFiles.foreach(f => assert(Files.exists(Paths.get(src, f))))
    assert(ids(src) == (0L until 50L))
  }

  test("clone through the data source and SQL DML on the clone") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(30).selectExpr("id", "id AS v"), src)
    shallowClone(src, dst)
    val df = spark.read.format("graft-commitlog").load(dst)
    assert(df.count() == 30)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW clone_t USING `graft-commitlog` OPTIONS (path '$dst')")
    spark.sql("DELETE FROM clone_t WHERE id >= 20")
    assert(ids(dst) == (0L until 20L))
    assert(ids(src) == (0L until 30L))
  }

  test("cloning onto an existing table refuses") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(3).toDF("id"), src)
    append(spark.range(3).toDF("id"), dst)
    intercept[IllegalArgumentException](shallowClone(src, dst))
  }
}
