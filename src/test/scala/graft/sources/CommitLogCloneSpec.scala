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

  test("fast-forward publishes the branch: WAP develop-validate-promote") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(50).selectExpr("id", "id * 2 AS v"), src)
    shallowClone(src, dst)
    // develop on the branch: append + DV delete + properties
    append(spark.range(50, 60).selectExpr("id", "id * 2 AS v"), dst)
    deleteDV(spark, dst, col("id") < 5)
    setTableProperties(dst, Map("branch.note" -> "validated"))
    val want = read(spark, dst).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val v = fastForward(src, dst)
    assert(v == 2L)
    val m = readManifest(src, v)
    assert(m.op == "fast-forward")
    assert(ids(src) == want && want == (5L until 60L))
    // unchanged shared file(s) come back SOURCE-RELATIVE (pre-branch
    // identity), clone-local files publish absolute into the clone
    assert(m.files.exists(f => !f.startsWith("/")),
      "shared files should re-root to source-relative paths")
    assert(m.files.exists(_.startsWith(dst)),
      "branch-written files should reference the clone's data dir")
    // metadata promoted wholesale
    assert(m.propsOrEmpty.get("branch.note").contains("validated"))
    // time travel to the pre-promote snapshot still serves
    assert(read(spark, src, Some(1L)).count() == 50)
    // and the source keeps working: another append on top of the promote
    append(spark.range(60, 65).selectExpr("id", "id * 2 AS v"), src)
    assert(ids(src) == (5L until 65L))
  }

  test("fast-forward refuses a diverged source and a non-clone target") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(10).toDF("id"), src)
    shallowClone(src, dst)
    append(spark.range(10, 12).toDF("id"), dst)
    append(spark.range(90, 95).toDF("id"), src) // source moves on
    val e = intercept[IllegalArgumentException](fastForward(src, dst))
    assert(e.getMessage.contains("not a fast-forward"))
    // a plain table (no clone origin) cannot promote anywhere
    val other = tmpTable()
    append(spark.range(3).toDF("id"), other)
    intercept[IllegalArgumentException](fastForward(src, other))
    // and the wrong source refuses
    val src2 = tmpTable()
    append(spark.range(3).toDF("id"), src2)
    intercept[IllegalArgumentException](fastForward(src2, dst))
  }

  test("fast-forward with rename + partition-spec change promotes the " +
      "clone's metadata exactly") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(20).selectExpr("id", "CAST(id % 2 AS STRING) AS k"),
      src)
    shallowClone(src, dst)
    renameColumn(dst, "k", "bucket")
    setPartitionSpec(dst, Seq("bucket"))
    append(spark.range(20, 30)
      .selectExpr("id", "CAST(id % 2 AS STRING) AS bucket"), dst)
    fastForward(src, dst)
    val m = readManifest(src, currentVersion(src).get)
    assert(m.partitionByOrNil == Seq("bucket"))
    assert(read(spark, src).columns.toSeq == Seq("id", "bucket"))
    assert(read(spark, src).count() == 30)
    // pruning on the promoted layout still works across both generations
    assert(readPruned(spark, src, col("bucket") === "1").count() == 15)
  }
}
