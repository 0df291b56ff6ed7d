package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** FSCK + repair: clean verification, missing-file detection/removal,
  * sidecar clearing that PRESERVES live deletion vectors, missing-DV
  * entry drops, and the SQL statement surface.
  */
class FsckSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-fsck").toString

  private def firstDataFile(root: String): String =
    CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
      .statsOrNil.head.path

  test("clean table verifies clean; a deleted data file is detected and " +
      "repaired by dropping its entry") {
    val root = tmp()
    CommitLog.append(Seq((1L, "a")).toDF("id", "v"), root)
    CommitLog.append(Seq((2L, "b")).toDF("id", "v"), root)
    assert(CommitLog.fsck(root).isEmpty)
    val victim = firstDataFile(root)
    Files.delete(Paths.get(CommitLog.dataPath(root, victim)))
    val issues = CommitLog.fsck(root)
    assert(issues.map(i => (i.kind, i.path)) == Seq(("missing-file", victim)))
    // un-repaired, the scan fails; repaired, it reads the surviving rows
    val v = CommitLog.fsckRepair(root)
    assert(CommitLog.readManifest(root, v).op == "fsck")
    assert(CommitLog.read(spark, root).count() == 1)
    assert(CommitLog.fsck(root).isEmpty)
  }

  test("missing bloom sidecar clears the reference only — rows AND live " +
      "deletion vectors survive the repair") {
    val root = tmp()
    CommitLog.create(root,
      Seq((0L, "x")).toDF("id", "v").schema,
      props = Map("bloom.columns" -> "id"))
    CommitLog.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), root)
    // merge-on-read delete → a DV rides on the bloom-indexed file
    spark.conf.set("spark.graft.commitlog.deletionVectors", "true")
    try CommitLog.deleteDV(spark, root, col("id") <= 2L)
    finally spark.conf.unset("spark.graft.commitlog.deletionVectors")
    assert(CommitLog.read(spark, root).count() == 8)
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    val indexed = m.statsOrNil.find(_.bloomOpt.isDefined).get
    Files.delete(Paths.get(CommitLog.dataPath(root, indexed.bloom)))
    val issues = CommitLog.fsck(root)
    assert(issues.map(_.kind) == Seq("missing-bloom"))
    CommitLog.fsckRepair(root)
    assert(CommitLog.fsck(root).isEmpty)
    val m2 = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m2.statsOrNil.find(_.path == indexed.path).get.bloomOpt.isEmpty)
    // the deletion vector survived the remove/re-add: still 8 rows
    assert(CommitLog.read(spark, root).count() == 8)
  }

  test("a missing deletion vector drops its whole file entry — deleted " +
      "rows can never resurrect") {
    val root = tmp()
    // one file, partial hit → a DV attaches (an all-rows hit would take
    // the full-file-drop path and leave no DV to break)
    CommitLog.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1), root)
    CommitLog.deleteDV(spark, root, col("id") === 1L)
    assert(CommitLog.read(spark, root).count() == 4)
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    val (file, dv) = m.dvsOrEmpty.head
    Files.delete(Paths.get(CommitLog.dataPath(root, dv)))
    assert(CommitLog.fsck(root).map(i => (i.kind, i.path))
      == Seq(("missing-dv", file)))
    CommitLog.fsckRepair(root)
    assert(CommitLog.fsck(root).isEmpty)
    // the whole entry went with the DV: no rows from that file remain
    assert(CommitLog.read(spark, root).count() == 0)
  }

  test("FSCK TABLE t [REPAIR] as SQL") {
    val root = tmp()
    CommitLog.append(Seq((1L, "a")).toDF("id", "v"), root)
    CommitLog.append(Seq((2L, "b")).toDF("id", "v"), root)
    val view = s"fsck_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view " +
      s"USING `graft-commitlog` OPTIONS (path '$root')")
    assert(spark.sql(s"FSCK TABLE $view").collect().isEmpty)
    Files.delete(Paths.get(CommitLog.dataPath(root, firstDataFile(root))))
    val rows = spark.sql(s"FSCK TABLE $view").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "missing-file")
    assert(spark.sql(s"FSCK TABLE $view REPAIR").collect().isEmpty)
    assert(spark.table(view).count() == 1)
  }
}
