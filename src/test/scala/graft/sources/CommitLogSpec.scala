package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

class CommitLogSpec extends SparkTestBase {
  import CommitLog._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-commitlog").toString

  test("append commits atomically and reads back the latest snapshot") {
    val root = tmpTable()
    val v1 = append(spark.range(3).selectExpr("id", "id * 2 AS v"), root)
    assert(v1 == 1L)
    val v2 = append(spark.range(3, 5).selectExpr("id", "id * 2 AS v"), root)
    assert(v2 == 2L)
    assert(currentVersion(root).contains(2L))
    val latest = read(spark, root)
    assert(latest.count() == 5)
    assert(latest.selectExpr("sum(v)").collect()(0).getLong(0) == 20L) // 2*(0+..+4)
  }

  test("time travel: historical versions stay readable after overwrite") {
    val root = tmpTable()
    append(spark.range(4).toDF("id"), root)
    overwrite(spark.range(100, 102).toDF("id"), root)
    assert(read(spark, root).count() == 2) // latest = overwritten
    assert(read(spark, root, Some(1L)).count() == 4) // pinned old snapshot
    assert(read(spark, root, Some(1L)).selectExpr("max(id)").collect()(0).getLong(0) == 3L)
  }

  test("conflicting writers: second commit to the same version fails") {
    val root = tmpTable()
    append(spark.range(2).toDF("id"), root)
    // Simulate a race: both writers observed version 1, both stage data,
    // both try to publish version 2. The log must admit exactly one.
    val m = readManifest(root, 1L)
    val winner = m.copy(version = 2L, op = "append")
    val loser = m.copy(version = 2L, op = "overwrite")
    publish(root, winner)
    intercept[CommitConflictException](publish(root, loser))
    // the table is the winner's commit, not a torn mix
    assert(readManifest(root, 2L).op == "append")
  }

  test("zero-row overwrite yields an empty snapshot with the schema intact") {
    val root = tmpTable()
    append(spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s"), root)
    overwrite(spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s"), root)
    val snap = read(spark, root)
    assert(snap.count() == 0)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "s"))
    // history still has the rows
    assert(read(spark, root, Some(1L)).count() == 3)
  }

  test("compaction is one metadata swap; pinned readers keep their snapshot") {
    val root = tmpTable()
    (0 until 4).foreach(i => append(
      spark.range(i * 10, i * 10 + 10).repartition(3).toDF("id"), root))
    val before = readManifest(root, 4L)
    assert(before.files.size > 4) // many small files across 4 commits
    val v = compact(spark, root, nFiles = 1)
    assert(v == 5L)
    val after = readManifest(root, v)
    assert(after.files.size == 1)
    assert(read(spark, root).count() == 40)
    assert(read(spark, root).selectExpr("sum(id)").collect()(0).getLong(0) ==
      (0 until 40).map(_.toLong).sum)
    // version 4 still reads the pre-compaction file set
    assert(read(spark, root, Some(4L)).count() == 40)
  }

  test("vacuum drops expired manifests and unreferenced files, keeps live ones") {
    val root = tmpTable()
    append(spark.range(5).toDF("id"), root)
    overwrite(spark.range(7).toDF("id"), root)
    compact(spark, root, nFiles = 1)
    vacuum(root, keepVersions = 1)
    // only v3 survives; its data is intact
    assert(currentVersion(root).contains(3L))
    assert(!Files.exists(Paths.get(root, "_graft_log", f"v${1L}%020d.json")))
    assert(!Files.exists(Paths.get(root, "_graft_log", f"v${2L}%020d.json")))
    assert(read(spark, root).count() == 7)
    // every remaining data file is referenced by the surviving manifest
    import scala.jdk.CollectionConverters._
    val live = readManifest(root, 3L).files.toSet
    val onDisk = Files.walk(Paths.get(root, "data")).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => Paths.get(root).relativize(p).toString).toSet
    assert(onDisk == live)
    // time travel to a vacuumed version now fails cleanly
    intercept[IllegalArgumentException](read(spark, root, Some(1L)))
  }
}
