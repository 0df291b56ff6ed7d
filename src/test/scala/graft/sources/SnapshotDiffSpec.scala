package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Net snapshot diff: inserts/deletes across appends, rewrites, deletion
  * vectors, and restore; schema-evolution presentation; rename refusal.
  */
class SnapshotDiffSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-sdiff").toString

  private def diffSet(root: String, a: Long, b: Long): Set[(String, Long)] =
    CommitLog.snapshotDiff(spark, root, a, b)
      .select(col("_change"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("appends diff as inserts; a pure rewrite diffs empty; DV deletes " +
      "diff as deletes; restore re-inserts them") {
    val root = tmp()
    CommitLog.append(spark.range(10).selectExpr("id", "id * 2 AS v"), root)
    val v1 = CommitLog.currentVersion(root).get
    CommitLog.append(spark.range(10, 15).selectExpr("id", "id * 2 AS v"), root)
    val v2 = CommitLog.currentVersion(root).get
    assert(diffSet(root, v1, v2) ==
      (10L until 15L).map(("insert", _)).toSet)
    // compaction re-stages the same rows: net diff must be EMPTY even
    // though every file changed
    CommitLog.compact(spark, root)
    val v3 = CommitLog.currentVersion(root).get
    assert(CommitLog.snapshotDiff(spark, root, v2, v3).count() == 0)
    // deletion vectors remove rows in place — common files, DV delta only
    CommitLog.deleteDV(spark, root, col("id") % 5 === 1)
    val v4 = CommitLog.currentVersion(root).get
    assert(diffSet(root, v3, v4) ==
      Set(1L, 6L, 11L).map(("delete", _)))
    // end-to-end net diff across all of it
    assert(diffSet(root, v1, v4) ==
      ((10L until 15L).toSet -- Set(11L)).map(("insert", _)) ++
        Set(1L, 6L).map(("delete", _)))
    // restore back past the delete: the DV shrinks away → re-inserts
    CommitLog.restore(root, v3)
    val v5 = CommitLog.currentVersion(root).get
    assert(diffSet(root, v4, v5) ==
      Set(1L, 6L, 11L).map(("insert", _)))
    assert(diffSet(root, v1, v1).isEmpty)
  }

  test("added columns read null on the delete side; renames refuse") {
    val root = tmp()
    CommitLog.append(spark.range(4).selectExpr("id"), root)
    val v1 = CommitLog.currentVersion(root).get
    // additive evolution + a rewrite that drops the old rows
    CommitLog.overwrite(
      spark.range(2).selectExpr("id + 10 AS id", "id AS extra"), root)
    val v2 = CommitLog.currentVersion(root).get
    val d = CommitLog.snapshotDiff(spark, root, v1, v2)
    val rows = d.select(col("_change"), col("id"), col("extra"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set(("insert", 10L, 0L), ("insert", 11L, 1L)) ++
      (0L until 4L).map(("delete", _, -1L)))
    // a rename in the range is ill-defined → refused
    CommitLog.renameColumn(root, "extra", "renamed")
    val v3 = CommitLog.currentVersion(root).get
    CommitLog.append(
      spark.range(1).selectExpr("id + 50 AS id", "id AS renamed"), root)
    val v4 = CommitLog.currentVersion(root).get
    assert(CommitLog.snapshotDiff(spark, root, v3, v4).count() == 1)
    val e = intercept[IllegalArgumentException] {
      CommitLog.snapshotDiff(spark, root, v2, v4).count()
    }
    assert(e.getMessage.contains("renamed"))
  }
}
