package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits. Files keep
  * each column's PHYSICAL (creation-time) name forever; the manifest maps
  * logical → physical at every read/write boundary. Covers reads across
  * file generations, stats pruning keyed by physical names, DML on renamed
  * columns, the drop + retired-name guard, the rename-swap acid test, and
  * SQL DDL through the catalog.
  */
class CommitLogColumnMapSpec extends SparkTestBase {
  import CommitLog._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-colmap").toString

  test("rename: zero rewrite, data intact, per-version names preserved") {
    val root = tmpTable()
    append(spark.range(10).selectExpr("id", "id * 2 AS v"), root)
    val filesBefore = readManifest(root, 1L).files.sorted
    renameColumn(root, "v", "value")
    val m = readManifest(root, 2L)
    assert(m.files.sorted == filesBefore) // not a byte rewritten
    assert(m.op == "rename-column")
    assert(manifestSchema(m).fieldNames.toSeq == Seq("id", "value"))
    val rows = read(spark, root).select("id", "value")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(3L) == 6L && rows.size == 10)
    // time travel: version 1 still reads under the OLD name
    assert(read(spark, root, Some(1L)).schema.fieldNames.toSeq == Seq("id", "v"))
    assert(read(spark, root, Some(1L)).agg(sum("v")).collect()(0).getLong(0) == 90L)
  }

  test("appends after a rename coexist with old files; pruning spans both") {
    val root = tmpTable()
    append(spark.range(100).selectExpr("id", "id AS v").coalesce(1), root)
    renameColumn(root, "v", "value")
    append(spark.range(100, 200).selectExpr("id", "id AS value").coalesce(1), root)
    assert(read(spark, root).count() == 200)
    assert(read(spark, root).agg(sum("value")).collect()(0).getLong(0) ==
      (0L until 200L).sum)
    // stats pruning on the LOGICAL name prunes across both generations:
    // old file stats keyed "v" (its physical name), new file stats keyed
    // "v" too (the mapping writes value -> v physically)
    val m = readManifest(root, currentVersion(root).get)
    assert(m.files.size == 2)
    val pruned = prunedFiles(spark, m, col("value") >= 150)
    assert(pruned.size == 1, s"expected 1 surviving file, got $pruned")
    assert(readPruned(spark, root, col("value") >= 150).count() == 50)
  }

  test("DML binds to logical names on a renamed table (CoW and MoR)") {
    val root = tmpTable()
    append(spark.range(20).selectExpr("id", "id AS v").coalesce(1), root)
    renameColumn(root, "v", "score")
    update(spark, root, Seq("score" -> lit(-1L)), col("score") < 3)
    assert(read(spark, root).filter(col("score") === -1L).count() == 3)
    deleteDV(spark, root, col("score") > 15)
    assert(read(spark, root).count() == 16)
    merge(spark, root,
      spark.range(5, 7).selectExpr("id", "id * 100 AS score"), Seq("id"))
    val rows = read(spark, root).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(5L) == 500L && rows(6L) == 600L && rows(7L) == 7L)
  }

  test("drop column: values vanish, storage name is retired against re-add") {
    val root = tmpTable()
    append(spark.range(10).selectExpr("id", "id AS a", "id * 2 AS b"), root)
    dropColumn(root, "a")
    val m = readManifest(root, 2L)
    assert(manifestSchema(m).fieldNames.toSeq == Seq("id", "b"))
    assert(m.retiredOrNil == Seq("a"))
    assert(read(spark, root).columns.toSeq == Seq("id", "b"))
    // re-adding 'a' would resurrect old file data under identity mapping
    intercept[IllegalArgumentException](
      append(spark.range(3).selectExpr("id", "id AS b", "id AS a"), root))
    // an unrelated new column is fine
    append(spark.range(10, 13).selectExpr("id", "id * 2 AS b", "id AS c"), root)
    assert(read(spark, root).count() == 13)
  }

  test("rename swap (a->tmp, b->a, tmp->b) reads swapped values correctly") {
    val root = tmpTable()
    append(spark.range(5).selectExpr("id", "id AS a", "id * 10 AS b"), root)
    renameColumn(root, "a", "tmp")
    renameColumn(root, "b", "a")
    renameColumn(root, "tmp", "b")
    val rows = read(spark, root).select("id", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (id, a, b) =>
      assert(a == id * 10 && b == id, s"row $id: a=$a b=$b")
    }
  }

  test("rename of a constrained or partition column is guarded") {
    val root = tmpTable()
    append(spark.range(10).selectExpr("id", "CAST(id % 2 AS STRING) AS p"), root,
      partitionBy = Seq("p"))
    addConstraint(spark, root, "id_pos", "id >= 0")
    intercept[IllegalArgumentException](renameColumn(root, "id", "key"))
    intercept[IllegalArgumentException](dropColumn(root, "p")) // partition col
    // renaming the PARTITION column is allowed — the spec follows it
    renameColumn(root, "p", "bucket")
    assert(readManifest(root, currentVersion(root).get)
      .partitionByOrNil == Seq("bucket"))
    append(spark.range(10, 14).selectExpr(
      "id", "CAST(id % 2 AS STRING) AS bucket"), root)
    assert(read(spark, root).filter(col("bucket") === "1").count() == 7)
  }

  test("clone and restore carry the column mapping") {
    val src = tmpTable(); val dst = tmpTable()
    append(spark.range(6).selectExpr("id", "id AS v"), src)
    renameColumn(src, "v", "w") // v2
    shallowClone(src, dst)
    assert(read(spark, dst).columns.toSeq == Seq("id", "w"))
    assert(read(spark, dst).agg(sum("w")).collect()(0).getLong(0) == 15L)
    restore(src, 1L) // back to the pre-rename names
    assert(read(spark, src).columns.toSeq == Seq("id", "v"))
    restore(src, 2L)
    assert(read(spark, src).columns.toSeq == Seq("id", "w"))
  }

  test("SQL ALTER TABLE RENAME/DROP COLUMN through the catalog; reads follow") {
    val whRoot = Files.createTempDirectory("graft-colmap-cat").toString
    spark.conf.set("spark.sql.catalog.cmcat", classOf[
      graft.sources.commitlog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmcat.root", whRoot)
    spark.sql("CREATE TABLE cmcat.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cmcat.t SELECT id, id * 3 FROM range(10)")
    spark.sql("ALTER TABLE cmcat.t RENAME COLUMN v TO val")
    assert(spark.table("cmcat.t").columns.toSeq == Seq("k", "val"))
    assert(spark.sql("SELECT sum(val) FROM cmcat.t").collect()(0).getLong(0) ==
      (0L until 10L).map(_ * 3).sum)
    spark.sql("UPDATE cmcat.t SET val = 0 WHERE k = 1")
    assert(spark.sql("SELECT val FROM cmcat.t WHERE k = 1")
      .collect()(0).getLong(0) == 0L)
    spark.sql("ALTER TABLE cmcat.t DROP COLUMN val")
    assert(spark.table("cmcat.t").columns.toSeq == Seq("k"))
    assert(spark.table("cmcat.t").count() == 10)
  }
}
