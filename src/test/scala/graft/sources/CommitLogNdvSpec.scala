package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Per-file NDV (HLL) sketch sidecars and the DESCRIBE STATS rollup:
  * write-time build (property-gated, same stats pass as min/max/bloom),
  * lossless merge across files and commits, exact row/null folding,
  * lifecycle interop (rewrites re-sketch, vacuum keeps live sidecars,
  * clones reference across roots), and the SQL statement surface.
  */
class CommitLogNdvSpec extends SparkTestBase {
  import CommitLog._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-ndv").toString

  /** id: all distinct; k: id % 100 → 100 distinct; v: untracked double. */
  private def chunk(lo: Long, hi: Long) =
    spark.range(lo, hi).selectExpr("id", "concat('k', id % 100) AS k",
      "CAST(id AS DOUBLE) / 3 AS v")

  private def statRow(root: String, column: String) =
    describeStats(spark, root).collect()
      .find(_.getString(0) == column).get

  test("sticky ndv.columns property: sketches build per commit and " +
      "DESCRIBE STATS merges them into table-level estimates") {
    val root = tmpTable()
    create(root, chunk(0, 1).schema,
      props = Map("ndv.columns" -> "id,k,v")) // v (double) silently skipped
    (0 until 4).foreach(i => append(chunk(i * 500L, (i + 1) * 500L), root))
    val m = readManifest(root, currentVersion(root).get)
    assert(m.statsOrNil.forall(_.ndvOpt.isDefined), "every file sketched")
    // id: 2000 true distinct spread over every file — a per-file count
    // could never be summed; the merged sketch lands within HLL error
    val idRow = statRow(root, "id")
    assert(idRow.getLong(1) == 2000L && idRow.getLong(2) == 0L)
    assert(idRow.getLong(3) == m.statsOrNil.size.toLong &&
      idRow.getLong(3) == idRow.getLong(4))
    val idNdv = idRow.getLong(5)
    assert(math.abs(idNdv - 2000L) <= 100L, s"id ndv estimate $idNdv")
    // k: the same 100 values recur in EVERY file — union must not sum
    val kNdv = statRow(root, "k").getLong(5)
    assert(math.abs(kNdv - 100L) <= 5L, s"k ndv estimate $kNdv")
    // v: unsupported type → no sketch, null estimate, nulls still folded
    val vRow = statRow(root, "v")
    assert(vRow.getLong(4) == 0L && vRow.isNullAt(5))
  }

  test("rows/nulls fold exactly from the manifest; no data scan needed") {
    val root = tmpTable()
    create(root, chunk(0, 1).schema, props = Map("ndv.columns" -> "k"))
    append(chunk(0, 300), root)
    append(spark.range(300, 400).selectExpr(
      "id", "CAST(NULL AS STRING) AS k", "CAST(1.0 AS DOUBLE) AS v"), root)
    val kRow = statRow(root, "k")
    assert(kRow.getLong(1) == 400L && kRow.getLong(2) == 100L)
    // the all-null generation still participates in file counts
    assert(kRow.getLong(3) > kRow.getLong(4) || kRow.getLong(4) >= 1L)
    val est = kRow.getLong(5)
    assert(math.abs(est - 100L) <= 5L)
  }

  test("OPTIMIZE re-sketches the rewrite; vacuum keeps live sidecars and " +
      "reclaims superseded ones") {
    val root = tmpTable()
    create(root, chunk(0, 1).schema, props = Map("ndv.columns" -> "id"))
    (0 until 3).foreach(i => append(chunk(i * 100L, (i + 1) * 100L), root))
    val before = readManifest(root, currentVersion(root).get)
      .statsOrNil.flatMap(_.ndvOpt).toSet
    optimize(spark, root)
    val after = readManifest(root, currentVersion(root).get)
      .statsOrNil.flatMap(_.ndvOpt).toSet
    assert(after.nonEmpty && after.intersect(before).isEmpty,
      "compaction writes fresh sketches for the rewritten files")
    val est = statRow(root, "id").getLong(5)
    assert(math.abs(est - 300L) <= 20L)
    // reclaim everything unreferenced by the latest snapshot
    vacuum(root, keepVersions = 1, retentionMs = 0L)
    after.foreach(p =>
      assert(Files.exists(Paths.get(root, p)), s"live sidecar $p vacuumed"))
    assert(math.abs(statRow(root, "id").getLong(5) - 300L) <= 20L)
  }

  test("shallow clone references source sketches; fast-forward re-roots " +
      "them back") {
    val src = tmpTable(); val dst = tmpTable()
    create(src, chunk(0, 1).schema, props = Map("ndv.columns" -> "id"))
    append(chunk(0, 200), src)
    shallowClone(src, dst)
    // the clone's estimate reads the SOURCE's sidecars by absolute path
    assert(math.abs(statRow(dst, "id").getLong(5) - 200L) <= 15L)
    append(chunk(200, 300), dst)
    fastForward(src, dst)
    val m = readManifest(src, currentVersion(src).get)
    assert(m.statsOrNil.forall(_.ndvOpt.isDefined))
    assert(math.abs(statRow(src, "id").getLong(5) - 300L) <= 20L)
  }

  test("rows is DV-aware; nulls report UNKNOWN (null) when a pre-evolution " +
      "file never recorded the column") {
    val root = tmpTable()
    create(root, chunk(0, 1).schema, props = Map("ndv.columns" -> "id"))
    append(chunk(0, 100), root)
    // merge-on-read delete: recorded per-file rows overcount live rows
    deleteDV(spark, root, col("id") < 20)
    assert(statRow(root, "id").getLong(1) == 80L)
    // additive evolution: old files read the new column as null but their
    // stats never saw it — a partial null sum would silently undercount
    val root2 = tmpTable()
    append(spark.range(50).selectExpr("id"), root2)
    evolveSchema(root2, spark.range(1)
      .selectExpr("id", "CAST('x' AS STRING) AS extra").schema)
    append(spark.range(50, 60).selectExpr("id", "concat('v', id) AS extra"),
      root2)
    val extraRow = describeStats(spark, root2).collect()
      .find(_.getString(0) == "extra").get
    assert(extraRow.getLong(1) == 60L && extraRow.isNullAt(2))
    // fully-recorded columns still fold exactly
    val idRow2 = describeStats(spark, root2).collect()
      .find(_.getString(0) == "id").get
    assert(idRow2.getLong(2) == 0L)
  }

  test("DESCRIBE STATS through SQL; ndv.lgk bounds validate at SET time") {
    val root = tmpTable()
    create(root, chunk(0, 1).schema,
      props = Map("ndv.columns" -> "id", "ndv.lgk" -> "14"))
    append(chunk(0, 500), root)
    val view = s"ndv_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view " +
      s"USING `graft-commitlog` OPTIONS (path '$root')")
    val rows = spark.sql(s"DESCRIBE STATS $view").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("id", "k", "v"))
    val id = rows.find(_.getString(0) == "id").get
    assert(id.getLong(1) == 500L &&
      math.abs(id.getLong(5) - 500L) <= 25L)
    intercept[IllegalArgumentException] {
      setTableProperties(root, Map("ndv.lgk" -> "30"))
    }
    intercept[IllegalArgumentException] {
      setTableProperties(root, Map("ndv.lgk" -> "words"))
    }
  }
}
