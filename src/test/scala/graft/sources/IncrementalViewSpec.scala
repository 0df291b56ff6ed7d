package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IncrementalViewSpec extends SparkTestBase {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("delta refreshes equal a full recompute; no-op when nothing changed") {
    val src = tmp("iv-src"); val view = tmp("iv-view")
    def wave(lo: Int, hi: Int) = CommitLog.append(
      spark.range(lo, hi).selectExpr("id", "CAST(id % 3 AS STRING) AS g",
        "CAST(id AS DOUBLE) / 7 AS x"), src)

    wave(0, 100)
    val v1 = IncrementalView.refresh(spark, src, view, Seq("g"), "x", 0L)
    wave(100, 250)
    val v2 = IncrementalView.refresh(spark, src, view, Seq("g"), "x", v1)
    // no new commits → same version back, view untouched
    assert(IncrementalView.refresh(spark, src, view, Seq("g"), "x", v2) == v2)

    val got = IncrementalView.serve(spark, view)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = CommitLog.read(spark, src)
      .groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    // the view is itself a CommitLog table: refreshes were atomic commits
    assert(CommitLog.currentVersion(view).contains(2L))
  }

  test("streaming ingest + incremental view: exactly-once commits feed delta refreshes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = tmp("iv-stream-src"); val view = tmp("iv-stream-view")
    var last = 0L
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("g", "x").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        CommitLog.appendTxn(batch, src, "iv-stream", id)
        last = IncrementalView.refresh(spark, src, view, Seq("g"), "x", last)
      }
      .option("checkpointLocation", tmp("iv-ckpt"))
      .start()
    try {
      mem.addData(("a", 1.0), ("b", 2.0)); q.processAllAvailable()
      mem.addData(("a", 3.0)); q.processAllAvailable()
      val rows = IncrementalView.serve(spark, view).orderBy("g").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("a", 2L, 4.0), ("b", 1L, 2.0)))
    } finally q.stop()
  }

  test("a NULL group key folds across refreshes instead of duplicating") {
    val src = tmp("iv-null-src"); val view = tmp("iv-null-view")
    def wave(lo: Int, hi: Int) = CommitLog.append(
      spark.range(lo, hi).selectExpr("id",
        "IF(id % 2 = 0, CAST(NULL AS STRING), 'a') AS g", "1.0 AS x"), src)
    wave(0, 10)
    val v1 = IncrementalView.refresh(spark, src, view, Seq("g"), "x", 0L)
    wave(10, 20)
    IncrementalView.refresh(spark, src, view, Seq("g"), "x", v1)
    val rows = IncrementalView.serve(spark, view)
      .orderBy(asc_nulls_first("g")).collect()
    assert(rows.length == 2) // ONE folded null-group row, not one per refresh
    assert(rows(0).isNullAt(0) && rows(0).getLong(1) == 10L)
    assert(rows(1).getString(0) == "a" && rows(1).getLong(1) == 10L)
  }

  test("refresh refuses a range containing a rewrite commit") {
    val src = tmp("iv-rw-src"); val view = tmp("iv-rw-view")
    CommitLog.append(spark.range(10).selectExpr("id", "'a' AS g", "1.0 AS x"), src)
    val v1 = IncrementalView.refresh(spark, src, view, Seq("g"), "x", 0L)
    CommitLog.compact(spark, src) // re-stages existing rows into new files
    CommitLog.append(spark.range(10, 12).selectExpr("id", "'a' AS g", "1.0 AS x"), src)
    // silently double-counting the compacted rows would be corruption —
    // the append-only contract is enforced, not just documented
    intercept[IllegalArgumentException](
      IncrementalView.refresh(spark, src, view, Seq("g"), "x", v1))
  }

  test("a delta introducing a brand-new group joins the view") {
    val src = tmp("iv-src2"); val view = tmp("iv-view2")
    CommitLog.append(spark.range(10).selectExpr("id", "'a' AS g", "1.5 AS x"), src)
    val v1 = IncrementalView.refresh(spark, src, view, Seq("g"), "x", 0L)
    CommitLog.append(spark.range(5).selectExpr("id", "'b' AS g", "2.5 AS x"), src)
    IncrementalView.refresh(spark, src, view, Seq("g"), "x", v1)
    val rows = IncrementalView.serve(spark, view).orderBy("g").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L, 5L))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(15.0, 12.5))
  }
}
