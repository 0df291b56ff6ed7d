package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SCD2 maintenance: one merge per batch closes changed versions, opens
  * new ones, inserts first versions, drops value-identical rows; replays
  * are no-ops; and the streaming sink equals batch-by-batch merges.
  */
class Scd2Spec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-scd2").toString

  private def d(s: String) = Date.valueOf(s)

  test("merge closes changed keys, drops no-ops, inserts new keys; a " +
      "replayed batch is a no-op; a later batch stacks a third version") {
    val t = tmp()
    Scd2.init(spark.range(4).selectExpr(
      "id AS k", "concat('v0-', id) AS attr"), t, d("2020-01-01"))
    // batch 1: k=0 changes, k=1 arrives value-identical, k=9 is new
    val b1 = spark.createDataFrame(Seq(
      (0L, "v1-0"), (1L, "v0-1"), (9L, "v1-9"))).toDF("k", "attr")
    val v1 = Scd2.merge(spark, t, b1, "k", d("2021-01-01"))
    val rows = CommitLog.read(spark, t)
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, r.getDate(3).toString, r.getBoolean(4))).toSet
    assert(rows == Set(
      (0L, "v0-0", "2020-01-01", "2021-01-01", false),
      (0L, "v1-0", "2021-01-01", "2099-12-31", true),
      (1L, "v0-1", "2020-01-01", "2099-12-31", true), // no-op untouched
      (2L, "v0-2", "2020-01-01", "2099-12-31", true),
      (3L, "v0-3", "2020-01-01", "2099-12-31", true),
      (9L, "v1-9", "2021-01-01", "2099-12-31", true)))
    // replay: same batch, same effective date — no new version
    assert(Scd2.merge(spark, t, b1, "k", d("2021-01-01")) == v1)
    // batch 2: k=0 changes AGAIN — three stacked versions
    Scd2.merge(spark, t,
      spark.createDataFrame(Seq((0L, "v2-0"))).toDF("k", "attr"),
      "k", d("2022-01-01"))
    val k0 = CommitLog.read(spark, t).filter(col("k") === 0L)
      .select("attr", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getBoolean(3))).toSet
    assert(k0 == Set(
      ("v0-0", "2020-01-01", "2021-01-01", false),
      ("v1-0", "2021-01-01", "2022-01-01", false),
      ("v2-0", "2022-01-01", "2099-12-31", true)))
  }

  test("streaming scd2Sink equals sequential batch merges and a replayed " +
      "micro-batch leaves the dimension unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val streamT = tmp(); val batchT = tmp()
    val snap = spark.range(6).selectExpr("id AS k", "concat('a', id) AS attr")
    Scd2.init(snap, streamT, d("2020-01-01"))
    Scd2.init(snap, batchT, d("2020-01-01"))
    val effOf = (batchId: Long) =>
      Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(batchId))
    val b0 = Seq((0L, "b0"), (1L, "b1"))
    val b1 = Seq((0L, "c0"), (5L, "b5"), (7L, "new7"))
    val sink = graft.streaming.StreamingAnalytics.scd2Sink(streamT, "k", effOf)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "attr").writeStream.foreachBatch(sink).start()
    try {
      mem.addData(b0); q.processAllAvailable()
      mem.addData(b1); q.processAllAvailable()
    } finally q.stop()
    Scd2.merge(spark, batchT, b0.toDF("k", "attr"), "k", effOf(0))
    Scd2.merge(spark, batchT, b1.toDF("k", "attr"), "k", effOf(1))
    def all(t: String) = CommitLog.read(spark, t)
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq).toSet
    assert(all(streamT) == all(batchT))
    // replayed micro-batch (same data, same batchId → same eff): no-op
    val v = CommitLog.currentVersion(streamT)
    sink(b1.toDF("k", "attr"), 1L)
    assert(CommitLog.currentVersion(streamT) == v)
  }
}
