package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.{CommitLog, IncrementalView, MvRegistry}

/** The automatic materialized-view rewrite: aggregates over the BASE
  * table reroute to the registered incremental view exactly when provably
  * exact — same grouping set or a rollup subset of it, count(*) and the
  * exact-decimal sum shape, fresh (or pinned-at-reflected) version — and
  * fall back to the real scan on staleness, filters, non-derivable
  * aggregates, and disabled conf.
  */
class MvRewriteSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-mvrw").toString

  private def view(root: String): String = {
    val v = s"mvrw_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $v " +
      s"USING `graft-commitlog` OPTIONS (path '$root')")
    v
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def readsOnly(df: DataFrame, wantRoot: String,
      notRoot: String): Boolean = {
    val p = planOf(df)
    p.contains(wantRoot) && !p.contains(notRoot)
  }

  private val sumSql = "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"

  private def base(src: String): DataFrame =
    spark.range(200).selectExpr("id",
      "concat('t', id % 5) AS event_type",
      "CAST(id AS DOUBLE) / 8 AS value")

  test("fresh view answers same-group and rollup aggregates; values " +
      "equal the scan's") {
    val src = tmp(); val mv = tmp()
    CommitLog.append(base(src), src)
    IncrementalView.refresh(spark, src, mv, Seq("event_type"), "value", 0L)
    val v = view(src)
    val grouped = spark.sql(s"SELECT event_type, count(*) AS cnt, " +
      s"$sumSql AS sum_value FROM $v GROUP BY event_type ORDER BY event_type")
    assert(readsOnly(grouped, mv, src), planOf(grouped))
    val want = base(src).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = grouped.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    // rollup to the global aggregate re-aggregates the view
    val global = spark.sql(s"SELECT count(*) AS n, $sumSql AS s FROM $v")
    assert(readsOnly(global, mv, src), planOf(global))
    assert(global.collect()(0).getLong(0) == 200L)
  }

  test("stale view declines; re-refresh re-arms; pinned time travel at " +
      "the reflected version still rewrites") {
    val src = tmp(); val mv = tmp()
    CommitLog.append(base(src), src)
    val v1 = IncrementalView.refresh(spark, src, mv,
      Seq("event_type"), "value", 0L)
    val reflected = CommitLog.currentVersion(src).get
    CommitLog.append(base(src).limit(10), src)
    val v = view(src)
    val stale = spark.sql(s"SELECT count(*) AS n, $sumSql AS s FROM $v")
    assert(!planOf(stale).contains(mv), planOf(stale))
    assert(stale.collect()(0).getLong(0) == 210L)
    // the pinned (time-travel) read AT the reflected version rewrites
    // even though the base has advanced (through the data source — the
    // rule recognizes commitlog relations, not bare parquet scans)
    val pinned = spark.read.format("graft-commitlog")
      .option("version", reflected).load(src)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("s"))
    assert(planOf(pinned).contains(mv), planOf(pinned))
    assert(pinned.collect()(0).getLong(0) == 200L)
    // catching the view back up re-arms the rewrite
    IncrementalView.refresh(spark, src, mv, Seq("event_type"), "value", v1)
    val again = spark.sql(s"SELECT count(*) AS n, $sumSql AS s FROM $v")
    assert(planOf(again).contains(mv), planOf(again))
    assert(again.collect()(0).getLong(0) == 210L)
  }

  test("filters, raw double sums, count(col), DISTINCT, and non-subset " +
      "grouping keep the real scan") {
    val src = tmp(); val mv = tmp()
    CommitLog.append(base(src), src)
    IncrementalView.refresh(spark, src, mv, Seq("event_type"), "value", 0L)
    val v = view(src)
    for (sql <- Seq(
        s"SELECT count(*) AS n FROM $v WHERE event_type = 't1'",
        s"SELECT sum(value) AS s FROM $v",
        s"SELECT count(value) AS n FROM $v",
        s"SELECT count(DISTINCT event_type) AS n FROM $v",
        s"SELECT id, count(*) AS n FROM $v GROUP BY id")) {
      val df = spark.sql(sql)
      assert(!planOf(df).contains(mv), s"$sql\n${planOf(df)}")
    }
    // conf kill switch
    spark.conf.set(MvRewrite.EnabledConf, "false")
    try {
      val off = spark.sql(s"SELECT count(*) AS n, $sumSql AS s FROM $v")
      assert(!planOf(off).contains(mv))
      assert(off.collect()(0).getLong(0) == 200L)
    } finally spark.conf.unset(MvRewrite.EnabledConf)
  }

  test("attach() re-arms a view from its persisted table properties in a " +
      "registry-cold state") {
    val src = tmp(); val mv = tmp()
    CommitLog.append(base(src), src)
    IncrementalView.refresh(spark, src, mv, Seq("event_type"), "value", 0L)
    MvRegistry.deregister(mv)
    val cold = spark.sql(
      s"SELECT count(*) AS n, $sumSql AS s FROM ${view(src)}")
    assert(!planOf(cold).contains(mv))
    val attached = MvRegistry.attach(mv)
    assert(attached.exists(m => m.srcRoot == src &&
      m.groupCols == Seq("event_type") && m.valueCol == "value"))
    val warm = spark.sql(
      s"SELECT count(*) AS n, $sumSql AS s FROM ${view(src)}")
    assert(planOf(warm).contains(mv), planOf(warm))
    assert(warm.collect()(0).getLong(0) == 200L)
  }
}
