package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** The metadata-aggregate rewrite: count/min/max answered from the
  * manifest (LocalTableScan, no file scan) exactly when provably exact,
  * and a clean fall-back to the normal scan everywhere else — filters,
  * deletion vectors, missing stats, disabled conf.
  */
class MetadataAggregateSpec extends SparkTestBase {

  private def tmpTable(): String =
    Files.createTempDirectory("graft-mdagg").toString

  private def view(root: String): String = {
    val v = s"mdagg_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $v " +
      s"USING `graft-commitlog` OPTIONS (path '$root')")
    v
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def answersFromMetadata(df: DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("LocalTableScan") && !p.contains("FileScan")
  }

  test("count(*)/count(c)/min/max over a bare table answer from metadata") {
    val root = tmpTable()
    CommitLog.append(spark.range(100)
      .selectExpr("id", "CASE WHEN id % 4 = 0 THEN NULL " +
        "ELSE concat('k', id % 10) END AS k"), root)
    CommitLog.append(spark.range(100, 250)
      .selectExpr("id", "concat('k', id % 10) AS k"), root)
    val q = spark.sql(s"SELECT count(*) AS n, count(k) AS nk, " +
      s"min(id) AS lo, max(id) AS hi, max(k) AS mk FROM ${view(root)}")
    assert(answersFromMetadata(q), planOf(q))
    val r = q.collect()(0)
    assert(r.getLong(0) == 250L && r.getLong(1) == 225L)
    assert(r.getLong(2) == 0L && r.getLong(3) == 249L)
    assert(r.getString(4) == "k9")
  }

  test("filters, grouping, and other aggregates keep the real scan") {
    val root = tmpTable()
    CommitLog.append(spark.range(50).selectExpr("id", "id * 2 AS v"), root)
    val filtered = spark.sql(
      s"SELECT count(*) FROM ${view(root)} WHERE id > 10")
    assert(!answersFromMetadata(filtered))
    assert(filtered.collect()(0).getLong(0) == 39L)
    val grouped = spark.sql(
      s"SELECT id % 2, count(*) FROM ${view(root)} GROUP BY 1")
    assert(!answersFromMetadata(grouped) && grouped.count() == 2)
    // integral sums ARE metadata-answerable (see the sum test); the
    // unsupported-aggregate fallback is exercised with avg
    val summed = spark.sql(s"SELECT sum(v) FROM ${view(root)}")
    assert(answersFromMetadata(summed))
    assert(summed.collect()(0).getLong(0) == 49L * 50L)
    val avged = spark.sql(s"SELECT avg(v) FROM ${view(root)}")
    assert(!answersFromMetadata(avged))
    assert(avged.collect()(0).getDouble(0) == 49.0)
    val distinct = spark.sql(
      s"SELECT count(DISTINCT id) FROM ${view(root)}")
    assert(!answersFromMetadata(distinct))
    assert(distinct.collect()(0).getLong(0) == 50L)
  }

  test("deletion vectors force the scan; counts reflect the deletes") {
    val root = tmpTable()
    CommitLog.append(spark.range(60).selectExpr("id"), root)
    CommitLog.deleteDV(spark, root, col("id") % 3 === 0)
    val q = spark.sql(s"SELECT count(*) AS n FROM ${view(root)}")
    assert(!answersFromMetadata(q))
    assert(q.collect()(0).getLong(0) == 40L)
  }

  test("time travel answers from the pinned version's manifest") {
    val root = tmpTable()
    CommitLog.append(spark.range(30).selectExpr("id"), root)
    CommitLog.append(spark.range(30, 80).selectExpr("id"), root)
    val v = view(root)
    val pinned = spark.sql(
      s"SELECT count(*) AS n, max(id) AS hi FROM $v VERSION AS OF 1")
    assert(answersFromMetadata(pinned), planOf(pinned))
    val r = pinned.collect()(0)
    assert(r.getLong(0) == 30L && r.getLong(1) == 29L)
    val cur = spark.sql(s"SELECT count(*) FROM $v").collect()(0).getLong(0)
    assert(cur == 80L)
  }

  test("renamed columns answer through the physical mapping; timestamps " +
      "parse through statParse; conf disables the rewrite") {
    val root = tmpTable()
    CommitLog.append(spark.range(40).selectExpr("id",
      "timestamp_micros(1700000000000000 + id * 1000000) AS ts"), root)
    CommitLog.renameColumn(root, "id", "uid")
    val q = spark.sql(
      s"SELECT max(uid) AS hi, min(ts) AS t0 FROM ${view(root)}")
    assert(answersFromMetadata(q), planOf(q))
    val r = q.collect()(0)
    assert(r.getLong(0) == 39L)
    assert(r.getTimestamp(1).getTime == 1700000000000L)
    spark.conf.set(MetadataAggregate.EnabledConf, "false")
    try {
      val off = spark.sql(s"SELECT max(uid) FROM ${view(root)}")
      assert(!answersFromMetadata(off))
      assert(off.collect()(0).getLong(0) == 39L)
    } finally spark.conf.unset(MetadataAggregate.EnabledConf)
  }

  test("sum of integral columns answers from per-file exact sums; " +
      "doubles and all-null sums keep exact SQL semantics") {
    val root = tmpTable()
    import spark.implicits._
    CommitLog.append(spark.range(1000)
      .selectExpr("id", "CAST(id AS DOUBLE) AS v"), root)
    CommitLog.append(Seq((1000L, null), (1001L, null))
      .asInstanceOf[Seq[(Long, Option[Double])]].toDF("id", "v")
      .selectExpr("id", "CAST(v AS DOUBLE) AS v").coalesce(1), root)
    val q = spark.sql(
      s"SELECT sum(id) AS s, count(*) AS n FROM ${view(root)}")
    assert(answersFromMetadata(q), planOf(q))
    assert(q.collect()(0).getLong(0) == (0L until 1002L).sum)
    // double sums are NOT structurally exact → real scan
    val dq = spark.sql(s"SELECT sum(v) FROM ${view(root)}")
    assert(!answersFromMetadata(dq))
    // a column that is null in EVERY row sums to SQL null — from metadata
    val root2 = tmpTable()
    CommitLog.append(spark.range(5)
      .selectExpr("id", "CAST(NULL AS BIGINT) AS w").coalesce(1), root2)
    val nq = spark.sql(s"SELECT sum(w) AS s FROM ${view(root2)}")
    assert(answersFromMetadata(nq), planOf(nq))
    assert(nq.collect()(0).isNullAt(0))
  }

  test("GROUP BY a partition column answers from the manifest: one row " +
      "per partition, counts and min/max folded per file") {
    val root = tmpTable()
    val df = spark.range(120).selectExpr("id",
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS k",
      "CAST(id AS DOUBLE) AS v")
    CommitLog.append(df.filter(col("id") < 60), root, partitionBy = Seq("k"))
    CommitLog.append(df.filter(col("id") >= 60), root)
    val q = spark.sql(s"SELECT k, count(*) AS n, min(id) AS lo, " +
      s"max(id) AS hi FROM ${view(root)} GROUP BY k")
    assert(answersFromMetadata(q), planOf(q))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    val want = df.groupBy("k").agg(count(lit(1)), min("id"), max("id"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.size == 3)
    // grouped sums fold from the same per-file exact sums
    val qs = spark.sql(s"SELECT k, sum(id) AS s FROM ${view(root)} GROUP BY k")
    assert(answersFromMetadata(qs), planOf(qs))
    val gotS = qs.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val wantS = df.groupBy("k").agg(sum("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotS == wantS)
    // grouping by a NON-single-valued column keeps the real scan
    val multi = spark.sql(
      s"SELECT id % 2, count(*) FROM ${view(root)} GROUP BY 1")
    assert(!answersFromMetadata(multi) && multi.count() == 2)
  }

  test("GROUP BY with a null partition value: the writer's default " +
      "partition folds to the SQL null group") {
    val root = tmpTable()
    import spark.implicits._
    CommitLog.append(Seq((1L, "x"), (2L, "x"), (3L, "y"))
      .toDF("id", "k").coalesce(1), root, partitionBy = Seq("k"))
    CommitLog.append(Seq((4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])).toDF("id", "k").coalesce(1), root)
    val q = spark.sql(s"SELECT k, count(*) AS n FROM ${view(root)} GROUP BY k")
    assert(answersFromMetadata(q), planOf(q))
    val got = q.collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got == Set((Some("x"), 2L), (Some("y"), 1L), (None, 2L)))
  }

  test("an all-null generation stays answerable; a from-scratch min over " +
      "only-null values is SQL-null") {
    val root = tmpTable()
    import spark.implicits._
    CommitLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), root)
    CommitLog.append(
      Seq((3L, null.asInstanceOf[String])).toDF("id", "k").coalesce(1), root)
    val q = spark.sql(
      s"SELECT count(k) AS nk, min(k) AS lo, max(id) AS hi FROM ${view(root)}")
    assert(answersFromMetadata(q), planOf(q))
    val r = q.collect()(0)
    assert(r.getLong(0) == 2L && r.getString(1) == "a" && r.getLong(2) == 3L)
    // a table where the column is null EVERYWHERE: min/max are null
    val root2 = tmpTable()
    CommitLog.append(Seq((1L, null.asInstanceOf[String]))
      .toDF("id", "k").coalesce(1), root2)
    val q2 = spark.sql(s"SELECT min(k) AS lo, count(k) AS nk FROM ${view(root2)}")
    assert(answersFromMetadata(q2), planOf(q2))
    val r2 = q2.collect()(0)
    assert(r2.isNullAt(0) && r2.getLong(1) == 0L)
  }
}
