package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Declared masking policies: the masked view hides raw values under the
  * declared policy per column, passes undeclared columns through, rejects
  * unknown policies at SET time, and registers as a SQL-reachable view.
  */
class MaskingSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-mask").toString

  test("each policy masks as specified; undeclared columns pass through") {
    val t = tmp()
    CommitLog.append(spark.range(10).selectExpr(
      "id", "concat('user-', id, '-4567') AS phone",
      "CAST(id * 37 AS DOUBLE) AS amount", "concat('n', id) AS note"), t)
    CommitLog.setTableProperties(t, Map(
      "mask.id" -> "hash64", "mask.phone" -> "last4",
      "mask.amount" -> "bucket:50", "mask.note" -> "redact"))
    val m = Masking.masked(spark, t).orderBy("phone").collect()
    // last4: '***' + tail; raw prefix hidden
    assert(m.forall(_.getString(1).startsWith("***")))
    assert(m.exists(_.getString(1) == "***4567"))
    // bucket: multiples of 50 only
    assert(m.forall(r => r.getDouble(2) % 50 == 0))
    // redact: all null
    assert(m.forall(_.isNullAt(3)))
    // hash64: deterministic pseudonyms, distinct for distinct inputs here
    assert(m.map(_.getLong(0)).distinct.length == 10)
    val again = Masking.masked(spark, t).orderBy("phone").collect()
    assert(m.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("rowfilter hides non-matching rows from the governed view and a " +
      "typo'd filter is rejected at SET time") {
    val t = tmp()
    CommitLog.append(spark.range(10).selectExpr(
      "id", "CASE WHEN id % 2 = 0 THEN 'pub' ELSE 'priv' END AS vis"), t)
    val e = intercept[IllegalArgumentException] {
      CommitLog.setTableProperties(t, Map("rowfilter" -> "nope = 'pub'"))
    }
    assert(e.getMessage.contains("does not analyze"))
    CommitLog.setTableProperties(t, Map("rowfilter" -> "vis = 'pub'"))
    val m = Masking.masked(spark, t)
    assert(m.count() == 5)
    assert(m.filter(col("vis") === "priv").count() == 0)
    // raw read is unaffected — governance applies to the view, not the log
    assert(CommitLog.read(spark, t).count() == 10)
  }

  test("unknown policy is rejected at SET time; masked view is reachable " +
      "from SQL") {
    val t = tmp()
    CommitLog.append(spark.range(5).selectExpr("id", "concat('x', id) AS s"), t)
    val e = intercept[IllegalArgumentException] {
      CommitLog.setTableProperties(t, Map("mask.s" -> "rot13"))
    }
    assert(e.getMessage.contains("unknown masking policy"))
    CommitLog.setTableProperties(t, Map("mask.s" -> "redact"))
    Masking.maskedView(spark, t, "masked_spec_view")
    val rows = spark.sql(
      "SELECT count(s) AS visible, count(*) AS n FROM masked_spec_view")
      .collect().head
    assert(rows.getLong(0) == 0 && rows.getLong(1) == 5)
  }
}
