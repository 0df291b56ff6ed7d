package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Right-to-erasure across a table family: one [[CommitLog.forgetKeys]]
  * call removes a subject's rows from every table at a single marker
  * instant, skips tables with nothing to erase, and leaves history intact
  * until vacuum (the documented DV + compact + vacuum two-phase contract).
  */
class ForgetKeysSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-forget").toString

  test("one call erases the subject from every table, skips untouched " +
      "tables, and a re-run is a no-op") {
    val activity = tmp(); val profile = tmp(); val unrelated = tmp()
    val coord = tmp()
    CommitLog.append(
      spark.range(1000).selectExpr("id AS evt", "id % 50 AS user_id"),
      activity)
    CommitLog.append(
      spark.range(50).selectExpr("id AS user_id", "concat('u', id) AS name"),
      profile)
    CommitLog.append(
      spark.range(20).selectExpr("id + 1000 AS user_id"), unrelated)
    val before = CommitLog.currentVersion(unrelated).get

    val vs = CommitLog.forgetKeys(spark,
      Seq((activity, "user_id"), (profile, "user_id"), (unrelated, "user_id")),
      keys = Seq(7L, 13L), coord = coord)

    // both holding tables erased at their new version
    assert(CommitLog.read(spark, activity)
      .filter(col("user_id").isin(7L, 13L)).count() == 0)
    assert(CommitLog.read(spark, activity).count() == 1000 - 2 * 20)
    assert(CommitLog.read(spark, profile)
      .filter(col("user_id").isin(7L, 13L)).count() == 0)
    assert(CommitLog.read(spark, profile).count() == 48)
    // the unrelated table skipped — same version, untouched
    assert(vs(unrelated) == before)
    assert(CommitLog.read(spark, unrelated).count() == 20)
    // pre-erasure snapshot still shows the subject (until vacuum)
    assert(CommitLog.read(spark, activity, Some(vs(activity) - 1))
      .filter(col("user_id") === 7L).count() == 20)
    // re-running the same erasure finds nothing live to delete
    val vs2 = CommitLog.forgetKeys(spark,
      Seq((activity, "user_id"), (profile, "user_id")),
      keys = Seq(7L, 13L), coord = coord)
    assert(CommitLog.read(spark, activity).count() == 960)
    assert(CommitLog.read(spark, profile).count() == 48)
    assert(vs2(profile) <= vs(profile) + 1)
  }

  test("physical erasure completes via compact: the rewritten files " +
      "materialize the deletion vectors away") {
    val t = tmp(); val coord = tmp()
    CommitLog.append(
      spark.range(100).selectExpr("id AS user_id", "id * 2 AS v"), t)
    CommitLog.forgetKeys(spark, Seq((t, "user_id")), Seq(42L), coord)
    val m0 = CommitLog.read(spark, t)
    assert(m0.filter(col("user_id") === 42L).count() == 0)
    CommitLog.compact(spark, t)
    assert(CommitLog.read(spark, t).count() == 99)
    assert(CommitLog.read(spark, t).filter(col("user_id") === 42L).count() == 0)
  }
}
