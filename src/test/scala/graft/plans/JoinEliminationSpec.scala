package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** RELY-constraint join elimination: declared `constraint.pk` /
  * `constraint.fk.<col>` table properties let the optimizer drop fact⋈dim
  * joins whose dimension side is never consumed — and the declarations
  * themselves are validated against the data (ADD CONSTRAINT semantics)
  * and enforced for new rows on every append.
  */
class JoinEliminationSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-jelim").toString

  private def view(root: String): String = {
    val v = s"je_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $v " +
      s"USING `graft-commitlog` OPTIONS (path '$root')")
    v
  }

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  /** dim: 10 unique keys; fact: 100 rows, every fk a valid parent. */
  private def fixture(): (String, String) = {
    val dim = tmp(); val fact = tmp()
    CommitLog.append(
      spark.range(10).selectExpr("id AS pk", "concat('d', id) AS dname"), dim)
    CommitLog.setTableProperties(dim, Map(CommitLog.PkProp -> "pk"))
    CommitLog.append(
      spark.range(100).selectExpr("id", "id % 10 AS fk",
        "CAST(id AS DOUBLE) AS v"), fact)
    CommitLog.setTableProperties(fact,
      Map(s"${CommitLog.FkPropPrefix}fk" -> s"$dim::pk"))
    (dim, fact)
  }

  test("inner fact-dim join with only fact columns consumed is eliminated " +
      "and answers match the real join") {
    val (dim, fact) = fixture()
    val fv = view(fact); val dv = view(dim)
    val q = spark.sql(
      s"""SELECT fk, count(*) AS n, sum(v) AS sv
         |FROM $fv f JOIN $dv d ON f.fk = d.pk
         |GROUP BY fk ORDER BY fk""".stripMargin)
    assert(!hasJoin(q), q.queryExecution.optimizedPlan.toString)
    val want = spark.sql(
      s"SELECT fk, count(*) AS n, sum(v) AS sv FROM $fv GROUP BY fk ORDER BY fk")
      .collect().toSeq
    assert(q.collect().toSeq == want)
  }

  test("left outer join to a declared-unique key is eliminated even with " +
      "a dim-side filter; inner is NOT eliminated when the dim is filtered") {
    val (dim, fact) = fixture()
    val fv = view(fact); val dv = view(dim)
    val louter = spark.sql(
      s"""SELECT f.id, f.v FROM $fv f
         |LEFT JOIN (SELECT * FROM $dv WHERE pk < 5) d ON f.fk = d.pk
         |ORDER BY f.id""".stripMargin)
    assert(!hasJoin(louter), louter.queryExecution.optimizedPlan.toString)
    assert(louter.count() == 100)
    val inner = spark.sql(
      s"""SELECT f.id, f.v FROM $fv f
         |JOIN (SELECT * FROM $dv WHERE pk < 5) d ON f.fk = d.pk""".stripMargin)
    assert(hasJoin(inner))
    assert(inner.count() == 50)
  }

  test("join survives when dim columns are consumed, when no constraint " +
      "is declared, and when the rewrite is disabled") {
    val (dim, fact) = fixture()
    val fv = view(fact); val dv = view(dim)
    val uses = spark.sql(
      s"SELECT f.fk, d.dname FROM $fv f JOIN $dv d ON f.fk = d.pk")
    assert(hasJoin(uses))
    // no declaration: a fresh dim without constraint.pk keeps the join
    val bare = tmp()
    CommitLog.append(
      spark.range(10).selectExpr("id AS pk", "concat('d', id) AS dname"), bare)
    val bv = view(bare)
    val noDecl = spark.sql(
      s"SELECT f.id FROM $fv f LEFT JOIN $bv d ON f.fk = d.pk")
    assert(hasJoin(noDecl))
    spark.conf.set(JoinElimination.EnabledConf, "false")
    try {
      val off = spark.sql(
        s"SELECT f.id FROM $fv f LEFT JOIN $dv d ON f.fk = d.pk")
      assert(hasJoin(off))
    } finally spark.conf.unset(JoinElimination.EnabledConf)
  }

  test("declaring a pk on duplicate or null data is rejected; declaring " +
      "an fk with orphans or an undeclared parent key is rejected") {
    val t = tmp()
    CommitLog.append(spark.range(10).selectExpr("id % 5 AS pk"), t)
    val e1 = intercept[IllegalArgumentException] {
      CommitLog.setTableProperties(t, Map(CommitLog.PkProp -> "pk"))
    }
    assert(e1.getMessage.contains("duplicate or null"))
    val (dim, _) = fixture()
    val orphan = tmp()
    CommitLog.append(spark.range(12).selectExpr("id AS fk"), orphan)
    val e2 = intercept[IllegalArgumentException] {
      CommitLog.setTableProperties(orphan,
        Map(s"${CommitLog.FkPropPrefix}fk" -> s"$dim::pk"))
    }
    assert(e2.getMessage.contains("has no parent"))
    val e3 = intercept[IllegalArgumentException] {
      CommitLog.setTableProperties(orphan,
        Map(s"${CommitLog.FkPropPrefix}fk" -> s"$t::pk"))
    }
    assert(e3.getMessage.contains("does not declare"))
  }

  test("appends enforce declared constraints: duplicate/existing pk and " +
      "orphan/null fk batches abort, valid batches commit") {
    val (dim, fact) = fixture()
    // duplicate-in-batch pk
    val e1 = intercept[IllegalArgumentException] {
      CommitLog.append(
        spark.range(2).selectExpr("CAST(99 AS BIGINT) AS pk", "'x' AS dname"), dim)
    }
    assert(e1.getMessage.contains("duplicate or null"))
    // re-insert of an existing pk
    val e2 = intercept[IllegalArgumentException] {
      CommitLog.append(
        spark.range(1).selectExpr("CAST(3 AS BIGINT) AS pk", "'x' AS dname"), dim)
    }
    assert(e2.getMessage.contains("re-inserts"))
    // orphan fk
    val e3 = intercept[IllegalArgumentException] {
      CommitLog.append(
        spark.range(1).selectExpr("CAST(1000 AS BIGINT) AS id", "CAST(77 AS BIGINT) AS fk", "CAST(0.0 AS DOUBLE) AS v"), fact)
    }
    assert(e3.getMessage.contains("no parent"))
    // null fk
    val e4 = intercept[IllegalArgumentException] {
      CommitLog.append(spark.range(1).selectExpr(
        "CAST(1000 AS BIGINT) AS id", "CAST(NULL AS BIGINT) AS fk", "CAST(0.0 AS DOUBLE) AS v"), fact)
    }
    assert(e4.getMessage.contains("null"))
    // valid appends still work
    CommitLog.append(
      spark.range(1).selectExpr("CAST(42 AS BIGINT) AS pk", "'d42' AS dname"), dim)
    CommitLog.append(
      spark.range(1).selectExpr("CAST(1000 AS BIGINT) AS id", "CAST(42 AS BIGINT) AS fk", "CAST(1.0 AS DOUBLE) AS v"), fact)
    assert(CommitLog.read(spark, fact).count() == 101)
  }

  test("a dim-side delete stales INNER elimination (removed parents would " +
      "orphan fact rows) but not LEFT — and re-declaration restores it") {
    val (dim, fact) = fixture()
    val fv = view(fact); val dv = view(dim)
    def inner = spark.sql(
      s"SELECT fk, count(*) AS n FROM $fv f JOIN $dv d ON f.fk = d.pk GROUP BY fk")
    def louter = spark.sql(
      s"SELECT f.id FROM $fv f LEFT JOIN $dv d ON f.fk = d.pk")
    assert(!hasJoin(inner) && !hasJoin(louter))
    // DELETE a parent: the fk declaration's validation no longer covers
    // the data — an eliminated inner join would return fk=3 rows a real
    // join drops. Pure deletes cannot duplicate the pk, so LEFT holds.
    CommitLog.delete(spark, dim, col("pk") === 3L)
    assert(hasJoin(inner), inner.queryExecution.optimizedPlan.toString)
    assert(!hasJoin(louter))
    // the declined plan is also CORRECT: fk=3 group is gone
    assert(!inner.collect().map(_.getLong(0)).contains(3L))
    // re-declare (re-validates against current data): fails while orphans
    // exist, succeeds once the orphaned fact rows are removed — and the
    // fresh stamp re-enables elimination
    intercept[IllegalArgumentException] {
      CommitLog.setTableProperties(fact,
        Map(s"${CommitLog.FkPropPrefix}fk" -> s"$dim::pk"))
    }
    CommitLog.delete(spark, fact, col("fk") === 3L)
    CommitLog.setTableProperties(fact,
      Map(s"${CommitLog.FkPropPrefix}fk" -> s"$dim::pk"))
    assert(!hasJoin(inner), inner.queryExecution.optimizedPlan.toString)
  }

  test("a dim-side UPDATE stales LEFT elimination too (an update can " +
      "duplicate the key) until the pk is re-declared") {
    val (dim, fact) = fixture()
    val fv = view(fact); val dv = view(dim)
    def louter = spark.sql(
      s"SELECT f.id FROM $fv f LEFT JOIN $dv d ON f.fk = d.pk")
    assert(!hasJoin(louter))
    CommitLog.update(spark, dim, Seq("dname" -> lit("renamed")),
      col("pk") === 2L)
    assert(hasJoin(louter), louter.queryExecution.optimizedPlan.toString)
    // re-declaring the pk re-validates uniqueness and restores elimination
    CommitLog.setTableProperties(dim, Map(CommitLog.PkProp -> "pk"))
    assert(!hasJoin(louter))
  }

  test("RELY validation stamps cannot be forged: setting or unsetting " +
      "constraint.*.v/.dimv directly is rejected, and dropping a " +
      "constraint drops its stamps") {
    val (dim, fact) = fixture()
    val fv = view(fact); val dv = view(dim)
    def inner = spark.sql(
      s"SELECT fk, count(*) AS n FROM $fv f JOIN $dv d ON f.fk = d.pk GROUP BY fk")
    // stale the fk by deleting a parent, then try to forge freshness
    CommitLog.delete(spark, dim, col("pk") === 3L)
    assert(hasJoin(inner))
    val forged = CommitLog.currentVersion(fact).get + 10
    Seq(
      Map(s"${CommitLog.FkPropPrefix}fk.v" -> forged.toString),
      Map(s"${CommitLog.FkPropPrefix}fk.dimv" -> forged.toString),
      Map(s"${CommitLog.PkProp}.v" -> forged.toString)
    ).foreach { set =>
      val e = intercept[IllegalArgumentException] {
        CommitLog.setTableProperties(fact, set)
      }
      assert(e.getMessage.contains("validation stamp"), e.getMessage)
    }
    val e2 = intercept[IllegalArgumentException] {
      CommitLog.setTableProperties(fact, Map.empty,
        unset = Seq(s"${CommitLog.FkPropPrefix}fk.v"))
    }
    assert(e2.getMessage.contains("validation stamp"), e2.getMessage)
    // still declined — the forgeries never landed
    assert(hasJoin(inner))
    // an FK ON a column literally named "v" is a constraint, not a stamp:
    // the stamp shape requires a column name before the suffix
    val vTable = tmp()
    CommitLog.append(spark.range(5).selectExpr("id % 2 AS v"), vTable)
    CommitLog.setTableProperties(vTable,
      Map(s"${CommitLog.FkPropPrefix}v" -> s"$dim::pk"))
    // dropping the constraint drops its stamps with it
    CommitLog.setTableProperties(vTable, Map.empty,
      unset = Seq(s"${CommitLog.FkPropPrefix}v"))
    val left = CommitLog.tablePropertiesOf(vTable).keys
      .filter(_.startsWith("constraint."))
    assert(left.isEmpty, left.toString)
  }

  test("multiAppend enforces relational constraints (it skipped " +
      "enforceRelational before r8)") {
    val (dim, fact) = fixture()
    val coord = tmp()
    val e = intercept[Exception] {
      CommitLog.multiAppend(Seq(
        (spark.range(1).selectExpr("CAST(1000 AS BIGINT) AS id",
          "CAST(77 AS BIGINT) AS fk", "CAST(0.0 AS DOUBLE) AS v"), fact),
        (spark.range(1).selectExpr("CAST(50 AS BIGINT) AS pk",
          "'d50' AS dname"), dim)), coord)
    }
    assert(e.getMessage.contains("no parent"), e.getMessage)
    // nothing landed visibly on either table
    assert(CommitLog.read(spark, fact).count() == 100)
    assert(CommitLog.read(spark, dim).count() == 10)
    // a valid multi-batch still commits both
    CommitLog.multiAppend(Seq(
      (spark.range(1).selectExpr("CAST(1000 AS BIGINT) AS id",
        "CAST(5 AS BIGINT) AS fk", "CAST(0.0 AS DOUBLE) AS v"), fact),
      (spark.range(1).selectExpr("CAST(50 AS BIGINT) AS pk",
        "'d50' AS dname"), dim)), coord)
    assert(CommitLog.read(spark, fact).count() == 101)
    assert(CommitLog.read(spark, dim).count() == 11)
  }
}
