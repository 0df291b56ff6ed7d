package graft.tools

import graft.SparkTestBase

class SqlMagicSpec extends SparkTestBase {

  private lazy val magic = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "tag", "v").createOrReplaceTempView("t")
    new SqlMagic(spark)
  }

  test("renders a right-aligned table capped at --limit rows") {
    val out = magic.run("SELECT id, tag FROM t ORDER BY id", "--limit 2")
    val lines = out.split("\n")
    assert(lines.count(_.startsWith("|")) == 3) // header + 2 rows
    assert(out.contains("| id | tag |"))
    assert(out.contains("|  1 |   a |"))
    assert(!out.contains("| 3 |"))
  }

  test("default limit is 100") {
    val out = magic.run("SELECT id FROM t ORDER BY id")
    assert(out.split("\n").count(_.startsWith("|")) == 4) // header + 3 rows
  }

  test("--limit 1 transposes the first row as (Column, Value)") {
    val out = magic.run("SELECT id, tag, v FROM t ORDER BY id", "--limit 1")
    assert(out.contains("| Column | Value |"))
    assert(out.contains("|     id |     1 |"))
    assert(out.contains("|      v |  10.0 |"))
  }

  test("--var captures the frame and registers a temp view for later SQL") {
    magic.run("SELECT tag, sum(v) AS s FROM t GROUP BY tag", "--var agg")
    assert(magic.vars.contains("agg"))
    val out = magic.run("SELECT s FROM agg WHERE tag = 'a'")
    assert(out.contains("| 40.0 |"))
  }
}
