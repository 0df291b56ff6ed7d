package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.sources.CommitLog

/** Throwaway experiment harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("scratch-cl").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    CommitLog.append(df, root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW t USING `graft-commitlog` OPTIONS (path '$root')")
    println("== SELECT works: " + spark.table("t").count())

    def attempt(label: String, sql: String): Unit = {
      println(s"\n######## $label: $sql")
      try {
        val out = spark.sql(sql)
        println("OK, result rows=" + out.collect().length)
        spark.table("t").orderBy("k").show(20, false)
      } catch {
        case e: Throwable =>
          println(s"FAILED: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(600)}")
      }
    }

    attempt("DELETE", "DELETE FROM t WHERE k = 2")
    attempt("UPDATE", "UPDATE t SET v = v * 2 WHERE k = 1")
    attempt("MERGE",
      """MERGE INTO t USING (SELECT 3L AS k, 'zz' AS s, 99.0 AS v
        |                    UNION ALL SELECT 9L, 'new', 1.0
        |                    UNION ALL SELECT 1L, 'del', 0.0) src
        |ON t.k = src.k
        |WHEN MATCHED AND src.s = 'del' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    attempt("MERGE insert-only",
      """MERGE INTO t USING (SELECT 3L AS k, 'nope' AS s, 0.0 AS v
        |                    UNION ALL SELECT 77L, 'io', 7.0) src
        |ON t.k = src.k
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    attempt("VERSION AS OF 1", "SELECT * FROM t VERSION AS OF 1")
    println("history:")
    CommitLog.history(spark, root).show(20, false)
    val c1ts = CommitLog.history(spark, root).orderBy("version")
      .collect()(0).getTimestamp(2).getTime
    attempt("TIMESTAMP AS OF", {
      val s = new java.sql.Timestamp(c1ts).toString
      s"SELECT * FROM t TIMESTAMP AS OF '$s'"
    })
    CommitLog.tag(root, "after-delete", Some(2L))
    attempt("VERSION AS OF tag", "SELECT * FROM t VERSION AS OF 'after-delete'")
    spark.stop()
  }
}
