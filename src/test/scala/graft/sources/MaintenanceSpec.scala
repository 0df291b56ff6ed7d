package graft.sources

import graft.SparkTestBase

class MaintenanceSpec extends SparkTestBase {

  test("compact rewrites a many-small-files table into few files, same data") {
    import spark.implicits._
    // simulate micro-batch ingest: 12 tiny appends → ≥12 files
    (1 to 12).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("append").saveAsTable("mnt_t")
    }
    assert(Maintenance.fileCount(spark, "mnt_t") >= 12)
    val before = spark.table("mnt_t").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val n = Maintenance.compact(spark, "mnt_t", targetFileBytes = 1024L * 1024)
    assert(n == 1) // tiny table → one file
    assert(Maintenance.fileCount(spark, "mnt_t") == 1)
    val after = spark.table("mnt_t").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    spark.sql("DROP TABLE mnt_t")
  }
}
