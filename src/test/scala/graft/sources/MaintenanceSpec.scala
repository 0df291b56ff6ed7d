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

  private def meta(table: String) = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.sessionState.catalog.getTableMetadata(
      cs.sessionState.sqlParser.parseTableIdentifier(table))
  }

  test("compact preserves the partition spec of a partitioned table") {
    import spark.implicits._
    (1 to 6).foreach { i =>
      Seq((i.toLong, s"2021-0${(i % 3) + 1}-01", s"v$i")).toDF("id", "month", "v")
        .write.mode("append").partitionBy("month").saveAsTable("mnt_part")
    }
    val before = spark.table("mnt_part").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    Maintenance.compact(spark, "mnt_part", targetFileBytes = 1024L * 1024)
    assert(meta("mnt_part").partitionColumnNames == Seq("month"),
      "partitioning must survive compaction (refreshMonths depends on it)")
    // partition pruning still works post-compaction
    val pruned = spark.table("mnt_part").filter($"month" === "2021-01-01")
    assert(pruned.count() == 2)
    val after = spark.table("mnt_part").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    spark.sql("DROP TABLE mnt_part")
  }

  test("compact preserves the bucket spec of a bucketed table") {
    import spark.implicits._
    (1 to 4).foreach { i =>
      Seq((i.toLong, i * 10L)).toDF("k", "v")
        .write.mode("append").bucketBy(4, "k").sortBy("k").saveAsTable("mnt_bkt")
    }
    Maintenance.compact(spark, "mnt_bkt", targetFileBytes = 1024L * 1024)
    val b = meta("mnt_bkt").bucketSpec
    assert(b.isDefined, "bucket spec must survive compaction")
    assert(b.get.numBuckets == 4 && b.get.bucketColumnNames == Seq("k") &&
      b.get.sortColumnNames == Seq("k"))
    assert(spark.table("mnt_bkt").count() == 4)
    spark.sql("DROP TABLE mnt_bkt")
  }
}
