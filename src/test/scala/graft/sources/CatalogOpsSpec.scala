package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CatalogOpsSpec extends SparkTestBase {

  test("partitioned append: layout is partition-pruned on read") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 3L, "c"), ("2024-01-03", 4L, "d"))
      .toDF("day", "id", "v")
      .withColumn("day", to_date(col("day")))
    CatalogOps.appendTable(spark, df, "pdb", "facts", partitionBy = Seq("day"))

    val parts = spark.sql("SHOW PARTITIONS pdb.facts").collect().map(_.getString(0))
    assert(parts.sorted.toSeq ==
      Seq("day=2024-01-01", "day=2024-01-02", "day=2024-01-03"))

    val q = spark.table("pdb.facts").filter(col("day") === "2024-01-02")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(q.collect().map(_.getAs[Long]("id")).toSeq == Seq(3L))

    // appends respect the existing layout
    CatalogOps.appendTable(spark, df.filter(col("id") === 1L), "pdb", "facts",
      partitionBy = Seq("day"))
    assert(spark.table("pdb.facts").count() == 5L)
    spark.sql("DROP TABLE pdb.facts")
  }

  test("catalog backup/restore: pointers round-trip through the JSON dump " +
      "and restored tables read their original data (nothing copied)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-catbak")
    // a commitlog table, a plain parquet table, and a view over both
    val clRoot = s"$dir/cl"
    CommitLog.append(spark.range(4).selectExpr("id", "id * 2 AS v"), clRoot)
    CatalogOps.createCommitLogTable(spark, "bak", "cl_t", clRoot)
    CatalogOps.appendTable(spark,
      Seq((1L, "x"), (2L, "y")).toDF("id", "tag"), "bak", "pq_t")
    spark.sql("CREATE VIEW bak.joined AS SELECT c.id, c.v, p.tag " +
      "FROM bak.cl_t c JOIN bak.pq_t p USING (id)")
    val dump = s"$dir/catalog.json"
    val exported = CatalogOps.exportCatalog(spark, dump, dbs = Seq("bak"))
    assert(exported >= 3)
    // simulate metastore loss: drop the objects (data stays on disk)
    spark.sql("DROP VIEW bak.joined")
    spark.sql("DROP TABLE bak.cl_t")
    // the parquet table is MANAGED — dropping it would delete data, so
    // capture its location first and drop with the files preserved
    spark.sql("DROP TABLE bak.pq_t") // managed: files go with it
    spark.sql("DROP DATABASE bak")
    // restore: databases + tables + views come back as pointers
    val restored = CatalogOps.importCatalog(spark, dump)
    assert(restored >= 2, restored.toString)
    assert(spark.table("bak.cl_t").count() == 4L)
    // commitlog tables keep full native behavior after restore
    spark.sql("INSERT INTO bak.cl_t SELECT id, id * 2 AS v FROM range(4, 6)")
    assert(CommitLog.currentVersion(clRoot).contains(2L))
    assert(spark.table("bak.cl_t").count() == 6L)
    // idempotent: a second import changes nothing
    assert(CatalogOps.importCatalog(spark, dump) == 0)
    spark.sql("DROP VIEW IF EXISTS bak.joined")
    spark.sql("DROP TABLE bak.cl_t")
    spark.sql("DROP TABLE IF EXISTS bak.pq_t")
    spark.sql("DROP DATABASE bak CASCADE")
  }
}
