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

  test("views-on-views restore whatever the dump order: failed views " +
      "retry to a fix-point; a genuinely broken view surfaces") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-catvv")
    CatalogOps.appendTable(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), "vvdb", "base")
    // a 3-deep view chain; dumps list in arbitrary catalog order
    spark.sql("CREATE VIEW vvdb.v1 AS SELECT id, v * 2 AS v2 FROM vvdb.base")
    spark.sql("CREATE VIEW vvdb.v2 AS SELECT id, v2 + 1 AS v3 FROM vvdb.v1")
    spark.sql("CREATE VIEW vvdb.v3 AS SELECT sum(v3) AS s FROM vvdb.v2")
    val dump = s"$dir/catalog.json"
    CatalogOps.exportCatalog(spark, dump, dbs = Seq("vvdb"))
    // REVERSE the dump's table order so every dependent view precedes
    // its dependency — a single-pass restore would abort mid-import
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dump)))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val tables = node.get("tables")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val rev = om.createArrayNode()
    (tables.size - 1 to 0 by -1).foreach(i => rev.add(tables.get(i)))
    node.set("tables", rev)
    java.nio.file.Files.write(java.nio.file.Paths.get(dump),
      om.writeValueAsBytes(node))
    spark.sql("DROP VIEW vvdb.v3"); spark.sql("DROP VIEW vvdb.v2")
    spark.sql("DROP VIEW vvdb.v1")
    assert(CatalogOps.importCatalog(spark, dump) == 3)
    assert(spark.table("vvdb.v3").collect()(0).getLong(0) == 62L)
    // a view whose text references something that never restores fails
    // loudly once no pass makes progress
    spark.sql("CREATE VIEW vvdb.broken AS SELECT * FROM vvdb.v1")
    CatalogOps.exportCatalog(spark, dump, dbs = Seq("vvdb"))
    val node2 = om.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dump)))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node2.get("tables").forEach { t =>
      val o = t.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      if (o.get("name").asText() == "broken")
        o.put("viewText", "SELECT * FROM vvdb.no_such_table")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dump),
      om.writeValueAsBytes(node2))
    spark.sql("DROP VIEW vvdb.broken")
    val e = intercept[IllegalStateException] {
      CatalogOps.importCatalog(spark, dump)
    }
    assert(e.getMessage.contains("broken"), e.getMessage)
    spark.sql("DROP VIEW IF EXISTS vvdb.v3")
    spark.sql("DROP VIEW IF EXISTS vvdb.v2")
    spark.sql("DROP VIEW IF EXISTS vvdb.v1")
    spark.sql("DROP TABLE IF EXISTS vvdb.base")
    spark.sql("DROP DATABASE vvdb CASCADE")
  }
}
