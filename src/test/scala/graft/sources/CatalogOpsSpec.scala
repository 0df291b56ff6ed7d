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
}
