package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkTestBase

class JobsSpec extends SparkTestBase {

  test("reference registry: two jobs, one scheduled at */30") {
    val jobs = Jobs.reference("/tmp/none", "/tmp/none")
    assert(jobs.all.map(_.name) == Seq("Insert_excel_tables", "Process_csv_data"))
    assert(jobs.scheduled.map(_.name) == Seq("Insert_excel_tables"))
    assert(jobs.get("Insert_excel_tables").get.cronSchedule.contains("*/30 * * * *"))
    assert(jobs.get("Process_csv_data").get.cronSchedule.isEmpty)
  }

  test("runNow executes a firing end-to-end and logs the run") {
    val landing = Files.createTempDirectory("jobland")
    val config = Files.createTempDirectory("jobconf")
    val bucket = landing.resolve("ventas")
    Files.createDirectories(bucket)
    Files.write(bucket.resolve("j1.csv"),
      "a,b\n1,x\n2,y\n".getBytes(StandardCharsets.UTF_8))

    val jobs = Jobs.reference(landing.toString, config.toString)
    jobs.runNow(spark, "Insert_excel_tables")
    assert(spark.table("ventas.j1").count() == 2L)
    assert(jobs.history.map(h => (h._1, h._3)) == Seq(("Insert_excel_tables", true)))
    spark.sql("DROP TABLE ventas.j1")

    intercept[IllegalArgumentException](jobs.runNow(spark, "nope"))
  }
}
