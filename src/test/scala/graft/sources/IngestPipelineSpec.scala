package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.SparkTestBase

/** E1 pipeline end-to-end over a tmp landing root (SURVEY.md §3 E1). */
class IngestPipelineSpec extends SparkTestBase {

  private def writeCsv(dir: java.nio.file.Path, name: String, body: String): Unit = {
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), body.getBytes(StandardCharsets.UTF_8))
  }

  test("ingest: bucket→db, file→table, inference, catalog, audit, archive") {
    val landing = Files.createTempDirectory("landing")
    val config = Files.createTempDirectory("config")
    writeCsv(landing.resolve("ventas"), "ventas 2023.csv",
      "fecha registro,cantidad,% desc\n" +
        "2023-01-05 10:30:00,12,nan\n" +
        "2023-01-06 11:00:00,7,x\n" +
        "nan,NULL,\n")

    val out = IngestPipeline.ingest(spark, landing.toString, config.toString, consume = "archive")
    assert(out == Seq(IngestPipeline.IngestedTable("ventas", "ventas_2023", 3L)))

    // table exists under bucket-db with inferred schema
    val t = spark.table("ventas.ventas_2023")
    assert(t.schema("fecharegistro").dataType == org.apache.spark.sql.types.TimestampType)
    assert(t.schema.fieldNames.toSeq == Seq("fecharegistro", "cantidad", "desc"))
    assert(t.count() == 3L)
    // bad words became NULLs
    assert(t.filter(t("fecharegistro").isNull).count() == 1L)

    // catalog row (assets.py:411-416)
    val cat = spark.table("info.files").filter("table_name = 'ventas.ventas_2023'")
    assert(cat.count() == 1L)

    // audit entry + consumed (archived) source (assets.py:66,70-74)
    assert(AuditLog.entries(config.toString, "ventas").exists(_.contains("\"op\":\"ingest\"")))
    assert(!Files.exists(landing.resolve("ventas").resolve("ventas 2023.csv")))
    assert(Files.exists(config.resolve("ventas").resolve("ventas 2023.csv")))
  }

  test("ingest json-lines: one file → one table through the same infer path") {
    val landing = Files.createTempDirectory("landingj")
    val config = Files.createTempDirectory("configj")
    writeCsv(landing.resolve("logs"), "app events.json",
      """{"when": "2023-02-01 08:00:00", "what": "login", "n": 3}
        |{"when": "2023-02-01 09:15:00", "what": "logout", "n": 5}
        |""".stripMargin)
    val out = IngestPipeline.ingest(spark, landing.toString, config.toString, consume = "keep")
    assert(out == Seq(IngestPipeline.IngestedTable("logs", "app_events", 2L)))
    val t = spark.table("logs.app_events")
    assert(t.schema("when").dataType == org.apache.spark.sql.types.TimestampType)
    assert(t.schema("what").dataType == org.apache.spark.sql.types.StringType)
    assert(t.count() == 2L)
    spark.sql("DROP TABLE logs.app_events")
  }

  test("ingest columnar handoffs: orc and parquet through the same infer path") {
    import scala.jdk.CollectionConverters._
    val landing = Files.createTempDirectory("landingc")
    val config = Files.createTempDirectory("configc")
    import spark.implicits._
    // typed source data, but timestamps deliberately carried as STRINGS —
    // the stringify→infer path must repair them like any text format
    val df = Seq(("2023-03-01 10:00:00", "a", 7L), ("2023-03-02 11:30:00", "b", 9L))
      .toDF("when", "tag", "n")
    def stage(fmt: String, target: String): Unit = {
      val tmp = Files.createTempDirectory(s"stage-$fmt")
      df.coalesce(1).write.mode("overwrite").format(fmt).save(tmp.toString)
      val part = Files.walk(tmp).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(s".$fmt"))
        .toSeq.head
      Files.createDirectories(landing.resolve("handoff"))
      Files.copy(part, landing.resolve("handoff").resolve(target))
    }
    stage("orc", "metrics feed.orc")
    stage("parquet", "events feed.parquet")
    val out = IngestPipeline.ingest(spark, landing.toString, config.toString,
      consume = "keep", extended = true)
    assert(out.toSet == Set(
      IngestPipeline.IngestedTable("handoff", "metrics_feed", 2L),
      IngestPipeline.IngestedTable("handoff", "events_feed", 2L)))
    for (t <- Seq("handoff.metrics_feed", "handoff.events_feed")) {
      val d = spark.table(t)
      assert(d.schema("when").dataType == org.apache.spark.sql.types.TimestampType)
      assert(d.schema("tag").dataType == org.apache.spark.sql.types.StringType)
      // the extended mapper recovers the numeric column from the handoff
      assert(d.schema("n").dataType == org.apache.spark.sql.types.LongType)
      assert(d.count() == 2L)
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("ingest skips the configuration dir as a bucket (assets.py:31)") {
    val landing = Files.createTempDirectory("landing2")
    writeCsv(landing.resolve("configuration"), "x.csv", "a\n1\n")
    assert(IngestPipeline.ingest(spark, landing.toString, landing.resolve("configuration").toString) == Seq.empty)
  }

  test("idempotent re-ingest appends (create table if not exists semantics)") {
    val landing = Files.createTempDirectory("landing3")
    val config = Files.createTempDirectory("config3")
    writeCsv(landing.resolve("b1"), "t.csv", "a,b\n1,x\n")
    IngestPipeline.ingest(spark, landing.toString, config.toString, consume = "keep")
    IngestPipeline.ingest(spark, landing.toString, config.toString, consume = "keep")
    assert(spark.table("b1.t").count() == 2L)
    assert(spark.table("info.files").filter("table_name = 'b1.t'").count() == 2L)
  }

  test("ingest over a non-file Hadoop filesystem URI (object-store parity)") {
    // The reference lands data in MinIO over the S3 protocol
    // (docker-compose.yml:4-19, assets.py:19,427-434). Parity here is the
    // Hadoop FS layer: a root with ANY registered scheme must work with no
    // java.io.File assumptions — proven with a custom scheme backed by
    // RawLocalFileSystem, the same wiring an s3a:// root uses (only the
    // fs.<scheme>.impl target differs).
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[TestSchemeFs].getName)
    val landing = Files.createTempDirectory("landing-hfs")
    val config = Files.createTempDirectory("config-hfs")
    writeCsv(landing.resolve("remoteb"), "remote sales.csv", "k,v\n1,10\n2,20\n")
    writeCsv(landing.resolve("remoteb"), "events feed.json",
      """{"k": "1", "v": "9"}""" + "\n")
    // workbook: the zip parse needs random access, so the remote path must
    // stage through a driver-local temp copy (and clean it up)
    Xlsx.write(landing.resolve("remoteb").resolve("book one.xlsx").toString,
      Seq(Xlsx.Sheet("s1", Seq("a", "b"), Seq(Seq("1", "2"), Seq("3", "4")))))

    val lr = s"graftfs://$landing"
    val cr = s"graftfs://$config"
    val out = IngestPipeline.ingest(spark, lr, cr, consume = "archive")
    assert(out.forall(_.db == "remoteb"))
    val byTable = out.map(t => t.table -> t.rows).toMap
    assert(byTable("remote_sales") == 2L)
    assert(byTable("events_feed") == 1L)
    assert(byTable.collect { case (n, r) if n.startsWith("book") => r }.toSeq == Seq(2L))

    // consume=archive moved the sources THROUGH the scheme into the config
    // root (same-FS rename path)
    assert(!Files.exists(landing.resolve("remoteb").resolve("remote sales.csv")))
    assert(Files.exists(config.resolve("remoteb").resolve("remote sales.csv")))
    assert(Files.exists(config.resolve("remoteb").resolve("book one.xlsx")))

    // audit wrote per-entry objects through the scheme and reads back
    val hconf = Some(spark.sessionState.newHadoopConf())
    val es = AuditLog.entries(cr, "remoteb", hconf)
    assert(es.count(_.contains("\"op\":\"ingest\"")) == 3)

    // and the tables landed with coerced content
    assert(spark.table("remoteb.remote_sales").count() == 2L)
    out.foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.db}.${t.table}"))
  }
}

/** `graftfs://` — a RawLocalFileSystem under a non-file scheme: exercises
  * every Hadoop-FS code path (impl lookup, listing, size, rename, create,
  * open) without needing a network object store in the sandbox.
  */
class TestSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
