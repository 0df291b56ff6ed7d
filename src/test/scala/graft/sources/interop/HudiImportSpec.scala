package graft.sources.interop

import java.nio.file.{Files, Path, Paths}

import graft.SparkTestBase
import graft.sources.CommitLog

/** Hudi COW import against hand-written spec fixtures: the timeline fold
  * (newest base file per file group wins, replacecommits kill groups,
  * inflight instants never enter), the avro-schema conversion, and the
  * MOR refusal.
  */
class HudiImportSpec extends SparkTestBase {

  private val avroSchema =
    """{"type":"record","name":"r","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"v","type":["null","double"],"default":null}
      |]}""".stripMargin

  private def writeParquet(dir: Path, name: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    val w = Files.createTempDirectory("graft-hudi-w")
    ids.map(i => (i, i.toDouble / 4)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(w.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(w).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, dir.resolve(name))
  }

  private def commitJson(stats: Seq[(String, String, Long)],
      replaced: Seq[String] = Nil): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.createObjectNode()
    val pws = n.putObject("partitionToWriteStats").putArray("")
    stats.foreach { case (fileId, path, rows) =>
      val s = pws.addObject()
      s.put("fileId", fileId); s.put("path", path); s.put("numWrites", rows)
    }
    if (replaced.nonEmpty) {
      val rep = n.putObject("partitionToReplaceFileIds").putArray("")
      replaced.foreach(rep.add)
    }
    n.putObject("extraMetadata").put("schema", avroSchema)
    om.writeValueAsString(n)
  }

  private def freshHudi(tableType: String = "COPY_ON_WRITE"): Path = {
    val t = Files.createTempDirectory("graft-hudi")
    val hoodie = t.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.write(hoodie.resolve("hoodie.properties"),
      s"hoodie.table.name=fixture\nhoodie.table.type=$tableType\n"
        .getBytes("UTF-8"))
    t
  }

  test("timeline fold: newest base file per file group, replacecommit " +
      "kills groups, inflight instants are invisible") {
    val t = freshHudi()
    writeParquet(t, "fg1_0-0-0_001.parquet", 0L until 50L)
    writeParquet(t, "fg2_0-0-0_001.parquet", 100L until 150L)
    // fg2 rewritten at instant 002 (an update shrank it)
    writeParquet(t, "fg2_0-0-0_002.parquet", 100L until 120L)
    // an INFLIGHT instant wrote fg3 — must never surface
    writeParquet(t, "fg3_0-0-0_003.parquet", 900L until 999L)
    val hoodie = t.resolve(".hoodie")
    Files.write(hoodie.resolve("001.commit"), commitJson(Seq(
      ("fg1", "fg1_0-0-0_001.parquet", 50L),
      ("fg2", "fg2_0-0-0_001.parquet", 50L))).getBytes("UTF-8"))
    Files.write(hoodie.resolve("002.commit"), commitJson(Seq(
      ("fg2", "fg2_0-0-0_002.parquet", 20L))).getBytes("UTF-8"))
    Files.write(hoodie.resolve("003.commit.inflight"), "{}".getBytes("UTF-8"))
    val root = Files.createTempDirectory("graft-hudi-t").toString
    HudiImport.importTable(spark, t.toString, root)
    val got = CommitLog.read(spark, root).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == ((0L until 50L) ++ (100L until 120L)))
    // schema converted from the avro commit metadata, union → nullable
    // (assert on the MANIFEST schema — Spark's parquet scan relaxes
    // everything to nullable at read time regardless)
    val sch = CommitLog.manifestSchema(
      CommitLog.readManifest(root, CommitLog.currentVersion(root).get))
    assert(sch.fieldNames.toSeq == Seq("id", "v"))
    assert(!sch("id").nullable && sch("v").nullable)
    // zero-copy: the import holds no parquet of its own
    import scala.jdk.CollectionConverters._
    assert(!Files.walk(Paths.get(root)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
    // a replacecommit at 004 retires fg2 entirely
    Files.write(hoodie.resolve("004.replacecommit"),
      commitJson(Nil, replaced = Seq("fg2")).getBytes("UTF-8"))
    val root2 = Files.createTempDirectory("graft-hudi-t2").toString
    HudiImport.importTable(spark, t.toString, root2)
    assert(CommitLog.read(spark, root2).count() == 50L)
  }

  test("MERGE_ON_READ with outstanding log files refuses loudly; once a " +
      "compaction commit supersedes the logs, the snapshot imports") {
    val t = freshHudi(tableType = "MERGE_ON_READ")
    val hoodie = t.resolve(".hoodie")
    writeParquet(t, "fg1_0-0-0_001.parquet", 0L until 30L)
    // 001: MOR base file; 002: a deltacommit APPENDS A LOG FILE to fg1 —
    // its updates live only in the log, so importing now would drop them
    Files.write(hoodie.resolve("001.deltacommit"), commitJson(Seq(
      ("fg1", "fg1_0-0-0_001.parquet", 30L))).getBytes("UTF-8"))
    Files.write(hoodie.resolve("002.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.1_0-1-0", 5L))).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      HudiImport.importTable(spark, t.toString,
        Files.createTempDirectory("graft-hudi-mor").toString)
    }
    assert(e.getMessage.contains("outstanding log"), e.getMessage)
    // 003: compaction lands a NEW base for fg1 (merging the log) — the
    // log-free snapshot now imports, reading only the compacted base
    writeParquet(t, "fg1_0-0-0_003.parquet", 0L until 35L)
    Files.write(hoodie.resolve("003.commit"), commitJson(Seq(
      ("fg1", "fg1_0-0-0_003.parquet", 35L))).getBytes("UTF-8"))
    val root = Files.createTempDirectory("graft-hudi-mor2").toString
    HudiImport.importTable(spark, t.toString, root)
    assert(CommitLog.read(spark, root).count() == 35L)
    // a fresh log AFTER the compaction re-arms the refusal
    Files.write(hoodie.resolve("004.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_003.log.1_0-1-0", 2L))).getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      HudiImport.importTable(spark, t.toString,
        Files.createTempDirectory("graft-hudi-mor3").toString)
    }
    assert(e2.getMessage.contains("outstanding log"), e2.getMessage)
  }

  test("a file group known ONLY through a log file (no base yet) refuses") {
    val t = freshHudi(tableType = "MERGE_ON_READ")
    Files.write(t.resolve(".hoodie").resolve("001.deltacommit"),
      commitJson(Seq(("fg9", ".fg9_001.log.1_0-1-0", 3L))).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      HudiImport.importTable(spark, t.toString,
        Files.createTempDirectory("graft-hudi-lonely").toString)
    }
    assert(e.getMessage.contains("outstanding log"), e.getMessage)
  }
}
