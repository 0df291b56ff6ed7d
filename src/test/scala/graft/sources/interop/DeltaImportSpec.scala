package graft.sources.interop

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.sources.CommitLog

/** Delta-log import: fixtures are written BY HAND to the public protocol
  * (ordered JSON commits of protocol/metaData/add/remove actions, optional
  * parquet checkpoint named by _last_checkpoint), so the reader is
  * exercised against the spec, not against our own writer.
  */
class DeltaImportSpec extends SparkTestBase {

  private val om = new ObjectMapper()

  private def tmp(): String =
    Files.createTempDirectory("graft-delta").toString

  /** Write `df` as exactly one parquet file at `target`. */
  private def writeOne(df: DataFrame, target: Path): Unit = {
    val t = Files.createTempDirectory("graft-dimp")
    df.coalesce(1).write.mode("overwrite").parquet(t.toString)
    val part = Files.list(t).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.createDirectories(target.getParent)
    Files.move(part, target)
  }

  private def protoJson(minReader: Int): String = {
    val n = om.createObjectNode()
    val p = n.putObject("protocol")
    p.put("minReaderVersion", minReader); p.put("minWriterVersion", 2)
    om.writeValueAsString(n)
  }

  private def metaJson(schema: StructType, partCols: Seq[String]): String = {
    val n = om.createObjectNode()
    val m = n.putObject("metaData")
    m.put("id", "fixture"); m.put("schemaString", schema.json)
    m.putObject("format").put("provider", "parquet")
    val pc = m.putArray("partitionColumns"); partCols.foreach(pc.add)
    om.writeValueAsString(n)
  }

  private def addJson(path: String, stats: Option[Long],
      partVals: Map[String, String] = Map.empty): String = {
    val n = om.createObjectNode()
    val a = n.putObject("add")
    a.put("path", path); a.put("dataChange", true)
    a.put("size", 1L); a.put("modificationTime", 0L)
    val pv = a.putObject("partitionValues")
    partVals.foreach { case (k, v) => pv.put(k, v) }
    stats.foreach(r => a.put("stats", s"""{"numRecords":$r}"""))
    om.writeValueAsString(n)
  }

  private def removeJson(path: String): String = {
    val n = om.createObjectNode()
    val r = n.putObject("remove")
    r.put("path", path); r.put("dataChange", true)
    om.writeValueAsString(n)
  }

  private def writeCommit(dir: String, v: Long, lines: Seq[String]): Unit = {
    val log = Paths.get(dir, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"$v%020d.json"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("unpartitioned table imports zero-copy: removes honored, encoded " +
      "paths decoded, stats trusted, statless files counted") {
    val d = tmp(); val root = tmp()
    val df1 = spark.range(4).selectExpr("id", "id * 2 AS v")
    val df2 = spark.range(6).selectExpr("id + 100 AS id", "id AS v")
    writeOne(df1, Paths.get(d, "part-1.snappy.parquet"))
    writeOne(df2, Paths.get(d, "part-2 x.snappy.parquet")) // space in name
    writeCommit(d, 0L, Seq(protoJson(1), metaJson(df1.schema, Nil),
      addJson("part-1.snappy.parquet", stats = Some(4L))))
    writeCommit(d, 1L, Seq(
      addJson("part-2%20x.snappy.parquet", stats = None), // RFC-encoded
      removeJson("part-1.snappy.parquet")))
    DeltaImport.importTable(spark, d, root)
    val got = CommitLog.read(spark, root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (0L until 6L).map(i => (i + 100, i)))
    // zero-copy: no parquet landed under the import root
    assert(!Files.walk(Paths.get(root)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
  }

  test("hive-partitioned table materializes with injected, typed " +
      "partition values and keeps the partition spec") {
    val d = tmp(); val root = tmp()
    // data files do NOT carry the partition column — the Delta layout
    val data = spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    val schema = StructType(data.schema.fields :+
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.DateType))
    writeOne(data, Paths.get(d, "day=2020-01-01", "part-a.parquet"))
    writeOne(data, Paths.get(d, "day=2020-01-02", "part-b.parquet"))
    writeCommit(d, 0L, Seq(protoJson(1), metaJson(schema, Seq("day")),
      addJson("day=2020-01-01/part-a.parquet", Some(3L),
        Map("day" -> "2020-01-01")),
      addJson("day=2020-01-02/part-b.parquet", Some(3L),
        Map("day" -> "2020-01-02"))))
    DeltaImport.importTable(spark, d, root)
    val t = CommitLog.read(spark, root)
    assert(t.count() == 6)
    assert(t.filter(col("day") === java.sql.Date.valueOf("2020-01-02"))
      .count() == 3)
    assert(t.schema("day").dataType ==
      org.apache.spark.sql.types.DateType)
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.partitionByOrNil == Seq("day"))
  }

  test("a parquet checkpoint folds as the base and newer JSON commits " +
      "apply on top; reader version > 1 is refused") {
    val d = tmp(); val root = tmp()
    val df1 = spark.range(4).selectExpr("id")
    val df2 = spark.range(2).selectExpr("id + 50 AS id")
    writeOne(df1, Paths.get(d, "f1.parquet"))
    writeOne(df2, Paths.get(d, "f2.parquet"))
    val log = Paths.get(d, "_delta_log"); Files.createDirectories(log)
    val schemaJson = df1.schema.json
    val cp = spark.sql(
      s"""SELECT named_struct('minReaderVersion', 1, 'minWriterVersion', 2)
         |    AS protocol,
         |  CAST(NULL AS STRUCT<schemaString: STRING,
         |    partitionColumns: ARRAY<STRING>>) AS metaData,
         |  CAST(NULL AS STRUCT<path: STRING, stats: STRING>) AS `add`
         |UNION ALL SELECT NULL,
         |  named_struct('schemaString', '$schemaJson',
         |    'partitionColumns', CAST(array() AS ARRAY<STRING>)), NULL
         |UNION ALL SELECT NULL, NULL,
         |  named_struct('path', 'f1.parquet',
         |    'stats', '{"numRecords":4}')""".stripMargin)
    writeOne(cp, log.resolve(f"${0L}%020d.checkpoint.parquet"))
    Files.write(log.resolve("_last_checkpoint"),
      s"""{"version":0,"size":3}""".getBytes("UTF-8"))
    writeCommit(d, 1L, Seq(addJson("f2.parquet", Some(2L))))
    DeltaImport.importTable(spark, d, root)
    assert(CommitLog.read(spark, root).count() == 6)

    // reader gate: minReaderVersion 3 (e.g. deletion vectors) refuses
    val d2 = tmp(); val root2 = tmp()
    writeOne(df1, Paths.get(d2, "f1.parquet"))
    writeCommit(d2, 0L, Seq(protoJson(3), metaJson(df1.schema, Nil),
      addJson("f1.parquet", Some(4L))))
    val e = intercept[IllegalArgumentException] {
      DeltaImport.importTable(spark, d2, root2)
    }
    assert(e.getMessage.contains("reader version"))
  }
}
