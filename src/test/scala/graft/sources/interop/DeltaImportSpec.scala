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

  private def protoJson(minReader: Int, features: Seq[String] = Nil): String = {
    val n = om.createObjectNode()
    val p = n.putObject("protocol")
    p.put("minReaderVersion", minReader); p.put("minWriterVersion", 2)
    if (features.nonEmpty) {
      val rf = p.putArray("readerFeatures"); features.foreach(rf.add)
      val wf = p.putArray("writerFeatures"); features.foreach(wf.add)
    }
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

  test("imports carry footer-derived stats: min/max pruning and exact " +
      "row counts with NO ANALYZE pass (r9)") {
    val d = tmp(); val root = tmp()
    val low = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    val high = spark.range(1000, 1100).selectExpr("id", "id AS v")
    writeOne(low, Paths.get(d, "low.parquet"))
    writeOne(high, Paths.get(d, "high.parquet"))
    // statless adds on purpose: rows must come from the footers now
    writeCommit(d, 0L, Seq(protoJson(1), metaJson(low.schema, Nil),
      addJson("low.parquet", stats = None),
      addJson("high.parquet", stats = None)))
    DeltaImport.importTable(spark, d, root)
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.statsOrNil.map(_.rows).sorted == Seq(100L, 100L))
    // pruning works immediately — no refreshStats/ANALYZE ran
    assert(CommitLog.prunedFiles(spark, root, m, col("id") < 50L).size == 1)
    assert(CommitLog.prunedFiles(spark, root, m, col("id") >= 1000L).size == 1)
    assert(CommitLog.read(spark, root).filter(col("id") < 50L).count() == 50)
    // still zero-copy: stats came from KB of footer, not a data move
    import scala.jdk.CollectionConverters._
    assert(!java.nio.file.Files.walk(Paths.get(root)).iterator().asScala
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

    // reader gate: version 3 with a feature this engine cannot translate
    // (v2Checkpoint) refuses; bare v3 without the mandatory feature list
    // is malformed and refuses too
    val d2 = tmp(); val root2 = tmp()
    writeOne(df1, Paths.get(d2, "f1.parquet"))
    writeCommit(d2, 0L, Seq(protoJson(3, Seq("v2Checkpoint")),
      metaJson(df1.schema, Nil), addJson("f1.parquet", Some(4L))))
    val e = intercept[IllegalArgumentException] {
      DeltaImport.importTable(spark, d2, root2)
    }
    assert(e.getMessage.contains("reader features"), e.getMessage)
    val d3 = tmp()
    writeOne(df1, Paths.get(d3, "f1.parquet"))
    writeCommit(d3, 0L, Seq(protoJson(3), metaJson(df1.schema, Nil),
      addJson("f1.parquet", Some(4L))))
    val e2 = intercept[IllegalArgumentException] {
      DeltaImport.importTable(spark, d3, tmp())
    }
    assert(e2.getMessage.contains("readerFeatures"), e2.getMessage)
  }

  /** Schema whose fields map to physical parquet names — the reader-v2
    * column-mapping layout (delta.columnMapping.physicalName metadata).
    */
  private def mappedSchema(fields: (String, org.apache.spark.sql.types.DataType,
      String)*): StructType =
    StructType(fields.map { case (name, dt, phys) =>
      org.apache.spark.sql.types.StructField(name, dt, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.columnMapping.physicalName", phys)
          .putLong("delta.columnMapping.id", 1L).build())
    })

  test("reader-version-2 column mapping imports zero-copy through the " +
      "native logical->physical column map") {
    import org.apache.spark.sql.types.LongType
    val d = tmp(); val root = tmp()
    // the data file holds PHYSICAL column names, delta-spark style
    val phys = spark.range(5).selectExpr(
      "id AS `col-9a1b`", "id * 3 AS `col-77cd`")
    writeOne(phys, Paths.get(d, "p1.parquet"))
    val schema = mappedSchema(
      ("id", LongType, "col-9a1b"), ("v", LongType, "col-77cd"))
    writeCommit(d, 0L, Seq(protoJson(2), metaJson(schema, Nil),
      addJson("p1.parquet", Some(5L))))
    DeltaImport.importTable(spark, d, root)
    val t = CommitLog.read(spark, root)
    assert(t.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(t.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == (0L until 5L).map(i => (i, i * 3)))
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.physOf("id") == "col-9a1b" && m.physOf("v") == "col-77cd")
    // zero-copy: nothing materialized under the import root
    assert(!Files.walk(Paths.get(root)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
    // a NESTED mapping cannot translate (top-level-only map) — refuse
    val d2 = tmp()
    writeOne(phys, Paths.get(d2, "p1.parquet"))
    val nested = StructType(Seq(org.apache.spark.sql.types.StructField(
      "s", StructType(mappedSchema(("a", LongType, "col-inner")).fields))))
    writeCommit(d2, 0L, Seq(protoJson(2), metaJson(nested, Nil),
      addJson("p1.parquet", Some(5L))))
    val e = intercept[IllegalArgumentException] {
      DeltaImport.importTable(spark, d2, tmp())
    }
    assert(e.getMessage.contains("NESTED"), e.getMessage)
  }

  private def addDvJson(path: String, stats: Option[Long],
      storageType: String, pathOrInlineDv: String, offset: Option[Int],
      cardinality: Long, partVals: Map[String, String] = Map.empty,
      sizeInBytes: Option[Int] = None): String = {
    val n = om.readTree(addJson(path, stats, partVals))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val dv = n.`with`("add").putObject("deletionVector")
    dv.put("storageType", storageType)
    dv.put("pathOrInlineDv", pathOrInlineDv)
    offset.foreach(o => dv.put("offset", o))
    // when present the import CHECKS it against the entry's length prefix
    // (the delta-spark behavior) — fixtures omit it unless probing that
    sizeInBytes.foreach(s => dv.put("sizeInBytes", s))
    dv.put("cardinality", cardinality)
    om.writeValueAsString(n)
  }

  test("reader-version-3 deletion vectors decode (u-path, inline) and " +
      "re-encode as commitlog DVs with row-exact reads") {
    val d = tmp(); val root = tmp()
    val df1 = spark.range(10).selectExpr("id", "id * 2 AS v")
      .coalesce(1).sortWithinPartitions("id")
    val df2 = spark.range(100, 106).selectExpr("id", "id * 2 AS v")
      .coalesce(1).sortWithinPartitions("id")
    writeOne(df1, Paths.get(d, "f1.parquet"))
    writeOne(df2, Paths.get(d, "f2.parquet"))
    // f1's DV lives in a 'u'-addressed .bin (Z85 uuid), killing rows 1,3,4
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val enc = DeltaDv.z85Encode(bb.array())
    val (off, dvLen) = DeltaDv.writeDvFile(
      Paths.get(d, s"deletion_vector_$uuid.bin"), Array(1L, 3L, 4L))
    // f2's DV rides INLINE (Z85 of the portable payload), killing row 0
    val inline = DeltaDv.z85Encode {
      val p = DeltaDv.writePortable(Array(0L))
      java.util.Arrays.copyOf(p, (p.length + 3) / 4 * 4) // Z85 pads to 4
    }
    writeCommit(d, 0L, Seq(
      protoJson(3, Seq("deletionVectors")),
      metaJson(spark.range(1).selectExpr("id", "id AS v").schema, Nil),
      addDvJson("f1.parquet", Some(10L), "u", enc, Some(off), 3L,
        sizeInBytes = Some(dvLen)),
      addDvJson("f2.parquet", Some(6L), "i", inline, None, 1L)))
    DeltaImport.importTable(spark, d, root)
    val got = CommitLog.read(spark, root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (Seq(0L, 2L, 5L, 6L, 7L, 8L, 9L) ++ (101L to 105L))
      .map(i => (i, i * 2))
    assert(got == want, got.toString)
    // the import landed DVs as manifest metadata, zero data copies
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.dvsOrEmpty.size == 2)
    // and the snapshot supports further native DV work: purge materializes
    CommitLog.purgeDeletionVectors(spark, root)
    assert(CommitLog.read(spark, root).count() == 12)
  }

  test("partitioned table with column mapping AND a DV materializes " +
      "row-exactly (partitionValues keyed by physical name)") {
    import org.apache.spark.sql.types.{LongType, StringType}
    val d = tmp(); val root = tmp()
    val phys = spark.range(4).selectExpr("id AS `col-x`")
      .coalesce(1).sortWithinPartitions("col-x")
    writeOne(phys, Paths.get(d, "k=a", "p1.parquet"))
    writeOne(phys, Paths.get(d, "k=b", "p2.parquet"))
    val schema = mappedSchema(
      ("id", LongType, "col-x"), ("k", StringType, "col-part"))
    // p1 (k=a) loses row index 2 to an inline DV
    val inline = DeltaDv.z85Encode {
      val p = DeltaDv.writePortable(Array(2L))
      java.util.Arrays.copyOf(p, (p.length + 3) / 4 * 4)
    }
    writeCommit(d, 0L, Seq(
      protoJson(3, Seq("deletionVectors", "columnMapping")),
      metaJson(schema, Seq("k")),
      addDvJson("k=a/p1.parquet", Some(4L), "i", inline, None, 1L,
        partVals = Map("col-part" -> "a")),
      addJson("k=b/p2.parquet", Some(4L), Map("col-part" -> "b"))))
    DeltaImport.importTable(spark, d, root)
    val t = CommitLog.read(spark, root)
    assert(t.schema.fieldNames.toSeq == Seq("id", "k"))
    assert(t.filter(col("k") === "a").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 3L))
    assert(t.filter(col("k") === "b").count() == 4)
  }
}
