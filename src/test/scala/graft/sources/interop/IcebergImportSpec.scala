package graft.sources.interop

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** Iceberg import: fixtures are written by hand to the public table spec
  * (vN.metadata.json + version-hint, avro manifest list, avro manifests
  * with spec field names), exercising the reader against the spec.
  */
class IcebergImportSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-iceberg").toString

  private def writeOne(df: DataFrame, target: Path): Unit = {
    val t = Files.createTempDirectory("graft-iimp")
    df.coalesce(1).write.mode("overwrite").parquet(t.toString)
    val part = Files.list(t).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.createDirectories(target.getParent)
    Files.move(part, target)
  }

  private def writeAvro(target: Path, schema: Schema,
      records: Seq[GenericRecord]): Unit = {
    Files.createDirectories(target.getParent)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, target.toFile)
    try records.foreach(w.append) finally w.close()
  }

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"partition_spec_id","type":"int"},
      |  {"name":"content","type":"int","default":0},
      |  {"name":"sequence_number","type":["null","long"],"default":null}
      |]}""".stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"sequence_number","type":["null","long"],"default":null},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"},
      |    {"name":"file_size_in_bytes","type":"long"},
      |    {"name":"content","type":"int","default":0},
      |    {"name":"equality_ids",
      |     "type":["null",{"type":"array","items":"int"}],"default":null}
      |  ]}}
      |]}""".stripMargin)

  private def listEntry(path: String, content: Int = 0,
      seq: Option[Long] = None): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path); r.put("manifest_length", 1L)
    r.put("partition_spec_id", 0); r.put("content", content)
    seq.foreach(s => r.put("sequence_number", s))
    r
  }

  private def manifestEntry(status: Int, path: String,
      rows: Long, dfContent: Int = 0, seq: Option[Long] = None,
      equalityIds: Seq[Int] = Nil): GenericRecord = {
    val r = new GenericData.Record(manifestSchema)
    r.put("status", status)
    seq.foreach(s => r.put("sequence_number", s))
    val d = new GenericData.Record(
      manifestSchema.getField("data_file").schema())
    d.put("file_path", path); d.put("file_format", "PARQUET")
    d.put("record_count", rows); d.put("file_size_in_bytes", 1L)
    d.put("content", dfContent)
    if (equalityIds.nonEmpty)
      d.put("equality_ids", equalityIds.map(Int.box).asJava)
    r.put("data_file", d)
    r
  }

  private val schemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      |  {"id":1,"name":"id","required":true,"type":"long"},
      |  {"id":2,"name":"v","required":false,"type":"double"},
      |  {"id":3,"name":"name","required":false,"type":"string"}
      |]}""".stripMargin

  private def metadataJson(location: String, snapshotId: Long,
      manifestList: String, formatVersion: Int = 1,
      partitionSpecFields: String = ""): String =
    s"""{"format-version":$formatVersion,
       |"table-uuid":"11111111-2222-3333-4444-555555555555",
       |"location":"$location",
       |"schema":$schemaJson,
       |"schemas":[$schemaJson],
       |"current-schema-id":0,
       |"default-spec-id":0,
       |"partition-specs":[{"spec-id":0,"fields":[$partitionSpecFields]}],
       |"current-snapshot-id":$snapshotId,
       |"snapshots":[{"snapshot-id":$snapshotId,
       |  "manifest-list":"$manifestList"}]}""".stripMargin

  private def dataDf(lo: Int, n: Int): DataFrame =
    spark.range(lo, lo + n).selectExpr("id",
      "CAST(id AS DOUBLE) / 2 AS v", "concat('r', id) AS name")

  test("v1 table imports by reference: deleted manifest entries drop, " +
      "record counts ride the manifest, schema converts") {
    val t = tmp(); val root = tmp()
    writeOne(dataDf(0, 8), Paths.get(t, "data", "f1.parquet"))
    writeOne(dataDf(100, 5), Paths.get(t, "data", "f2.parquet"))
    writeAvro(Paths.get(t, "metadata", "m1.avro"), manifestSchema, Seq(
      manifestEntry(1, s"$t/data/f1.parquet", 8L),
      manifestEntry(2, s"$t/data/f2.parquet", 5L))) // status 2 = deleted
    writeAvro(Paths.get(t, "metadata", "ml1.avro"), manifestListSchema,
      Seq(listEntry(s"$t/metadata/m1.avro")))
    Files.write(Paths.get(t, "metadata", "v1.metadata.json"),
      metadataJson(t, 1L, s"$t/metadata/ml1.avro").getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t, root)
    val got = CommitLog.read(spark, root)
    assert(got.count() == 8)
    assert(got.filter(col("id") >= 100).count() == 0)
    assert(got.schema("v").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(got.filter(col("name") === "r3").count() == 1)
    // by reference: no parquet copied under the import root
    assert(!Files.walk(Paths.get(root)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
  }

  test("version-hint picks the current metadata among several") {
    val t = tmp(); val root = tmp()
    writeOne(dataDf(0, 4), Paths.get(t, "data", "old.parquet"))
    writeOne(dataDf(50, 6), Paths.get(t, "data", "new.parquet"))
    writeAvro(Paths.get(t, "metadata", "m-old.avro"), manifestSchema,
      Seq(manifestEntry(1, s"$t/data/old.parquet", 4L)))
    writeAvro(Paths.get(t, "metadata", "m-new.avro"), manifestSchema,
      Seq(manifestEntry(1, s"$t/data/new.parquet", 6L)))
    writeAvro(Paths.get(t, "metadata", "ml-old.avro"), manifestListSchema,
      Seq(listEntry(s"$t/metadata/m-old.avro")))
    writeAvro(Paths.get(t, "metadata", "ml-new.avro"), manifestListSchema,
      Seq(listEntry(s"$t/metadata/m-new.avro")))
    Files.write(Paths.get(t, "metadata", "v1.metadata.json"),
      metadataJson(t, 1L, s"$t/metadata/ml-old.avro").getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "v2.metadata.json"),
      metadataJson(t, 2L, s"$t/metadata/ml-new.avro").getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "2".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t, root)
    assert(CommitLog.read(spark, root).agg(min(col("id"))).collect()
      .head.getLong(0) == 50L)
  }

  test("v2 EQUALITY deletes materialize outranked files (null-safe key " +
      "match, position deletes folded in) while unoutranked and " +
      "unaffected files stay by reference") {
    import spark.implicits._
    val t = tmp(); val root = tmp()
    // CDC shape: f1 (seq 1) holds ids 0..7; an equality delete (seq 2)
    // kills keys 2 and 5; f2 (seq 2) re-inserts key 2 with a NEW value —
    // same seq as the delete, so the delete does NOT outrank it. A
    // position delete also kills f1's row 0 — applied in the same rewrite.
    writeOne(dataDf(0, 8).coalesce(1).sortWithinPartitions("id"),
      Paths.get(t, "data", "f1.parquet"))
    val f2 = spark.sql(
      "SELECT id, CAST(id AS DOUBLE)/2 AS v, concat('r', id) AS name " +
        "FROM range(100, 104) UNION ALL SELECT 2L, 99.0D, 'r2new'")
    writeOne(f2.coalesce(1), Paths.get(t, "data", "f2.parquet"))
    writeOne(Seq(2L, 5L).toDF("id"), Paths.get(t, "data", "eq1.parquet"))
    writeOne(Seq((s"$t/data/f1.parquet", 0L)).toDF("file_path", "pos"),
      Paths.get(t, "data", "pdel.parquet"))
    writeAvro(Paths.get(t, "metadata", "m1.avro"), manifestSchema, Seq(
      manifestEntry(1, s"$t/data/f1.parquet", 8L, seq = Some(1L))))
    writeAvro(Paths.get(t, "metadata", "m2.avro"), manifestSchema, Seq(
      manifestEntry(1, s"$t/data/f2.parquet", 5L, seq = Some(2L))))
    writeAvro(Paths.get(t, "metadata", "md.avro"), manifestSchema, Seq(
      manifestEntry(1, s"$t/data/eq1.parquet", 2L, dfContent = 2,
        seq = Some(2L), equalityIds = Seq(1)), // field id 1 = "id"
      manifestEntry(1, s"$t/data/pdel.parquet", 1L, dfContent = 1,
        seq = Some(2L))))
    writeAvro(Paths.get(t, "metadata", "ml.avro"), manifestListSchema, Seq(
      listEntry(s"$t/metadata/m1.avro", seq = Some(1L)),
      listEntry(s"$t/metadata/m2.avro", seq = Some(2L)),
      listEntry(s"$t/metadata/md.avro", content = 1, seq = Some(2L))))
    Files.write(Paths.get(t, "metadata", "v1.metadata.json"),
      metadataJson(t, 1L, s"$t/metadata/ml.avro", formatVersion = 2)
        .getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t, root)
    val got = CommitLog.read(spark, root)
    // f1 survivors: 1,3,4,6,7 (0 by position, 2 and 5 by equality);
    // f2 intact: 100..103 plus the re-inserted key 2
    assert(got.count() == 10, got.collect().mkString(","))
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 6L, 7L, 100L, 101L, 102L, 103L))
    // the surviving key 2 is the NEW row — the delete did not outrank it
    assert(got.filter(col("id") === 2L).select("name").collect()
      .map(_.getString(0)).toSeq == Seq("r2new"))
    // zero-copy held for the unoutranked file: f2 is still referenced
    // absolutely; only f1 re-staged under the root
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.files.contains(s"$t/data/f2.parquet"), m.files.toString)
    assert(!m.files.contains(s"$t/data/f1.parquet"), m.files.toString)

    // equality deletes on a PARTITIONED table refuse (partition-scoped;
    // a global rewrite could over-delete)
    val t2 = tmp()
    writeOne(dataDf(0, 3), Paths.get(t2, "data", "f.parquet"))
    writeOne(Seq(1L).toDF("id"), Paths.get(t2, "data", "eq.parquet"))
    writeAvro(Paths.get(t2, "metadata", "m.avro"), manifestSchema,
      Seq(manifestEntry(1, s"$t2/data/f.parquet", 3L, seq = Some(1L))))
    writeAvro(Paths.get(t2, "metadata", "md.avro"), manifestSchema,
      Seq(manifestEntry(1, s"$t2/data/eq.parquet", 1L, dfContent = 2,
        seq = Some(2L), equalityIds = Seq(1))))
    writeAvro(Paths.get(t2, "metadata", "ml.avro"), manifestListSchema, Seq(
      listEntry(s"$t2/metadata/m.avro", seq = Some(1L)),
      listEntry(s"$t2/metadata/md.avro", content = 1, seq = Some(2L))))
    Files.write(Paths.get(t2, "metadata", "v1.metadata.json"),
      metadataJson(t2, 1L, s"$t2/metadata/ml.avro", formatVersion = 2,
        partitionSpecFields = """{"name":"name","transform":"identity",
          |"source-id":3,"field-id":1000}""".stripMargin)
        .getBytes("UTF-8"))
    Files.write(Paths.get(t2, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      IcebergImport.importTable(spark, t2, tmp())
    }
    assert(e.getMessage.contains("PARTITIONED"), e.getMessage)
  }

  test("v2 PARTITION-SCOPED equality deletes: a delete under a " +
      "partitioned spec hits only its own partition's files; an " +
      "unpartitioned-spec delete stays global") {
    import spark.implicits._
    // manifest schema WITH the partition tuple record (field `name`)
    val pManifestSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"sequence_number","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"},
        |    {"name":"content","type":"int","default":0},
        |    {"name":"equality_ids",
        |     "type":["null",{"type":"array","items":"int"}],"default":null},
        |    {"name":"partition",
        |     "type":["null",{"type":"record","name":"ptup","fields":[
        |       {"name":"name","type":["null","string"],"default":null}
        |     ]}],"default":null}
        |  ]}}]}""".stripMargin)
    def pEntry(path: String, rows: Long, content: Int, seq: Long,
        part: Option[String], eqIds: Seq[Int] = Nil): GenericRecord = {
      val r = new GenericData.Record(pManifestSchema)
      r.put("status", 1); r.put("sequence_number", seq)
      val d = new GenericData.Record(
        pManifestSchema.getField("data_file").schema())
      d.put("file_path", path); d.put("file_format", "PARQUET")
      d.put("record_count", rows); d.put("file_size_in_bytes", 1L)
      d.put("content", content)
      if (eqIds.nonEmpty) d.put("equality_ids", eqIds.map(Int.box).asJava)
      part.foreach { v =>
        val ptupSchema = pManifestSchema.getField("data_file").schema()
          .getField("partition").schema().getTypes.get(1)
        val p = new GenericData.Record(ptupSchema)
        p.put("name", v); d.put("partition", p)
      }
      r.put("data_file", d); r
    }
    val pListSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"content","type":"int","default":0},
        |  {"name":"sequence_number","type":["null","long"],"default":null}
        |]}""".stripMargin)
    def pList(path: String, content: Int, seq: Long,
        specId: Int): GenericRecord = {
      val r = new GenericData.Record(pListSchema)
      r.put("manifest_path", path); r.put("manifest_length", 1L)
      r.put("partition_spec_id", specId); r.put("content", content)
      r.put("sequence_number", seq); r
    }
    def pMeta(t: String): String =
      s"""{"format-version":2,
         |"table-uuid":"11111111-2222-3333-4444-666666666666",
         |"location":"$t",
         |"schema":$schemaJson,
         |"schemas":[$schemaJson],
         |"current-schema-id":0,
         |"default-spec-id":0,
         |"partition-specs":[
         |  {"spec-id":0,"fields":[{"name":"name","transform":"identity",
         |    "source-id":3,"field-id":1000}]},
         |  {"spec-id":1,"fields":[]}],
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,
         |  "manifest-list":"$t/metadata/ml.avro"}]}""".stripMargin

    // --- table 1: ONLY a partition-scoped delete -------------------------
    // partition 'a': ids 0..4; partition 'b': ids 10..14. The delete
    // (seq 2, scoped to partition 'a') kills keys 1 AND 12 — but 12 lives
    // in partition 'b', so it must SURVIVE, and fb must stay by reference.
    val t = tmp(); val root = tmp()
    def partDf(lo: Int, n: Int, name: String) =
      spark.range(lo, lo + n).selectExpr("id",
        "CAST(id AS DOUBLE) / 2 AS v", s"'$name' AS name")
    writeOne(partDf(0, 5, "a").coalesce(1).sortWithinPartitions("id"),
      Paths.get(t, "data", "fa.parquet"))
    writeOne(partDf(10, 5, "b").coalesce(1).sortWithinPartitions("id"),
      Paths.get(t, "data", "fb.parquet"))
    writeOne(Seq(1L, 12L).toDF("id"), Paths.get(t, "data", "eqa.parquet"))
    writeAvro(Paths.get(t, "metadata", "ma.avro"), pManifestSchema, Seq(
      pEntry(s"$t/data/fa.parquet", 5L, 0, 1L, Some("a")),
      pEntry(s"$t/data/fb.parquet", 5L, 0, 1L, Some("b"))))
    writeAvro(Paths.get(t, "metadata", "md.avro"), pManifestSchema, Seq(
      pEntry(s"$t/data/eqa.parquet", 2L, 2, 2L, Some("a"),
        eqIds = Seq(1))))
    writeAvro(Paths.get(t, "metadata", "ml.avro"), pListSchema, Seq(
      pList(s"$t/metadata/ma.avro", 0, 1L, 0),
      pList(s"$t/metadata/md.avro", 1, 2L, 0)))
    Files.write(Paths.get(t, "metadata", "v1.metadata.json"),
      pMeta(t).getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t, root)
    val got = CommitLog.read(spark, root).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 14L),
      s"id 1 dies (partition a), id 12 survives (partition b): $got")
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.files.contains(s"$t/data/fb.parquet"),
      "the out-of-scope partition must stay by reference")
    assert(!m.files.contains(s"$t/data/fa.parquet"))

    // --- table 2: an UNPARTITIONED-spec delete stays global --------------
    val t2 = tmp(); val root2 = tmp()
    writeOne(partDf(0, 5, "a").coalesce(1), Paths.get(t2, "data", "fa.parquet"))
    writeOne(partDf(10, 5, "b").coalesce(1), Paths.get(t2, "data", "fb.parquet"))
    writeOne(Seq(2L, 13L).toDF("id"), Paths.get(t2, "data", "eqg.parquet"))
    writeAvro(Paths.get(t2, "metadata", "ma.avro"), pManifestSchema, Seq(
      pEntry(s"$t2/data/fa.parquet", 5L, 0, 1L, Some("a")),
      pEntry(s"$t2/data/fb.parquet", 5L, 0, 1L, Some("b"))))
    writeAvro(Paths.get(t2, "metadata", "md.avro"), pManifestSchema, Seq(
      pEntry(s"$t2/data/eqg.parquet", 2L, 2, 2L, None, eqIds = Seq(1))))
    writeAvro(Paths.get(t2, "metadata", "ml.avro"), pListSchema, Seq(
      pList(s"$t2/metadata/ma.avro", 0, 1L, 0),
      pList(s"$t2/metadata/md.avro", 1, 2L, 1))) // spec 1 = unpartitioned
    Files.write(Paths.get(t2, "metadata", "v1.metadata.json"),
      pMeta(t2).getBytes("UTF-8"))
    Files.write(Paths.get(t2, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t2, root2)
    assert(CommitLog.read(spark, root2).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 3L, 4L, 10L, 11L, 12L, 14L),
      "a global delete kills 2 (partition a) AND 13 (partition b)")
  }

  test("v2 POSITION deletes translate to commitlog DVs (dedup + dangling " +
      "drop); an equality delete outranking nothing is a no-op") {
    val t = tmp(); val root = tmp()
    // two data files; f1 loses rows 1 and 3, marked across TWO delete
    // files (row 3 twice — dedup), plus a DANGLING mark on a removed file
    writeOne(dataDf(0, 8).coalesce(1).sortWithinPartitions("id"),
      Paths.get(t, "data", "f1.parquet"))
    writeOne(dataDf(100, 4).coalesce(1).sortWithinPartitions("id"),
      Paths.get(t, "data", "f2.parquet"))
    import spark.implicits._
    writeOne(Seq((s"$t/data/f1.parquet", 1L), (s"$t/data/f1.parquet", 3L))
      .toDF("file_path", "pos"), Paths.get(t, "data", "del1.parquet"))
    writeOne(Seq((s"$t/data/f1.parquet", 3L),
      (s"$t/data/gone.parquet", 0L)) // dangling — target not in snapshot
      .toDF("file_path", "pos"), Paths.get(t, "data", "del2.parquet"))
    writeAvro(Paths.get(t, "metadata", "m.avro"), manifestSchema, Seq(
      manifestEntry(1, s"$t/data/f1.parquet", 8L),
      manifestEntry(1, s"$t/data/f2.parquet", 4L)))
    writeAvro(Paths.get(t, "metadata", "md.avro"), manifestSchema, Seq(
      manifestEntry(1, s"$t/data/del1.parquet", 2L, dfContent = 1),
      manifestEntry(1, s"$t/data/del2.parquet", 2L, dfContent = 1)))
    writeAvro(Paths.get(t, "metadata", "ml.avro"), manifestListSchema, Seq(
      listEntry(s"$t/metadata/m.avro"),
      listEntry(s"$t/metadata/md.avro", content = 1)))
    Files.write(Paths.get(t, "metadata", "v1.metadata.json"),
      metadataJson(t, 1L, s"$t/metadata/ml.avro", formatVersion = 2)
        .getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t, root)
    val got = CommitLog.read(spark, root)
    assert(got.count() == 10) // 8 - 2 dead + 4
    assert(got.filter(col("id") < 8).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L, 4L, 5L, 6L, 7L))
    // the deletes landed as DV metadata; data stayed by reference
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.dvsOrEmpty.size == 1)
    // r9: footer stats at import — min/max pruning with NO ANALYZE pass
    assert(CommitLog.prunedFiles(spark, root, m, col("id") >= 100L).size == 1)
    // and purge materializes them away natively
    CommitLog.purgeDeletionVectors(spark, root)
    assert(CommitLog.read(spark, root).count() == 10)

    // an equality delete whose sequence number outranks NO data file is
    // a no-op (spec scan planning: strictly-smaller only) — the import
    // stays fully by reference
    val t2 = tmp(); val root2 = tmp()
    writeOne(dataDf(0, 3), Paths.get(t2, "data", "f.parquet"))
    writeOne(Seq(1L).toDF("id"), Paths.get(t2, "data", "eq.parquet"))
    writeAvro(Paths.get(t2, "metadata", "m.avro"), manifestSchema,
      Seq(manifestEntry(1, s"$t2/data/f.parquet", 3L, seq = Some(2L))))
    writeAvro(Paths.get(t2, "metadata", "md.avro"), manifestSchema,
      Seq(manifestEntry(1, s"$t2/data/eq.parquet", 1L, dfContent = 2,
        seq = Some(2L), equalityIds = Seq(1))))
    writeAvro(Paths.get(t2, "metadata", "ml.avro"), manifestListSchema, Seq(
      listEntry(s"$t2/metadata/m.avro", seq = Some(2L)),
      listEntry(s"$t2/metadata/md.avro", content = 1, seq = Some(2L))))
    Files.write(Paths.get(t2, "metadata", "v1.metadata.json"),
      metadataJson(t2, 1L, s"$t2/metadata/ml.avro", formatVersion = 2)
        .getBytes("UTF-8"))
    Files.write(Paths.get(t2, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t2, root2)
    assert(CommitLog.read(spark, root2).count() == 3)
    assert(!Files.walk(Paths.get(root2)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
  }

  test("position-delete scan-planning gate: marks whose delete sequence " +
      "is below the data file's sequence drop instead of over-deleting") {
    val t = tmp(); val root = tmp()
    // data file at sequence 2; one delete file at sequence 1 (OUTRANKED —
    // a valid writer can't produce this, a malformed tree can) and one at
    // sequence 3 (applies). Only the seq-3 marks may kill rows.
    writeOne(dataDf(0, 6).coalesce(1).sortWithinPartitions("id"),
      Paths.get(t, "data", "f1.parquet"))
    import spark.implicits._
    writeOne(Seq((s"$t/data/f1.parquet", 0L), (s"$t/data/f1.parquet", 1L))
      .toDF("file_path", "pos"), Paths.get(t, "data", "del_old.parquet"))
    writeOne(Seq((s"$t/data/f1.parquet", 5L))
      .toDF("file_path", "pos"), Paths.get(t, "data", "del_new.parquet"))
    writeAvro(Paths.get(t, "metadata", "m.avro"), manifestSchema,
      Seq(manifestEntry(1, s"$t/data/f1.parquet", 6L, seq = Some(2L))))
    writeAvro(Paths.get(t, "metadata", "md.avro"), manifestSchema, Seq(
      manifestEntry(1, s"$t/data/del_old.parquet", 2L, dfContent = 1,
        seq = Some(1L)),
      manifestEntry(1, s"$t/data/del_new.parquet", 1L, dfContent = 1,
        seq = Some(3L))))
    writeAvro(Paths.get(t, "metadata", "ml.avro"), manifestListSchema, Seq(
      listEntry(s"$t/metadata/m.avro", seq = Some(2L)),
      listEntry(s"$t/metadata/md.avro", content = 1, seq = Some(3L))))
    Files.write(Paths.get(t, "metadata", "v1.metadata.json"),
      metadataJson(t, 1L, s"$t/metadata/ml.avro", formatVersion = 2)
        .getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    IcebergImport.importTable(spark, t, root)
    // rows 0 and 1 SURVIVE (their marks were outranked); row 5 dies
    assert(CommitLog.read(spark, root).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("import-time bloom/NDV sidecars (r10): session opt-in lights " +
      "point-lookup skipping at import, no OPTIMIZE needed") {
    val t = tmp(); val root = tmp()
    // four files with INTERLEAVED id ranges (file k holds k, k+4, k+8…)
    // so min/max bounds overlap completely — only a bloom probe prunes
    (0 until 4).foreach { k =>
      writeOne(spark.range(16).selectExpr(s"id * 4 + $k AS id",
          "CAST(id AS DOUBLE) / 2 AS v", s"concat('r', id * 4 + $k) AS name")
        .coalesce(1).sortWithinPartitions("id"),
        Paths.get(t, "data", s"f$k.parquet"))
    }
    writeAvro(Paths.get(t, "metadata", "m.avro"), manifestSchema,
      (0 until 4).map(k => manifestEntry(1, s"$t/data/f$k.parquet", 16L)))
    writeAvro(Paths.get(t, "metadata", "ml.avro"), manifestListSchema,
      Seq(listEntry(s"$t/metadata/m.avro")))
    Files.write(Paths.get(t, "metadata", "v1.metadata.json"),
      metadataJson(t, 1L, s"$t/metadata/ml.avro").getBytes("UTF-8"))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))
    spark.conf.set("spark.graft.bloom.columns", "id")
    spark.conf.set("spark.graft.ndv.columns", "name")
    try IcebergImport.importTable(spark, t, root)
    finally {
      spark.conf.unset("spark.graft.bloom.columns")
      spark.conf.unset("spark.graft.ndv.columns")
    }
    val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
    assert(m.statsOrNil.size == 4)
    assert(m.statsOrNil.forall(_.bloomOpt.isDefined), "every file bloom-indexed")
    assert(m.statsOrNil.forall(_.ndvOpt.isDefined), "every file NDV-sketched")
    // min/max alone cannot prune the interleaved layout…
    assert(CommitLog.prunedFiles(spark, m, col("id") === 5L).size == 4)
    // …the import-time bloom does: id 5 lives only in file 5 % 4 == 1
    assert(CommitLog.prunedFiles(spark, root, m, col("id") === 5L).size == 1)
    assert(CommitLog.readPruned(spark, root, col("id") === 5L)
      .select("name").collect().map(_.getString(0)).toSeq == Seq("r5"))
    // data files stayed foreign (by reference); only sidecars landed
    // under the target root
    import scala.jdk.CollectionConverters._
    val local = Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => Files.isRegularFile(p)).map(_.toString).toSeq
    assert(!local.exists(_.endsWith(".parquet")), "data must stay foreign")
    assert(local.exists(_.contains("_bloom/")) && local.exists(_.contains("_ndv/")))
    // and without the opt-in the import stays pure metadata (no sidecars)
    val root2 = tmp()
    IcebergImport.importTable(spark, t, root2)
    val m2 = CommitLog.readManifest(root2, CommitLog.currentVersion(root2).get)
    assert(m2.statsOrNil.forall(_.bloomOpt.isEmpty))
    assert(!Files.walk(Paths.get(root2)).iterator().asScala
      .exists(_.toString.contains("_bloom")))
  }
}
