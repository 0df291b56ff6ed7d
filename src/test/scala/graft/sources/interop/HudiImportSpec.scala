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
      replaced: Seq[String] = Nil, schema: String = avroSchema): String = {
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
    n.putObject("extraMetadata").put("schema", schema)
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

  // ------------------------------------------- MOR log-fold fixtures
  // An INDEPENDENT byte-level writer of the published HoodieLogFormat v1
  // layout (the DeltaImport fixture discipline: the test writes the spec
  // by hand; agreeing with the reader means both implement the published
  // bytes, not each other).

  private def metaBytes(m: Seq[(Int, String)]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bo)
    d.writeInt(m.size)
    m.foreach { case (k, v) =>
      d.writeInt(k)
      val b = v.getBytes("UTF-8"); d.writeInt(b.length); d.write(b)
    }
    bo.toByteArray
  }

  private def blockBytes(btype: Int, header: Seq[(Int, String)],
      content: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bo)
    d.write("#HUDI#".getBytes("UTF-8"))
    val hb = metaBytes(header); val fb = metaBytes(Nil)
    // block size = version(4) + type(4) + header + contentLen(8) +
    // content + footer + trailing-total(8), excluding magic and itself
    val blockSize = 4 + 4 + hb.length + 8 + content.length + fb.length + 8
    d.writeLong(blockSize.toLong)
    d.writeInt(1) // HoodieLogFormat version
    d.writeInt(btype)
    d.write(hb)
    d.writeLong(content.length.toLong)
    d.write(content)
    d.write(fb)
    d.writeLong((6 + 8 + blockSize).toLong) // total incl. magic + size long
    bo.toByteArray
  }

  private def avroDataBlock(instant: String,
      recs: Seq[(Long, Option[Double])]): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(avroSchema)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    val co = new java.io.ByteArrayOutputStream()
    val cd = new java.io.DataOutputStream(co)
    cd.writeInt(3) // avro data block content-format version
    cd.writeInt(recs.size)
    recs.foreach { case (id, v) =>
      val r = new GenericData.Record(schema)
      r.put("id", java.lang.Long.valueOf(id))
      r.put("v", v.map(java.lang.Double.valueOf).orNull)
      val ro = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(ro, null)
      writer.write(r, enc); enc.flush()
      val rb = ro.toByteArray
      cd.writeInt(rb.length); cd.write(rb)
    }
    // header: INSTANT_TIME(0), SCHEMA(2); type 3 = avro data block
    blockBytes(3, Seq(0 -> instant, 2 -> avroSchema), co.toByteArray)
  }

  // the published HoodieDeleteRecordList schema, re-embedded here so the
  // test does NOT share the reader's constant
  private val deleteListSchemaJson =
    """{"type":"record","name":"HoodieDeleteRecordList",
      |"namespace":"org.apache.hudi.avro.model","fields":[
      |  {"name":"deleteRecordList","type":{"type":"array","items":
      |    {"type":"record","name":"HoodieDeleteRecord","fields":[
      |      {"name":"recordKey","type":["null","string"],"default":null},
      |      {"name":"partitionPath","type":["null","string"],"default":null},
      |      {"name":"orderingVal","type":["null","string","int","long",
      |        "float","double","bytes"],"default":null}
      |    ]}}}]}""".stripMargin

  private def deleteBlock(instant: String, keys: Seq[String]): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val ls = new org.apache.avro.Schema.Parser().parse(deleteListSchemaJson)
    val recSchema = ls.getField("deleteRecordList").schema().getElementType
    val list = new GenericData.Record(ls)
    val arr = new java.util.ArrayList[GenericRecord]()
    keys.foreach { k =>
      val r = new GenericData.Record(recSchema)
      r.put("recordKey", k); r.put("partitionPath", ""); arr.add(r)
    }
    list.put("deleteRecordList", arr)
    val ro = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(ro, null)
    new GenericDatumWriter[GenericRecord](ls).write(list, enc); enc.flush()
    val body = ro.toByteArray
    val co = new java.io.ByteArrayOutputStream()
    val cd = new java.io.DataOutputStream(co)
    cd.writeInt(3) // delete block content-format version
    cd.writeInt(body.length); cd.write(body)
    blockBytes(1, Seq(0 -> instant), co.toByteArray)
  }

  private def rollbackBlock(instant: String, target: String): Array[Byte] =
    // COMMAND_BLOCK (0); header: INSTANT_TIME(0), TARGET_INSTANT_TIME(1),
    // COMMAND_BLOCK_TYPE(3) = "0" (rollback)
    blockBytes(0, Seq(0 -> instant, 1 -> target, 3 -> "0"),
      Array.emptyByteArray)

  private def freshMor(): Path = {
    val t = Files.createTempDirectory("graft-hudi-mor-fold")
    val hoodie = t.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.write(hoodie.resolve("hoodie.properties"),
      ("hoodie.table.name=fixture\nhoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.recordkey.fields=id\n").getBytes("UTF-8"))
    t
  }

  test("MOR log fold (allowLogs=true): avro data blocks upsert/insert, " +
      "delete blocks kill keys, later blocks win — against hand-written " +
      "byte fixtures") {
    val t = freshMor()
    val hoodie = t.resolve(".hoodie")
    writeParquet(t, "fg1_0-0-0_001.parquet", 0L until 10L) // v = id/4
    Files.write(hoodie.resolve("001.deltacommit"), commitJson(Seq(
      ("fg1", "fg1_0-0-0_001.parquet", 10L))).getBytes("UTF-8"))
    // 002: upsert id 3 (v=99) + insert id 100 (v=1)
    Files.write(t.resolve(".fg1_001.log.1_0-1-0"),
      avroDataBlock("002", Seq(3L -> Some(99.0), 100L -> Some(1.0))))
    Files.write(hoodie.resolve("002.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.1_0-1-0", 2L))).getBytes("UTF-8"))
    // 003: one log file, TWO blocks — delete {5, 100}, then a data block
    // resurrects 5 with v=7.5 (order within the file must hold)
    Files.write(t.resolve(".fg1_001.log.2_0-1-0"),
      deleteBlock("003", Seq("5", "100")) ++
        avroDataBlock("003", Seq(5L -> Some(7.5))))
    Files.write(hoodie.resolve("003.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.2_0-1-0", 3L))).getBytes("UTF-8"))

    // default stays the refusal
    intercept[IllegalArgumentException] {
      HudiImport.importTable(spark, t.toString,
        Files.createTempDirectory("graft-hudi-f0").toString)
    }
    val root = Files.createTempDirectory("graft-hudi-f1").toString
    HudiImport.importTable(spark, t.toString, root, allowLogs = true)
    val got = CommitLog.read(spark, root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = (0L until 10L).map {
      case 3L => (3L, 99.0)
      case 5L => (5L, 7.5)
      case i => (i, i.toDouble / 4)
    }
    assert(got == want, s"got $got")

    // 004: a rollback command block negates instant 003's blocks —
    // the delete and the resurrection both vanish, 002's effects stay
    Files.write(t.resolve(".fg1_001.log.3_0-1-0"),
      rollbackBlock("004", target = "003"))
    Files.write(hoodie.resolve("004.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.3_0-1-0", 0L))).getBytes("UTF-8"))
    val root2 = Files.createTempDirectory("graft-hudi-f2").toString
    HudiImport.importTable(spark, t.toString, root2, allowLogs = true)
    val got2 = CommitLog.read(spark, root2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want2 = ((0L until 10L).map {
      case 3L => (3L, 99.0)
      case i => (i, i.toDouble / 4)
    } :+ (100L, 1.0)).sortBy(_._1)
    assert(got2 == want2, s"got $got2")
  }

  // --------------------------- parquet + HFile data block fixtures (r13)

  private def avroRecBytes(id: Long, v: Option[Double]): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(avroSchema)
    val r = new GenericData.Record(schema)
    r.put("id", java.lang.Long.valueOf(id))
    r.put("v", v.map(java.lang.Double.valueOf).orNull)
    val ro = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(ro, null)
    new GenericDatumWriter[GenericRecord](schema).write(r, enc); enc.flush()
    ro.toByteArray
  }

  /** PARQUET data block (type 5): content is a REAL parquet file byte
    * stream — produced by Spark's own writer, so the reader is tested
    * against genuine parquet bytes, not a hand copy.
    */
  private def parquetDataBlock(instant: String,
      recs: Seq[(Long, Option[Double])]): Array[Byte] = {
    import spark.implicits._
    val w = Files.createTempDirectory("graft-hudi-pqblk")
    recs.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(w.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(w).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    blockBytes(5, Seq(0 -> instant, 2 -> avroSchema), Files.readAllBytes(part))
  }

  /** HFILE data block (type 4): a hand-written HBase HFile per the
    * published v2 block layout — 8-byte `DATABLK*` magic, the 33-byte
    * header (onDiskSizeWithoutHeader INCLUDING trailing checksum bytes,
    * uncompressedSize, prevOffset, checksumType, bytesPerChecksum,
    * onDiskDataSizeWithHeader EXCLUDING checksums), cells of
    * (i32 keyLen, i32 valLen, [i16 rowLen, row, famLen=0, ts, type],
    * value[, MVCC varint]), optionally gzip-compressed (HBase's GZ), a
    * root-index + trailer stub after the data proving the scan stops.
    */
  /** The FILEINF2 block real writers always emit: a valid 33-byte block
    * header plus a payload naming `MAX_MEMSTORE_TS` exactly when the
    * file's cells carry mvcc varints (HFileWriterImpl.finishFileInfo's
    * published contract — the key bytes appear verbatim in both the
    * protobuf and writable-map encodings).
    */
  private def fileInfoBlock(mvcc: Boolean): Array[Byte] = {
    val payload = ("PBUF" +
      (if (mvcc) "MAX_MEMSTORE_TS KEY_VALUE_VERSION"
       else "hfile.LASTKEY 7")).getBytes("UTF-8")
    val f = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(f)
    d.write("FILEINF2".getBytes("UTF-8"))
    d.writeInt(payload.length) // onDiskSizeWithoutHeader
    d.writeInt(payload.length) // uncompressedSizeWithoutHeader
    d.writeLong(-1L); d.writeByte(1); d.writeInt(16384)
    d.writeInt(33 + payload.length) // onDiskDataSizeWithHeader
    d.write(payload)
    f.toByteArray
  }

  private def hfileBytes(recs: Seq[(Long, Option[Double])],
      gz: Boolean, mvcc: Boolean, fileInfo: Boolean = false): Array[Byte] = {
    val cells = new java.io.ByteArrayOutputStream()
    val cd = new java.io.DataOutputStream(cells)
    recs.sortBy(r => String.valueOf(r._1)).foreach { case (id, v) =>
      val row = String.valueOf(id).getBytes("UTF-8")
      val value = avroRecBytes(id, v)
      val keyLen = 2 + row.length + 1 + 8 + 1 // row, famLen=0, ts, type
      cd.writeInt(keyLen); cd.writeInt(value.length)
      cd.writeShort(row.length); cd.write(row)
      cd.writeByte(0) // family length 0 (no family/qualifier bytes)
      cd.writeLong(0L) // timestamp
      cd.writeByte(4) // KeyValue.Type.Put
      cd.write(value)
      if (mvcc) cd.writeByte(0) // WritableUtils.writeVLong(0) — seq id 0
    }
    val payload = cells.toByteArray
    val onDisk =
      if (!gz) payload
      else {
        val bo = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bo)
        g.write(payload); g.close(); bo.toByteArray
      }
    val checksum = Array[Byte](1, 2, 3, 4) // excluded by the data size
    val f = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(f)
    d.write("DATABLK*".getBytes("UTF-8"))
    d.writeInt(onDisk.length + checksum.length) // onDiskSizeWithoutHeader
    d.writeInt(payload.length) // uncompressedSizeWithoutHeader
    d.writeLong(-1L) // prevBlockOffset
    d.writeByte(1) // checksumType CRC32
    d.writeInt(16384) // bytesPerChecksum
    d.writeInt(33 + onDisk.length) // onDiskDataSizeWithHeader
    d.write(onDisk); d.write(checksum)
    // load-on-open section: the scan must STOP here, not parse it
    d.write("IDXROOT2".getBytes("UTF-8"))
    d.write(new Array[Byte](40)) // root-index stub
    if (fileInfo) d.write(fileInfoBlock(mvcc))
    d.write("TRABLK\"$".getBytes("UTF-8"))
    d.write(new Array[Byte](12)) // trailer stub
    f.toByteArray
  }

  private def hfileDataBlock(instant: String,
      recs: Seq[(Long, Option[Double])], gz: Boolean,
      mvcc: Boolean): Array[Byte] =
    blockBytes(4, Seq(0 -> instant, 2 -> avroSchema),
      hfileBytes(recs, gz = gz, mvcc = mvcc))

  test("MOR log fold: PARQUET and HFILE data blocks fold like avro ones " +
      "— real parquet bytes, hand-written HFile (gz + mvcc variants)") {
    // unit face first: the HFile scan reads back exactly what the spec
    // wrote, in all eight layout variants (± gz, ± mvcc, ± file info —
    // the file-info variants exercise the deterministic detection path,
    // the bare ones the legacy parse-retry fallback)
    for (gz <- Seq(false, true); mvcc <- Seq(false, true);
         fi <- Seq(false, true)) {
      val cells = HFileScan.cells(
        hfileBytes(Seq(11L -> Some(1.5), 7L -> None), gz = gz, mvcc = mvcc,
          fileInfo = fi))
      assert(cells.map(_._1) == Seq("11", "7"), s"gz=$gz mvcc=$mvcc fi=$fi")
      assert(java.util.Arrays.equals(cells.head._2,
        avroRecBytes(11L, Some(1.5))), s"gz=$gz mvcc=$mvcc fi=$fi value bytes")
    }

    val t = freshMor()
    val hoodie = t.resolve(".hoodie")
    writeParquet(t, "fg1_0-0-0_001.parquet", 0L until 10L) // v = id/4
    Files.write(hoodie.resolve("001.deltacommit"), commitJson(Seq(
      ("fg1", "fg1_0-0-0_001.parquet", 10L))).getBytes("UTF-8"))
    // 002: a PARQUET block upserts id 2 and inserts id 200
    Files.write(t.resolve(".fg1_001.log.1_0-1-0"),
      parquetDataBlock("002", Seq(2L -> Some(50.0), 200L -> Some(2.0))))
    Files.write(hoodie.resolve("002.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.1_0-1-0", 2L))).getBytes("UTF-8"))
    // 003: an HFILE block (gzip + MVCC, HBase's defaults) upserts id 7,
    // inserts id 300; a delete block in the same file kills id 200 AFTER
    // its parquet-block insert
    Files.write(t.resolve(".fg1_001.log.2_0-1-0"),
      hfileDataBlock("003", Seq(7L -> Some(70.0), 300L -> Some(3.0)),
        gz = true, mvcc = true) ++
        deleteBlock("003", Seq("200")))
    Files.write(hoodie.resolve("003.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.2_0-1-0", 3L))).getBytes("UTF-8"))
    val root = Files.createTempDirectory("graft-hudi-pqhf").toString
    HudiImport.importTable(spark, t.toString, root, allowLogs = true)
    val got = CommitLog.read(spark, root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = ((0L until 10L).map {
      case 2L => (2L, 50.0)
      case 7L => (7L, 70.0)
      case i => (i, i.toDouble / 4)
    } :+ (300L, 3.0)).sortBy(_._1)
    assert(got == want, s"got $got")
  }

  test("HFile MVCC detection is file-info-authoritative: an ambiguous " +
      "cell layout that parse-retry would misread parses correctly " +
      "under FILEINF2-based detection") {
    // An MVCC file whose bytes ALSO satisfy a strict no-mvcc parse with
    // different (wrong) cell boundaries — the r13 verdict's hazard made
    // concrete. True content: cell "11" (4-byte value), then cell "7"
    // with a 3328-byte padded key and a 256-byte value; each cell
    // carries a 1-byte mvcc varint (seq 0). The padding embeds a fake
    // cell header so the misaligned no-mvcc walk chains cleanly to the
    // exact end of the payload.
    val val1 = Array[Byte](1, 1, 1, 1)
    val val2 = Array.fill[Byte](256)(7)
    val cells = new java.io.ByteArrayOutputStream()
    val cd = new java.io.DataOutputStream(cells)
    // C1: row "11"
    cd.writeInt(2 + 2 + 1 + 8 + 1); cd.writeInt(val1.length)
    cd.writeShort(2); cd.write("11".getBytes("UTF-8"))
    cd.writeByte(0); cd.writeLong(0L); cd.writeByte(4)
    cd.write(val1)
    cd.writeByte(0) // mvcc varint — the misread consumes this as keyLen'
    // C2: row "7", keyLen 0x00000D00 so the misread sees keyLen' = 13
    val keyLen2 = 0xD00
    cd.writeInt(keyLen2); cd.writeInt(val2.length) // valLen 0x100 → valLen' = 1
    cd.writeShort(1); cd.write("7".getBytes("UTF-8"))
    cd.writeByte(0); cd.writeLong(0L); cd.writeByte(4)
    // key padding, opening with the fake cell header the misread lands on
    val padding = new java.io.ByteArrayOutputStream()
    val pd = new java.io.DataOutputStream(padding)
    pd.writeInt(3500); pd.writeInt(64) // fake keyLen''/valLen'': 8+3500+64
    pd.writeShort(2); pd.write("99".getBytes("UTF-8"))
    val padLen = keyLen2 - 13 // key bytes before padding: 2+1+1+8+1
    pd.write(new Array[Byte](padLen - padding.size()))
    cd.write(padding.toByteArray)
    cd.write(val2)
    cd.writeByte(0) // C2's mvcc varint — consumed as the fake value's tail
    val payload = cells.toByteArray
    def wrap(withInfo: Boolean): Array[Byte] = {
      val f = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(f)
      d.write("DATABLK*".getBytes("UTF-8"))
      d.writeInt(payload.length); d.writeInt(payload.length)
      d.writeLong(-1L); d.writeByte(1); d.writeInt(16384)
      d.writeInt(33 + payload.length)
      d.write(payload)
      d.write("IDXROOT2".getBytes("UTF-8")); d.write(new Array[Byte](40))
      if (withInfo) d.write(fileInfoBlock(mvcc = true))
      d.write("TRABLK\"$".getBytes("UTF-8")); d.write(new Array[Byte](12))
      f.toByteArray
    }
    // the ambiguity is REAL: without file info, strict-no-mvcc-first
    // parse-retry accepts the wrong walk and fabricates cells
    val misread = HFileScan.cells(wrap(withInfo = false))
    assert(misread.map(_._1) == Seq("11", "", "99"),
      s"expected the crafted misread, got ${misread.map(_._1)}")
    // with the file info block, detection is deterministic and the true
    // cells come back
    val correct = HFileScan.cells(wrap(withInfo = true))
    assert(correct.map(_._1) == Seq("11", "7"))
    assert(java.util.Arrays.equals(correct.head._2, val1))
    assert(java.util.Arrays.equals(correct(1)._2, val2))
  }

  test("MOR log fold: COMPOSITE record keys (ComplexKeyGenerator " +
      "`f1:v1,f2:v2` encoding) — upserts, deletes, and the base-file " +
      "anti-join all agree on the encoded key") {
    import spark.implicits._
    val schema2 =
      """{"type":"record","name":"r2","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"sub","type":"string"},
        |  {"name":"v","type":["null","double"],"default":null}
        |]}""".stripMargin
    def dataBlock2(instant: String,
        recs: Seq[(Long, String, Option[Double])]): Array[Byte] = {
      import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
      val sc = new org.apache.avro.Schema.Parser().parse(schema2)
      val writer = new GenericDatumWriter[GenericRecord](sc)
      val co = new java.io.ByteArrayOutputStream()
      val cd = new java.io.DataOutputStream(co)
      cd.writeInt(3); cd.writeInt(recs.size)
      recs.foreach { case (id, sub, v) =>
        val r = new GenericData.Record(sc)
        r.put("id", java.lang.Long.valueOf(id))
        r.put("sub", sub)
        r.put("v", v.map(java.lang.Double.valueOf).orNull)
        val ro = new java.io.ByteArrayOutputStream()
        val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(ro, null)
        writer.write(r, enc); enc.flush()
        val rb = ro.toByteArray
        cd.writeInt(rb.length); cd.write(rb)
      }
      blockBytes(3, Seq(0 -> instant, 2 -> schema2), co.toByteArray)
    }
    val t = Files.createTempDirectory("graft-hudi-mor-ck")
    val hoodie = t.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Files.write(hoodie.resolve("hoodie.properties"),
      ("hoodie.table.name=fixture\nhoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.recordkey.fields=id,sub\n").getBytes("UTF-8"))
    // base: (0..5) x (a,b)
    val w = Files.createTempDirectory("graft-hudi-ckw")
    (0L until 6L).flatMap(i => Seq((i, "a", i * 1.0), (i, "b", i * 2.0)))
      .toDF("id", "sub", "v").coalesce(1)
      .write.mode("overwrite").parquet(w.toString)
    import scala.jdk.CollectionConverters._
    Files.move(Files.list(w).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get,
      t.resolve("fg1_0-0-0_001.parquet"))
    Files.write(hoodie.resolve("001.deltacommit"), commitJson(Seq(
      ("fg1", "fg1_0-0-0_001.parquet", 12L)), schema = schema2)
      .getBytes("UTF-8"))
    // 002: upsert (3,a)->99, insert (100,a)->1
    Files.write(t.resolve(".fg1_001.log.1_0-1-0"),
      dataBlock2("002", Seq((3L, "a", Some(99.0)), (100L, "a", Some(1.0)))))
    Files.write(hoodie.resolve("002.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.1_0-1-0", 2L)), schema = schema2)
      .getBytes("UTF-8"))
    // 003: composite-encoded deletes — (5,b) from the base, (100,a) from
    // the log insert; (5,a) must SURVIVE (the key is the pair, not id)
    Files.write(t.resolve(".fg1_001.log.2_0-1-0"),
      deleteBlock("003", Seq("id:5,sub:b", "id:100,sub:a")))
    Files.write(hoodie.resolve("003.deltacommit"), commitJson(Seq(
      ("fg1", ".fg1_001.log.2_0-1-0", 2L)), schema = schema2)
      .getBytes("UTF-8"))
    val root = Files.createTempDirectory("graft-hudi-ck-out").toString
    HudiImport.importTable(spark, t.toString, root, allowLogs = true)
    val got = CommitLog.read(spark, root).orderBy("id", "sub").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val want = ((0L until 6L).flatMap(i => Seq(
      (i, "a", if (i == 3L) 99.0 else i * 1.0),
      (i, "b", i * 2.0))).filterNot(x => x._1 == 5L && x._2 == "b"))
      .sortBy(x => (x._1, x._2))
    assert(got == want, s"got $got")
  }

  test("MOR log fold: a log-ONLY file group (no base) imports its " +
      "inserts under allowLogs; mixed clean groups stay by reference") {
    val t = freshMor()
    val hoodie = t.resolve(".hoodie")
    // fg1: a clean, log-free base file
    writeParquet(t, "fg1_0-0-0_001.parquet", 0L until 20L)
    Files.write(hoodie.resolve("001.deltacommit"), commitJson(Seq(
      ("fg1", "fg1_0-0-0_001.parquet", 20L))).getBytes("UTF-8"))
    // fg2: exists ONLY as a log file of inserts
    Files.write(t.resolve(".fg2_002.log.1_0-1-0"),
      avroDataBlock("002", Seq(500L -> Some(5.0), 501L -> None)))
    Files.write(hoodie.resolve("002.deltacommit"), commitJson(Seq(
      ("fg2", ".fg2_002.log.1_0-1-0", 2L))).getBytes("UTF-8"))
    val root = Files.createTempDirectory("graft-hudi-f3").toString
    HudiImport.importTable(spark, t.toString, root, allowLogs = true)
    val got = CommitLog.read(spark, root).orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.length == 22)
    assert(got.last == ((501L, None))) // null union round-trips
    assert(got(20) == ((500L, Some(5.0))))
    // the clean group's base file is referenced, not copied: the only
    // parquet under root is the merged log-only group
    import scala.jdk.CollectionConverters._
    val copied = Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(copied.nonEmpty &&
      copied.forall(_.toString.contains("mor-merge-")))
  }
}
