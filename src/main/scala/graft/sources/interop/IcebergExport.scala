package graft.sources.interop

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types._

import graft.sources.CommitLog

/** Zero-copy EXPORT of a commitlog snapshot as an Apache Iceberg v1 table:
  * the `metadata/` tree (version-hint.text → v1.metadata.json → avro
  * manifest list → avro manifest) is written INTO the table root, so the
  * commitlog data files become the Iceberg table's data files with
  * `file://` URIs and no byte moved. The layout follows the public table
  * spec (iceberg.apache.org/spec/): the metadata JSON carries the schema
  * (field-id'd struct), an empty partition spec (this engine stages
  * partition columns in-file as ordinary data columns, so unpartitioned is
  * always correct), and one snapshot whose manifest list names one
  * manifest of ADDED (`status = 1`) `manifest_entry` records with exact
  * `record_count` / `file_size_in_bytes` from the commitlog manifest.
  *
  * Unlike [[DeltaExport]] (whose `add` paths are root-relative), Iceberg
  * `file_path` is a full URI — so by-reference files OUTSIDE the root
  * (clone/import sources) export fine.
  *
  * Deletion vectors (r9): a DV-bearing snapshot exports as FORMAT
  * VERSION 2 with POSITION-DELETE files — the commitlog DV parquet
  * re-encodes (one distributed job, positions never on the driver) as
  * spec-shaped (file_path, pos) parquet carrying the spec's reserved
  * parquet field ids, referenced from a content=1 delete manifest at
  * data sequence 2 over the data's sequence 1. Column mapping still
  * refuses: Iceberg resolves renames by FIELD ID inside the data files,
  * which by-reference physical-name parquet does not carry — exporting
  * logical names would read as all-null; materialize a rename-free copy
  * first.
  *
  * Round-trip contract: [[IcebergImport.importTable]] over the exported
  * root reads back the identical snapshot ([[IcebergExportSpec]]). At
  * 100 TB the export is a driver-metadata write — KB of JSON/avro for any
  * table size.
  */
object IcebergExport {

  private val mapper = new ObjectMapper()

  /** Spark type → Iceberg schema-JSON node (the exact mirror of
    * [[IcebergImport.toSpark]]); `id()` mints the spec-required unique
    * field ids. Types Iceberg cannot represent exactly (short/byte/char)
    * refuse rather than widen silently.
    */
  private def typeNode(dt: DataType, id: () => Int): Object = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case StringType => "string"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case s: StructType =>
      val n = mapper.createObjectNode()
      n.put("type", "struct")
      val fs = n.putArray("fields")
      s.fields.foreach { f =>
        val fn = fs.addObject()
        fn.put("id", id()); fn.put("name", f.name)
        fn.put("required", !f.nullable)
        fn.putPOJO("type", typeNode(f.dataType, id))
      }
      n
    case ArrayType(et, containsNull) =>
      val n = mapper.createObjectNode()
      n.put("type", "list"); n.put("element-id", id())
      n.putPOJO("element", typeNode(et, id))
      n.put("element-required", !containsNull)
      n
    case MapType(kt, vt, valueContainsNull) =>
      val n = mapper.createObjectNode()
      n.put("type", "map")
      n.put("key-id", id()); n.putPOJO("key", typeNode(kt, id))
      n.put("value-id", id()); n.putPOJO("value", typeNode(vt, id))
      n.put("value-required", !valueContainsNull)
      n
    case other => throw new IllegalArgumentException(
      s"type $other has no exact Iceberg representation — cast it first")
  }

  // manifest_entry with the v1-required data_file fields (spec §Manifests;
  // field-id props ride along as the spec assigns them: status=0,
  // snapshot_id=1, data_file=2, file_path=100 …block_size_in_bytes=105).
  // `partFields` (r10) injects the typed partition-struct fields of the
  // declared spec — empty for unpartitioned exports, as before.
  private def entrySchema(partFields: String): Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","type":{"type":"record","name":"r102","fields":[$partFields]},"field-id":102},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"block_size_in_bytes","type":"long","field-id":105}
      |  ]},"field-id":2}]}""".stripMargin)

  // v2 manifest_entry: data sequence numbers inline, data_file.content
  // (0 data / 1 position deletes) — the fields the v2 scan-planning rules
  // read (spec §Manifests, §Sequence Numbers)
  private def entrySchemaV2(partFields: String): Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int","default":0,"field-id":134},
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","type":{"type":"record","name":"r102","fields":[$partFields]},"field-id":102},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104}
      |  ]},"field-id":2}]}""".stripMargin)

  // manifest_file (the manifest-list entry), v1 core fields
  private val listSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503}
      |]}""".stripMargin)

  // v2 manifest_file: content (0 data / 1 deletes manifest) + the
  // manifest's sequence number, which added entries inherit
  private val listSchemaV2: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"content","type":"int","default":0,"field-id":517},
      |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":515},
      |  {"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503}
      |]}""".stripMargin)

  private def writeAvro(target: java.nio.file.Path, sch: Schema,
      meta: Seq[(String, String)], rs: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(sch, target.toFile)
    try rs.foreach(w.append) finally w.close()
  }

  /** Write the Iceberg metadata tree for the current — or a PINNED
    * (`version`) — snapshot; returns the number of data files exported.
    * Same publish-a-tag semantics as [[DeltaExport.exportTable]].
    */
  def exportTable(root: String, version: Option[Long] = None,
      spark: Option[org.apache.spark.sql.SparkSession] = None): Int = {
    val v = version.getOrElse(CommitLog.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no commits at $root")))
    val m = CommitLog.readManifest(root, v)
    val dvMap = m.dvsOrEmpty
    require(dvMap.isEmpty || spark.nonEmpty,
      "snapshot carries deletion vectors — their positions live in DV " +
        "parquet, so exporting them needs a SparkSession: " +
        "exportTable(root, version, spark = Some(session)) writes a " +
        "format-version-2 tree with position-delete files; or " +
        "REORG … APPLY (PURGE) first for a v1 export")
    require(m.colMapOrEmpty.isEmpty,
      "table uses column mapping — physical file names differ from the " +
        "logical schema; materialize a rename-free copy first")
    val metaDir = Paths.get(root, "metadata")
    require(!Files.exists(metaDir),
      s"$root already carries an Iceberg metadata directory")
    val rowsOf = m.statsOrNil.map(s => s.path -> s.rows).toMap
    val sizeOf = m.statsOrNil.map(s => s.path -> s.bytes).toMap
    def uri(f: String): String =
      "file://" + (if (f.startsWith("/")) f else s"$root/$f")
    val fv = if (dvMap.isEmpty) 1 else 2

    // DV → position-delete parquet BEFORE the metadata dir exists (a
    // failed export must not leave a half-valid Iceberg tree): one
    // distributed job reads every DV parquet, maps each row back to its
    // data file's URI, and writes spec-shaped (file_path, pos) rows —
    // sorted, with the spec's reserved parquet field ids (2147483546 /
    // 2147483545) on the columns for id-based readers. Positions never
    // land on the driver; only the part-file list does.
    val posDeleteSchema = StructType(Seq(
      StructField("file_path", StringType), StructField("pos", LongType)))
    val deleteParts: Seq[(String, Long)] =
      if (dvMap.isEmpty) Nil
      else {
        val s = spark.get
        import org.apache.spark.sql.functions._
        import s.implicits._
        val byDvAbs: Map[String, Seq[String]] =
          dvMap.toSeq.groupMap { case (_, dvFile) =>
            Paths.get(root, dvFile).toAbsolutePath.normalize.toString
          } { case (dataFile, _) => uri(dataFile) }
        val outDir = s"$root/deletes-v$v"
        val fileIdMeta = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2147483546L).build()
        val posIdMeta = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2147483545L).build()
        s.read
          .schema(StructType(Seq(StructField("pos", LongType))))
          .parquet(byDvAbs.keys.toSeq: _*)
          .select(input_file_name().as("u"), col("pos"))
          .as[(String, Long)]
          .flatMap { case (u, p) =>
            byDvAbs(Paths.get(new java.net.URI(u).getPath)
              .normalize.toString).map(f => (f, p)) }
          .toDF("file_path", "pos")
          .sort("file_path", "pos")
          .select(col("file_path").as("file_path", fileIdMeta),
            col("pos").as("pos", posIdMeta))
          .write.parquet(outDir)
        import scala.jdk.CollectionConverters._
        val parts = Files.walk(Paths.get(outDir)).iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            Files.isRegularFile(p) && n.endsWith(".parquet") &&
              !n.startsWith("_") && !n.startsWith(".")
          }.map(_.toString).toSeq.sorted
        // exact per-part record counts off the footers (KB each)
        CommitLog.importFooterStats(s, posDeleteSchema, parts)
          .map(st => st.path -> st.rows)
      }
    Files.createDirectories(metaDir)

    // schema JSON with spec-required field ids
    var nextId = 0
    val id = () => { nextId += 1; nextId }
    val schemaNode = typeNode(CommitLog.manifestSchema(m), id)
      .asInstanceOf[ObjectNode]
    schemaNode.put("schema-id", 0)

    // ---- hidden-partition spec translation (r10): the commitlog's
    // transform vocabulary IS Iceberg's (days/months/years/truncate are
    // the spec's own transforms; the floor contract already matches), so
    // a hidden-partitioned layout exports as a real Iceberg partition
    // spec with typed per-file partition values — Iceberg readers prune
    // on it natively. Deliberate exclusions, each wrong-results-proof:
    //   - bucket(N, c) — SPARK-hash buckets: the two engines hash
    //     DIFFERENTLY (Spark Murmur3 seed-42 internal encoding vs
    //     Iceberg's spec-defined murmur3_x86_32 byte encodings) —
    //     declaring it would make an Iceberg reader probe the wrong
    //     bucket and silently drop rows; the field stays undeclared
    //     (unpartitioned is always correct). Tables that WANT a
    //     declarable bucket layout partition by iceberg_bucket(N, c)
    //     instead (r11): graft.functions.IcebergHash IS the spec's
    //     murmur3_x86_32 with the spec's type encodings, so those
    //     export as real bucket[N] specs below.
    //   - any file missing its partition tuple → declare nothing.
    //   - DV-bearing (v2) exports stay unpartitioned-declared: delete
    //     manifests share the spec, and null partition tuples on delete
    //     entries could make a strict planner skip applying them.
    val topIds: Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      schemaNode.get("fields").elements().asScala
        .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    }
    val tableSchema = CommitLog.manifestSchema(m)
    val statsByPath = m.statsOrNil.map(s => s.path -> s).toMap
    final case class PartOut(name: String, transform: String, sourceId: Int,
        key: String, conv: String => Any, avroType: String) {
      var fieldId: Int = 0
    }
    def epochDay(s: String): Any =
      java.time.LocalDate.parse(s).toEpochDay.toInt
    val declaredParts: Seq[PartOut] = {
      if (fv != 1) Nil
      else {
        val candidates = m.partitionByOrNil
          .map(CommitLog.parsePartField).flatMap { f =>
            val srcType = tableSchema.fields.find(_.name == f.source)
              .map(_.dataType)
            val key = f.key(identity)
            (f.fn, srcType) match {
              case ("days", _) => Some(PartOut(s"${f.source}_day", "day",
                topIds(f.source), key, epochDay,
                """{"type":"int","logicalType":"date"}"""))
              case ("months", _) => Some(PartOut(s"${f.source}_month", "month",
                topIds(f.source), key, s => {
                  val d = java.time.LocalDate.parse(s)
                  (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
                }, "\"int\""))
              case ("years", _) => Some(PartOut(s"${f.source}_year", "year",
                topIds(f.source), key, s =>
                  java.time.LocalDate.parse(s).getYear - 1970, "\"int\""))
              case ("truncate", Some(StringType)) =>
                Some(PartOut(s"${f.source}_trunc", s"truncate[${f.arg}]",
                  topIds(f.source), key, s => s, "\"string\""))
              case ("ibucket", _) =>
                // written with the spec's own hash (IcebergHash), so an
                // Iceberg reader probing bucket[N] finds every row
                Some(PartOut(s"${f.source}_bucket", s"bucket[${f.arg}]",
                  topIds(f.source), key, s => s.toInt, "\"int\""))
              case ("identity", Some(LongType)) =>
                Some(PartOut(f.source, "identity", topIds(f.source), key,
                  s => s.toLong, "\"long\""))
              case ("identity", Some(IntegerType)) =>
                Some(PartOut(f.source, "identity", topIds(f.source), key,
                  s => s.toInt, "\"int\""))
              case ("identity", Some(StringType)) =>
                Some(PartOut(f.source, "identity", topIds(f.source), key,
                  s => s, "\"string\""))
              case ("identity", Some(DateType)) =>
                Some(PartOut(f.source, "identity", topIds(f.source), key,
                  epochDay, """{"type":"int","logicalType":"date"}"""))
              case _ => None // bucket + untranslatable identity types
            }
          }
        val complete = m.files.forall(f => statsByPath.get(f)
          .exists(st => candidates.forall(c =>
            st.partitionsOrEmpty.contains(c.key))))
        if (candidates.nonEmpty && complete) {
          candidates.zipWithIndex.foreach { case (c, i) => c.fieldId = 1000 + i }
          candidates
        } else Nil
      }
    }
    val partFieldsJson = declaredParts.map(pd =>
      s"""{"name":"${pd.name}","type":["null",${pd.avroType}],""" +
        s""""default":null,"field-id":${pd.fieldId}}""").mkString(",")
    val specFieldsJson: String = {
      val arr = mapper.createArrayNode()
      declaredParts.foreach { pd =>
        val o = arr.addObject()
        o.put("name", pd.name); o.put("transform", pd.transform)
        o.put("source-id", pd.sourceId); o.put("field-id", pd.fieldId)
      }
      mapper.writeValueAsString(arr)
    }

    val eSchema = if (fv == 1) entrySchema(partFieldsJson)
      else entrySchemaV2(partFieldsJson)
    val dataFileSchema = eSchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    // `f` is the path AS THE COMMITLOG MANIFEST RECORDS IT (the
    // statsByPath key); the Iceberg file_path URI derives from it here
    def entry(f: String, rows: Long, bytes: Long, content: Int,
        seq: Long): GenericRecord = {
      val e = new GenericData.Record(eSchema)
      e.put("status", 1); e.put("snapshot_id", v)
      if (fv == 2) e.put("sequence_number", seq)
      val d = new GenericData.Record(dataFileSchema)
      d.put("file_path", uri(f)); d.put("file_format", "PARQUET")
      val pRec = new GenericData.Record(partSchema)
      if (content == 0) declaredParts.foreach { pd =>
        statsByPath.get(f).flatMap(_.partitionsOrEmpty.get(pd.key))
          .foreach(vStr => pRec.put(pd.name, pd.conv(vStr)))
      }
      d.put("partition", pRec)
      d.put("record_count", rows)
      d.put("file_size_in_bytes", bytes)
      if (fv == 1) d.put("block_size_in_bytes", bytes)
      else d.put("content", content)
      e.put("data_file", d); e
    }
    // data manifest: ADDED entries carrying the manifest's exact counts;
    // data sequence 1 — the position deletes outrank it at sequence 2
    // (position deletes apply at data seq ≤ delete seq per the spec)
    val entries = m.files.map(f =>
      entry(f, rowsOf.getOrElse(f, 0L), sizeOf.getOrElse(f, 0L), 0, 1L))
    val manifestPath = metaDir.resolve(f"m0-v$v%d.avro")
    writeAvro(manifestPath, eSchema, Seq(
      "schema" -> mapper.writeValueAsString(schemaNode),
      "partition-spec" -> specFieldsJson, "format-version" -> fv.toString,
      "content" -> "data"), entries)
    val deleteManifestPath =
      if (deleteParts.isEmpty) None
      else {
        val p = metaDir.resolve(f"m1-v$v%d-deletes.avro")
        writeAvro(p, eSchema, Seq(
          "schema" -> mapper.writeValueAsString(schemaNode),
          "partition-spec" -> specFieldsJson, "format-version" -> fv.toString,
          "content" -> "deletes"),
          deleteParts.map { case (path, rows) =>
            entry(path, rows, Files.size(Paths.get(path)), 1, 2L) })
        Some(p)
      }

    val lSchema = if (fv == 1) listSchema else listSchemaV2
    def listEntry(p: java.nio.file.Path, content: Int, seq: Long) = {
      val mf = new GenericData.Record(lSchema)
      mf.put("manifest_path", uri(s"metadata/${p.getFileName}"))
      mf.put("manifest_length", Files.size(p))
      mf.put("partition_spec_id", 0); mf.put("added_snapshot_id", v)
      if (fv == 2) { mf.put("content", content); mf.put("sequence_number", seq) }
      mf
    }
    val listPath = metaDir.resolve(f"snap-v$v%d.avro")
    writeAvro(listPath, lSchema, Seq("format-version" -> fv.toString),
      listEntry(manifestPath, 0, 1L) +:
        deleteManifestPath.map(listEntry(_, 1, 2L)).toSeq)

    val meta = mapper.createObjectNode()
    meta.put("format-version", fv)
    // deterministic identity + times (not wall clock), as DeltaExport does
    meta.put("table-uuid",
      java.util.UUID.nameUUIDFromBytes(root.getBytes("UTF-8")).toString)
    meta.put("location", "file://" + root)
    meta.put("last-updated-ms", v)
    meta.put("last-column-id", nextId)
    meta.set[ObjectNode]("schema", schemaNode)
    if (fv == 2) {
      val schemas = meta.putArray("schemas")
      schemas.add(schemaNode.deepCopy[ObjectNode]())
      meta.put("current-schema-id", 0)
      meta.put("last-sequence-number", 2L)
      // v2-REQUIRED fields a strict reader (the Java reference impl)
      // checks even when empty: an unsorted sort order, its default id,
      // and the highest assigned partition-field id (999 = none yet;
      // partition field ids start at 1000 per the spec).
      val orders = meta.putArray("sort-orders")
      val order0 = orders.addObject()
      order0.put("order-id", 0); order0.putArray("fields")
      meta.put("default-sort-order-id", 0)
      meta.put("last-partition-id", 999)
    }
    def specFieldObj(n: com.fasterxml.jackson.databind.node.ArrayNode,
        pd: (String, String, Int, Int)): Unit = {
      val o = n.addObject()
      o.put("name", pd._1); o.put("transform", pd._2)
      o.put("source-id", pd._3); o.put("field-id", pd._4)
    }
    val declTuples = declaredParts.map(pd =>
      (pd.name, pd.transform, pd.sourceId, pd.fieldId))
    val legacy = meta.putArray("partition-spec") // v1 legacy single spec
    declTuples.foreach(specFieldObj(legacy, _))
    val specs = meta.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    val spec0Fields = spec0.putArray("fields")
    declTuples.foreach(specFieldObj(spec0Fields, _))
    if (declaredParts.nonEmpty)
      meta.put("last-partition-id", 999 + declaredParts.size)
    meta.put("default-spec-id", 0)
    meta.putObject("properties")
    meta.put("current-snapshot-id", v)
    val snaps = meta.putArray("snapshots")
    val snap = snaps.addObject()
    snap.put("snapshot-id", v); snap.put("timestamp-ms", v)
    if (fv == 2) snap.put("sequence-number", 2L)
    snap.putObject("summary").put("operation", "append")
    snap.put("manifest-list", uri(s"metadata/${listPath.getFileName}"))
    Files.write(metaDir.resolve("v1.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    Files.write(metaDir.resolve("version-hint.text"), "1".getBytes("UTF-8"))
    m.files.size
  }
}
