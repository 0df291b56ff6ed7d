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
  * (clone/import sources) export fine; only states a v1 Iceberg reader
  * would misread refuse: deletion vectors (rows would resurrect) and
  * column mapping (physical names would leak).
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
  // snapshot_id=1, data_file=2, file_path=100 …block_size_in_bytes=105)
  private val entrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"block_size_in_bytes","type":"long","field-id":105}
      |  ]},"field-id":2}]}""".stripMargin)

  // manifest_file (the manifest-list entry), v1 core fields
  private val listSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
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
  def exportTable(root: String, version: Option[Long] = None): Int = {
    val v = version.getOrElse(CommitLog.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no commits at $root")))
    val m = CommitLog.readManifest(root, v)
    require(m.dvsOrEmpty.isEmpty,
      "snapshot carries deletion vectors — compact first (an Iceberg v1 " +
        "reader would resurrect deleted rows)")
    require(m.colMapOrEmpty.isEmpty,
      "table uses column mapping — physical file names differ from the " +
        "logical schema; materialize a rename-free copy first")
    val metaDir = Paths.get(root, "metadata")
    require(!Files.exists(metaDir),
      s"$root already carries an Iceberg metadata directory")
    Files.createDirectories(metaDir)
    val rowsOf = m.statsOrNil.map(s => s.path -> s.rows).toMap
    val sizeOf = m.statsOrNil.map(s => s.path -> s.bytes).toMap
    def uri(f: String): String =
      "file://" + (if (f.startsWith("/")) f else s"$root/$f")

    // schema JSON with spec-required field ids
    var nextId = 0
    val id = () => { nextId += 1; nextId }
    val schemaNode = typeNode(CommitLog.manifestSchema(m), id)
      .asInstanceOf[ObjectNode]
    schemaNode.put("schema-id", 0)

    // one manifest of ADDED entries carrying the manifest's exact counts
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    val entries = m.files.map { f =>
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("snapshot_id", v)
      val d = new GenericData.Record(dataFileSchema)
      d.put("file_path", uri(f)); d.put("file_format", "PARQUET")
      d.put("partition", new GenericData.Record(partSchema))
      d.put("record_count", rowsOf.getOrElse(f, 0L))
      d.put("file_size_in_bytes", sizeOf.getOrElse(f, 0L))
      d.put("block_size_in_bytes", sizeOf.getOrElse(f, 0L))
      e.put("data_file", d); e
    }
    val manifestPath = metaDir.resolve(f"m0-v$v%d.avro")
    writeAvro(manifestPath, entrySchema, Seq(
      "schema" -> mapper.writeValueAsString(schemaNode),
      "partition-spec" -> "[]", "format-version" -> "1",
      "content" -> "data"), entries)

    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", uri(s"metadata/${manifestPath.getFileName}"))
    mf.put("manifest_length", Files.size(manifestPath))
    mf.put("partition_spec_id", 0); mf.put("added_snapshot_id", v)
    val listPath = metaDir.resolve(f"snap-v$v%d.avro")
    writeAvro(listPath, listSchema,
      Seq("format-version" -> "1"), Seq(mf))

    val meta = mapper.createObjectNode()
    meta.put("format-version", 1)
    // deterministic identity + times (not wall clock), as DeltaExport does
    meta.put("table-uuid",
      java.util.UUID.nameUUIDFromBytes(root.getBytes("UTF-8")).toString)
    meta.put("location", "file://" + root)
    meta.put("last-updated-ms", v)
    meta.put("last-column-id", nextId)
    meta.set[ObjectNode]("schema", schemaNode)
    meta.putArray("partition-spec")
    val specs = meta.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0); spec0.putArray("fields")
    meta.put("default-spec-id", 0)
    meta.putObject("properties")
    meta.put("current-snapshot-id", v)
    val snaps = meta.putArray("snapshots")
    val snap = snaps.addObject()
    snap.put("snapshot-id", v); snap.put("timestamp-ms", v)
    snap.putObject("summary").put("operation", "append")
    snap.put("manifest-list", uri(s"metadata/${listPath.getFileName}"))
    Files.write(metaDir.resolve("v1.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    Files.write(metaDir.resolve("version-hint.text"), "1".getBytes("UTF-8"))
    m.files.size
  }
}
