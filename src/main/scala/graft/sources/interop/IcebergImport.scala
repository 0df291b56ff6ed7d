package graft.sources.interop

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.sources.CommitLog

/** Read-only import of an Apache Iceberg table into the commitlog format.
  * The Iceberg table spec is public (iceberg.apache.org/spec/): table
  * state lives in `metadata/vN.metadata.json` (named by
  * `version-hint.text`), whose current snapshot points at a MANIFEST LIST
  * (avro) of MANIFEST FILES (avro), each holding `manifest_entry` records
  * whose `data_file` struct names the parquet file, its `record_count`,
  * and `file_size_in_bytes`. All metadata reads are driver-side avro/JSON
  * walks — manifests are KB–MB at any table size.
  *
  * Import is ALWAYS by reference (`CommitLog.importSnapshot`): Iceberg
  * parquet data files are self-contained (identity-partition source
  * columns are stored in-file; hidden-partition transforms never
  * materialize as columns at all), so a 100 TB table imports in
  * driver-metadata time with zero byte moves. Run `cluster`/`optimize`
  * afterwards to build this engine's own stats/layout for skipping.
  *
  * Refused loudly (importing by path would resurrect deleted rows):
  * v2 DELETE manifests (`content = 1` in the manifest list) and non-data
  * `data_file.content` entries (position/equality deletes); `deleted`
  * manifest entries (`status = 2`) simply drop out of the fold.
  */
object IcebergImport {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  /** Iceberg schema JSON → Spark schema. Primitives, struct, list, map. */
  private[interop] def toSpark(t: JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "time" => LongType // micros since midnight (no Spark TimeType)
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" => StringType
      case "uuid" => StringType
      case "binary" => BinaryType
      case s if s.startsWith("decimal(") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case s if s.startsWith("fixed[") => BinaryType
      case other =>
        throw new IllegalArgumentException(s"unsupported Iceberg type $other")
    } else t.get("type").asText() match {
      case "struct" =>
        StructType(t.get("fields").elements().asScala.map { f =>
          StructField(f.get("name").asText(), toSpark(f.get("type")),
            nullable = !f.get("required").asBoolean())
        }.toArray)
      case "list" =>
        ArrayType(toSpark(t.get("element")),
          containsNull = !t.get("element-required").asBoolean())
      case "map" =>
        MapType(toSpark(t.get("key")), toSpark(t.get("value")),
          valueContainsNull = !t.get("value-required").asBoolean())
      case other =>
        throw new IllegalArgumentException(s"unsupported Iceberg type $other")
    }

  /** Field value, None when the record's schema lacks the field entirely
    * (GenericData.Record.get THROWS on unknown names rather than
    * returning null — optional spec fields need the schema probe).
    */
  private def fieldOpt(r: GenericRecord, name: String): Option[AnyRef] =
    if (r.getSchema.getField(name) == null) None else Option(r.get(name))

  private def avroRecords(path: String): Seq[GenericRecord] = {
    val reader = DataFileReader.openReader(new File(path),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector finally reader.close()
  }

  /** Strip a `file:`/`file://` scheme down to a plain absolute path. */
  private def localPath(uri: String): String =
    if (uri.startsWith("file:")) uri.stripPrefix("file:").replaceAll("^//", "")
    else uri

  private def currentMetadata(icebergPath: String): JsonNode = {
    val metaDir = Paths.get(icebergPath, "metadata")
    require(Files.isDirectory(metaDir),
      s"$icebergPath has no metadata directory — not an Iceberg table")
    val hint = metaDir.resolve("version-hint.text")
    val metaFile =
      if (Files.isRegularFile(hint)) {
        val v = new String(Files.readAllBytes(hint), "UTF-8").trim
        metaDir.resolve(s"v$v.metadata.json")
      } else {
        // fall back to the lexically-latest vN.metadata.json
        val vs = Files.list(metaDir).iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.matches("v\\d+\\.metadata\\.json")).toSeq
        require(vs.nonEmpty, s"$metaDir holds no vN.metadata.json")
        metaDir.resolve(vs.maxBy(_.stripPrefix("v")
          .stripSuffix(".metadata.json").toLong))
      }
    require(Files.isRegularFile(metaFile), s"missing $metaFile")
    mapper.readTree(Files.readAllBytes(metaFile))
  }

  /** Import the table's current snapshot into a NEW commitlog table at
    * `root`; returns the created version.
    */
  def importTable(spark: SparkSession, icebergPath: String,
      root: String): Long = {
    require(CommitLog.currentVersion(root).isEmpty,
      s"import target $root already holds a table")
    val meta = currentMetadata(icebergPath)
    val fv = meta.get("format-version").asInt()
    require(fv == 1 || fv == 2, s"unsupported Iceberg format-version $fv")
    // schema: v1 inline `schema`; v2 `schemas` keyed by current-schema-id
    val schemaNode = Option(meta.get("schema")).getOrElse {
      val id = meta.get("current-schema-id").asInt()
      meta.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt() == id)
        .getOrElse(throw new IllegalArgumentException(
          s"current-schema-id $id not present in schemas"))
    }
    val schema = toSpark(schemaNode).asInstanceOf[StructType]
    val snapId = Option(meta.get("current-snapshot-id")).map(_.asLong())
      .filter(_ != -1L)
      .getOrElse(throw new IllegalArgumentException(
        s"$icebergPath has no current snapshot"))
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-snapshot-id $snapId not present in snapshots"))
    val manifests: Seq[String] = Option(snap.get("manifest-list")) match {
      case Some(ml) =>
        avroRecords(localPath(ml.asText())).map { r =>
          fieldOpt(r, "content").map(_.toString.toInt).foreach(c =>
            require(c == 0,
              "snapshot carries DELETE manifests (v2 row-level deletes); " +
                "importing data files by path would resurrect deleted " +
                "rows — rewrite/expire them with an Iceberg-native engine " +
                "first"))
          localPath(r.get("manifest_path").toString)
        }
      case None => // v1 inline manifest array
        snap.get("manifests").elements().asScala
          .map(m => localPath(m.asText())).toSeq
    }
    val stats = manifests.flatMap { mPath =>
      avroRecords(mPath).flatMap { e =>
        val status = e.get("status").toString.toInt
        if (status == 2) None // deleted entry
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          fieldOpt(df, "content").map(_.toString.toInt).foreach(c =>
            require(c == 0,
              "manifest carries delete files (position/equality) — " +
                "unsupported for by-path import"))
          val path = localPath(df.get("file_path").toString)
          require(Files.isRegularFile(Paths.get(path)),
            s"manifest references missing data file $path")
          Some(CommitLog.FileStat(path,
            df.get("record_count").toString.toLong,
            Files.size(Paths.get(path))))
        }
      }
    }
    require(stats.nonEmpty,
      s"$icebergPath folds to an empty snapshot — nothing to import")
    CommitLog.importSnapshot(root, schema, stats)
  }
}
