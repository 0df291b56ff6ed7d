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
  * v2 row-level deletes (r8): POSITION delete files translate natively —
  * per the spec they are ordinary parquet of (`file_path`, `pos`) rows,
  * `pos` being the row's ordinal in its data file, which is EXACTLY the
  * commitlog deletion-vector model (`_metadata.row_index` positions in
  * DV parquet). Delete manifests (`content = 1`) are read, their
  * position-delete files re-encode through `CommitLog.stageImportedDvs`,
  * and the import stays zero-copy for data. Dangling deletes (target
  * data file no longer in the snapshot) are ignored, as the spec directs
  * readers to. EQUALITY delete files (`data_file.content = 2`) still
  * refuse loudly — applying them needs row matching plus sequence-number
  * ordering, machinery with no commitlog twin. `deleted` manifest
  * entries (`status = 2`) simply drop out of the fold.
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
    val (dataManifests, deleteManifests) = Option(snap.get("manifest-list")) match {
      case Some(ml) =>
        val entries = avroRecords(localPath(ml.asText())).map { r =>
          (localPath(r.get("manifest_path").toString),
            fieldOpt(r, "content").map(_.toString.toInt).getOrElse(0))
        }
        (entries.collect { case (p, 0) => p },
          entries.collect { case (p, 1) => p })
      case None => // v1 inline manifest array (data only by definition)
        (snap.get("manifests").elements().asScala
          .map(m => localPath(m.asText())).toSeq, Nil)
    }
    val stats = dataManifests.flatMap { mPath =>
      avroRecords(mPath).flatMap { e =>
        val status = e.get("status").toString.toInt
        if (status == 2) None // deleted entry
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          fieldOpt(df, "content").map(_.toString.toInt).foreach(c =>
            require(c == 0,
              "data manifest carries delete-file content — malformed " +
                "metadata (delete files belong in content=1 manifests)"))
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
    // v2 row-level deletes: position-delete parquet → commitlog DVs;
    // equality deletes refuse (no by-path translation exists)
    val deleteFiles = deleteManifests.flatMap { mPath =>
      avroRecords(mPath).flatMap { e =>
        if (e.get("status").toString.toInt == 2) None // removed delete file
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val c = fieldOpt(df, "content").map(_.toString.toInt).getOrElse(1)
          require(c != 2,
            "snapshot carries EQUALITY delete files — applying them needs " +
              "row matching + sequence ordering with no by-path " +
              "translation; rewrite them with an Iceberg-native engine " +
              "first")
          require(c == 1, s"unknown delete-file content $c")
          val path = localPath(df.get("file_path").toString)
          require(Files.isRegularFile(Paths.get(path)),
            s"delete manifest references missing file $path")
          Some(path)
        }
      }
    }
    val dvs =
      if (deleteFiles.isEmpty) Map.empty[String, String]
      else {
        import org.apache.spark.sql.functions._
        // position-delete files are plain parquet of (file_path, pos) —
        // read DISTRIBUTED, never collected: the marks flow straight into
        // stageImportedDvs' partitionBy write, the driver holding only the
        // DV'd file list. Duplicate marks (several delete files hitting
        // one row) dedupe in the staging shuffle; dangling marks (target
        // no longer live) drop per the spec via a broadcast semi join
        // against the metadata-sized live-file list
        val live = spark.createDataFrame(
          stats.map(s => Tuple1(s.path))).toDF("file")
        val marks = spark.read
          .schema(StructType(Seq(
            StructField("file_path", StringType),
            StructField("pos", LongType))))
          .parquet(deleteFiles: _*)
          // localPath, columnar: strip a file:/  or file:// scheme prefix
          .select(regexp_replace(col("file_path"), "^file:(//)?", "")
            .as("file"), col("pos"))
          .join(broadcast(live), Seq("file"), "left_semi")
        CommitLog.stageImportedDvs(spark, root, marks)
      }
    CommitLog.importSnapshot(root, schema, stats, dvs = dvs)
  }
}
