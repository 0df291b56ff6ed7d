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
  * readers to. `deleted` manifest entries (`status = 2`) simply drop out
  * of the fold.
  *
  * EQUALITY delete files (`data_file.content = 2`, r9) MATERIALIZE: the
  * data files an equality delete outranks (strictly smaller data
  * sequence number, per the spec's scan planning) re-stage as a second
  * commit with their dead rows anti-joined away — null-safe equality on
  * the `equality_ids` columns, position deletes for those files applied
  * in the same rewrite. THE IMPORT STOPS BEING ZERO-COPY FOR EXACTLY
  * THOSE FILES (stated here loudly; unaffected files still import by
  * reference).
  *
  * Equality deletes are PARTITION-SCOPED (r14, spec "Scan Planning"): a
  * delete written under a partitioned spec applies only to data files of
  * the SAME spec and partition tuple; a delete under an unpartitioned
  * spec applies globally. Both the outranking decision and the anti-join
  * carry the (spec-id, partition-tuple) scope, so partitioned CDC tables
  * import exactly. The one honest refusal left: equality ids naming
  * NESTED fields (no top-level column to match on).
  */
object IcebergImport {

  /** Row-level delete scope of one manifest entry: the manifest's
    * partition-spec id plus the entry's rendered partition tuple (fields
    * sorted by name — both sides of a match render identically). A
    * `None` tuple = the entry's spec is unpartitioned: for a DELETE that
    * means global scope, for a data file it means only unpartitioned-
    * spec deletes (or same-spec empty tuples) can hit it.
    */
  private final case class EntryScope(specId: Int, tuple: Option[String]) {
    def key: Option[String] = tuple.map(t => s"$specId|$t")
  }

  private def renderPartition(v: Option[AnyRef]): Option[String] = v match {
    case Some(rec: GenericRecord) if !rec.getSchema.getFields.isEmpty =>
      Some(rec.getSchema.getFields.asScala.map(_.name()).toSeq.sorted
        .map(n => s"$n=${String.valueOf(rec.get(n))}").mkString("|"))
    case _ => None
  }

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
    // manifest-list entries carry the manifests' DATA SEQUENCE NUMBERS
    // (v2) — the ordering that scopes row-level deletes: an equality
    // delete applies to data files with STRICTLY SMALLER sequence numbers
    // (iceberg spec, "Scan Planning"). Entries may carry their own
    // sequence_number; added entries inherit the manifest's.
    val (dataManifests, deleteManifests) = Option(snap.get("manifest-list")) match {
      case Some(ml) =>
        val entries = avroRecords(localPath(ml.asText())).map { r =>
          (localPath(r.get("manifest_path").toString),
            fieldOpt(r, "content").map(_.toString.toInt).getOrElse(0),
            fieldOpt(r, "sequence_number").map(_.toString.toLong).getOrElse(0L),
            fieldOpt(r, "partition_spec_id").map(_.toString.toInt).getOrElse(0))
        }
        (entries.collect { case (p, 0, s, sid) => (p, s, sid) },
          entries.collect { case (p, 1, s, sid) => (p, s, sid) })
      case None => // v1 inline manifest array (data only by definition)
        (snap.get("manifests").elements().asScala
          .map(m => (localPath(m.asText()), 0L, 0)).toSeq, Nil)
    }
    def entrySeq(e: GenericRecord, manifestSeq: Long): Long =
      fieldOpt(e, "sequence_number").map(_.toString.toLong)
        .getOrElse(manifestSeq)
    def entryScope(df: GenericRecord, specId: Int): EntryScope =
      EntryScope(specId, renderPartition(fieldOpt(df, "partition")))
    val dataEntries: Seq[(String, Long, EntryScope)] = dataManifests.flatMap {
      case (mPath, mSeq, specId) =>
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
            Some((path, entrySeq(e, mSeq), entryScope(df, specId)))
          }
        }
    }
    require(dataEntries.nonEmpty,
      s"$icebergPath folds to an empty snapshot — nothing to import")
    // r9: per-file stats off the parquet FOOTERS at import — KB per file,
    // zero data reads — so the imported table prunes immediately without
    // an ANALYZE scan; row counts are footer-exact (supersedes trusting
    // the manifests' record_count)
    val stats = CommitLog.importFooterStats(spark, schema,
      dataEntries.map(_._1).distinct, sidecarRoot = Some(root))
    // v2 row-level deletes: position-delete parquet → commitlog DVs;
    // equality deletes MATERIALIZE the data files they cover (r9)
    val posDeleteFiles = Seq.newBuilder[(String, Long)]
    val eqDeleteFiles = Seq.newBuilder[(String, Long, Seq[String], EntryScope)]
    val fieldNameById: Map[Int, String] =
      schemaNode.get("fields").elements().asScala
        .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
    deleteManifests.foreach { case (mPath, mSeq, specId) =>
      avroRecords(mPath).foreach { e =>
        if (e.get("status").toString.toInt != 2) { // 2 = removed delete file
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val c = fieldOpt(df, "content").map(_.toString.toInt).getOrElse(1)
          val path = localPath(df.get("file_path").toString)
          require(Files.isRegularFile(Paths.get(path)),
            s"delete manifest references missing file $path")
          if (c == 1) posDeleteFiles += ((path, entrySeq(e, mSeq)))
          else if (c == 2) {
            val ids = fieldOpt(df, "equality_ids").map { v =>
              v.asInstanceOf[java.lang.Iterable[AnyRef]].asScala
                .map(_.toString.toInt).toSeq
            }.getOrElse(Nil)
            require(ids.nonEmpty,
              s"equality delete file $path lists no equality_ids — " +
                "malformed metadata")
            val cols = ids.map(id => fieldNameById.getOrElse(id,
              sys.error(s"equality delete field id $id is not a top-level " +
                "schema column — nested equality deletes have no " +
                "translation here; rewrite with an Iceberg-native engine")))
            eqDeleteFiles += ((path, entrySeq(e, mSeq), cols,
              entryScope(df, specId)))
          } else sys.error(s"unknown delete-file content $c")
        }
      }
    }
    val posDeletes = posDeleteFiles.result()
    val eqDeletes = eqDeleteFiles.result()
    // which partition specs are PARTITIONED — globality is a property of
    // the DELETE's spec (an unpartitioned-spec delete applies globally),
    // decided from the table metadata, never inferred from a missing
    // tuple: a partitioned-spec delete whose entry carries no tuple is
    // malformed and must refuse, not silently over-delete globally
    val specPartitioned: Map[Int, Boolean] = {
      val v2 = Option(meta.get("partition-specs")).toSeq
        .flatMap(_.elements().asScala).map(s =>
          s.get("spec-id").asInt() ->
            Option(s.get("fields")).exists(_.elements().asScala.nonEmpty))
        .toMap
      if (v2.nonEmpty) v2
      else Option(meta.get("partition-spec"))
        .map(f => Map(0 -> f.elements().asScala.nonEmpty))
        .getOrElse(Map.empty)
    }
    def partitionedSpec(id: Int): Boolean =
      specPartitioned.getOrElse(id, false)
    eqDeletes.foreach { case (p, _, _, sc) =>
      require(!partitionedSpec(sc.specId) || sc.tuple.isDefined,
        s"equality delete file $p was written under PARTITIONED spec " +
          s"${sc.specId} but its manifest entry carries no partition " +
          "tuple — malformed metadata; rewrite with an Iceberg-native " +
          "engine first")
    }
    // a data file under a partitioned spec a scoped delete targets must
    // carry its tuple too, or scoping would be guesswork
    val scopedSpecs = eqDeletes.collect {
      case (_, _, _, sc) if partitionedSpec(sc.specId) => sc.specId
    }.toSet
    if (scopedSpecs.nonEmpty)
      dataEntries.foreach { case (p, _, sc) =>
        require(!scopedSpecs(sc.specId) || sc.tuple.isDefined,
          s"data file $p sits under PARTITIONED spec ${sc.specId} that " +
            "equality deletes scope to, but its manifest entry carries " +
            "no partition tuple — malformed metadata; rewrite with an " +
            "Iceberg-native engine first")
      }
    val seqOf = dataEntries.map(e => e._1 -> e._2).toMap
    val scopeOf = dataEntries.map(e => e._1 -> e._3).toMap
    def eqGlobal(sc: EntryScope): Boolean = !partitionedSpec(sc.specId)
    // spec "Scan Planning": an equality delete hits a data file when the
    // file's data sequence number is STRICTLY smaller AND the delete is
    // global (unpartitioned spec) or carries the file's exact
    // (spec-id, partition-tuple)
    def eqApplies(dSeq: Long, dScope: EntryScope, path: String): Boolean =
      dSeq > seqOf(path) &&
        (eqGlobal(dScope) || scopeOf(path).key == dScope.key)
    // balanced union — a left-deep fold over many files would blow
    // Catalyst's recursive plan walks
    def unionAll(dfs: IndexedSeq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame =
      if (dfs.size == 1) dfs.head
      else unionAll(dfs.take(dfs.size / 2))
        .unionByName(unionAll(dfs.drop(dfs.size / 2)))
    // a data file is AFFECTED when any equality delete outranks it IN ITS
    // SCOPE; those files MATERIALIZE (import stops being zero-copy for
    // exactly them — rows re-stage minus their deletes), everything else
    // imports by reference as always — a partition-scoped CDC delete
    // materializes only its own partition's files
    val affected = stats.map(_.path)
      .filter(p => eqDeletes.exists { case (_, q, _, sc) =>
        eqApplies(q, sc, p)
      }).toSet
    val unaffected = stats.filterNot(s => affected(s.path))
    import org.apache.spark.sql.functions._
    val posSchema = StructType(Seq(
      StructField("file_path", StringType), StructField("pos", LongType)))
    def posMarks(targets: Seq[String]): org.apache.spark.sql.DataFrame = {
      // (path, data sequence) of the targets — file-list-sized, broadcast
      val live = spark.createDataFrame(targets.map(p => (p, seqOf(p))))
        .toDF("file", "__dataseq")
      // delete files read grouped by THEIR sequence so each mark carries
      // it; the spec's scan-planning gate then drops marks whose delete
      // sequence is below the target file's data sequence (valid
      // metadata never produces such a mark — paths are unique — but a
      // malformed tree must not silently over-delete)
      val marks = unionAll(posDeletes.groupBy(_._2).toIndexedSeq
        .sortBy(_._1).map { case (dseq, files) =>
          spark.read.schema(posSchema).parquet(files.map(_._1): _*)
            // localPath, columnar: strip a file:/ or file:// scheme prefix
            .select(regexp_replace(col("file_path"), "^file:(//)?", "")
              .as("file"), col("pos"), lit(dseq).as("__dseq"))
        })
      marks.join(broadcast(live), Seq("file")) // inner: dangling marks drop
        .filter(col("__dseq") >= col("__dataseq"))
        .select(col("file"), col("pos"))
    }
    // position-delete files are plain parquet of (file_path, pos) — read
    // DISTRIBUTED, never collected: marks for by-reference files flow
    // straight into stageImportedDvs' partitionBy write (duplicates
    // dedupe in the shuffle; dangling and sequence-outranked marks drop
    // via the broadcast join + gate); marks for materializing files anti-join
    // during the rewrite below instead
    val dvs =
      if (posDeletes.isEmpty || unaffected.isEmpty)
        Map.empty[String, String]
      else CommitLog.stageImportedDvs(spark, root,
        posMarks(unaffected.map(_.path)))
    val v1 = CommitLog.importSnapshot(root, schema, unaffected, dvs = dvs)
    if (affected.isEmpty) v1
    else {
      val dataCols = schema.fieldNames.toIndexedSeq
      val posTargets = affected.toSeq.sorted
      val marksForAffected =
        if (posDeletes.isEmpty) None else Some(posMarks(posTargets))
      val perFile = posTargets.toIndexedSeq.map { p =>
        val base = spark.read.schema(schema).parquet(p)
          .withColumn("__seq", lit(seqOf(p)))
          // the file's delete scope rides each row so the anti-join can
          // honor partition scoping (null = unpartitioned-spec file)
          .withColumn("__scope",
            lit(scopeOf(p).key.orNull).cast(StringType))
        marksForAffected match {
          case None => base
          case Some(mk) =>
            base.withColumn("__pos", col("_metadata.row_index"))
              .join(mk.filter(col("file") === lit(p))
                .select(col("pos").as("__pos")), Seq("__pos"), "left_anti")
              .drop("__pos")
        }
      }
      // one anti-join per distinct equality-column set: delete rows read
      // with their sequence number + scope attached, matched null-safely
      // (the spec: NULL in a delete row matches NULL in the data),
      // applied only to rows from files the delete outranks IN SCOPE
      val survivors = eqDeletes.groupBy(_._3).foldLeft(unionAll(perFile)) {
        case (data, (cols, files)) =>
          val delRows = unionAll(files.toIndexedSeq.map {
            case (p, q, _, sc) =>
              spark.read.parquet(p)
                .select(cols.map(c => col(c).as(s"__eq_$c")) ++ Seq(
                  lit(q).as("__dseq"),
                  lit(eqGlobal(sc)).as("__dglobal"),
                  lit(sc.key.orNull).cast(StringType).as("__dscope")): _*)
          })
          val cond = cols.map(c => col(c) <=> col(s"__eq_$c"))
            .reduce(_ && _) && col("__seq") < col("__dseq") &&
            (col("__dglobal") || col("__scope") <=> col("__dscope"))
          data.join(delRows, cond, "left_anti")
      }
      CommitLog.append(
        survivors.select(dataCols.map(col): _*), root)
    }
  }
}
