package graft.sources.interop

import java.nio.file.{Files, Path, Paths}
import java.util.Properties

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.sources.CommitLog

/** Read-only import of an Apache Hudi COPY_ON_WRITE table into the
  * commitlog format. The Hudi layout is public (hudi.apache.org/tech-specs):
  * `.hoodie/hoodie.properties` names the table type; the TIMELINE is a
  * directory of `<instant>.<action>` files (completed instants carry no
  * state suffix; 1.x moves them under `.hoodie/timeline/`) whose `commit` /
  * `replacecommit` JSON bodies carry `partitionToWriteStats` (the base
  * files each instant wrote, with exact record counts) and the table's
  * avro schema in `extraMetadata`. A COW snapshot is the timeline FOLD:
  * per (partition, fileId) file group, the newest completed base file
  * wins; a `replacecommit` (clustering / insert_overwrite) kills the file
  * groups it lists in `partitionToReplaceFileIds`.
  *
  * Import is ALWAYS by reference ([[CommitLog.importSnapshot]]) — COW base
  * files are self-contained parquet; Hudi's `_hoodie_*` meta columns are
  * simply never projected because the commitlog schema doesn't name them.
  * All reads are driver-side JSON walks, KB–MB at any table size.
  *
  * MERGE_ON_READ (r8): imports when the snapshot is LOG-FREE — every live
  * file group's newest base file is newer than any log file attached to it
  * (a fully-compacted MOR table, the steady state any compaction schedule
  * converges to; the fold reads `deltacommit` instants alongside commits
  * and tracks per-group log/base recency from the timeline alone). A file
  * group with an OUTSTANDING log file refuses loudly BY DEFAULT: folding
  * the log means re-implementing Hudi's binary log-block format from the
  * published spec with no native writer on this host to validate against,
  * so a wrong-byte reader would silently drop or resurrect updates.
  *
  * `importTable(allowLogs = true)` (r11) opts into that fold for the
  * DOCUMENTED subset of the published HoodieLogFormat (hudi tech-specs
  * "Log File Format"): version-1 `#HUDI#` block framing, AVRO data
  * blocks (schema in the block header, length-prefixed avro-binary
  * records), v3 DELETE blocks (avro HoodieDeleteRecordList), and
  * ROLLBACK command blocks (negate prior blocks of the target instant).
  * Per group, blocks apply in instant order — last writer wins per
  * record key (`hoodie.table.recordkey.fields`), a delete kills the key,
  * a later upsert resurrects it — and the merged group MATERIALIZES as
  * parquet under the target root (log-free groups stay zero-copy by
  * reference). The boundary text stands as the default: fixture-proven
  * is weaker than writer-validated, which is why the flag is explicit
  * and default-off (HudiImportSpec carries the byte-level fixtures).
  *
  * Scale: log files are MB-bounded by design (compaction debt); blocks
  * parse on the driver, but the MERGE itself is a DataFrame anti-join —
  * base files are never collected.
  *
  * Files written by INFLIGHT instants never enter the fold at all — only
  * completed-commit metadata is read, which is exactly Hudi's own
  * snapshot-isolation rule.
  */
object HudiImport {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  /** Avro schema JSON → Spark type (records, unions-with-null, primitives,
    * the common logical types). Mirrors what Hudi stores in
    * `extraMetadata.schema`.
    */
  private[interop] def avroToSpark(t: JsonNode): (DataType, Boolean) =
    if (t.isTextual) (t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "string" => StringType
      case "bytes" => BinaryType
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type $other")
    }, false)
    else if (t.isArray) {
      // union: ["null", X] → nullable X
      val branches = t.elements().asScala.toSeq
      val nonNull = branches.filterNot(b => b.isTextual && b.asText() == "null")
      require(nonNull.size == 1,
        s"unsupported avro union ${t.toString} — want [null, type]")
      val (dt, _) = avroToSpark(nonNull.head)
      (dt, branches.size != nonNull.size)
    } else {
      val logical = Option(t.get("logicalType")).map(_.asText())
      (Option(t.get("type")).map(_.asText()), logical) match {
        case (Some("record"), _) =>
          (StructType(t.get("fields").elements().asScala.map { f =>
            val (dt, nullable) = avroToSpark(f.get("type"))
            StructField(f.get("name").asText(), dt, nullable)
          }.toArray), false)
        case (Some("array"), _) =>
          val (et, n) = avroToSpark(t.get("items"))
          (ArrayType(et, containsNull = n), false)
        case (Some("map"), _) =>
          val (vt, n) = avroToSpark(t.get("values"))
          (MapType(StringType, vt, valueContainsNull = n), false)
        case (Some("long"), Some("timestamp-micros")) => (TimestampType, false)
        case (Some("long"), Some("timestamp-millis")) => (TimestampType, false)
        case (Some("int"), Some("date")) => (DateType, false)
        case (Some("bytes"), Some("decimal")) =>
          (DecimalType(t.get("precision").asInt(), t.get("scale").asInt()), false)
        case (Some(prim), _) => avroToSpark(t.get("type"))
        case other =>
          throw new IllegalArgumentException(s"unsupported avro node $t")
      }
    }

  /** Completed commit/replacecommit/deltacommit instants, oldest first,
    * as (instantTime, action, parsed JSON body).
    */
  private def completedCommits(hoodie: Path): Seq[(String, String, JsonNode)] = {
    val timelineDirs = Seq(hoodie.resolve("timeline"), hoodie)
      .filter(Files.isDirectory(_))
    val Re = """^(\d+)(?:_\d+)?\.(commit|replacecommit|deltacommit)$""".r
    timelineDirs.flatMap { d =>
      Files.list(d).iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case Re(instant, action) =>
            Some((instant, action, mapper.readTree(Files.readAllBytes(p))))
          case _ => None
        }
      }.toSeq
    }.sortBy(_._1)
  }

  /** Import the table's current COW snapshot into a NEW commitlog table at
    * `root`; returns the created version.
    */
  def importTable(spark: SparkSession, hudiPath: String, root: String,
      allowLogs: Boolean = false): Long = {
    require(CommitLog.currentVersion(root).isEmpty,
      s"import target $root already holds a table")
    val hoodie = Paths.get(hudiPath, ".hoodie")
    require(Files.isDirectory(hoodie),
      s"$hudiPath has no .hoodie directory — not a Hudi table")
    val props = new Properties()
    val pf = hoodie.resolve("hoodie.properties")
    require(Files.isRegularFile(pf), s"missing $pf")
    val in = Files.newInputStream(pf)
    try props.load(in) finally in.close()
    val tableType = props.getProperty("hoodie.table.type", "COPY_ON_WRITE")
    require(tableType == "COPY_ON_WRITE" || tableType == "MERGE_ON_READ",
      s"unknown hoodie.table.type $tableType")
    val commits = completedCommits(hoodie)
    require(commits.nonEmpty, s"$hudiPath has no completed commits")
    // timeline fold: newest completed base file per (partition, fileId);
    // replacecommits kill the file groups they list; deltacommit write
    // stats referencing LOG files mark their group log-bearing AS OF that
    // instant (a later compaction commit replaces the base and absorbs
    // older logs — only a log newer than the group's base is outstanding)
    final case class Group(path: String, rows: Long, baseInstant: String,
        logs: Vector[(String, String)]) { // (instant, path), arrival order
      def outstandingLogs: Vector[(String, String)] =
        logs.filter(_._1 > baseInstant)
      def hasOutstanding: Boolean = path == null || outstandingLogs.nonEmpty
    }
    val live = scala.collection.mutable.Map[(String, String), Group]()
    commits.foreach { case (instant, _, body) =>
      Option(body.get("partitionToReplaceFileIds")).foreach { rep =>
        rep.properties().asScala.foreach { e =>
          e.getValue.elements().asScala.foreach(fid =>
            live.remove((e.getKey, fid.asText())))
        }
      }
      Option(body.get("partitionToWriteStats")).foreach { pws =>
        pws.properties().asScala.foreach { e =>
          e.getValue.elements().asScala.foreach { st =>
            val fileId = st.get("fileId").asText()
            val p = st.get("path").asText()
            val key = (e.getKey, fileId)
            if (p.contains(".log.")) {
              // MOR delta log append: the group carries unmerged updates
              // from this instant on (until a newer base file lands)
              live.get(key) match {
                case Some(g) => live(key) = g.copy(logs = g.logs :+ (instant -> p))
                case None =>
                  live(key) = Group(null, 0L, "", Vector(instant -> p))
              }
            } else {
              val rows = Option(st.get("numWrites")).map(_.asLong()).getOrElse(0L)
              // a new base file (insert or compaction) supersedes any log
              // written before it
              live(key) = Group(p, rows, instant, Vector.empty)
            }
          }
        }
      }
    }
    require(live.nonEmpty, s"$hudiPath folds to an empty snapshot")
    val outstanding = live.filter { case (_, g) => g.hasOutstanding }
    require(outstanding.isEmpty || allowLogs,
      s"MERGE_ON_READ snapshot has ${outstanding.size} file group(s) with " +
        "outstanding log files (e.g. " +
        s"${outstanding.keys.take(3).mkString(", ")}). Folding Hudi's " +
        "binary log blocks is DEFAULT-OFF in this importer " +
        "(DEPLOYMENT.md, 'Hudi MERGE_ON_READ'): with no native writer on " +
        "this host to validate a byte-level reader against, a wrong-byte " +
        "fold could silently drop or resurrect updates. Either compact " +
        "with a Hudi-native engine and import the log-free snapshot, or " +
        "opt into the fixture-proven log fold with " +
        "importTable(allowLogs = true)")
    // schema: the newest commit carrying one
    val schemaJson = commits.reverse.iterator
      .flatMap(c => Option(c._3.get("extraMetadata"))
        .flatMap(m => Option(m.get("schema"))).map(_.asText()))
      .find(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"no commit at $hudiPath carries extraMetadata.schema"))
    val (dt, _) = avroToSpark(mapper.readTree(schemaJson))
    val schema = dt.asInstanceOf[StructType]
    // log-free groups stay zero-copy by reference; log-bearing groups
    // (allowLogs) materialize their merged state under the target root
    val clean = live.filter { case (_, g) => !g.hasOutstanding }
    val refPaths = clean.values.toSeq.map(_.path).sorted.map { p =>
      val abs = Paths.get(hudiPath, p)
      require(Files.isRegularFile(abs),
        s"commit metadata references missing base file $abs")
      abs.toString
    }
    val mergedPaths: Seq[String] =
      if (outstanding.isEmpty) Nil
      else {
        val keySpec = Option(props.getProperty("hoodie.table.recordkey.fields"))
          .map(_.trim).filter(_.nonEmpty).getOrElse(
            throw new IllegalArgumentException(
              "MOR log fold needs hoodie.table.recordkey.fields in " +
                "hoodie.properties"))
        val keyFields = keySpec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        keyFields.foreach(f => require(schema.fieldNames.contains(f),
          s"record-key field $f is not in the table schema"))
        // Hudi's key encodings (the published KeyGenerator contract):
        // SimpleKeyGenerator renders the single field's value verbatim;
        // ComplexKeyGenerator renders `f1:v1,f2:v2` with the documented
        // placeholders `__null__` for a null value and `__empty__` for an
        // empty string — delete blocks carry recordKey in exactly this
        // form, so the fold's avro-side and base-file-side encoders must
        // both reproduce it (r12 advice: String.valueOf rendered "null"
        // and concat_ws silently DROPPED null fields, so the two sides
        // disagreed with Hudi and with each other on such keys).
        def complexVal(s: String): String =
          if (s == null) "__null__" else if (s.isEmpty) "__empty__" else s
        def keyOfRecord(r: org.apache.avro.generic.GenericRecord): String =
          if (keyFields.size == 1) String.valueOf(r.get(keyFields.head))
          else keyFields.map { f =>
            val v = r.get(f)
            s"$f:${complexVal(if (v == null) null else String.valueOf(v))}"
          }.mkString(",")
        import org.apache.spark.sql.functions.{col, concat_ws, lit, when}
        def keyColumn: org.apache.spark.sql.Column =
          if (keyFields.size == 1) col(keyFields.head).cast("string")
          else concat_ws(",", keyFields.map { f =>
            val s = col(f).cast("string")
            val v = when(s.isNull, "__null__")
              .when(s === "", "__empty__").otherwise(s)
            concat_ws(":", lit(f), v)
          }: _*)
        val mergedFrames = outstanding.toSeq
          .sortBy { case ((part, fid), _) => (part, fid) }
          .map { case ((_, _), g) =>
            val blocks = g.outstandingLogs.flatMap { case (instant, p) =>
              val abs = Paths.get(hudiPath, p)
              require(Files.isRegularFile(abs),
                s"commit metadata references missing log file $abs")
              parseLogFile(abs).map(instant -> _)
            }
            // ROLLBACK command blocks negate earlier blocks of their
            // target instant (Hudi's log-level undo)
            val effective = blocks.foldLeft(Vector.empty[(String, LogBlock)]) {
              case (acc, (_, b)) if b.blockType == CommandBlock =>
                val target = b.header.getOrElse(TargetInstantTime, "")
                acc.filterNot(_._1 == target)
              case (acc, ib) => acc :+ ib
            }
            // key of an already-row-shaped record (parquet/HFile block
            // rows land as Spark Rows under the table schema) — same
            // encoding contract as keyOfRecord
            def keyOfRow(row: org.apache.spark.sql.Row): String =
              if (keyFields.size == 1)
                String.valueOf(row.get(schema.fieldIndex(keyFields.head)))
              else keyFields.map { f =>
                val v = row.get(schema.fieldIndex(f))
                s"$f:${complexVal(if (v == null) null else String.valueOf(v))}"
              }.mkString(",")
            // last-writer-wins fold by record key, in block order; values
            // normalize to Spark Rows under the table schema at entry
            val upserts =
              new java.util.LinkedHashMap[String, org.apache.spark.sql.Row]()
            val deletes = new java.util.LinkedHashSet[String]()
            def upsert(k: String, row: org.apache.spark.sql.Row): Unit = {
              upserts.put(k, row); deletes.remove(k)
            }
            effective.foreach { case (_, b) =>
              b.blockType match {
                case AvroDataBlock =>
                  dataBlockRecords(b).foreach { r =>
                    upsert(keyOfRecord(r), avroRecordToRow(r, schema))
                  }
                case ParquetDataBlock =>
                  parquetBlockRows(spark, b, schema)
                    .foreach(row => upsert(keyOfRow(row), row))
                case HFileDataBlock =>
                  hfileBlockRows(b, schema)
                    .foreach(row => upsert(keyOfRow(row), row))
                case DeleteBlock =>
                  deleteBlockKeys(b).foreach { k =>
                    deletes.add(k); upserts.remove(k)
                  }
                case other => throw new IllegalArgumentException(
                  s"unsupported log block type $other (avro/parquet/hfile " +
                    "data, delete, and rollback command blocks fold)")
              }
            }
            val touched = (upserts.keySet.asScala ++ deletes.asScala).toSeq
            val base =
              if (g.path == null) spark.createDataFrame(
                java.util.Collections.emptyList[org.apache.spark.sql.Row](),
                schema)
              else spark.read.schema(schema)
                .parquet(Paths.get(hudiPath, g.path).toString)
            val touchedDf = spark.createDataFrame(
              touched.map(org.apache.spark.sql.Row(_)).asJava,
              StructType(Seq(StructField("__hoodie_touched_key", StringType))))
            val upsertDf = spark.createDataFrame(
              upserts.values.asScala.toSeq.asJava, schema)
            base.join(touchedDf,
                keyColumn === col("__hoodie_touched_key"),
                "left_anti")
              .unionByName(upsertDf)
          }
        val mergeDir = Paths.get(root,
          s"mor-merge-${java.util.UUID.randomUUID().toString.take(8)}")
        mergedFrames.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(mergeDir.toString)
        Files.list(mergeDir).iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
          }.map(_.toString).toSeq.sorted
      }
    // r9: per-file stats off the parquet FOOTERS at import — KB per file,
    // zero data reads — so the imported table prunes immediately without
    // an ANALYZE scan; row counts are footer-exact (supersedes trusting
    // the commits' numWrites). Hudi's _hoodie_* meta columns are simply
    // not in the schema, so no stats ever track them.
    val stats = CommitLog.importFooterStats(spark, schema,
      refPaths ++ mergedPaths, sidecarRoot = Some(root))
    CommitLog.importSnapshot(root, schema, stats)
  }

  // ------------------------------------------------- HoodieLogFormat v1
  // The published log-file layout (hudi tech-specs "Log File Format"):
  // per block — 6-byte #HUDI# magic, i64 block size (excluding magic and
  // this long), i32 format version (1), i32 block-type ordinal, header
  // metadata map, i64 content length, content, footer metadata map, i64
  // total block length (reverse-scan support). Metadata maps serialize as
  // i32 count then per entry (i32 key-ordinal, i32 byte-length, UTF-8
  // bytes). Block-type ordinals: 0 command, 1 delete, 2 corrupt, 3 avro
  // data. Header-key ordinals: 0 INSTANT_TIME, 1 TARGET_INSTANT_TIME,
  // 2 SCHEMA, 3 COMMAND_BLOCK_TYPE.

  private[interop] val CommandBlock = 0
  private[interop] val DeleteBlock = 1
  private[interop] val AvroDataBlock = 3
  private[interop] val HFileDataBlock = 4
  private[interop] val ParquetDataBlock = 5
  private[interop] val InstantTime = 0
  private[interop] val TargetInstantTime = 1
  private[interop] val SchemaKey = 2

  private val LogMagic: Array[Byte] = "#HUDI#".getBytes("UTF-8")

  private[interop] final case class LogBlock(blockType: Int,
      header: Map[Int, String], content: Array[Byte])

  private[interop] def parseLogFile(path: Path): Seq[LogBlock] = {
    val bytes = Files.readAllBytes(path)
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[LogBlock]
    while (in.available() > 0) {
      val magic = new Array[Byte](LogMagic.length); in.readFully(magic)
      require(java.util.Arrays.equals(magic, LogMagic),
        s"corrupt log block in $path: bad magic")
      val blockSize = in.readLong()
      require(blockSize > 0 && blockSize <= bytes.length,
        s"corrupt log block in $path: size $blockSize")
      val version = in.readInt()
      require(version == 1, s"unsupported HoodieLogFormat version $version")
      val blockType = in.readInt()
      val header = readLogMetadata(in)
      val contentLen = in.readLong()
      require(contentLen >= 0 && contentLen <= bytes.length,
        s"corrupt log block in $path: content length $contentLen")
      val content = new Array[Byte](contentLen.toInt); in.readFully(content)
      readLogMetadata(in) // footer (unused in the folded subset)
      in.readLong() // trailing total-length (reverse-scan support)
      out += LogBlock(blockType, header, content)
    }
    out.result()
  }

  private def readLogMetadata(in: java.io.DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    require(n >= 0 && n <= 64, s"corrupt log metadata map size $n")
    (0 until n).map { _ =>
      val k = in.readInt()
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      k -> new String(b, "UTF-8")
    }.toMap
  }

  /** AVRO data block content: i32 content-format version, i32 record
    * count, then per record (i32 length, avro-binary bytes) decoded with
    * the WRITER schema carried in the block header.
    */
  private[interop] def dataBlockRecords(b: LogBlock)
      : Seq[org.apache.avro.generic.GenericRecord] = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val schemaJson = b.header.getOrElse(SchemaKey,
      throw new IllegalArgumentException("avro data block without a schema header"))
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(b.content))
    in.readInt() // content-format version
    val count = in.readInt()
    val reader = new GenericDatumReader[GenericRecord](schema)
    (0 until count).map { _ =>
      val len = in.readInt()
      val rb = new Array[Byte](len); in.readFully(rb)
      reader.read(null,
        org.apache.avro.io.DecoderFactory.get().binaryDecoder(rb, null))
    }
  }

  /** PARQUET data block (hudi tech-specs block type 5): the content IS a
    * complete parquet file byte stream (Hudi serializes records through
    * a parquet stream writer), so Spark's own reader decodes it — spill
    * to a temp file, read, align to the table schema by name (Hudi's
    * `_hoodie_*` meta columns, if present, simply aren't selected).
    * Block payloads are log-append sized; the driver-side spill matches
    * the fold's existing per-block discipline.
    */
  private[interop] def parquetBlockRows(spark: SparkSession, b: LogBlock,
      schema: StructType): Seq[org.apache.spark.sql.Row] = {
    val tmp = Files.createTempDirectory("hudi-pq-block")
    val f = tmp.resolve("block.parquet")
    Files.write(f, b.content)
    try {
      spark.read.parquet(f.toString)
        .select(schema.fields.toIndexedSeq.map(fd =>
          org.apache.spark.sql.functions
            .col(s"`${fd.name.replace("`", "``")}`")
            .cast(fd.dataType).as(fd.name)): _*)
        .collect().toSeq
    } finally {
      Files.deleteIfExists(f)
      Files.deleteIfExists(tmp)
    }
  }

  /** HFILE data block (hudi tech-specs block type 4): the content is an
    * HBase HFile (v2/v3 block layout) whose cells map record key → one
    * avro-binary record under the block header's SCHEMA — decoded by
    * [[HFileScan]], a from-spec reader for exactly the subset Hudi
    * writes (DATA blocks, NONE or GZ compression).
    */
  private[interop] def hfileBlockRows(b: LogBlock, schema: StructType)
      : Seq[org.apache.spark.sql.Row] = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val schemaJson = b.header.getOrElse(SchemaKey,
      throw new IllegalArgumentException(
        "hfile data block without a schema header"))
    val avroSchema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](avroSchema)
    HFileScan.cells(b.content).map { case (_, value) =>
      val rec = reader.read(null,
        org.apache.avro.io.DecoderFactory.get().binaryDecoder(value, null))
      avroRecordToRow(rec, schema)
    }
  }

  /** DELETE block content (v3 layout): i32 version, i32 length, then an
    * avro-binary HoodieDeleteRecordList (recordKey/partitionPath/
    * orderingVal per entry — the published hudi-common schema).
    */
  private val DeleteListSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"HoodieDeleteRecordList",
      |"namespace":"org.apache.hudi.avro.model","fields":[
      |  {"name":"deleteRecordList","type":{"type":"array","items":
      |    {"type":"record","name":"HoodieDeleteRecord","fields":[
      |      {"name":"recordKey","type":["null","string"],"default":null},
      |      {"name":"partitionPath","type":["null","string"],"default":null},
      |      {"name":"orderingVal","type":["null","string","int","long",
      |        "float","double","bytes"],"default":null}
      |    ]}}}]}""".stripMargin)

  /** Exposed for fixture writers (q181, HudiImportSpec builds its own
    * independent copy).
    */
  def deleteListSchema: org.apache.avro.Schema = DeleteListSchema

  private[interop] def deleteBlockKeys(b: LogBlock): Seq[String] = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(b.content))
    in.readInt() // delete-block content version
    val len = in.readInt()
    val rb = new Array[Byte](len); in.readFully(rb)
    val reader = new GenericDatumReader[GenericRecord](DeleteListSchema)
    val rec = reader.read(null,
      org.apache.avro.io.DecoderFactory.get().binaryDecoder(rb, null))
    rec.get("deleteRecordList").asInstanceOf[java.util.List[AnyRef]]
      .asScala.map {
        case r: GenericRecord => String.valueOf(r.get("recordKey"))
        case other => String.valueOf(other)
      }.toSeq
  }

  /** Avro GenericRecord → Spark Row under the TABLE schema (fields
    * resolved by name; Utf8 → String, ByteBuffer → bytes — the same
    * subset [[avroToSpark]] maps).
    */
  private[interop] def avroRecordToRow(r: org.apache.avro.generic.GenericRecord,
      schema: StructType): org.apache.spark.sql.Row = {
    def conv(v: Any): Any = v match {
      case null => null
      case u: org.apache.avro.util.Utf8 => u.toString
      case s: CharSequence => s.toString
      case bb: java.nio.ByteBuffer =>
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
      case x => x
    }
    org.apache.spark.sql.Row(schema.fields.map(f => conv(r.get(f.name))): _*)
  }
}

/** From-spec reader for the HFile subset Hudi's log blocks carry — the
  * published HBase "HFile format, versions 2 and 3" layout (HBase book,
  * appendix "HFile format"), no HBase dependency.
  *
  * Per on-disk block: an 8-byte magic (`DATABLK*` data, `LEAFIDX*` /
  * `BLMFBLK*` / `METABLKc` interleavable non-data, `IDXROOT2` /
  * `IDXINTE2` / `FILEINF2` / `TRABLK"$` load-on-open section), then the
  * 33-byte v2 header: i32 onDiskSizeWithoutHeader (checksums included),
  * i32 uncompressedSizeWithoutHeader, i64 prevBlockOffset, u8
  * checksumType, i32 bytesPerChecksum, i32 onDiskDataSizeWithHeader
  * (header + data, checksums EXCLUDED — so the payload is bytes
  * [33, onDiskDataSizeWithHeader) and checksums trail it). The scan
  * walks blocks from offset 0 by size, folds every DATA block, skips
  * interleaved index/bloom/meta blocks, and STOPS at the load-on-open
  * section — no trailer parse needed (v3's trailer is protobuf; nothing
  * in it matters to a sequential whole-file scan).
  *
  * DATA block payload: repeated cells of i32 keyLen, i32 valueLen, key,
  * value. The key is the HBase KeyValue key: i16 rowLen, row bytes
  * (Hudi's record key), family/qualifier/timestamp/type (opaque here).
  * Files written with MVCC carry a trailing varint per cell (Hudi
  * writes sequence id 0); whether it is present is recorded in the
  * FILE INFO block (HBase writes `MAX_MEMSTORE_TS` + `KEY_VALUE_VERSION`
  * into file info exactly when the file includes mvcc —
  * HFileWriterImpl.finishFileInfo, published layout). Detection is
  * therefore DETERMINISTIC when a `FILEINF2` block is present: locate it
  * in the load-on-open section and test for the `MAX_MEMSTORE_TS` key
  * bytes (verbatim in both the protobuf and the writable-map info
  * encodings). Only a file carrying NO file info block (minimal
  * fixtures) falls back to parse-retry — strict no-MVCC first,
  * re-parse with the varint on misalignment — which a crafted payload
  * could in principle satisfy under the wrong mode (r13 verdict #7);
  * real HBase/Hudi writers always emit file info. Compression: NONE, or
  * GZ (HBase's GZ algorithm is a plain gzip stream — recognized by its
  * 1f 8b magic, inflated to the declared uncompressed size).
  */
private[interop] object HFileScan {

  private val DataMagic = "DATABLK*".getBytes("UTF-8")
  private val SkipMagics =
    Seq("LEAFIDX*", "BLMFBLK*", "METABLKc").map(_.getBytes("UTF-8"))
  private val StopMagics =
    Seq("IDXROOT2", "IDXINTE2", "FILEINF2", "TRABLK\"$")
      .map(_.getBytes("UTF-8"))

  private val FileInfoMagic = "FILEINF2".getBytes("UTF-8")
  private val MaxMemstoreKey = "MAX_MEMSTORE_TS".getBytes("UTF-8")

  private def i32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte],
      from: Int): Int = {
    var i = math.max(0, from)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Deterministic MVCC answer from the file info block: Some(true/false)
    * when a structurally valid `FILEINF2` block exists (mvcc ⇔ its
    * payload names `MAX_MEMSTORE_TS`), None when the file carries no
    * file info at all. The LAST magic occurrence is used — file info
    * lives in the load-on-open section at the file's end, and earlier
    * hits could be payload coincidence; a hit whose header does not
    * bound-check is likewise payload noise and skipped.
    */
  private def fileInfoMvcc(bytes: Array[Byte]): Option[Boolean] = {
    var found = -1
    var at = indexOfSlice(bytes, FileInfoMagic, 0)
    while (at >= 0) {
      found = at
      at = indexOfSlice(bytes, FileInfoMagic, at + 1)
    }
    if (found < 0 || found + 33 > bytes.length) return None
    val onDiskDataSizeWithHeader = i32(bytes, found + 29)
    if (onDiskDataSizeWithHeader < 33 ||
      found + onDiskDataSizeWithHeader.toLong > bytes.length) return None
    val raw = java.util.Arrays.copyOfRange(bytes, found + 33,
      found + onDiskDataSizeWithHeader)
    val payload =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
        (raw(1) & 0xff) == 0x8b)
        try gunzip(raw, raw.length * 4) catch { case _: Exception => raw }
      else raw
    Some(indexOfSlice(payload, MaxMemstoreKey, 0) >= 0)
  }

  /** (rowKey, value) of every cell in every DATA block, file order. */
  def cells(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val mvccKnown = fileInfoMvcc(bytes)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + 33 <= bytes.length) {
      val magic = java.util.Arrays.copyOfRange(bytes, off, off + 8)
      def is(m: Array[Byte]) = java.util.Arrays.equals(magic, m)
      if (StopMagics.exists(is)) done = true
      else if (is(DataMagic) || SkipMagics.exists(is)) {
        val onDiskSizeWithoutHeader = i32(bytes, off + 8)
        val uncompressedSize = i32(bytes, off + 12)
        val onDiskDataSizeWithHeader = i32(bytes, off + 29)
        require(onDiskSizeWithoutHeader >= 0 &&
          off + 33 + onDiskSizeWithoutHeader.toLong <= bytes.length &&
          onDiskDataSizeWithHeader >= 33 &&
          onDiskDataSizeWithHeader <= 33 + onDiskSizeWithoutHeader,
          s"corrupt HFile block at offset $off")
        if (is(DataMagic)) {
          val raw = java.util.Arrays.copyOfRange(bytes, off + 33,
            off + onDiskDataSizeWithHeader)
          val data =
            if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
              (raw(1) & 0xff) == 0x8b) gunzip(raw, uncompressedSize)
            else raw
          out ++= parseCells(data, mvccKnown)
        }
        off += 33 + onDiskSizeWithoutHeader
      } else throw new IllegalArgumentException(
        s"unsupported HFile block magic '${new String(magic, "UTF-8")}' " +
          s"at offset $off")
    }
    out.result()
  }

  private def gunzip(raw: Array[Byte], expected: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    try {
      val buf = new java.io.ByteArrayOutputStream(math.max(64, expected))
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  private def parseCells(data: Array[Byte], mvccKnown: Option[Boolean])
      : Seq[(String, Array[Byte])] = mvccKnown match {
    case Some(m) => parseCellsWith(data, mvcc = m) // file-info authority
    case None =>
      try parseCellsWith(data, mvcc = false)
      catch {
        case _: IllegalArgumentException => parseCellsWith(data, mvcc = true)
      }
  }

  private def parseCellsWith(data: Array[Byte], mvcc: Boolean)
      : Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var p = 0
    while (p < data.length) {
      require(p + 8 <= data.length, s"truncated HFile cell at $p")
      val keyLen = i32(data, p); val valLen = i32(data, p + 4)
      // smallest legal key: rowLen(2) + row(1) + famLen(1) + ts(8) + type(1)
      require(keyLen >= 13 && valLen >= 0 &&
        p + 8 + keyLen.toLong + valLen <= data.length,
        s"corrupt HFile cell at $p (keyLen=$keyLen valLen=$valLen)")
      val rowLen = ((data(p + 8) & 0xff) << 8) | (data(p + 9) & 0xff)
      require(rowLen >= 0 && rowLen <= keyLen - 12,
        s"corrupt HFile cell row length $rowLen at $p")
      val row = new String(data, p + 10, rowLen,
        java.nio.charset.StandardCharsets.UTF_8)
      val value = java.util.Arrays.copyOfRange(data,
        p + 8 + keyLen, p + 8 + keyLen + valLen)
      out += row -> value
      p += 8 + keyLen + valLen
      if (mvcc) {
        // varint64 (HBase WritableUtils.readVLong) — Hudi writes seq 0,
        // a single byte; decode generally anyway
        require(p < data.length, s"truncated MVCC varint at $p")
        val first = data(p).toInt
        p += 1 + (if (first >= -112) 0
                  else if (first >= -120) -112 - first
                  else -120 - first)
        require(p <= data.length, "truncated MVCC varint tail")
      }
    }
    out.result()
  }
}
