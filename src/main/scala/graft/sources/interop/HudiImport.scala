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
  * group with an OUTSTANDING log file still refuses loudly: folding the
  * log would require re-implementing Hudi's binary log-block format
  * (#HUDI# framing + avro record/delete blocks) from the spec with no
  * native writer available to validate against — a wrong-byte reader
  * would silently drop or resurrect updates, which is strictly worse than
  * the refusal. This is a PERMANENT boundary, recorded in DEPLOYMENT.md's
  * interop section (r9): compact with a Hudi-native engine, then import.
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
  def importTable(spark: SparkSession, hudiPath: String, root: String): Long = {
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
        lastLogInstant: Option[String])
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
                case Some(g) => live(key) = g.copy(lastLogInstant = Some(instant))
                case None => live(key) = Group(null, 0L, "", Some(instant))
              }
            } else {
              val rows = Option(st.get("numWrites")).map(_.asLong()).getOrElse(0L)
              // a new base file (insert or compaction) supersedes any log
              // written before it
              live(key) = Group(p, rows, instant, None)
            }
          }
        }
      }
    }
    require(live.nonEmpty, s"$hudiPath folds to an empty snapshot")
    val outstanding = live.filter { case (_, g) =>
      g.path == null || g.lastLogInstant.exists(_ > g.baseInstant)
    }
    require(outstanding.isEmpty,
      s"MERGE_ON_READ snapshot has ${outstanding.size} file group(s) with " +
        "outstanding log files (e.g. " +
        s"${outstanding.keys.take(3).mkString(", ")}). Folding Hudi's " +
        "binary log blocks is a PERMANENT boundary of this importer " +
        "(DEPLOYMENT.md, 'Permanent boundary — Hudi MERGE_ON_READ'): with " +
        "no native writer to validate a byte-level reader against, a " +
        "wrong-byte fold would silently drop or resurrect updates. " +
        "Compact with a Hudi-native engine, then import the log-free " +
        "snapshot (verified per file group from the timeline)")
    // schema: the newest commit carrying one
    val schemaJson = commits.reverse.iterator
      .flatMap(c => Option(c._3.get("extraMetadata"))
        .flatMap(m => Option(m.get("schema"))).map(_.asText()))
      .find(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"no commit at $hudiPath carries extraMetadata.schema"))
    val (dt, _) = avroToSpark(mapper.readTree(schemaJson))
    val schema = dt.asInstanceOf[StructType]
    val paths = live.values.toSeq.map(_.path).sorted.map { p =>
      val abs = Paths.get(hudiPath, p)
      require(Files.isRegularFile(abs),
        s"commit metadata references missing base file $abs")
      abs.toString
    }
    // r9: per-file stats off the parquet FOOTERS at import — KB per file,
    // zero data reads — so the imported table prunes immediately without
    // an ANALYZE scan; row counts are footer-exact (supersedes trusting
    // the commits' numWrites). Hudi's _hoodie_* meta columns are simply
    // not in the schema, so no stats ever track them.
    val stats = CommitLog.importFooterStats(spark, schema, paths,
      sidecarRoot = Some(root))
    CommitLog.importSnapshot(root, schema, stats)
  }
}
