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
  * Refused loudly: MERGE_ON_READ tables (ignoring their avro log files
  * would silently drop updates). Files written by INFLIGHT instants never
  * enter the fold at all — only completed-commit metadata is read, which
  * is exactly Hudi's own snapshot-isolation rule.
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

  /** Completed commit/replacecommit instants, oldest first, as
    * (instantTime, parsed JSON body).
    */
  private def completedCommits(hoodie: Path): Seq[(String, JsonNode)] = {
    val timelineDirs = Seq(hoodie.resolve("timeline"), hoodie)
      .filter(Files.isDirectory(_))
    val Re = """^(\d+)(?:_\d+)?\.(commit|replacecommit)$""".r
    timelineDirs.flatMap { d =>
      Files.list(d).iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case Re(instant, _) =>
            Some(instant -> mapper.readTree(Files.readAllBytes(p)))
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
    require(tableType == "COPY_ON_WRITE",
      s"table type $tableType unsupported — a MERGE_ON_READ snapshot " +
        "needs its avro log files merged; compact it to COW with a " +
        "Hudi-native engine first")
    val commits = completedCommits(hoodie)
    require(commits.nonEmpty, s"$hudiPath has no completed commits")
    // timeline fold: newest completed base file per (partition, fileId);
    // replacecommits kill the file groups they list
    val live = scala.collection.mutable.Map[
      (String, String), (String, Long)]() // (partition, fileId) -> (path, rows)
    commits.foreach { case (_, body) =>
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
            val rows = Option(st.get("numWrites")).map(_.asLong()).getOrElse(0L)
            live((e.getKey, fileId)) = (p, rows)
          }
        }
      }
    }
    require(live.nonEmpty, s"$hudiPath folds to an empty snapshot")
    // schema: the newest commit carrying one
    val schemaJson = commits.reverse.iterator
      .flatMap(c => Option(c._2.get("extraMetadata"))
        .flatMap(m => Option(m.get("schema"))).map(_.asText()))
      .find(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"no commit at $hudiPath carries extraMetadata.schema"))
    val (dt, _) = avroToSpark(mapper.readTree(schemaJson))
    val schema = dt.asInstanceOf[StructType]
    val stats = live.values.toSeq.sortBy(_._1).map { case (rel, rows) =>
      val abs = Paths.get(hudiPath, rel)
      require(Files.isRegularFile(abs),
        s"commit metadata references missing base file $abs")
      CommitLog.FileStat(abs.toString, rows, Files.size(abs))
    }
    CommitLog.importSnapshot(root, schema, stats)
  }
}
