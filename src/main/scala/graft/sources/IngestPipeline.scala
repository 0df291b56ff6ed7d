package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StringType
import graft.functions.Sanitize

/** The reference's scheduled ELT pipeline (E1 in SURVEY.md §3), Spark-first:
  * landing-zone discovery → tabular parse → stringify → infer → sanitize →
  * coerce → batch append to a managed table → catalog + audit log →
  * consume the source file.
  *
  * Layout mapping: one landing-root subdirectory ≡ one MinIO bucket ≡ one
  * Spark database (assets.py:33-36); one data file ≡ one table
  * (assets.py:48-64, 155-158). The `configuration` directory is skipped as
  * a bucket (assets.py:31) and receives the audit log (assets.py:70-74).
  *
  * File discovery is driver-side (same as `list_buckets`/`list_objects`,
  * assets.py:24-41) — cheap metadata ops; all row processing is
  * distributed. The scheduled variant is [[graft.streaming.FileStreamIngest]].
  */
object IngestPipeline {

  final case class IngestedTable(db: String, table: String, rows: Long)

  /** Discover bucket dirs ≡ list_buckets minus `configuration`
    * (assets.py:24-31, 141-145).
    */
  def listBuckets(landingRoot: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(landingRoot)
    if (!Files.isDirectory(root)) Seq.empty
    else Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filterNot(_.contains("configuration")) // assets.py:31
      .toSeq.sorted
  }

  /** Objects of one extension in one bucket ≡ list_objects + endswith filter
    * (assets.py:39-41, 146-149).
    */
  def listObjects(landingRoot: String, bucket: String, ext: String): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(landingRoot, bucket)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(ext))
      .toSeq.sortBy(_.toString)
  }

  /** Parse one header-ful CSV with every cell stringified — ≡ the Excel
    * sheet parse where `rows.append([str(value) for value in row])`
    * (assets.py:231). Excel itself is out of scope for the zero-egress
    * build (SURVEY.md §7: no spark-excel/POI jar; semantics are
    * source-format-independent).
    */
  def readStringly(spark: SparkSession, file: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(file)
    raw.select(raw.columns.toIndexedSeq.map(c => raw(c).cast(StringType).as(c)): _*)
  }

  /** Parse one JSON-lines file with every leaf stringified — the
    * `obtain_data_from_json`/`tranform_json_data` assets the reference's
    * README documents but never implemented (README.md:123-127; SURVEY.md
    * §2a dead-code note) — implemented here since Spark gives it natively.
    */
  def readStringlyJson(spark: SparkSession, file: String): DataFrame = {
    val raw = spark.read.option("primitivesAsString", "true").json(file)
    raw.select(raw.columns.toIndexedSeq.map(c => raw(c).cast(StringType).as(c)): _*)
  }

  /** Parse one columnar landing file (ORC or parquet — third-party data
    * handoffs arrive in both; Spark decodes either natively) with every
    * column stringified, so typed handoffs flow through the SAME
    * infer → coerce → append path as csv/json/xlsx: one code path owns
    * type decisions, and a file whose embedded types are wrong (strings
    * holding timestamps, ints holding booleans) gets the same repair the
    * text formats get.
    */
  def readStringlyColumnar(spark: SparkSession, file: String, fmt: String): DataFrame = {
    val raw = spark.read.format(fmt).load(file)
    raw.select(raw.columns.toIndexedSeq.map(c => raw(c).cast(StringType).as(c)): _*)
  }

  /** Full E1 pipeline over one landing root. `consume` ≡ remove_object
    * (assets.py:66) when "delete", ≡ minio_mv archival (assets.py:289-291)
    * when "archive", no-op when "keep".
    *
    * CSV: one file → one table (assets.py:155-158). XLSX: one SHEET → one
    * table named `{file}_{sheet}` (assets.py:48-64), sheets parsed by the
    * zero-dependency [[Xlsx]] reader. JSON-lines: one file → one table
    * ([[readStringlyJson]]). ORC/parquet handoffs: one file → one table
    * ([[readStringlyColumnar]]). All land as stringified columns and flow
    * through the same infer → coerce → append path.
    */
  def ingest(
      spark: SparkSession,
      landingRoot: String,
      configRoot: String,
      consume: String = "archive",
      extended: Boolean = false): Seq[IngestedTable] = {
    CatalogOps.ensureInfoTable(spark)
    val buckets = listBuckets(landingRoot)
    // Staged source: table name, all-string DataFrame, and (when the
    // staging scan already established it) the file's own row count.
    val csv = for {
      bucket <- buckets
      file <- listObjects(landingRoot, bucket, ".csv")
    } yield {
      val base = file.getFileName.toString.stripSuffix(".csv")
      val table = Sanitize.sanitizeDbName(Sanitize.unidecode(base).replace(" ", "_"))
      (bucket, file, Seq((table, readStringly(spark, file.toString), None: Option[Long])))
    }
    val json = for {
      bucket <- buckets
      file <- listObjects(landingRoot, bucket, ".json")
    } yield {
      val base = file.getFileName.toString.stripSuffix(".json")
      val table = Sanitize.sanitizeDbName(Sanitize.unidecode(base).replace(" ", "_"))
      (bucket, file, Seq((table, readStringlyJson(spark, file.toString), None: Option[Long])))
    }
    // Workbooks under the threshold stage as driver-local relations (schema
    // inference and row counts then cost no Spark jobs — right for the
    // human-authored files the reference ingests). Larger ones switch to
    // the distributed streaming parse: rows flow from the StAX cursor on an
    // executor straight into the append, never materialized on the driver,
    // so a machine-generated workbook is bounded by executor memory, not
    // driver heap.
    val streamBytes = spark.conf
      .getOption("graft.xlsx.streamBytes").map(_.toLong).getOrElse(4L << 20)
    val xlsx = for {
      bucket <- buckets
      file <- listObjects(landingRoot, bucket, ".xlsx")
    } yield {
      val base = file.getFileName.toString.stripSuffix(".xlsx")
      val staged =
        if (Files.size(file) < streamBytes)
          Xlsx.readSheets(file.toString).map { sheet =>
            // ≡ assets.py:53-56 table naming via Sanitize.tableName
            (Sanitize.tableName(base, sheet.name), Xlsx.sheetDf(spark, sheet),
              None: Option[Long])
          }
        else
          Xlsx.sheetInfos(file.toString).map { info =>
            (Sanitize.tableName(base, info.name),
              Xlsx.streamSheet(spark, file.toString, info.name, info.header),
              Some(info.dataRows): Option[Long])
          }
      (bucket, file, staged)
    }
    val columnar = for {
      bucket <- buckets
      (ext, fmt) <- Seq((".orc", "orc"), (".parquet", "parquet"))
      file <- listObjects(landingRoot, bucket, ext)
    } yield {
      val base = file.getFileName.toString.stripSuffix(ext)
      val table = Sanitize.sanitizeDbName(Sanitize.unidecode(base).replace(" ", "_"))
      (bucket, file,
        Seq((table, readStringlyColumnar(spark, file.toString, fmt),
          None: Option[Long])))
    }
    (csv ++ json ++ xlsx ++ columnar).flatMap { case (bucket, file, staged) =>
      val db = Sanitize.fixString(bucket)
      val out = staged.map { case (table, raw, knownRows) =>
        val schema = SchemaInference.infer(raw, extended)
        val coerced = SchemaInference.coerce(raw, schema)
        CatalogOps.appendTable(spark, coerced, db, table)
        // Rows ingested from THIS file (not the cumulative table count — no
        // full-table scan, and re-ingest/append stays truthful in the audit).
        // A sheet staged as a local relation knows its row count without a
        // job (the optimizer folds the coercion projection into the local
        // relation); file-backed sources count distributed as before.
        val n = knownRows.getOrElse(coerced.queryExecution.optimizedPlan match {
          case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
            lr.data.size.toLong
          case _ => coerced.count()
        })
        // Audit entries and archived source files share one directory key:
        // the RAW bucket name, matching the reference's configuration-bucket
        // layout (assets.py:119-124, 214-218).
        AuditLog.append(configRoot, bucket, table, "ingest",
          Map("source" -> file.toString, "schema" -> schema.toDDL,
            "db" -> db, "rows" -> n.toString))
        IngestedTable(db, table, n)
      }
      consume match {
        case "delete" => Files.deleteIfExists(file)
        case "archive" =>
          val dst = Paths.get(configRoot, bucket, file.getFileName.toString)
          Files.createDirectories(dst.getParent)
          Files.move(file, dst, StandardCopyOption.REPLACE_EXISTING)
        case _ => ()
      }
      out
    }
  }
}
