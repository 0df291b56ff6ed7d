package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path => HPath}

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
  * Landing roots are HADOOP FILESYSTEM URIS, not just local paths — the
  * reference's landing zone is MinIO reached over the S3 protocol
  * (docker-compose.yml:4-19, assets.py:19,427-434); the parity surface
  * here is Spark's own Hadoop FS layer, so `s3a://bucket/land` (endpoint +
  * credentials via the usual `spark.hadoop.fs.s3a.*` session conf) works
  * wherever a local path does. Scheme-less / `file:` roots take a
  * java.nio fast path (no Hadoop checksum-file side effects in local
  * landing dirs); any other scheme routes through
  * `Path.getFileSystem(hadoopConf)` — discovery, size probes, consume
  * (delete/archive) and the audit log all included. Workbook (.xlsx)
  * parsing needs random access (zip central directory), so remote
  * workbooks stage through a local temp copy, removed before return.
  *
  * File discovery is driver-side (same as `list_buckets`/`list_objects`,
  * assets.py:24-41) — cheap metadata ops; all row processing is
  * distributed. The scheduled variant is [[graft.streaming.FileStreamIngest]]
  * (pure Structured Streaming file source — scheme-generic by construction).
  */
object IngestPipeline {

  final case class IngestedTable(db: String, table: String, rows: Long)

  /** True when `root` needs the Hadoop FS path (any scheme except file:). */
  private def isRemote(root: String): Boolean = {
    val i = root.indexOf(':')
    // "C:\..." never occurs here; a scheme is 2+ chars before ':'
    i > 1 && !root.startsWith("file:")
  }

  /** Minimal driver-side landing-zone operations, in both flavors. Paths
    * in/out are plain strings (full URIs on the Hadoop side) so the rest
    * of the pipeline — and `spark.read`, which speaks every Hadoop scheme
    * natively — never branches.
    */
  private sealed trait Landing {
    def listDirs(root: String): Seq[String]
    def listFilesIn(root: String, bucket: String, ext: String): Seq[String]
    def size(path: String): Long
    def delete(path: String): Unit
    def archive(path: String, dstDir: String): Unit
    def fileName(path: String): String
  }

  private object NioLanding extends Landing {
    import scala.jdk.CollectionConverters._
    def listDirs(root: String): Seq[String] = {
      val r = Paths.get(root)
      if (!Files.isDirectory(r)) Seq.empty
      else Files.list(r).iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filterNot(_.contains("configuration")) // assets.py:31
        .toSeq.sorted
    }
    def listFilesIn(root: String, bucket: String, ext: String): Seq[String] = {
      val dir = Paths.get(root, bucket)
      if (!Files.isDirectory(dir)) Seq.empty
      else Files.walk(dir).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(ext))
        .map(_.toString).toSeq.sorted
    }
    def size(path: String): Long = Files.size(Paths.get(path))
    def delete(path: String): Unit = Files.deleteIfExists(Paths.get(path))
    def archive(path: String, dstDir: String): Unit = {
      val src = Paths.get(path)
      val dst = Paths.get(dstDir, src.getFileName.toString)
      Files.createDirectories(dst.getParent)
      Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
    def fileName(path: String): String = Paths.get(path).getFileName.toString
  }

  /** Hadoop-FS landing ops: every call resolves the filesystem FROM the
    * path, so landing root and archive dir may even live on different
    * stores (archive then copies across and deletes the source — rename
    * only works within one FS).
    */
  private final class HadoopLanding(conf: Configuration) extends Landing {
    private def fsOf(p: HPath) = p.getFileSystem(conf)
    def listDirs(root: String): Seq[String] = {
      val r = new HPath(root); val fs = fsOf(r)
      if (!fs.exists(r)) Seq.empty
      else fs.listStatus(r).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .filterNot(_.contains("configuration"))
        .sorted
    }
    def listFilesIn(root: String, bucket: String, ext: String): Seq[String] = {
      // recursive listStatus walk rather than FileSystem.listFiles: the
      // latter materializes LocatedFileStatus, which eagerly loads POSIX
      // permissions (`new File(uri)`) and breaks on any non-file scheme
      // layered over RawLocalFileSystem; listStatus stays lazy.
      val dir = new HPath(root, bucket); val fs = fsOf(dir)
      def walk(d: HPath): Seq[String] =
        fs.listStatus(d).toSeq.flatMap { s =>
          if (s.isDirectory) walk(s.getPath)
          else if (s.getPath.getName.endsWith(ext)) Seq(s.getPath.toString)
          else Seq.empty
        }
      if (!fs.exists(dir)) Seq.empty else walk(dir).sorted
    }
    def size(path: String): Long = {
      val p = new HPath(path); fsOf(p).getFileStatus(p).getLen
    }
    def delete(path: String): Unit = {
      val p = new HPath(path); fsOf(p).delete(p, false); ()
    }
    def archive(path: String, dstDir: String): Unit = {
      val src = new HPath(path); val srcFs = fsOf(src)
      val dir = new HPath(dstDir); val dstFs = fsOf(dir)
      dstFs.mkdirs(dir)
      val dst = new HPath(dir, src.getName)
      if (dstFs.exists(dst)) dstFs.delete(dst, false)
      if (srcFs.getUri == dstFs.getUri) { srcFs.rename(src, dst); () }
      else { FileUtil.copy(srcFs, src, dstFs, dst, true, conf); () }
    }
    def fileName(path: String): String = new HPath(path).getName
    /** Random-access local copy for zip-structured formats (.xlsx). */
    def toLocalTemp(path: String): Path = {
      val p = new HPath(path)
      val tmp = Files.createTempFile("graft-land-", "-" + p.getName)
      FileUtil.copy(fsOf(p), p, new java.io.File(tmp.toString), false, conf)
      tmp
    }
  }

  /** Discover bucket dirs ≡ list_buckets minus `configuration`
    * (assets.py:24-31, 141-145). Local-path form; the FS-generic pipeline
    * path is [[ingest]].
    */
  def listBuckets(landingRoot: String): Seq[String] =
    NioLanding.listDirs(landingRoot)

  /** Objects of one extension in one bucket ≡ list_objects + endswith filter
    * (assets.py:39-41, 146-149). Local-path form.
    */
  def listObjects(landingRoot: String, bucket: String, ext: String): Seq[Path] =
    NioLanding.listFilesIn(landingRoot, bucket, ext).map(Paths.get(_))

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

  /** Full E1 pipeline over one landing root (local path or any Hadoop FS
    * URI — see the object scaladoc). `consume` ≡ remove_object
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
    val hconf = spark.sessionState.newHadoopConf()
    val lfs: Landing =
      if (isRemote(landingRoot)) new HadoopLanding(hconf) else NioLanding
    val auditConf = if (isRemote(configRoot)) Some(hconf) else None
    // temp local copies of remote workbooks — freed before return
    val tmps = scala.collection.mutable.ListBuffer[Path]()
    try {
      val buckets = lfs.listDirs(landingRoot)
      // Staged source: table name, all-string DataFrame, and (when the
      // staging scan already established it) the file's own row count.
      val csv = for {
        bucket <- buckets
        file <- lfs.listFilesIn(landingRoot, bucket, ".csv")
      } yield {
        val base = lfs.fileName(file).stripSuffix(".csv")
        val table = Sanitize.sanitizeDbName(Sanitize.unidecode(base).replace(" ", "_"))
        (bucket, file, Seq((table, readStringly(spark, file), None: Option[Long])))
      }
      val json = for {
        bucket <- buckets
        file <- lfs.listFilesIn(landingRoot, bucket, ".json")
      } yield {
        val base = lfs.fileName(file).stripSuffix(".json")
        val table = Sanitize.sanitizeDbName(Sanitize.unidecode(base).replace(" ", "_"))
        (bucket, file, Seq((table, readStringlyJson(spark, file), None: Option[Long])))
      }
      // Workbooks under the threshold stage as driver-local relations (schema
      // inference and row counts then cost no Spark jobs — right for the
      // human-authored files the reference ingests). Larger ones switch to
      // the distributed streaming parse: rows flow from the StAX cursor on an
      // executor straight into the append, never materialized on the driver,
      // so a machine-generated workbook is bounded by executor memory, not
      // driver heap. Either way the zip parse needs random access, so a
      // REMOTE workbook first stages to a driver-local temp file.
      val streamBytes = spark.conf
        .getOption("graft.xlsx.streamBytes").map(_.toLong).getOrElse(4L << 20)
      val xlsx = for {
        bucket <- buckets
        file <- lfs.listFilesIn(landingRoot, bucket, ".xlsx")
      } yield {
        val base = lfs.fileName(file).stripSuffix(".xlsx")
        val localPath = lfs match {
          case h: HadoopLanding =>
            val t = h.toLocalTemp(file); tmps += t; t.toString
          case _ => file
        }
        val staged =
          if (lfs.size(file) < streamBytes)
            Xlsx.readSheets(localPath).map { sheet =>
              // ≡ assets.py:53-56 table naming via Sanitize.tableName
              (Sanitize.tableName(base, sheet.name), Xlsx.sheetDf(spark, sheet),
                None: Option[Long])
            }
          else
            Xlsx.sheetInfos(localPath).map { info =>
              (Sanitize.tableName(base, info.name),
                Xlsx.streamSheet(spark, localPath, info.name, info.header),
                Some(info.dataRows): Option[Long])
            }
        (bucket, file, staged)
      }
      val columnar = for {
        bucket <- buckets
        (ext, fmt) <- Seq((".orc", "orc"), (".parquet", "parquet"))
        file <- lfs.listFilesIn(landingRoot, bucket, ext)
      } yield {
        val base = lfs.fileName(file).stripSuffix(ext)
        val table = Sanitize.sanitizeDbName(Sanitize.unidecode(base).replace(" ", "_"))
        (bucket, file,
          Seq((table, readStringlyColumnar(spark, file, fmt),
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
            Map("source" -> file, "schema" -> schema.toDDL,
              "db" -> db, "rows" -> n.toString), auditConf)
          IngestedTable(db, table, n)
        }
        consume match {
          case "delete"  => lfs.delete(file)
          case "archive" => lfs.archive(file, s"$configRoot/$bucket")
          case _         => ()
        }
        out
      }
    } finally tmps.foreach(Files.deleteIfExists(_))
  }
}
