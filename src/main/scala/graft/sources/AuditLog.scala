package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Replay / persistence log ≡ the reference's `.sql` files uploaded to the
  * `configuration` bucket (assets.py:23, 69-74, 97, 115, 119-124, 214-218;
  * README.md:5-6, 91-92 — used to recreate DB state after loss).
  *
  * Divergence, documented per SURVEY.md §7 hard-part 5: Parquet managed
  * tables already survive engine restarts, so our log is an *audit* of
  * ingest operations (JSON lines), not a re-executable SQL script. Entries
  * are written per ingested table under `configuration/{bucket}/`, matching
  * the reference's object layout.
  *
  * The config root may be a Hadoop FS URI (object-store parity — the
  * reference keeps this bucket in MinIO): pass the session's Hadoop conf
  * and entries route through `Path.getFileSystem`. Object stores have no
  * append, so the remote form writes ONE IMMUTABLE OBJECT PER ENTRY
  * (`{table}-{zero-padded millis}-{seq}.json` — names sort in write
  * order); the local form keeps the appended `{table}.json` lines.
  * [[entries]] reads both layouts identically (all `*.json` under the
  * bucket dir, name-sorted, concatenated).
  */
object AuditLog {

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  private def esc(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  private def render(bucket: String, table: String, op: String,
      detail: Map[String, String]): String =
    (Map("ts" -> java.time.Instant.now().toString, "op" -> op,
      "bucket" -> bucket, "table" -> table) ++ detail)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}\n")

  /** Append one JSON-line entry under `configRoot/{bucket}/`. With
    * `hadoopConf` set the root is treated as a Hadoop FS URI (see the
    * object scaladoc for the per-entry object layout); otherwise it is a
    * local path and the entry appends to `{table}.json`.
    */
  def append(configRoot: String, bucket: String, table: String,
             op: String, detail: Map[String, String],
             hadoopConf: Option[Configuration] = None): Unit = {
    val line = render(bucket, table, op, detail)
    hadoopConf match {
      case Some(conf) =>
        val dir = new HPath(configRoot, bucket)
        val fs = dir.getFileSystem(conf)
        fs.mkdirs(dir)
        val name = f"$table-${System.currentTimeMillis()}%013d-${seq.incrementAndGet()}%06d.json"
        val out = fs.create(new HPath(dir, name), false)
        try out.write(line.getBytes(StandardCharsets.UTF_8)) finally out.close()
      case None =>
        val dir = Paths.get(configRoot, bucket)
        Files.createDirectories(dir)
        Files.write(dir.resolve(s"$table.json"),
          line.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Read back all entries for a bucket (replay support), oldest first
    * within each file; files in name order. Filters to `*.json` so Hadoop
    * checksum siblings (`.crc`) on checksummed filesystems never pollute
    * the replay.
    */
  def entries(configRoot: String, bucket: String,
              hadoopConf: Option[Configuration] = None): Seq[String] =
    hadoopConf match {
      case Some(conf) =>
        val dir = new HPath(configRoot, bucket)
        val fs = dir.getFileSystem(conf)
        if (!fs.exists(dir)) Seq.empty
        else fs.listStatus(dir).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
          .sortBy(_.getPath.getName)
          .flatMap { s =>
            val in = fs.open(s.getPath)
            try new String(in.readAllBytes(), StandardCharsets.UTF_8)
              .linesIterator.toSeq
            finally in.close()
          }
      case None =>
        val dir = Paths.get(configRoot, bucket)
        if (!Files.exists(dir)) Seq.empty
        else {
          import scala.jdk.CollectionConverters._
          Files.list(dir).iterator().asScala.toSeq
            .filter(p => p.toString.endsWith(".json"))
            .sortBy(_.toString).flatMap { p =>
              new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
                .linesIterator.toSeq
            }
        }
    }
}
