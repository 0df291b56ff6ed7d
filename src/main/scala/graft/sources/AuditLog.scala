package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Replay / persistence log ≡ the reference's `.sql` files uploaded to the
  * `configuration` bucket (assets.py:23, 69-74, 97, 115, 119-124, 214-218;
  * README.md:5-6, 91-92 — used to recreate DB state after loss).
  *
  * Divergence, documented per SURVEY.md §7 hard-part 5: Parquet managed
  * tables already survive engine restarts, so our log is an *audit* of
  * ingest operations (JSON lines), not a re-executable SQL script. Entries
  * are written per ingested table under `configuration/{bucket}/`, matching
  * the reference's object layout.
  */
object AuditLog {

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

  /** Append one JSON-line entry to `configRoot/{bucket}/{table}.json`. */
  def append(configRoot: String, bucket: String, table: String,
             op: String, detail: Map[String, String]): Unit = {
    val dir = Paths.get(configRoot, bucket)
    Files.createDirectories(dir)
    val fields = (Map("ts" -> java.time.Instant.now().toString, "op" -> op,
      "bucket" -> bucket, "table" -> table) ++ detail)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}\n")
    Files.write(dir.resolve(s"$table.json"), fields.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Read back all entries for a bucket (replay support). */
  def entries(configRoot: String, bucket: String): Seq[String] = {
    val dir = Paths.get(configRoot, bucket)
    if (!Files.exists(dir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala.toSeq.sortBy(_.toString).flatMap { p =>
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8).linesIterator.toSeq
      }
    }
  }
}
