package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal versioned-manifest table format: the ACID layer the plain
  * managed-parquet path lacks (BASELINE names "Spark + Delta/Iceberg table
  * ops"; zero egress rules those jars out, so this implements the core of
  * the published commit-protocol design — a log of immutable manifests with
  * atomic publication — directly).
  *
  * Layout:
  * {{{
  *   <root>/_graft_log/v00000000000000000001.json   // one manifest per commit
  *   <root>/data/<commit-uuid>/part-*.parquet        // immutable data files
  * }}}
  *
  * Guarantees:
  *  - **Atomic commit**: data files are fully written into a fresh
  *    `data/<uuid>/` dir FIRST; the commit is a single hard-link creation of
  *    the next manifest (`Files.createLink` fails atomically if the version
  *    exists). A crash mid-write leaves unreferenced garbage, never a
  *    half-visible table.
  *  - **Optimistic concurrency**: two writers racing to version N+1 — one
  *    wins the link creation, the other gets [[CommitConflictException]]
  *    and must re-read and retry (the documented Delta/Iceberg protocol).
  *  - **Snapshot isolation / time travel**: a reader resolves ONE manifest
  *    and reads only files it references; compaction and overwrite publish
  *    new manifests and never mutate old files, so `read(version = Some(n))`
  *    keeps returning the historical snapshot until [[vacuum]].
  *  - **Schema on empty**: each manifest carries the Spark schema JSON, so a
  *    zero-file snapshot still reads as an empty, correctly-typed DataFrame
  *    (the dynamic-partition-overwrite zero-row hole does not exist here).
  *
  * At 100 TB the log is metadata-only (KBs per commit, data moves never),
  * and reads list one manifest instead of walking the directory tree —
  * exactly why table formats beat directory-scan tables at scale.
  */
object CommitLog {

  final class CommitConflictException(msg: String) extends RuntimeException(msg)

  final case class Manifest(
      version: Long,
      op: String,
      schemaJson: String,
      files: Seq[String]) // relative to root

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  private def logDir(root: String): Path = Paths.get(root, "_graft_log")
  private def manifestPath(root: String, v: Long): Path =
    logDir(root).resolve(f"v$v%020d.json")

  /** Largest committed version, if any. */
  def currentVersion(root: String): Option[Long] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) None
    else {
      val vs = Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toLong
        }
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def readManifest(root: String, v: Long): Manifest = {
    val p = manifestPath(root, v)
    require(Files.exists(p), s"no manifest for version $v under $root")
    mapper.readValue(Files.readAllBytes(p), classOf[Manifest])
  }

  /** Atomically publish `m` as version `m.version`. The manifest is staged
    * to a temp file and hard-linked into place — link creation is the
    * atomic, fail-if-exists commit point.
    */
  private[sources] def publish(root: String, m: Manifest): Unit = {
    Files.createDirectories(logDir(root))
    val tmp = logDir(root).resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.write(tmp, mapper.writeValueAsBytes(m))
    try Files.createLink(manifestPath(root, m.version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"version ${m.version} was committed concurrently at $root")
    } finally Files.deleteIfExists(tmp)
  }

  /** Write `df`'s rows as a new immutable file set under `data/<uuid>/` and
    * return their root-relative paths. Nothing is visible until a manifest
    * referencing them is published.
    */
  private def stage(df: DataFrame, root: String): Seq[String] = {
    val sub = s"data/${UUID.randomUUID()}"
    df.write.parquet(s"$root/$sub")
    Files.list(Paths.get(root, sub)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$sub/$n")
      .toSeq.sorted
  }

  /** Append `df` as one atomic commit; returns the new version. */
  def append(df: DataFrame, root: String): Long = {
    val base = currentVersion(root)
    val prior = base.map(readManifest(root, _).files).getOrElse(Nil)
    val v = base.getOrElse(0L) + 1
    publish(root, Manifest(v, "append", df.schema.json, prior ++ stage(df, root)))
    v
  }

  /** Replace the table contents with `df` (zero rows allowed) atomically. */
  def overwrite(df: DataFrame, root: String): Long = {
    val v = currentVersion(root).getOrElse(0L) + 1
    val files = if (df.isEmpty) Nil else stage(df, root)
    publish(root, Manifest(v, "overwrite", df.schema.json, files))
    v
  }

  /** Read a snapshot: latest by default, or a pinned historical version. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(root))
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val m = readManifest(root, v)
    if (m.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
          .asInstanceOf[StructType])
    else spark.read.parquet(m.files.map(f => s"$root/$f"): _*)
  }

  /** Small-file compaction as ONE metadata commit: rewrite the current
    * snapshot into `nFiles` files and publish a manifest swap. Readers
    * pinned to older versions keep their exact snapshot — the property
    * `Maintenance.compact`'s stage-and-swap on plain tables cannot give.
    */
  def compact(spark: SparkSession, root: String, nFiles: Int = 1): Long = {
    val base = currentVersion(root)
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val df = read(spark, root, Some(base)).repartition(nFiles)
    val files = stage(df, root)
    val v = base + 1
    publish(root, Manifest(v, "compact", df.schema.json, files))
    v
  }

  /** Drop manifests older than the last `keepVersions` and delete data files
    * referenced by NO surviving manifest. Bounds time-travel history.
    */
  def vacuum(root: String, keepVersions: Int = 1): Unit = {
    val cur = currentVersion(root).getOrElse(return)
    val keepFrom = math.max(1L, cur - keepVersions + 1)
    val live = (keepFrom to cur)
      .filter(v => Files.exists(manifestPath(root, v)))
      .flatMap(v => readManifest(root, v).files).toSet
    // remove expired manifests
    (1L until keepFrom).foreach(v => Files.deleteIfExists(manifestPath(root, v)))
    // remove unreferenced data files (and then empty commit dirs)
    val dataRoot = Paths.get(root, "data")
    if (Files.isDirectory(dataRoot)) {
      Files.walk(dataRoot).iterator().asScala.toSeq.reverse.foreach { p =>
        val rel = Paths.get(root).relativize(p).toString
        if (Files.isRegularFile(p) && !live.contains(rel)) Files.delete(p)
        else if (Files.isDirectory(p) && !Files.list(p).iterator().hasNext &&
          p != dataRoot) Files.delete(p)
      }
    }
  }
}
