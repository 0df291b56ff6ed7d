package graft.sources.commitlog

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source => V1Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.sources.CommitLog

/** CommitLog as a registered Spark data source — the format-API surface
  * over [[graft.sources.CommitLog]] snapshots:
  *
  * {{{
  *   spark.read.format("graft-commitlog").load(root)              // latest
  *   spark.read.format("graft-commitlog")
  *     .option("version", 3).load(root)                           // time travel
  *   sql("CREATE TEMPORARY VIEW t USING `graft-commitlog` OPTIONS (path '…')")
  * }}}
  *
  * Built on the stable V1 relation API: [[PrunedFilteredScan]] receives the
  * column prune + pushed filters from Catalyst, translates the filters onto
  * the manifest's per-file min/max stats, and scans ONLY surviving files
  * with only the required columns — manifest-stats data skipping driven by
  * ordinary `df.filter(...)` / SQL WHERE, no special read API needed. The
  * V1 contract re-applies every filter above the scan (`unhandledFilters`
  * default), so pruning can never change results, only skip I/O — the same
  * conservative contract as [[CommitLog.readPruned]].
  */
class DefaultSource extends RelationProvider with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-commitlog"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-commitlog requires a path"))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = rootOf(parameters)
    val version = parameters.get("version").map(_.toLong)
    CommitLogRelation(sqlContext, root, version)
  }

  // ---- streaming source: commit versions ARE the offsets ----------------

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val v = CommitLog.currentVersion(root).getOrElse(
      throw new IllegalStateException(
        s"graft-commitlog stream requires an existing table at $root"))
    (shortName(), CommitLog.manifestSchema(CommitLog.readManifest(root, v)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): V1Source =
    new CommitLogStreamSource(sqlContext, rootOf(parameters))
}

/** Tail a CommitLog table as a micro-batch stream: each commit version is
  * an offset, each micro-batch is `changes(start, end]` — so a table
  * written by [[CommitLog.streamingSink]] (exactly-once) can feed the next
  * stage's stream, the medallion bronze→silver loop, with no extra
  * bookkeeping. The append-only contract of `changes` is enforced: a
  * compaction inside an unconsumed range fails the stream rather than
  * re-delivering old rows (run maintenance when consumers are caught up —
  * the documented lakehouse practice).
  */
class CommitLogStreamSource(sqlContext: SQLContext, root: String)
    extends V1Source {

  private val spark = sqlContext.sparkSession
  private val initial = CommitLog.currentVersion(root).getOrElse(
    throw new IllegalStateException(s"no commits at $root"))

  override val schema: StructType =
    CommitLog.manifestSchema(CommitLog.readManifest(root, initial))

  override def getOffset: Option[V1Offset] =
    CommitLog.currentVersion(root).map(v => LongOffset(v))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val toV = end.asInstanceOf[LongOffset].offset
    start match {
      // First batch of a new stream: serve the full snapshot at toV. Using
      // changes(0, toV) here would demand an all-append history, so a
      // stream could never START on a table ever compacted/merged — the
      // append-only contract belongs to the incremental ranges only.
      case None =>
        GraftBridge.asStreamingFrame(CommitLog.read(spark, root, Some(toV)))
      case Some(s) =>
        val fromV = s.asInstanceOf[LongOffset].offset
        GraftBridge.asStreamingFrame(CommitLog.changes(spark, root, fromV, toV))
    }
  }

  override def stop(): Unit = ()
}

case class CommitLogRelation(
    sqlContext: SQLContext,
    root: String,
    version: Option[Long]) extends BaseRelation with PrunedFilteredScan {

  private val resolved: Long = version.orElse(CommitLog.currentVersion(root))
    .getOrElse(throw new IllegalStateException(s"no commits at $root"))
  private val manifest = CommitLog.readManifest(root, resolved)

  override val schema: StructType = CommitLog.manifestSchema(manifest)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val spark = sqlContext.sparkSession
    val surviving = CommitLog.pruneForSourceFilters(spark, manifest, filters)
    val snap = CommitLog.readManifestFiles(spark, root, manifest, surviving)
    val projected =
      if (requiredColumns.isEmpty) snap.select() // COUNT(*)-style scans
      else snap.select(requiredColumns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
    projected.rdd
  }
}
