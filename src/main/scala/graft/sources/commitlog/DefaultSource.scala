package graft.sources.commitlog

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
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
class DefaultSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-commitlog"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-commitlog requires a path"))
    val version = parameters.get("version").map(_.toLong)
    CommitLogRelation(sqlContext, root, version)
  }
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
