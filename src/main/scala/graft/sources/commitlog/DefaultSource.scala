package graft.sources.commitlog

import java.nio.file.{Files, Paths}
import java.{util => ju}

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, GraftBridge, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{DataSourceUtils, FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source => V1Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.CommitLog

/** CommitLog as a registered Spark data source — the full format-API
  * surface over [[graft.sources.CommitLog]] tables:
  *
  * {{{
  *   spark.read.format("graft-commitlog").load(root)              // latest snapshot, per scan
  *   spark.read.format("graft-commitlog")
  *     .option("version", 3).load(root)                           // time travel
  *   df.write.format("graft-commitlog").mode("append")
  *     .partitionBy("etype").save(root)                           // atomic commit
  *   sql("CREATE TEMPORARY VIEW t USING `graft-commitlog` OPTIONS (path '…')")
  *   sql("INSERT INTO t SELECT …")                                // SQL DML → atomic commit
  * }}}
  *
  * The architecture is the one Delta Lake published for exactly this
  * problem (a log-indexed parquet table under a stock Spark runtime):
  *
  *  - **Reads** resolve a snapshot into a [[CommitLogFileIndex]] wrapped in
  *    a `HadoopFsRelation` over the builtin `ParquetFileFormat`. Execution
  *    is Spark's own `FileSourceScanExec`: vectorized columnar parquet
  *    reads inside whole-stage codegen, with pushed filters — strictly
  *    better than any hand-rolled row-producing scan (the previous V1
  *    `PrunedFilteredScan` here ended in `.rdd`, which boxed every value
  *    and severed codegen above the scan). Catalyst hands the index each
  *    query's data filters, so manifest-stats file skipping happens
  *    per-scan, and an unpinned index re-resolves `currentVersion` per
  *    scan — a `CREATE TEMPORARY VIEW` now tracks the table instead of
  *    freezing at DDL time.
  *  - **Writes** commit through the log, never around it: the relation
  *    mixes in [[InsertableRelation]] (SQL `INSERT INTO`/`INSERT
  *    OVERWRITE` plan `InsertIntoDataSourceCommand` against it), the
  *    provider implements [[CreatableRelationProvider]] (`df.write…save`),
  *    and [[CommitLogTable]] exposes the DataSourceV2 write surface
  *    (`TableProvider` + `SupportsWrite`) through the connector-API
  *    [[V1Write]] bridge, whose `InsertableRelation` lands the same
  *    atomic [[CommitLog.append]]/[[CommitLog.overwrite]] commits.
  *
  * The V2 table deliberately does NOT implement `SupportsRead`:
  * `DataFrameReader` then falls back to this V1 relation, whose
  * FileIndex-driven `FileSourceScanExec` already IS the optimized read
  * path (Delta ships the same read-through-V1 split for the same reason).
  */
class DefaultSource extends RelationProvider with CreatableRelationProvider
    with StreamSourceProvider with DataSourceRegister with TableProvider {

  override def shortName(): String = "graft-commitlog"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-commitlog requires a path"))

  /** Partition columns arrive from `DataFrameWriter.partitionBy` encoded
    * under `__partition_columns` (the V1-source convention), or explicitly
    * via a `partitionBy` option (comma-separated).
    */
  private def partitionSpecOf(parameters: Map[String, String]): Seq[String] =
    parameters.get(DataSourceUtils.PARTITIONING_COLUMNS_KEY)
      .map(DataSourceUtils.decodePartitioningColumns)
      .orElse(parameters.get("partitionBy")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)))
      .getOrElse(Nil)

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val version = parameters.get("version").map(_.toLong)
    val index = new CommitLogFileIndex(spark, root, version)
    new HadoopFsRelation(index, new StructType(), index.initialSchema, None,
      new ParquetFileFormat, parameters)(spark) with InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        require(version.isEmpty,
          "cannot INSERT through a version-pinned (time travel) relation")
        if (overwrite) CommitLog.overwrite(data, root)
        else CommitLog.append(data, root)
      }
    }
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val root = rootOf(parameters)
    val spec = partitionSpecOf(parameters)
    val exists = CommitLog.currentVersion(root).isDefined
    mode match {
      case SaveMode.Append => CommitLog.append(data, root, spec)
      case SaveMode.Overwrite => CommitLog.overwrite(data, root, spec)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-commitlog table already exists at $root")
        CommitLog.append(data, root, spec)
      case SaveMode.Ignore => if (!exists) CommitLog.append(data, root, spec)
    }
    createRelation(sqlContext, parameters - DataSourceUtils.PARTITIONING_COLUMNS_KEY)
  }

  // ---- DataSourceV2: the connector-catalog write surface ----------------

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = options.get("path")
    require(root != null, "graft-commitlog requires a path")
    CommitLog.currentVersion(root) match {
      case Some(v) => CommitLog.manifestSchema(CommitLog.readManifest(root, v))
      case None => new StructType() // first write creates the table
    }
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: ju.Map[String, String]): Table =
    new CommitLogTable(properties.get("path"), schema)

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

/** Snapshot-resolving [[FileIndex]]: the bridge between the commit log's
  * metadata and Spark's file-scan planner (Delta's `TahoeLogFileIndex`
  * pattern). `listFiles` is invoked at planning time with the query's
  * data filters; the index resolves the manifest (the CURRENT version per
  * scan unless pinned for time travel), evaluates the filters against the
  * per-file min/max stats, and returns only surviving files — so data
  * skipping costs a metadata read, composes with the parquet row-group
  * pruning that happens inside surviving files, and at 100 TB never lists
  * a directory (file sizes come from the manifest, not the filesystem).
  */
class CommitLogFileIndex(
    spark: SparkSession,
    root: String,
    pinned: Option[Long]) extends FileIndex {

  private def manifest(): CommitLog.Manifest = {
    val v = pinned.orElse(CommitLog.currentVersion(root))
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    CommitLog.readManifest(root, v)
  }

  /** Schema at relation-creation time (schema is fixed per plan; files
    * added later with extra columns still read — extra columns in a
    * parquet file are simply not requested).
    */
  val initialSchema: StructType = CommitLog.manifestSchema(manifest())

  override def rootPaths: Seq[HPath] = Seq(new HPath(Paths.get(root).toUri))

  override def partitionSchema: StructType = new StructType()

  override def refresh(): Unit = () // resolution is per-listFiles already

  override def sizeInBytes: Long = {
    val m = manifest()
    m.statsOrNil.map(s => math.max(s.bytes, 0L)).sum
  }

  override def inputFiles: Array[String] =
    manifest().files.map(f => Paths.get(root, f).toUri.toString).toArray

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val m = manifest()
    // Catalyst expressions → V1 filters → the manifest pruner. A filter
    // that doesn't translate simply doesn't prune (it still runs above
    // the scan), the standard conservative data-skipping contract.
    val v1Filters = dataFilters.flatMap(GraftBridge.toSourceFilter)
    val surviving =
      if (v1Filters.isEmpty) m.files
      else CommitLog.pruneForSourceFilters(spark, m, v1Filters.toArray)
    val byPath = m.statsOrNil.map(s => s.path -> s).toMap
    val statuses = surviving.map { rel =>
      val p = Paths.get(root, rel)
      val len = byPath.get(rel).map(_.bytes).filter(_ > 0L)
        .getOrElse(Files.size(p)) // pre-bytes manifests only
      new FileStatus(len, false, 1, len.max(1L), 0L, new HPath(p.toUri))
    }
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
  }
}

/** The DataSourceV2 face of a CommitLog table: write-only by design (reads
  * fall back to the FileIndex relation — see [[DefaultSource]]'s scaladoc).
  * `ACCEPT_ANY_SCHEMA` defers schema checks to the commit protocol itself,
  * which is what enables first-write-creates-table and additive schema
  * evolution through `df.write`; [[CommitLog.append]] still rejects
  * retyping.
  */
class CommitLogTable(root: String, declaredSchema: StructType)
    extends Table with SupportsWrite {
  require(root != null, "graft-commitlog requires a path")

  override def name(): String = s"graft-commitlog.`$root`"

  override def schema(): StructType =
    CommitLog.currentVersion(root) match {
      case Some(v) => CommitLog.manifestSchema(CommitLog.readManifest(root, v))
      case None => declaredSchema
    }

  override def capabilities(): ju.Set[TableCapability] =
    ju.EnumSet.of(
      TableCapability.ACCEPT_ANY_SCHEMA,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwriteAll = false
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwriteAll || overwrite) CommitLog.overwrite(data, root)
              else CommitLog.append(data, root)
            }
          }
      }
    }
}

/** Tail a CommitLog table as a micro-batch stream: each commit version is
  * an offset; the FIRST batch of a new stream is the full snapshot at the
  * start offset, and every subsequent micro-batch is `changes(start, end]`
  * — so a table written by [[CommitLog.streamingSink]] (exactly-once) can
  * feed the next stage's stream, the medallion bronze→silver loop, with no
  * extra bookkeeping. The append-only contract of `changes` applies only
  * to ranges consumed incrementally: a compaction inside an unconsumed
  * range fails the stream rather than re-delivering old rows (run
  * maintenance when consumers are caught up — the documented lakehouse
  * practice), while rewrites that PRE-DATE the stream are fine because the
  * initial batch is a snapshot read.
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
