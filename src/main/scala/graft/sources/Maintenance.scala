package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Table maintenance: small-file compaction.
  *
  * Streaming / micro-batch ingestion (FileStreamIngest, per-file
  * IngestPipeline appends) accumulates many small parquet files; at 100 TB
  * the file-listing and per-file open costs dominate scan time long before
  * the bytes do. Compaction rewrites a managed table into
  * `ceil(bytes / targetFileBytes)` files.
  *
  * The rewrite stages into a temporary table first and only then swaps —
  * an overwrite that reads its own input would truncate-before-read.
  * (With a transactional table format the swap is a metadata commit; on
  * plain parquet tables run compaction in the ingest job's quiet window.)
  *
  * Partitioned and bucketed tables keep their layout: the catalog's
  * partition columns and bucket spec are read back and reapplied on both
  * rewrites, so compacting a monthly rollup does not break
  * `RollupJob.refreshMonths` (which needs the partition column) and
  * compacting a bucketed table does not silently drop its shuffle-free
  * join property.
  */
object Maintenance {

  /** Rough on-disk size of a managed table (driver-side file walk). */
  def tableBytes(spark: SparkSession, table: String): Long = {
    val loc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
      .getOrElse(throw new IllegalStateException(s"no location for $table"))
    val root = Paths.get(new java.net.URI(loc))
    if (!Files.exists(root)) 0L
    else {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
        .map(Files.size).sum
    }
  }

  /** Number of data files currently backing a managed table. */
  def fileCount(spark: SparkSession, table: String): Int =
    spark.table(table).inputFiles.length

  /** Rewrite `table` into ~targetFileBytes-sized files, preserving the
    * catalog's partitioning and bucketing specs. Returns the new file count.
    */
  def compact(
      spark: SparkSession,
      table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val meta = session.sessionState.catalog.getTableMetadata(
      session.sessionState.sqlParser.parseTableIdentifier(table))
    val partCols = meta.partitionColumnNames
    val bucketSpec = meta.bucketSpec

    val bytes = math.max(tableBytes(spark, table), 1L)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = table.replace('.', '_') + "__compact_tmp"

    // Co-locate rows with their output file: bucketed tables repartition on
    // the bucket hash (repartition's HashPartitioning matches bucket-id
    // assignment → one file per bucket); partitioned tables repartition on
    // the partition columns so each directory gets contiguous writers.
    def shaped(df: DataFrame): DataFrame = bucketSpec match {
      case Some(b) => df.repartition(b.numBuckets, b.bucketColumnNames.map(col): _*)
      case None if partCols.nonEmpty => df.repartition(nFiles, partCols.map(col): _*)
      case None => df.repartition(nFiles)
    }
    def write(df: DataFrame, target: String): Unit = {
      var w = df.write.mode(SaveMode.Overwrite)
      if (partCols.nonEmpty) w = w.partitionBy(partCols: _*)
      bucketSpec.foreach { b =>
        w = w.bucketBy(b.numBuckets, b.bucketColumnNames.head, b.bucketColumnNames.tail: _*)
        if (b.sortColumnNames.nonEmpty)
          w = w.sortBy(b.sortColumnNames.head, b.sortColumnNames.tail: _*)
      }
      w.saveAsTable(target)
    }

    write(shaped(spark.table(table)), tmp)
    write(shaped(spark.table(tmp)), table)
    spark.sql(s"DROP TABLE $tmp")
    fileCount(spark, table)
  }
}
