package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{SaveMode, SparkSession}

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

  /** Rewrite `table` into ~targetFileBytes-sized files. Returns the new
    * file count.
    */
  def compact(
      spark: SparkSession,
      table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = math.max(tableBytes(spark, table), 1L)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = table.replace('.', '_') + "__compact_tmp"
    spark.table(table).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).saveAsTable(tmp)
    spark.table(tmp)
      .write.mode(SaveMode.Overwrite).saveAsTable(table)
    spark.sql(s"DROP TABLE $tmp")
    fileCount(spark, table)
  }
}
