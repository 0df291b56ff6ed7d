package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's orchestration semantics, Spark-first.
  *
  * Reference: a Dagster cron (every 30 min) polls MinIO buckets and deletes
  * each source object after ingestion (assets/__init__.py:52-56 +
  * assets.py:66). Structured Streaming's file source is the exact built-in
  * equivalent: new-file discovery, exactly-once tracking via the checkpoint
  * log, and `cleanSource=delete|archive` for consume-the-source semantics
  * (SURVEY.md §2a #5, #19).
  *
  * `Trigger.AvailableNow` ≡ one cron firing (drain everything present, then
  * stop); `Trigger.ProcessingTime` ≡ the resident 30-minute loop.
  */
object FileStreamIngest {

  /** Build the streaming source over a bucket dir of CSV files. */
  def source(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      archiveDir: Option[String] = None): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", "1000") // bound per-batch work at scale
    val withClean = archiveDir match {
      case Some(a) => r.option("cleanSource", "archive").option("sourceArchiveDir", a)
      case None    => r.option("cleanSource", "delete")
    }
    withClean.csv(dir)
  }

  /** Run one drain-everything batch (≡ one cron firing) appending into a
    * managed table, then stop. Returns the completed query.
    */
  def runAvailableNow(
      df: DataFrame,
      targetTable: String,
      checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .toTable(targetTable)
    q.awaitTermination()
    q
  }

  /** Resident variant ≡ the 30-minute cron loop (caller stops it). */
  def runEvery(
      df: DataFrame,
      targetTable: String,
      checkpoint: String,
      interval: String = "30 minutes"): StreamingQuery =
    df.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .toTable(targetTable)
}
