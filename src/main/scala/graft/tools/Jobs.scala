package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Job registry ≡ the reference's Dagster job/schedule definitions
  * (projects/dagster/assets/__init__.py:41-57): named jobs over asset
  * groups, optionally bound to a cron schedule. The reference ships two
  * jobs — `Insert_excel_tables` (every-30-minutes cron) and
  * `Process_csv_data` (manual) — mirrored by [[Jobs.reference]].
  *
  * This is registry + metadata, not a resident scheduler daemon: `runNow`
  * executes a job's body once (≡ one cron firing / one manual launch —
  * exactly how `Trigger.AvailableNow` models a firing in
  * [[graft.streaming.FileStreamIngest]]); an external scheduler (cron,
  * Airflow, k8s CronJob) drives the cadence, which is also how the
  * reference's Dagster daemon relates to its run workers.
  */
final case class JobDef(
    name: String,
    group: String,
    cronSchedule: Option[String],
    body: SparkSession => Unit)

final class Jobs {
  private val jobs = mutable.LinkedHashMap.empty[String, JobDef]
  private val runs = mutable.ArrayBuffer.empty[(String, Long, Boolean)]

  def register(job: JobDef): Jobs = { jobs(job.name) = job; this }
  def get(name: String): Option[JobDef] = jobs.get(name)
  def all: Seq[JobDef] = jobs.values.toSeq
  def scheduled: Seq[JobDef] = all.filter(_.cronSchedule.isDefined)

  /** Run-log entries (name, epochMillis, succeeded) ≡ dagster's run history. */
  def history: Seq[(String, Long, Boolean)] = runs.toSeq

  /** Execute one firing of a registered job. */
  def runNow(spark: SparkSession, name: String): Unit = {
    val job = jobs.getOrElse(name,
      throw new IllegalArgumentException(s"unknown job: $name"))
    val t = System.currentTimeMillis()
    try { job.body(spark); runs += ((name, t, true)) }
    catch { case e: Throwable => runs += ((name, t, false)); throw e }
  }
}

object Jobs {
  /** The reference's two jobs over a landing/config root: scheduled
    * tabular-file ingestion (excel/csv/json via [[graft.sources.IngestPipeline]])
    * and the manual farm-CSV extraction path.
    */
  def reference(landingRoot: String, configRoot: String, farmOut: String = "farm"): Jobs =
    new Jobs()
      .register(JobDef(
        name = "Insert_excel_tables",
        group = "Data_Integration_excel",
        cronSchedule = Some("*/30 * * * *"), // __init__.py:52-56
        body = s => { graft.sources.IngestPipeline.ingest(s, landingRoot, configRoot); () }))
      .register(JobDef(
        name = "Process_csv_data",
        group = "Data_Integration_csv",
        cronSchedule = None, // manual job, __init__.py:46-49
        body = s => {
          val rows = graft.sources.FarmCsv.read(s, landingRoot)
          graft.sources.CatalogOps.appendTable(s, rows.toDF(), "farm", farmOut)
        }))
}
