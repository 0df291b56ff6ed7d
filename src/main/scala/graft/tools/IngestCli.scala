package graft.tools

import graft.Graft
import graft.sources.IngestPipeline

/** CLI entry for the ELT pipeline ≡ the reference's `Insert_excel_tables` /
  * `Process_csv_data` Dagster jobs (assets/__init__.py:41-57), run once
  * (one cron firing).
  *
  * Usage: graft.tools.IngestCli <landingRoot> <configRoot> [keep|archive|delete] [warehouseDir]
  */
object IngestCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.tools.IngestCli <landingRoot> <configRoot> [keep|archive|delete] [warehouseDir]")
      sys.exit(2)
    }
    val landing = args(0)
    val config = args(1)
    val consume = if (args.length > 2) args(2) else "archive"
    if (!Set("keep", "archive", "delete").contains(consume)) {
      System.err.println(s"unknown consume mode '$consume' (keep|archive|delete)")
      sys.exit(2)
    }
    val spark = Graft.session(
      Some(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"),
      warehouse = args.lift(3))
    val results = IngestPipeline.ingest(spark, landing, config, consume)
    results.foreach { t =>
      println(s"""{"db":"${t.db}","table":"${t.table}","rows":${t.rows}}""")
    }
    println(s"""{"ingested_tables":${results.length}}""")
    spark.stop()
  }
}
