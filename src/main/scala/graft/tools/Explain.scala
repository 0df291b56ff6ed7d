package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: print the formatted physical plan of registered queries.
  * Usage: dev/run.sh graft.tools.Explain [sfDir] q04_star_join ...
  * (no names → all queries). Used to audit pushdown (`PushedFilters`,
  * `ReadSchema`), join strategies (broadcast vs sort-merge), and
  * whole-stage-codegen coverage per SURVEY.md §4.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = args.toSeq match {
      case d +: rest if d.startsWith("/") => (d, rest)
      case rest                           => ("/root/testdata/sf0.01", rest)
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      // same extension surface as Bench/Verify — queries that issue
      // commitlog SQL DML (q106 et al.) need the rewrite rules to plan
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the 2026-08 testdata regen switched events.ts from TIMESTAMP(NANOS)
      // to TIMESTAMP(MICROS, isAdjustedToUTC=false); without this, Spark
      // infers TIMESTAMP_NTZ and unix_micros()-based operators stop
      // resolving. Reading it as LTZ epoch-micros matches the DuckDB
      // oracle's naive-micros view under the UTC session tz.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // fresh warehouse per JVM — queries that build managed tables while
      // constructing their frame (q103) must not pollute the CWD
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-explain-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names
    sel.foreach { q =>
      println(s"\n========== $q ==========")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
