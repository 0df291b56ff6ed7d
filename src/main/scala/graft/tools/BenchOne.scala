package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated per-query timing: `dev/run.sh graft.tools.BenchOne [sfDir] q…`
  * runs ONLY the named queries (sf0.001 warmup, then N timed runs each)
  * so a single query's cost can be read without the full-suite noise the
  * shared-host bench is exposed to.
  *
  * SF-dir resolution (the r10 footgun, fixed): an explicit directory
  * argument wins; otherwise `SPARK_GRAFT_SF_DIR` (the same env var
  * [[graft.Bench]] honors); otherwise sf0.1. Anything that is neither a
  * directory nor a registered query name fails LOUDLY up front instead
  * of surfacing as a suppressed NoSuchElementException mid-run, and the
  * header prints the resolved dir so a capture records what it measured.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toList match {
      case d :: rest if java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)) =>
        (d, rest)
      case rest =>
        (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), rest)
    }
    require(names.nonEmpty,
      "usage: BenchOne [sfDir] <query…> (or SPARK_GRAFT_SF_DIR=…)")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"not a directory or registered query: ${unknown.mkString(", ")} " +
        s"(sf dir resolved to $dir; ${graft.SparkEntry.queries.size} queries registered)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the 2026-08 testdata regen switched events.ts from TIMESTAMP(NANOS)
      // to TIMESTAMP(MICROS, isAdjustedToUTC=false); without this, Spark
      // infers TIMESTAMP_NTZ and unix_micros()-based operators stop
      // resolving. Reading it as LTZ epoch-micros matches the DuckDB
      // oracle's naive-micros view under the UTC session tz.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.cleaner.periodicGC.interval", "2min")
      // fresh warehouse per JVM — a stale CWD spark-warehouse breaks the
      // managed-table queries (same guard as Bench/Verify)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-benchone-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val rowCount = try graft.Tables.load(spark, dir, "lineitem").count()
      catch { case scala.util.control.NonFatal(_) => -1L }
    println(s"BenchOne: sfDir=$dir (lineitem rows=$rowCount) runs=$nRuns " +
      s"queries=${names.mkString(",")}")
    for (q <- names) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").count() // JIT/codegen warmup
      for (i <- 1 to nRuns) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
    sys.exit(0) // see graft.Verify — pooled sessions pin server threads
  }
}
