package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Single-query Verify for fast oracle iteration:
  * `dev/run.sh graft.tools.VerifyOne <query> <sfDir> <outDir>` writes the
  * one result parquet plus an `oracle_sql.json` holding just that query, so
  * `dev/compare.py <sfDir> <outDir>` checks it in seconds instead of
  * sweeping the whole registry.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .appName("graft-verify-one")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-verifyone-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    Files.createDirectories(Paths.get(outDir))
    fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
    val oracle = SparkEntry.oracleSql.get(name)
      .map(sql => s"""{"$name": ${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(sql)}}""")
      .getOrElse("{}")
    Files.write(Paths.get(outDir, "oracle_sql.json"), oracle.getBytes("UTF-8"))
    println(s"wrote $outDir/$name (oracle: ${SparkEntry.oracleSql.contains(name)})")
    spark.stop()
    sys.exit(0) // see graft.Verify — pooled sessions pin server threads
  }
}
