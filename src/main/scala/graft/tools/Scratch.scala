package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Throwaway experiment harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("scratch-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Does the BUILT-IN Spark 4.1.2 grammar (no graft extensions) parse
    // constraint DDL? Decides whether MaintenanceParser's regex intercept
    // can shadow a native statement.
    val p = spark.sessionState.sqlParser
    for (sql <- Seq(
      "ALTER TABLE t ADD CONSTRAINT c1 CHECK (x > 0)",
      "ALTER TABLE t DROP CONSTRAINT c1",
      "OPTIMIZE t",
      "VACUUM t RETAIN 168 HOURS",
      "DESCRIBE HISTORY t",
      "RESTORE TABLE t TO VERSION AS OF 3")) {
      try println(s"OK   $sql  ->  ${p.parsePlan(sql).getClass.getSimpleName}")
      catch {
        case e: Exception =>
          println(s"FAIL $sql  ->  ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
    }
    spark.stop()
  }
}
