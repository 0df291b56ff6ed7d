package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — contents change per investigation, never library
  * surface. Current probe: footer stats for >4KB strings + MICROS override.
  */
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
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val big = "x" * 5000
    val df = Seq((1, big + "a"), (2, big + "b")).toDF("i", "t")
      .withColumn("ts", to_timestamp(lit("2024-03-01 10:11:12.123456")))
      .withColumn("mixnan", when(col("i") === 1, lit(Float.NaN)).otherwise(lit(2.5f)))
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/footerprobe2")
    val f = Files.list(java.nio.file.Paths.get("/tmp/footerprobe2")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    r.getFooter.getBlocks.forEach { b =>
      b.getColumns.forEach { c =>
        val st = c.getStatistics
        println(s"col=${c.getPath} prim=${c.getPrimitiveType.getPrimitiveTypeName} " +
          s"empty=${st.isEmpty} hasNonNull=${st.hasNonNullValue} nullsSet=${st.isNumNullsSet} " +
          s"min=${if (st.hasNonNullValue) String.valueOf(st.genericGetMin).take(20) else "-"} " +
          s"max=${if (st.hasNonNullValue) String.valueOf(st.genericGetMax).take(20) else "-"}")
      }
    }
    r.close()
    spark.stop()
  }
}
