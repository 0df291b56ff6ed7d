package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Throwaway experiment harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("scratch")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("scratch-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.sources.{IngestPipeline, SchemaInference, Xlsx}
    // synthesize the bench-shaped workbook: 1 sheet, 10k rows, 4 cols
    val rows = (0 until 10000).map(i =>
      Seq(i.toString, s"name_$i", s"brand_${i % 7}", f"${i * 1.37}%.2f"))
    val xlsxPath = Files.createTempDirectory("scratch-xlsx").resolve("parts.xlsx").toString
    Xlsx.write(xlsxPath, Seq(Xlsx.Sheet("parts",
      Seq("p_partkey", "p_name", "p_brand", "p_retailprice"), rows)))

    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm up JVM/session on a first full pass
    val w = Xlsx.readSheets(xlsxPath)
    val wdf = Xlsx.sheetDf(spark, w.head)
    val ws = SchemaInference.infer(wdf); SchemaInference.coerce(wdf, ws).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val sheets = timeIt("readSheets (parse)")(Xlsx.readSheets(xlsxPath))
      val df = timeIt("sheetDf (local relation)")(Xlsx.sheetDf(spark, sheets.head))
      val schema = timeIt("infer")(SchemaInference.infer(df))
      val coerced = SchemaInference.coerce(df, schema)
      timeIt("append (saveAsTable)") {
        graft.sources.CatalogOps.appendTable(spark, coerced, "scratchdb", s"t$round")
      }
      timeIt("count")(coerced.count())
    }
    spark.stop()
  }
}
