package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.types._

/** Streaming file-source ≡ cron+consume orchestration (SURVEY.md §2a #5/#19). */
class FileStreamIngestSpec extends SparkTestBase {

  test("AvailableNow drains present files into a table exactly once") {
    val dir = Files.createTempDirectory("stream-in")
    val archive = Files.createTempDirectory("stream-archive")
    val ckpt = Files.createTempDirectory("stream-ckpt")
    Files.write(dir.resolve("a.csv"),
      "k,v\n1,10\n2,20\n".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.csv"),
      "k,v\n3,30\n".getBytes(StandardCharsets.UTF_8))

    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    spark.sql("DROP TABLE IF EXISTS stream_sink")

    val src = FileStreamIngest.source(spark, dir.toString, schema,
      archiveDir = Some(archive.toString))
    FileStreamIngest.runAvailableNow(src, "stream_sink", ckpt.toString)
    assert(spark.table("stream_sink").count() == 3L)

    // second firing with no new files ingests nothing (checkpoint log)
    val src2 = FileStreamIngest.source(spark, dir.toString, schema,
      archiveDir = Some(archive.toString))
    FileStreamIngest.runAvailableNow(src2, "stream_sink", ckpt.toString)
    assert(spark.table("stream_sink").count() == 3L)

    // new file on the next firing is picked up (≡ next cron tick)
    Files.write(dir.resolve("c.csv"),
      "k,v\n4,40\n".getBytes(StandardCharsets.UTF_8))
    val src3 = FileStreamIngest.source(spark, dir.toString, schema,
      archiveDir = Some(archive.toString))
    FileStreamIngest.runAvailableNow(src3, "stream_sink", ckpt.toString)
    assert(spark.table("stream_sink").count() == 4L)
  }
}
