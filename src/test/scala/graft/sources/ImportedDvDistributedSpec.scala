package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The r9 interop-DV scale contract: position marks stay DISTRIBUTED
  * end-to-end through import staging — the driver holds the DV'd file
  * list and descriptor tuples, never a position set. Machine-checked the
  * only way a driver materialization is observable from inside the JVM:
  * Spark ships every collect()'d row to the driver as TASK RESULTS, so
  * `taskMetrics.resultSize` summed over the staging jobs bounds what the
  * driver ever received. Millions of marks (tens of MB if collected)
  * must stage with KB–low-MB total result traffic.
  */
class ImportedDvDistributedSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-dvdist").toString

  /** Total task-result bytes shipped to the driver while `f` runs. */
  private def resultBytesDuring(f: => Unit): Long = {
    val got = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        got.addAndGet(t.taskMetrics.resultSize)
    }
    spark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(500) } // listener bus drains asynchronously
    finally spark.sparkContext.removeSparkListener(l)
    got.get()
  }

  test("stageImportedDvs stages millions of marks with bounded driver " +
      "result traffic and one exact, ascending DV parquet per file") {
    val root = tmp()
    val files = (0 until 3).map(i => s"/abs/f$i.parquet")
    // 3M marks built distributed — never an Array[Long] anywhere
    val marks = spark.range(0, 3000000L).selectExpr(
      s"element_at(array(${files.map(f => s"'$f'").mkString(",")}), " +
        "CAST(id % 3 AS INT) + 1) AS file",
      "id div 3 AS pos")
    var dvs: Map[String, String] = Map.empty
    val resultBytes = resultBytesDuring {
      dvs = CommitLog.stageImportedDvs(spark, root, marks)
    }
    assert(dvs.keySet == files.toSet)
    // 3M positions are 24 MB of longs (plus file strings) if collected;
    // the distributed write keeps driver results orders smaller
    assert(resultBytes < 4L * 1024 * 1024,
      s"staging shipped $resultBytes bytes of task results to the " +
        "driver — the marks are being materialized")
    dvs.foreach { case (_, rel) =>
      val ps = spark.read.parquet(s"$root/$rel")
      val agg = ps.agg(count(lit(1)), min(col("pos")), max(col("pos")),
        count_distinct(col("pos"))).collect()(0)
      assert(agg.getLong(0) == 1000000L, rel)
      assert(agg.getLong(1) == 0L && agg.getLong(2) == 999999L)
      assert(agg.getLong(3) == 1000000L) // dedupe preserved distinctness
    }
  }

  test("duplicate marks dedupe in the staging shuffle, not on the driver") {
    val root = tmp()
    val marks = spark.range(0, 1000L)
      .selectExpr("'/abs/one.parquet' AS file", "id % 100 AS pos")
    val dvs = CommitLog.stageImportedDvs(spark, root, marks)
    val ps = spark.read.parquet(s"$root/${dvs("/abs/one.parquet")}")
    assert(ps.count() == 100L)
    assert(ps.agg(max(col("pos"))).collect()(0).getLong(0) == 99L)
  }

  test("a DeltaImport with a large deletion vector decodes executor-side " +
      "(driver result traffic stays bounded) and reads row-exactly") {
    import java.nio.file.Paths
    val d = tmp(); val root = tmp()
    val n = 400000L
    // one data file of n rows; a DV killing every third row (133k+
    // positions ≈ 1 MB of longs if collected — threshold catches it)
    val df = spark.range(n).selectExpr("id", "id * 2 AS v")
      .coalesce(1).sortWithinPartitions("id")
    val t = Files.createTempDirectory("graft-dvbig")
    df.write.mode("overwrite").parquet(t.toString)
    import scala.jdk.CollectionConverters._
    Files.move(Files.list(t).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get,
      Paths.get(d, "big.parquet"))
    val dead = (0L until n).filter(_ % 3 == 0).toArray
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val (off, dvLen) = interop.DeltaDv.writeDvFile(
      Paths.get(d, s"deletion_vector_$uuid.bin"), dead)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def line(b: com.fasterxml.jackson.databind.node.ObjectNode => Unit) = {
      val o = om.createObjectNode(); b(o); om.writeValueAsString(o)
    }
    val log = Paths.get(d, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"), Seq(
      line { o =>
        val p = o.putObject("protocol")
        p.put("minReaderVersion", 3); p.put("minWriterVersion", 7)
        p.putArray("readerFeatures").add("deletionVectors")
        p.putArray("writerFeatures").add("deletionVectors")
      },
      line { o =>
        val m = o.putObject("metaData")
        m.put("id", "big"); m.put("schemaString", df.schema.json)
        m.putObject("format").put("provider", "parquet")
        m.putArray("partitionColumns")
      },
      line { o =>
        val a = o.putObject("add")
        a.put("path", "big.parquet"); a.put("dataChange", true)
        a.put("size", 1L); a.put("modificationTime", 0L)
        a.putObject("partitionValues")
        a.put("stats", s"""{"numRecords":$n}""")
        val dv = a.putObject("deletionVector")
        dv.put("storageType", "u")
        dv.put("pathOrInlineDv", interop.DeltaDv.z85Encode(bb.array()))
        dv.put("offset", off); dv.put("sizeInBytes", dvLen)
        dv.put("cardinality", dead.length.toLong)
      }).mkString("\n").getBytes("UTF-8"))
    val resultBytes = resultBytesDuring {
      interop.DeltaImport.importTable(spark, d, root)
    }
    assert(resultBytes < 768L * 1024,
      s"import shipped $resultBytes bytes of task results to the driver " +
        "— DV positions are being materialized")
    val got = CommitLog.read(spark, root)
    assert(got.count() == n - dead.length)
    assert(got.filter(col("id") % 3 === 0).count() == 0L)
    assert(got.agg(sum(col("v"))).collect()(0).getLong(0) ==
      (0L until n).filterNot(_ % 3 == 0).map(_ * 2).sum)
  }
}
