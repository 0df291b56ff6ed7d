package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — contents change per investigation, never library
  * surface. Current probe: per-JOB cost of the CommitLog write path at
  * sf0.1 (r15 optimization round — where do the per-commit seconds go?).
  * Runs the named queries once with a job listener that prints every
  * Spark job (id, seconds, description) plus the driver-side gap since
  * the previous job ended — the gaps are the driver-side manifest/stats
  * work the scaling block says dominates.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scratch")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SCRATCH_AQE","true"))
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("scratch-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var lastEnd = System.nanoTime()
    val t00 = System.nanoTime()
    val taskNs = new java.util.concurrent.atomic.AtomicLong()
    val taskCnt = new java.util.concurrent.atomic.AtomicLong()
    val deserNs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          Option(te.taskMetrics).foreach { m =>
            taskNs.addAndGet(m.executorRunTime * 1000000L)
            deserNs.addAndGet(m.executorDeserializeTime * 1000000L)
            taskCnt.incrementAndGet()
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val rt = si.taskMetrics.executorRunTime / 1e3
          if (rt > 0.3)
            println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d " +
              f"runTime=${rt}%6.2f s  ${si.name.take(100)}")
        }
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          starts.put(js.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val now = System.nanoTime()
          Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
            val gap = (t0 - lastEnd) / 1e9
            println(f"JOB ${je.jobId}%4d at ${(t0 - t00) / 1e9}%7.2f " +
              f"gap=${gap}%6.3f dur=${(now - t0) / 1e9}%6.3f  ${desc.take(110)}")
          }
          lastEnd = now
        }
      })
    def snapTasks(label: String): Unit =
      println(f"TASKS $label: n=${taskCnt.getAndSet(0)} " +
        f"runTime=${taskNs.getAndSet(0) / 1e9}%.2f s " +
        f"deser=${deserNs.getAndSet(0) / 1e9}%.2f s")

    val dir = args.headOption.filter(a =>
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(a)))
      .getOrElse("/root/testdata/sf0.1")
    val names = (if (args.nonEmpty &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(args.head)))
      args.drop(1) else args).toSeq
    require(names.nonEmpty, "usage: Scratch [sfDir] <query...>")
    if (names == Seq("microtag")) {
      // per-row cost of the tagged-read machinery over a 150k-row parquet
      import org.apache.spark.sql.functions._
      val src = s"$dir/orders.parquet"
      def canon = url_decode(regexp_replace(
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/"), "\\+", "%2B"))
      def run(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        // noop sink: count() would prune the tag columns away (§1.4)
        def once(): Unit =
          df.write.format("noop").mode("overwrite").save()
        once() // warm
        val t0 = System.nanoTime()
        (1 to 5).foreach(_ => once())
        println(f"MICRO $label: ${(System.nanoTime() - t0) / 5e9}%.3f s/run")
      }
      run("plain scan")(spark.read.parquet(src))
      run("with row_index")(spark.read.parquet(src)
        .withColumn("p", col("_metadata.row_index")))
      run("with file_path raw")(spark.read.parquet(src)
        .withColumn("f", col("_metadata.file_path"))
        .withColumn("p", col("_metadata.row_index")))
      run("with canonical decode")(spark.read.parquet(src)
        .withColumn("f", canon)
        .withColumn("p", col("_metadata.row_index")))
      run("canonical + filter")(spark.read.parquet(src)
        .withColumn("f", canon)
        .withColumn("p", col("_metadata.row_index"))
        .filter(col("o_totalprice") > 100000.0))
      run("native canonical")(spark.read.parquet(src)
        .withColumn("f", org.apache.spark.sql.GraftBridge.column(
          graft.functions.CanonicalPath(
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
              Seq("_metadata", "file_path")))))
        .withColumn("p", col("_metadata.row_index")))
      spark.stop(); sys.exit(0)
    }
    if (names == Seq("microappend")) {
      // per-commit cost split: full append vs sums-off append
      import graft.sources.CommitLog
      import org.apache.spark.sql.functions.col
      val ev = graft.Tables.load(spark, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      def t[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        val r1 = Files.createTempDirectory("scr-append-on").toString
        t("append sums-on")(CommitLog.append(ev, r1))
        spark.conf.set("spark.graft.sums.columns", "")
        val r2 = Files.createTempDirectory("scr-append-off").toString
        t("append sums-off")(CommitLog.append(ev, r2))
        spark.conf.unset("spark.graft.sums.columns")
      }
      spark.stop(); sys.exit(0)
    }
    if (names == Seq("microxlsx")) {
      // where does the xlsx ingest second go? synthesize the bench fixture
      // and time each phase
      import graft.sources.{IngestPipeline, Xlsx, SchemaInference, CatalogOps}
      val work = Files.createTempDirectory("scratch-xlsx")
      val partRows = graft.Tables.load(spark, dir, "part")
        .selectExpr("p_partkey", "p_name", "p_brand", "p_retailprice")
        .limit(10000).collect()
        .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      val f = s"$work/parts_bench.xlsx"
      Xlsx.write(f, Seq(Xlsx.Sheet("parts",
        Seq("p_partkey", "p_name", "p_brand", "p_retailprice"),
        partRows.toIndexedSeq)))
      def t[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        val land = Files.createDirectories(
          java.nio.file.Paths.get(s"$work/land$round/sales")).getParent.toString
        java.nio.file.Files.copy(java.nio.file.Paths.get(f),
          java.nio.file.Paths.get(s"$land/sales/parts_bench.xlsx"))
        val conf = Files.createDirectories(
          java.nio.file.Paths.get(s"$work/conf$round")).toString
        val rows = t("ingest-e2e")(IngestPipeline
          .ingest(spark, land, conf, consume = "keep").map(_.rows).sum)
        println(s"rows=$rows")
      }
      spark.stop(); sys.exit(0)
    }
    for (q <- names) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").count() // warmup
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(s"=== $q (timed, $dir) ===")
      snapTasks("pre")
      lastEnd = System.nanoTime()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"=== $q total ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows) ===")
      snapTasks(q)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
    sys.exit(0)
  }
}
