package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — contents change per investigation, never library
  * surface. Current probe: per-phase cost of the q94 IVFADC chain at
  * sf0.1 (r14 optimization round — where do its seconds actually go?).
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
    // job-level timing: expose where wall-clock goes (executor jobs vs
    // driver-side gaps between them)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, System.nanoTime())
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(je.jobId)
          val _ = t0
        }
      })

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (q <- Seq("q47_dedup_components")) graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      t("full q47") { graft.SparkEntry.queries("q47_dedup_components")(spark, dir).count() }
      val d = graft.Tables.load(spark, dir, "documents")
      val fp = t("fps checkpoint") { graft.operators.Dedup.fingerprints(d).localCheckpoint() }
      val bands = graft.operators.Dedup.bandIndex(fp)
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.nib") === col("b.nib") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val fa = fp.toDF("doc_id", "fp_a")
      val fb = fp.toDF("doc_id", "fp_b")
      val pairs = cand
        .join(fa, cand("doc_a") === fa("doc_id")).drop("doc_id")
        .join(fb, cand("doc_b") === fb("doc_id")).drop("doc_id")
        .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
        .filter(col("hamming") <= 3)
        .select("doc_a", "doc_b")
      val edges = t("edges checkpoint") {
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .localCheckpoint() }
      var labels = t("labels0") { d.select(col("doc_id").as("id"), col("doc_id").as("label")).localCheckpoint() }
      var iter = 0
      var converged = false
      while (!converged && iter < 25) {
        val nbrMin = edges
          .join(labels.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("label")).as("nbl"))
        val next = t(s"round-$iter ckpt") { labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbl"), col("label"))).as("label"),
            (coalesce(col("nbl"), col("label")) < col("label")).as("chg"))
          .localCheckpoint() }
        converged = t(s"round-$iter conv") { next.filter(col("chg")).isEmpty }
        labels = next
        iter += 1
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
    sys.exit(0)
  }
}
