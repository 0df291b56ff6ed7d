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
          if (t0 != 0L)
            println(f"    job ${je.jobId}%4d: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      })

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // warmup staging + one full q191 at sf0.001 then at dir
    graft.SparkEntry.queries("q191_pgwire_txn_merge")(spark, "/root/testdata/sf0.001").count()
    graft.SparkEntry.queries("q191_pgwire_txn_merge")(spark, dir).count()
    // hand-unrolled q191 with phase timers (mirrors ReferenceCubes)
    val m = classOf[graft.semantic.ReferenceCubes.type]
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      import graft.sources.{CatalogOps, CommitLog}
      // fixture already staged by the warmup call
      val fx = {
        val f = graft.semantic.ReferenceCubes.getClass.getDeclaredMethod(
          "pgDmlFixture", classOf[SparkSession], classOf[String])
        f.setAccessible(true)
        f.invoke(graft.semantic.ReferenceCubes, spark, dir)
          .asInstanceOf[(String, String, String)]
      }
      val port = {
        val f = graft.semantic.ReferenceCubes.getClass.getDeclaredMethod(
          "pgDmlPort", classOf[SparkSession])
        f.setAccessible(true)
        f.invoke(graft.semantic.ReferenceCubes, spark).asInstanceOf[Int]
      }
      val (db, baseRoot, _) = fx
      val root = t("clone") {
        val r = Files.createTempDirectory("scratch-q191").toString
        CommitLog.shallowClone(baseRoot, r); r }
      val tbl = "ordm_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      t("catalog DDL") { CatalogOps.createCommitLogTable(spark, db, tbl, root) }
      try {
        t("block1 MERGE+DELETE+COMMIT") {
          graft.tools.PgWire.queryOnce("127.0.0.1", port, "cube", "wire-check",
            s"""USE $db;
               |BEGIN;
               |MERGE INTO $tbl t USING msrc src
               |  ON t.o_orderkey = src.o_orderkey
               |  WHEN MATCHED THEN UPDATE SET *
               |  WHEN NOT MATCHED THEN INSERT *;
               |DELETE FROM $tbl WHERE o_custkey % 11 = 0;
               |COMMIT""".stripMargin) }
        t("block2 MERGE+ROLLBACK") {
          graft.tools.PgWire.queryOnce("127.0.0.1", port, "cube", "wire-check",
            s"""USE $db;
               |BEGIN;
               |MERGE INTO $tbl t USING msrc src
               |  ON t.o_orderkey = src.o_orderkey
               |  WHEN MATCHED THEN UPDATE SET *;
               |ROLLBACK""".stripMargin) }
        t("final SELECT") {
          graft.tools.PgWire.queryOnce("127.0.0.1", port, "cube", "wire-check",
            s"""SELECT o_custkey % 10 AS bucket, count(*) AS n,
               |  sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
               |FROM $db.$tbl
               |GROUP BY o_custkey % 10
               |ORDER BY bucket""".stripMargin) }
      } finally spark.sql(s"DROP TABLE IF EXISTS $db.`$tbl`")
    }
    spark.stop()
    sys.exit(0)
  }
}
