package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — contents change per investigation, never library
  * surface. Current probe: per-phase cost of a federated JDBC read
  * against the in-process thrift endpoint (q186/q188/q189 bench floor).
  */
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.sources.{CatalogOps, CommitLog}
    val root = Files.createTempDirectory("scratch-fed").toString
    CommitLog.append(spark.range(25).selectExpr("id AS k", "id % 5 AS g"), root)
    CatalogOps.createCommitLogTable(spark, "scrdb", "t", root)
    val (port, server) = t("endpoint-start") { SqlEndpoint.start(spark) }
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val url = s"jdbc:hive2://localhost:$port/default"
    t("first-conn-poll") {
      var conn: java.sql.Connection = null
      while (conn == null) {
        try conn = java.sql.DriverManager.getConnection(url, "anonymous", "")
        catch { case _: Exception => Thread.sleep(200) }
      }
      conn.close()
    }
    for (i <- 1 to 3) {
      val c = t(s"conn$i-open") {
        java.sql.DriverManager.getConnection(url, "anonymous", "")
      }
      t(s"conn$i-stmt") {
        val st = c.createStatement()
        val rs = st.executeQuery("SELECT count(*) FROM scrdb.t")
        rs.next(); rs.close(); st.close()
      }
      c.close()
    }
    // the exact shapes Spark's JDBC relation generates, issued directly
    val c2 = java.sql.DriverManager.getConnection(url, "anonymous", "")
    t("direct-probe-prepared") {
      val ps = c2.prepareStatement(
        "SELECT * FROM scrdb.t WHERE 1=0")
      ps.executeQuery().close(); ps.close()
    }
    t("direct-scan-prepared") {
      val ps = c2.prepareStatement(
        "SELECT `k`,`g` FROM scrdb.t")
      val rs = ps.executeQuery()
      while (rs.next()) ()
      rs.close(); ps.close()
    }
    c2.close()
    for (i <- 1 to 2) {
      val df = t(s"read$i-load") {
        graft.sources.interop.JdbcFederation.readTable(spark, url, "scrdb.t")
      }
      if (i == 2) {
        val dumper = new Thread(() => {
          Thread.sleep(2500)
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
            val s = st.map(_.toString)
            if (s.exists(x => x.contains("CloseSession") ||
                x.contains("closeSession") || x.contains("SessionState")))
              println(s"THREAD ${th.getName}:\n  " + s.take(35).mkString("\n  "))
          }
        })
        dumper.setDaemon(true); dumper.start()
      }
      t(s"read$i-count") { df.count() }
    }
    server.stop()
    spark.stop()
    sys.exit(0)
  }
}
