package graft.tools

import java.sql.DriverManager

import graft.SparkTestBase

/** JDBC round trip over the network SQL endpoint: a managed table written
  * through the session catalog must be queryable by an external JDBC client
  * over a real socket — the reference's DataGrip/Metabase workflow
  * (README.md:53-58, 74-76).
  */
class SqlEndpointSpec extends SparkTestBase {

  test("JDBC client connects over a socket and round-trips a query") {
    spark.range(3).selectExpr("id", "id * 10 AS v")
      .write.mode("overwrite").saveAsTable("endpoint_rt")

    val (port, server) = SqlEndpoint.start(spark)
    try {
      // server binds asynchronously; poll the socket until it accepts
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var conn: java.sql.Connection = null
      while (conn == null) {
        try conn = DriverManager.getConnection(url, "anonymous", "")
        catch {
          case e: Exception if System.nanoTime() < deadline => Thread.sleep(500)
        }
      }
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT count(*) AS n, sum(v) AS s FROM endpoint_rt")
        assert(rs.next())
        assert(rs.getLong(1) == 3L)
        assert(rs.getLong(2) == 30L) // 0 + 10 + 20
        assert(!rs.next())
      } finally conn.close()
    } finally {
      server.stop()
      spark.sql("DROP TABLE IF EXISTS endpoint_rt")
    }
  }
}
