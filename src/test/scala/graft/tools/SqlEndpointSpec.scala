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

    // The endpoint requires credentials ≡ the reference's password-protected
    // Trino port (trino/conf/trino/config.properties:15 PASSWORD auth +
    // password-authenticator.properties file). One server per JVM
    // (HiveThriftServer2 doesn't rebind after stop), so auth and the query
    // battery share this single instance.
    val pwFile = java.nio.file.Files.createTempFile("graft-ep-passwd", "")
    PasswdAuth.writePasswordFile(pwFile, Map("analyst" -> "s3cret"))
    val (port, server) = SqlEndpoint.start(spark, passwdFile = Some(pwFile))
    try {
      // server binds asynchronously; poll the socket until it accepts
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var conn: java.sql.Connection = null
      while (conn == null) {
        try conn = DriverManager.getConnection(url, "analyst", "s3cret")
        catch {
          case e: Exception if System.nanoTime() < deadline => Thread.sleep(500)
        }
      }
      try {
        // Wrong password and unknown user must be REJECTED by the live
        // server (not just by the file check): the SASL PLAIN handshake
        // surfaces PasswdAuth's AuthenticationException as a SQLException.
        intercept[java.sql.SQLException] {
          DriverManager.getConnection(url, "analyst", "wrong")
        }
        intercept[java.sql.SQLException] {
          DriverManager.getConnection(url, "nobody", "s3cret")
        }
        val rs = conn.createStatement().executeQuery(
          "SELECT count(*) AS n, sum(v) AS s FROM endpoint_rt")
        assert(rs.next())
        assert(rs.getLong(1) == 3L)
        assert(rs.getLong(2) == 30L) // 0 + 10 + 20
        assert(!rs.next())

        // Semantic layer over the socket ≡ cube.dev's SQL port persona
        // (conf/cube/.env:9-11): register the events cube as a session
        // view; the external JDBC client SELECTs and further rolls it up.
        graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
          .createOrReplaceTempView("events")
        val cubeViews = graft.semantic.CubeViews.register(spark, grain = "month")
        assert(cubeViews.contains("global_temp.events_cube"))
        val inProc = spark.table("global_temp.events_cube").count()
        val rsCube = conn.createStatement().executeQuery(
          "SELECT count(*) AS n, sum(n) AS rows_total FROM global_temp.events_cube")
        assert(rsCube.next())
        assert(rsCube.getLong(1) == inProc && inProc > 0)
        assert(rsCube.getLong(2) == spark.table("events").count())

        // Same server, CommitLog catalog table: the external client both
        // QUERIES the snapshot and ISSUES DML that must land as an atomic
        // commit in the log — the reference persona's Trino-issued INSERT
        // (assets.py:105-114), end to end over a real socket. (One server
        // per JVM: HiveThriftServer2 doesn't rebind after stop.)
        import graft.sources.{CatalogOps, CommitLog}
        val root = java.nio.file.Files.createTempDirectory("graft-ep-cl").toString
        CommitLog.append(spark.range(4).selectExpr("id", "id * 2 AS v"), root)
        CatalogOps.createCommitLogTable(spark, "lake", "ep_cl", root)
        try {
          val st = conn.createStatement()
          val rs2 = st.executeQuery("SELECT count(*) AS n, sum(v) AS s FROM lake.ep_cl")
          assert(rs2.next() && rs2.getLong(1) == 4L && rs2.getLong(2) == 12L)
          st.execute("INSERT INTO lake.ep_cl SELECT id, id * 2 AS v FROM range(4, 6)")
          assert(CommitLog.currentVersion(root).contains(2L))
          assert(CommitLog.readManifest(root, 2L).op == "append")
          val rs3 = st.executeQuery("SELECT count(*) AS n FROM lake.ep_cl")
          assert(rs3.next() && rs3.getLong(1) == 6L)

          // Row-level DML as SQL over the same socket — the capability the
          // reference persona exercises through its JDBC endpoints
          // (assets.py:105-114 issues DML text): MERGE upserts one row,
          // deletes one, inserts one, all in one atomic commit.
          st.execute(
            """MERGE INTO lake.ep_cl t USING (
              |  SELECT 0L AS id, -1L AS v UNION ALL
              |  SELECT 1L, 0L UNION ALL
              |  SELECT 100L, 100L) src
              |ON t.id = src.id
              |WHEN MATCHED AND src.v = 0 THEN DELETE
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          assert(CommitLog.currentVersion(root).contains(3L))
          assert(CommitLog.readManifest(root, 3L).op == "merge")
          val rs4 = st.executeQuery(
            "SELECT count(*) AS n, sum(v) AS s FROM lake.ep_cl")
          // rows: {0→-1, 2..5 unchanged (4,6,8,10), 100}; id=1 deleted
          assert(rs4.next() && rs4.getLong(1) == 6L &&
            rs4.getLong(2) == (-1L + 4L + 6L + 8L + 10L + 100L))
          st.execute("UPDATE lake.ep_cl SET v = 999 WHERE id = 100")
          st.execute("DELETE FROM lake.ep_cl WHERE id = 0")
          val rs5 = st.executeQuery(
            "SELECT count(*) AS n, max(v) AS m FROM lake.ep_cl")
          assert(rs5.next() && rs5.getLong(1) == 5L && rs5.getLong(2) == 999L)

          // time travel through plain SQL, same connection
          val rs6 = st.executeQuery(
            "SELECT count(*) AS n FROM lake.ep_cl VERSION AS OF 1")
          assert(rs6.next() && rs6.getLong(1) == 4L)

          // table maintenance through plain SQL: OPTIMIZE returns the new
          // version, VACUUM runs, the table still reads
          val rs7 = st.executeQuery("OPTIMIZE lake.ep_cl")
          assert(rs7.next() && rs7.getLong(1) > 1L)
          st.execute("VACUUM lake.ep_cl RETAIN 168 HOURS")
          val rs8 = st.executeQuery("SELECT count(*) AS n FROM lake.ep_cl")
          assert(rs8.next() && rs8.getLong(1) == 5L)

          // deletion vectors over the socket: the client flips the session
          // flag, DELETE lands merge-on-read, DESCRIBE DETAIL reports the
          // DV, REORG purges it — the full MoR lifecycle from plain JDBC
          st.execute("SET spark.graft.commitlog.deletionVectors=true")
          st.execute("DELETE FROM lake.ep_cl WHERE id = 2")
          st.execute("SET spark.graft.commitlog.deletionVectors=false")
          assert(CommitLog.readManifest(root,
            CommitLog.currentVersion(root).get).op == "delete-dv")
          val det = st.executeQuery("DESCRIBE DETAIL lake.ep_cl")
          assert(det.next())
          assert(det.getLong(det.findColumn("num_deletion_vectors")) == 1L)
          assert(det.getLong(det.findColumn("num_rows")) == 4L)
          val rs9 = st.executeQuery("REORG TABLE lake.ep_cl APPLY (PURGE)")
          assert(rs9.next())
          val det2 = st.executeQuery("DESCRIBE DETAIL lake.ep_cl")
          assert(det2.next())
          assert(det2.getLong(det2.findColumn("num_deletion_vectors")) == 0L)
          val rs10 = st.executeQuery("SELECT count(*) AS n FROM lake.ep_cl")
          assert(rs10.next() && rs10.getLong(1) == 4L)
        } finally spark.sql("DROP TABLE IF EXISTS lake.ep_cl")
      } finally conn.close()
    } finally {
      server.stop()
      spark.sql("DROP TABLE IF EXISTS endpoint_rt")
    }
  }
}
