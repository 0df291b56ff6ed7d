package graft.tools

import java.net.ServerSocket
import java.nio.file.Files

import org.apache.hive.service.server.HiveServer2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** Network SQL endpoint ≡ the reference's JDBC surface: the reference hands
  * its entire analytical interface to JDBC clients (README.md:74-76 lists
  * `jdbc:trino://localhost:8060` and a Postgres endpoint;
  * docker-compose.yml:103-105 exposes the ports; the documented workflow is
  * DataGrip/Metabase connecting in, README.md:53-58). This starts Spark's
  * HiveServer2-protocol thrift server ON the given session — every catalog
  * table, view, and registered function of the engine becomes reachable at
  * `jdbc:hive2://host:port/` by any BI tool with a Hive/Spark JDBC driver.
  *
  * Scale note: the thrift server is a thin session/protocol layer; query
  * execution is the same Catalyst/Tungsten path the library API uses, so a
  * dashboard query through JDBC gets identical plans (broadcasts, AQE,
  * rollup rewrites) to the in-process `SqlMagic` REPL.
  */
object SqlEndpoint {

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Start the JDBC endpoint on `port` (0 = pick a free port). Returns
    * (boundPort, server); `server.stop()` shuts it down. (The concrete
    * HiveThriftServer2 type is private[hive] — callers get the public
    * HiveServer2 supertype, which carries stop().)
    *
    * `passwdFile`: when set, the endpoint requires SASL PLAIN credentials
    * checked against that file (see [[PasswdAuth]]) ≡ the reference's
    * password-protected Trino endpoint
    * (trino/conf/trino/config.properties:15,
    * password-authenticator.properties:1-2). When None the server stays
    * open-auth, matching the reference's unauthenticated Postgres port.
    */
  def start(spark: SparkSession, port: Int = 0,
            passwdFile: Option[java.nio.file.Path] = None): (Int, HiveServer2) = {
    val p = if (port == 0) freePort() else port
    // HiveConf applies "hive.*" system properties on construction — the
    // reliable way to reach the server conf from outside spark-submit.
    System.setProperty("hive.server2.thrift.port", p.toString)
    System.setProperty("hive.server2.thrift.bind.host", "localhost")
    passwdFile match {
      case Some(f) =>
        System.setProperty("hive.server2.authentication", "CUSTOM")
        System.setProperty("hive.server2.custom.authentication.class",
          classOf[PasswdAuth].getName)
        System.setProperty(PasswdAuth.PASSWD_FILE_PROP, f.toString)
      case None =>
        System.setProperty("hive.server2.authentication", "NONE")
    }
    // Embedded Derby workspace for HiveServer2's session state: keep
    // metastore_db/derby.log out of the process CWD.
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        Files.createTempDirectory("graft-derby").toString)
    val server = HiveThriftServer2.startWithSparkSession(spark, exitOnError = false)
    (p, server)
  }
}
