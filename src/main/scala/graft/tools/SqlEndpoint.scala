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

  /** Server-side TLS material: a JKS keystore holding the endpoint's
    * private key + certificate (≡ the reference's HTTPS JDBC keystore,
    * trino/conf/trino/config.properties:9-12 + certs/).
    */
  final case class Ssl(keystore: java.nio.file.Path, keystorePassword: String)

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
    *
    * `ssl`: when set, the thrift socket speaks TLS (`hive.server2.use.SSL`
    * + keystore — the HiveServer2 twin of the reference's HTTPS JDBC,
    * trino/conf/trino/config.properties:9-12 `http-server.https.enabled`
    * with a keystore path; certs in `certs/`). Without it, PASSWORD auth
    * ships credentials in the clear the moment the endpoint leaves
    * localhost — pair them. Clients connect with
    * `jdbc:hive2://host:port/;ssl=true;sslTrustStore=…;trustStorePassword=…`.
    */
  def start(spark: SparkSession, port: Int = 0,
            passwdFile: Option[java.nio.file.Path] = None,
            ssl: Option[Ssl] = None): (Int, HiveServer2) = {
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
    ssl match {
      case Some(Ssl(ks, pw)) =>
        System.setProperty("hive.server2.use.SSL", "true")
        System.setProperty("hive.server2.keystore.path", ks.toString)
        System.setProperty("hive.server2.keystore.password", pw)
      case None =>
        System.setProperty("hive.server2.use.SSL", "false")
    }
    // Embedded Derby workspace for HiveServer2's session state: keep
    // metastore_db/derby.log out of the process CWD.
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        Files.createTempDirectory("graft-derby").toString)
    // With an in-memory catalog (no real metastore configured), pin the
    // HiveServer2 session-state metastore to a FILE-BACKED temp Derby:
    // the `jdbc:derby:memory:;databaseName=…` URL Spark otherwise
    // derives resolves the empty database name against the process CWD
    // on this Derby (10.16: "Directory memory:<cwd> already exists")
    // and the server wedges in metastore-init retries. Guarded so a
    // session with a REAL metastore (Graft.session(warehouse), hive
    // catalog) keeps its own URL untouched.
    val jdoKey = "javax.jdo.option.ConnectionURL"
    if (System.getProperty(jdoKey) == null &&
        !spark.sparkContext.getConf.contains(jdoKey) &&
        spark.sparkContext.getConf
          .get("spark.sql.catalogImplementation", "in-memory") != "hive")
      System.setProperty(jdoKey,
        "jdbc:derby:;databaseName=" +
          Files.createTempDirectory("graft-hs2-ms").resolve("metastore_db") +
          ";create=true")
    // The in-memory-catalog execution client's Derby URL
    // (`jdbc:derby:memory:;databaseName=…`, baked by Spark's
    // newClientForExecution — not overridable from outside) fails its
    // FIRST create on Derby 10.16 and succeeds on a retry once the
    // racing create has landed. The default HMS handler cadence (10
    // attempts × 2000 ms) turns that benign first failure into ~20 s of
    // dead wait PER JDBC CONNECTION; a tight interval keeps the same
    // eventually-succeeds behavior at interactive latency.
    Seq("hive.hmshandler.retry.interval" -> "200ms",
        "hive.metastore.client.connect.retry.delay" -> "1s")
      .foreach { case (k, v) =>
        if (System.getProperty(k) == null) System.setProperty(k, v)
      }
    val server = HiveThriftServer2.startWithSparkSession(spark, exitOnError = false)
    (p, server)
  }

  /** Dev/test keystore generation (self-signed, CN=localhost) via the
    * JDK's own keytool — a deployment brings its own certificate exactly
    * like the reference's `certs/` directory. Writes the server keystore
    * and a client truststore holding just the exported certificate.
    */
  def generateSelfSignedKeystore(keystore: java.nio.file.Path,
      storePass: String, truststore: java.nio.file.Path,
      trustPass: String): Unit = {
    def run(cmd: String*): Unit = {
      val pr = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
      require(pr.waitFor() == 0, s"${cmd.take(2).mkString(" ")} failed:\n$out")
    }
    val keytool = s"${System.getProperty("java.home")}/bin/keytool"
    run(keytool, "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "365", "-dname", "CN=localhost",
      "-keystore", keystore.toString, "-storetype", "JKS",
      "-storepass", storePass, "-keypass", storePass)
    val cert = keystore.resolveSibling("graft-endpoint.cer")
    run(keytool, "-exportcert", "-alias", "graft",
      "-keystore", keystore.toString, "-storepass", storePass,
      "-file", cert.toString)
    run(keytool, "-importcert", "-noprompt", "-alias", "graft",
      "-keystore", truststore.toString, "-storetype", "JKS",
      "-storepass", trustPass, "-file", cert.toString)
  }
}
