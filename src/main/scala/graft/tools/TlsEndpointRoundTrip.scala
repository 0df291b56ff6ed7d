package graft.tools

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

/** Child-JVM driver for SqlEndpointTlsSpec (HiveThriftServer2 binds once
  * per JVM, and the plaintext SqlEndpointSpec owns the test JVM's server —
  * same pattern as CatalogRoundTrip): start the endpoint with TLS +
  * PASSWORD auth ≡ the reference's HTTPS JDBC
  * (trino/conf/trino/config.properties:9-15 — https enabled, keystore,
  * PASSWORD authenticator; certs in certs/), then prove from a real client
  * socket that
  *   1. the handshake + query succeed WITH the right truststore,
  *   2. a client WITHOUT the certificate fails the handshake loudly,
  *   3. wrong credentials are still rejected INSIDE the TLS tunnel.
  * Prints TLS_ROUNDTRIP_* markers the spec asserts on.
  */
object TlsEndpointRoundTrip {
  def main(args: Array[String]): Unit = {
    val dir = Files.createTempDirectory("graft-tls")
    val ks = dir.resolve("server.jks")
    val ts = dir.resolve("client-trust.jks")
    SqlEndpoint.generateSelfSignedKeystore(ks, "kspass123", ts, "tspass123")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tls-endpoint")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-tls-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // a GLOBAL temp view: each JDBC connection gets its own session
      // state, so a session-local view would be invisible to the client
      spark.range(3).selectExpr("id", "id * 10 AS v")
        .createOrReplaceGlobalTempView("tls_rt")
      val pw = dir.resolve("passwd")
      PasswdAuth.writePasswordFile(pw, Map("analyst" -> "s3cret"))
      val (port, server) = SqlEndpoint.start(spark,
        passwdFile = Some(pw), ssl = Some(SqlEndpoint.Ssl(ks, "kspass123")))
      try {
        Class.forName("org.apache.hive.jdbc.HiveDriver")
        val sslUrl = s"jdbc:hive2://localhost:$port/default;ssl=true;" +
          s"sslTrustStore=$ts;trustStorePassword=tspass123"
        // server binds asynchronously; poll the GOOD connection until up
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        var conn: java.sql.Connection = null
        while (conn == null) {
          try conn = DriverManager.getConnection(sslUrl, "analyst", "s3cret")
          catch {
            case _: Exception if System.nanoTime() < deadline =>
              Thread.sleep(500)
          }
        }
        try {
          val rs = conn.createStatement().executeQuery(
            "SELECT count(*) AS n, sum(v) AS s FROM global_temp.tls_rt")
          require(rs.next() && rs.getLong(1) == 3L && rs.getLong(2) == 30L)
          println("TLS_ROUNDTRIP_QUERY=OK")
          // without the certificate the handshake must FAIL (the JVM's
          // default truststore does not contain the self-signed cert)
          try {
            DriverManager.getConnection(
              s"jdbc:hive2://localhost:$port/default;ssl=true",
              "analyst", "s3cret").close()
            println("TLS_ROUNDTRIP_NOTRUST=ACCEPTED") // must not happen
          } catch {
            case _: java.sql.SQLException =>
              println("TLS_ROUNDTRIP_NOTRUST=REJECTED")
          }
          // a PLAINTEXT client against the TLS port must fail too
          try {
            DriverManager.getConnection(
              s"jdbc:hive2://localhost:$port/default",
              "analyst", "s3cret").close()
            println("TLS_ROUNDTRIP_PLAINTEXT=ACCEPTED")
          } catch {
            case _: java.sql.SQLException =>
              println("TLS_ROUNDTRIP_PLAINTEXT=REJECTED")
          }
          // auth still enforced INSIDE the tunnel
          try {
            DriverManager.getConnection(sslUrl, "analyst", "wrong").close()
            println("TLS_ROUNDTRIP_BADPASS=ACCEPTED")
          } catch {
            case _: java.sql.SQLException =>
              println("TLS_ROUNDTRIP_BADPASS=REJECTED")
          }
        } finally conn.close()
      } finally server.stop()
    } finally spark.stop()
  }
}
