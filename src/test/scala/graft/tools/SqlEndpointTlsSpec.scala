package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** TLS on the JDBC endpoint ≡ the reference's HTTPS JDBC
  * (trino/conf/trino/config.properties:9-15: https enabled + keystore +
  * PASSWORD auth; certs/). Runs in a CHILD JVM because HiveThriftServer2
  * binds once per JVM and the plaintext SqlEndpointSpec owns this one —
  * the same two-JVM pattern CatalogPersistenceSpec uses. The child proves,
  * over a real socket: handshake + query succeed with the right
  * truststore; a client without the certificate fails the handshake; a
  * plaintext client fails against the TLS port; wrong credentials are
  * rejected INSIDE the tunnel.
  */
class SqlEndpointTlsSpec extends AnyFunSuite {

  test("TLS endpoint round-trips with a truststore, rejects untrusted and " +
      "plaintext clients, and still enforces PASSWORD auth in the tunnel") {
    val pb = new ProcessBuilder("dev/run.sh", "graft.tools.TlsEndpointRoundTrip")
    pb.directory(new java.io.File("/root/repo"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0, s"TLS round trip JVM failed:\n$out")
    assert(out.contains("TLS_ROUNDTRIP_QUERY=OK"), out)
    assert(out.contains("TLS_ROUNDTRIP_NOTRUST=REJECTED"), out)
    assert(out.contains("TLS_ROUNDTRIP_PLAINTEXT=REJECTED"), out)
    assert(out.contains("TLS_ROUNDTRIP_BADPASS=REJECTED"), out)
  }
}
