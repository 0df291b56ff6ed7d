package graft.sources.interop

import org.scalatest.funsuite.AnyFunSuite

/** Federated JDBC read against the engine's OWN thrift endpoint — both
  * halves of the reference's federation persona (its Trino `postgresql`
  * connector catalog) in one loop: this engine serves the wire AND
  * consumes it. Runs in a CHILD JVM (the SqlEndpointTlsSpec pattern:
  * HiveThriftServer2 binds once per JVM and the plaintext
  * SqlEndpointSpec owns this one); the child asserts dialect-correct
  * schema resolution, predicate + projection pushdown into the remote
  * scan, the partitioned parallel fetch, and a remote⋈local join equal
  * to the all-local answer — see [[graft.tools.FederationRoundTrip]].
  */
class JdbcFederationSpec extends AnyFunSuite {

  test("spark.read.jdbc federates into the thrift endpoint: pushdown, " +
      "partitioned scan, remote-to-local join (child JVM)") {
    val pb = new ProcessBuilder("dev/run.sh", "graft.tools.FederationRoundTrip")
    pb.directory(new java.io.File("/root/repo"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0, s"federation round-trip JVM failed:\n${out.takeRight(4000)}")
    assert(out.contains("FED_SCHEMA=OK"), out.takeRight(2000))
    assert(out.contains("FED_PUSHDOWN=OK"), out.takeRight(2000))
    assert(out.contains("FED_PARTITIONED=OK"), out.takeRight(2000))
    assert(out.contains("FED_JOIN=OK"), out.takeRight(2000))
    assert(out.contains("FED_WRITE=OK"), out.takeRight(2000))
    assert(out.contains("FED_ATOMIC=OK"), out.takeRight(2000))
    assert(out.contains("FED_AGG_PUSHDOWN=OK"), out.takeRight(2000))
  }
}
