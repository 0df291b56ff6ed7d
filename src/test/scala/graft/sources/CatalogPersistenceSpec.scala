package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** Proves catalog durability across PROCESS restarts — the equivalent of
  * the reference's Postgres-backed catalog surviving container restarts
  * (assets.py:393-425): session 1 (own JVM) creates a managed table through
  * `Graft.session(warehouse=…)`'s Hive-on-Derby metastore; session 2 (a
  * second, fresh JVM) resolves it by NAME. Two real JVMs because a
  * metastore's persistence can't be shown inside one process — Spark caches
  * catalog state per SparkContext.
  */
class CatalogPersistenceSpec extends SparkTestBase {

  private def runPhase(phase: String, wh: String): (Int, String) = {
    val pb = new ProcessBuilder(
      "dev/run.sh", "graft.tools.CatalogRoundTrip", phase, wh)
    pb.directory(new java.io.File("/root/repo"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    (code, out)
  }

  test("managed table created in one JVM is readable by name from a fresh JVM") {
    val root = Files.createTempDirectory("graft-catalog-persist")
    val wh = s"$root/warehouse"

    val (c1, out1) = runPhase("create", wh)
    assert(c1 == 0, s"create phase failed:\n$out1")
    assert(out1.contains("CATALOG_ROUNDTRIP_CREATED=info.catalog_roundtrip"), out1)

    val (c2, out2) = runPhase("read", wh)
    assert(c2 == 0, s"read phase failed:\n$out2")
    assert(out2.contains("CATALOG_ROUNDTRIP_COUNT=5"), out2)
    // sum(id*2) over 0..4 = 20 — values, not just metadata, round-tripped
    assert(out2.contains("CATALOG_ROUNDTRIP_SUM=20"), out2)
  }
}
