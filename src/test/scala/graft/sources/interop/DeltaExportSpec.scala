package graft.sources.interop

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** Delta export round-trip: the written log re-imports to the identical
  * snapshot, zero bytes move, and exports that would corrupt (deletion
  * vectors, out-of-root references) refuse.
  */
class DeltaExportSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-dexp").toString

  test("export writes a protocol-1 log over the existing files and " +
      "DeltaImport round-trips the identical snapshot") {
    val t = tmp(); val back = tmp()
    CommitLog.append(spark.range(100).selectExpr(
      "id", "CAST(id AS DOUBLE) / 4 AS v"), t)
    CommitLog.append(spark.range(50).selectExpr(
      "id + 1000 AS id", "CAST(id AS DOUBLE) AS v"), t)
    val nFiles = DeltaExport.exportTable(t)
    assert(nFiles == CommitLog.readManifest(t,
      CommitLog.currentVersion(t).get).files.size)
    assert(Files.isRegularFile(
      Paths.get(t, "_delta_log", f"${0L}%020d.json")))
    DeltaImport.importTable(spark, t, back)
    val a = CommitLog.read(spark, t).orderBy("id").collect().map(_.toSeq)
    val b = CommitLog.read(spark, back).orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // zero-copy both ways: the round-trip table holds no parquet either
    import scala.jdk.CollectionConverters._
    assert(!Files.walk(Paths.get(back)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
  }

  test("a RENAMED (column-mapped) table exports as Delta name-mode column " +
      "mapping and round-trips through DeltaImport") {
    val t = tmp(); val back = tmp()
    CommitLog.append(spark.range(30).selectExpr(
      "id", "id * 3 AS old_name"), t)
    CommitLog.renameColumn(t, "old_name", "v") // files keep 'old_name'
    CommitLog.append(spark.range(30, 40).selectExpr("id", "id * 3 AS v"), t)
    val want = CommitLog.read(spark, t).orderBy("id").collect().map(_.toSeq)
    DeltaExport.exportTable(t)
    val log = new String(Files.readAllBytes(
      Paths.get(t, "_delta_log", f"${0L}%020d.json")), "UTF-8")
    // legacy reader-version-2 protocol IS column mapping; the schema
    // carries per-field physicalName metadata and name mode is declared
    assert(log.contains("\"minReaderVersion\":2"), log.take(200))
    assert(log.contains("delta.columnMapping.physicalName") &&
      log.contains("\"delta.columnMapping.mode\":\"name\""))
    DeltaImport.importTable(spark, t, back)
    val got = CommitLog.read(spark, back)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(got.orderBy("id").collect().map(_.toSeq).toSeq == want.toSeq)
    // the map survives as the importer's native column map; still zero-copy
    val m = CommitLog.readManifest(back, CommitLog.currentVersion(back).get)
    assert(m.physOf("v") != "v")
    import scala.jdk.CollectionConverters._
    assert(!Files.walk(Paths.get(back)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))

    // DVs + column mapping together: table-features protocol with BOTH
    // reader features, still row-exact through the round trip
    val t2 = tmp(); val back2 = tmp()
    CommitLog.append(spark.range(20).selectExpr("id", "id * 2 AS a0"), t2)
    CommitLog.renameColumn(t2, "a0", "val")
    CommitLog.deleteDV(spark, t2, col("id").isin(2L, 11L))
    val want2 = CommitLog.read(spark, t2).orderBy("id").collect().map(_.toSeq)
    DeltaExport.exportTable(t2, spark = Some(spark))
    val log2 = new String(Files.readAllBytes(
      Paths.get(t2, "_delta_log", f"${0L}%020d.json")), "UTF-8")
    assert(log2.contains("\"minReaderVersion\":3") &&
      log2.contains("columnMapping") && log2.contains("deletionVectors"))
    DeltaImport.importTable(spark, t2, back2)
    assert(CommitLog.read(spark, back2).orderBy("id").collect()
      .map(_.toSeq).toSeq == want2.toSeq)
  }

  test("exports that would corrupt refuse: deletion vectors without a " +
      "session, and a pre-existing _delta_log") {
    val t = tmp()
    CommitLog.append(spark.range(20).selectExpr("id"), t)
    CommitLog.deleteDV(spark, t, col("id") === 3L)
    val e = intercept[IllegalArgumentException] {
      DeltaExport.exportTable(t)
    }
    assert(e.getMessage.contains("deletion vectors"))
    // after compact the DVs materialize away and export succeeds ONCE
    CommitLog.compact(spark, t)
    DeltaExport.exportTable(t)
    val e2 = intercept[IllegalArgumentException] {
      DeltaExport.exportTable(t)
    }
    assert(e2.getMessage.contains("_delta_log"))
  }

  test("a DV-bearing snapshot exports as a reader-version-3 log whose " +
      "descriptors round-trip through DeltaImport row-exactly") {
    val t = tmp(); val back = tmp()
    CommitLog.append(spark.range(40).selectExpr(
      "id", "CAST(id AS DOUBLE) / 8 AS v"), t)
    CommitLog.append(spark.range(40, 60).selectExpr(
      "id", "CAST(id AS DOUBLE) AS v"), t)
    // merge-on-read deletes in BOTH file generations
    CommitLog.deleteDV(spark, t, col("id").isin(3L, 17L, 45L))
    val want = CommitLog.read(spark, t).orderBy("id").collect().map(_.toSeq)
    assert(want.length == 57)
    val n = DeltaExport.exportTable(t, spark = Some(spark))
    assert(n >= 2)
    // the log declares the feature and carries descriptors
    val log = new String(Files.readAllBytes(
      Paths.get(t, "_delta_log", f"${0L}%020d.json")), "UTF-8")
    assert(log.contains("\"minReaderVersion\":3") &&
      log.contains("deletionVectors") && log.contains("\"storageType\":\"u\""))
    // descriptor sizeInBytes must be the serialized PAYLOAD length — the
    // value the storage format repeats as the entry's length prefix and
    // delta-spark asserts on load — never the .bin file size (version
    // byte + prefix + payload + CRC)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val dvDescs = log.split('\n').toSeq
      .map(om.readTree)
      .flatMap(n => Option(n.get("add")))
      .flatMap(a => Option(a.get("deletionVector")))
    assert(dvDescs.nonEmpty)
    dvDescs.foreach { d =>
      val bin = DeltaDv.dvFilePath(t, d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText())
      val bytes = Files.readAllBytes(bin)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.position(d.get("offset").asInt())
      val lenPrefix = bb.getInt
      assert(d.get("sizeInBytes").asInt() == lenPrefix,
        s"descriptor sizeInBytes ${d.get("sizeInBytes").asInt()} != " +
          s"length prefix $lenPrefix")
      assert(d.get("sizeInBytes").asLong() != Files.size(bin))
    }
    // both halves of the PROTOCOL.md DV codec meet: export wrote, import
    // decodes (now CHECKING sizeInBytes against the prefix), and the
    // commitlog read is the ground truth on both sides
    DeltaImport.importTable(spark, t, back)
    val got = CommitLog.read(spark, back).orderBy("id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // zero-copy for DATA: the only parquet the re-import writes is its
    // own KB-scale DV encoding (positions land as commitlog DV parquet)
    import scala.jdk.CollectionConverters._
    val parquet = Files.walk(Paths.get(back)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(parquet.nonEmpty && parquet.forall(_.toString.contains("__dv_k=")),
      parquet.mkString("\n"))
  }
}
