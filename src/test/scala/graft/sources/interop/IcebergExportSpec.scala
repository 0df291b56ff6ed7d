package graft.sources.interop

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** Iceberg export round-trip: the written metadata tree re-imports to the
  * identical snapshot, zero bytes move, and exports that would corrupt
  * (deletion vectors, a pre-existing metadata tree) refuse.
  */
class IcebergExportSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-iexp").toString

  test("export writes a v1 metadata tree over the existing files and " +
      "IcebergImport round-trips the identical snapshot") {
    val t = tmp(); val back = tmp()
    CommitLog.append(spark.range(100).selectExpr(
      "id", "CAST(id AS DOUBLE) / 4 AS v", "CAST(id AS STRING) AS s"), t)
    CommitLog.append(spark.range(50).selectExpr(
      "id + 1000 AS id", "CAST(id AS DOUBLE) AS v",
      "CAST(id % 7 AS STRING) AS s"), t)
    val nFiles = IcebergExport.exportTable(t)
    assert(nFiles == CommitLog.readManifest(t,
      CommitLog.currentVersion(t).get).files.size)
    assert(Files.isRegularFile(Paths.get(t, "metadata", "v1.metadata.json")))
    assert(Files.isRegularFile(Paths.get(t, "metadata", "version-hint.text")))
    IcebergImport.importTable(spark, t, back)
    val a = CommitLog.read(spark, t).orderBy("id").collect().map(_.toSeq)
    val b = CommitLog.read(spark, back).orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // schema round-trips exactly (names, types, nullability)
    assert(CommitLog.read(spark, back).schema ==
      CommitLog.read(spark, t).schema)
    // zero-copy both ways: the round-trip table holds no parquet
    import scala.jdk.CollectionConverters._
    assert(!Files.walk(Paths.get(back)).iterator().asScala
      .exists(_.toString.endsWith(".parquet")))
  }

  test("a PINNED version exports the old snapshot while the table has " +
      "moved on") {
    val t = tmp(); val back = tmp()
    CommitLog.append(spark.range(30).selectExpr("id"), t)     // v1
    CommitLog.append(spark.range(70).selectExpr("id + 100 AS id"), t) // v2
    IcebergExport.exportTable(t, version = Some(1L))
    IcebergImport.importTable(spark, t, back)
    assert(CommitLog.read(spark, back).count() == 30L)
    assert(CommitLog.read(spark, t).count() == 100L) // live table untouched
  }

  test("by-reference files OUTSIDE the root export fine (full-URI paths, " +
      "unlike Delta's root-relative adds)") {
    val ext = Files.createTempDirectory("graft-iexp-ext")
    val w = Files.createTempDirectory("graft-iexp-w")
    spark.range(40).selectExpr("id").coalesce(1)
      .write.mode("overwrite").parquet(w.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(w).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val data = ext.resolve("f.parquet")
    Files.move(part, data)
    val t = tmp(); val back = tmp()
    CommitLog.importSnapshot(t, spark.range(1).selectExpr("id").schema,
      Seq(CommitLog.FileStat(data.toString, 40L, Files.size(data))))
    IcebergExport.exportTable(t)
    IcebergImport.importTable(spark, t, back)
    assert(CommitLog.read(spark, back).count() == 40L)
  }

  test("exports that would corrupt refuse: deletion vectors without a " +
      "session, and a pre-existing metadata tree") {
    val t = tmp()
    CommitLog.append(spark.range(20).selectExpr("id"), t)
    CommitLog.deleteDV(spark, t, col("id") === 3L)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.exportTable(t)
    }
    assert(e.getMessage.contains("deletion vectors"))
    // after compact the DVs materialize away and a v1 export succeeds ONCE
    CommitLog.compact(spark, t)
    IcebergExport.exportTable(t)
    val e2 = intercept[IllegalArgumentException] {
      IcebergExport.exportTable(t)
    }
    assert(e2.getMessage.contains("metadata directory"))
  }

  test("a DV-bearing snapshot exports as FORMAT VERSION 2 with position " +
      "deletes that round-trip through IcebergImport row-exactly") {
    val t = tmp(); val back = tmp()
    CommitLog.append(spark.range(40).selectExpr(
      "id", "CAST(id AS DOUBLE) / 8 AS v"), t)
    CommitLog.append(spark.range(40, 60).selectExpr(
      "id", "CAST(id AS DOUBLE) AS v"), t)
    // merge-on-read deletes in BOTH file generations
    CommitLog.deleteDV(spark, t, col("id").isin(3L, 17L, 45L))
    val want = CommitLog.read(spark, t).orderBy("id").collect().map(_.toSeq)
    assert(want.length == 57)
    val n = IcebergExport.exportTable(t, spark = Some(spark))
    assert(n >= 2)
    import scala.jdk.CollectionConverters._
    // the metadata tree declares v2 and a content=1 delete manifest
    val metaJson = new String(Files.readAllBytes(
      Paths.get(t, "metadata", "v1.metadata.json")), "UTF-8")
    assert(metaJson.contains("\"format-version\" : 2") ||
      metaJson.contains("\"format-version\":2"), metaJson.take(200))
    // v2-required fields strict readers check (r10): empty sort order,
    // its default id, and last-partition-id
    Seq("\"sort-orders\"", "\"default-sort-order-id\" : 0",
        "\"last-partition-id\" : 999", "\"order-id\" : 0")
      .foreach(f => assert(metaJson.replace(" ", "").contains(
        f.replace(" ", "")), s"missing $f in ${metaJson.take(400)}"))
    assert(Files.list(Paths.get(t, "metadata")).iterator()
      .asScala.exists(_.getFileName.toString.contains("deletes")))
    // the delete parquet is spec-shaped (file_path, pos)
    val delDir = Files.list(Paths.get(t)).iterator().asScala
      .find(_.getFileName.toString.startsWith("deletes-v")).get
    val delDf = spark.read.parquet(delDir.toString)
    assert(delDf.schema.fieldNames.toSeq == Seq("file_path", "pos"))
    assert(delDf.count() == 3L)
    // both halves of the position-delete codec meet: export wrote, import
    // re-encodes as commitlog DVs, the commitlog read is ground truth
    IcebergImport.importTable(spark, t, back)
    val got = CommitLog.read(spark, back).orderBy("id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // zero-copy for DATA: the re-import's only parquet is its own DV
    // re-encoding
    val parquet = Files.walk(Paths.get(back)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(parquet.nonEmpty && parquet.forall(_.toString.contains("__dv_k=")),
      parquet.mkString("\n"))
  }

  test("hidden-partition layouts export as REAL Iceberg partition specs " +
      "(r10): day/truncate/identity declared with typed values, bucket " +
      "honestly excluded, and the tree round-trips") {
    val t = tmp(); val back = tmp()
    val df = spark.sql(
      """SELECT id,
        |  TIMESTAMP'2026-01-01 00:00:00' + make_interval(0,0,0,0, CAST(id * 7 AS INT),0,0) AS ts,
        |  concat('key_', id % 3) AS k,
        |  CAST(id % 4 AS STRING) AS cat,
        |  id * 10 AS v
        |FROM range(48)""".stripMargin)
    CommitLog.append(df, t,
      partitionBy = Seq("days(ts)", "truncate(4, k)", "cat", "bucket(4, id)"))
    IcebergExport.exportTable(t)
    val metaJson = new String(Files.readAllBytes(
      Paths.get(t, "metadata", "v1.metadata.json")), "UTF-8").replace(" ", "")
    // declared transforms use Iceberg's own vocabulary
    assert(metaJson.contains("\"transform\":\"day\""))
    assert(metaJson.contains("\"transform\":\"truncate[4]\""))
    assert(metaJson.contains("\"transform\":\"identity\""))
    // bucket is EXCLUDED: the engines hash differently, declaring it
    // would make an Iceberg reader prune the wrong bucket
    assert(!metaJson.contains("bucket["))
    assert(metaJson.contains("\"last-partition-id\":1002"))

    // manifest partition tuples carry TYPED values matching the files
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._
    val mPath = Files.list(Paths.get(t, "metadata")).iterator().asScala
      .find(_.getFileName.toString.startsWith("m0-")).get
    val reader = DataFileReader.openReader(mPath.toFile,
      new GenericDatumReader[GenericRecord]())
    val tuples = try reader.iterator().asScala.toVector.map { e =>
      val d = e.get("data_file").asInstanceOf[GenericRecord]
      val pr = d.get("partition").asInstanceOf[GenericRecord]
      (d.get("file_path").toString,
        pr.get("ts_day").asInstanceOf[Int],
        pr.get("k_trunc").toString, pr.get("cat").toString)
    } finally reader.close()
    assert(tuples.nonEmpty)
    // cross-check every file: its actual rows agree with the declared
    // partition tuple (wrong values would make Iceberg readers mis-prune)
    tuples.foreach { case (uri, day, ktr, cat) =>
      val rows = spark.read.parquet(uri.stripPrefix("file://"))
      val chk = rows.selectExpr(
        "CAST(datediff(CAST(ts AS DATE), DATE'1970-01-01') AS INT) AS d",
        "substring(k, 1, 4) AS kt", "cat").distinct().collect()
      assert(chk.length == 1, s"file $uri not single-valued")
      assert(chk(0).getInt(0) == day && chk(0).getString(1) == ktr &&
        chk(0).getString(2) == cat)
    }
    // 48 rows * 7h = 14 distinct days; day values cover them exactly
    val want = (0 until 48).map(i =>
      java.time.LocalDate.of(2026, 1, 1).plusDays(i * 7 / 24).toEpochDay.toInt)
      .toSet
    assert(tuples.map(_._2).toSet == want)

    // the in-repo importer round-trips the partitioned tree identically
    IcebergImport.importTable(spark, t, back)
    assert(CommitLog.read(spark, back).orderBy("id").collect().map(_.toSeq)
      .toSeq == CommitLog.read(spark, t).orderBy("id").collect()
      .map(_.toSeq).toSeq)
  }

  test("iceberg_bucket(N, c) layouts export as REAL bucket[N] specs " +
      "(r11): the spec hash wrote the files, every declared tuple " +
      "matches its rows, and the tree round-trips") {
    val t = tmp(); val back = tmp()
    val df = spark.sql(
      "SELECT id, concat('u', id % 5) AS who, id * 3 AS v FROM range(120)")
    CommitLog.append(df, t, partitionBy = Seq("iceberg_bucket(4, id)"))
    IcebergExport.exportTable(t)
    val metaJson = new String(Files.readAllBytes(
      Paths.get(t, "metadata", "v1.metadata.json")), "UTF-8").replace(" ", "")
    // DECLARED now — the engine wrote with the spec's own hash
    assert(metaJson.contains("\"transform\":\"bucket[4]\""))
    assert(metaJson.contains("\"name\":\"id_bucket\""))

    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._
    val mPath = Files.list(Paths.get(t, "metadata")).iterator().asScala
      .find(_.getFileName.toString.startsWith("m0-")).get
    val reader = DataFileReader.openReader(mPath.toFile,
      new GenericDatumReader[GenericRecord]())
    val tuples = try reader.iterator().asScala.toVector.map { e =>
      val d = e.get("data_file").asInstanceOf[GenericRecord]
      val pr = d.get("partition").asInstanceOf[GenericRecord]
      (d.get("file_path").toString, pr.get("id_bucket").asInstanceOf[Int])
    } finally reader.close()
    assert(tuples.map(_._2).toSet == Set(0, 1, 2, 3))
    // an Iceberg reader prunes on these tuples — each must equal the
    // spec hash of EVERY row in its file, or reads silently lose rows
    tuples.foreach { case (uri, declared) =>
      val ids = spark.read.parquet(uri.stripPrefix("file://"))
        .select("id").collect().map(_.getLong(0))
      assert(ids.nonEmpty)
      ids.foreach { id =>
        assert(graft.functions.IcebergHash.bucketLong(id, 4) == declared,
          s"row $id in $uri declared bucket $declared")
      }
    }
    // round trip through the importer stays row-exact
    IcebergImport.importTable(spark, t, back)
    assert(CommitLog.read(spark, back).orderBy("id").collect().map(_.toSeq)
      .toSeq == df.orderBy("id").collect().map(_.toSeq).toSeq)
  }
}
