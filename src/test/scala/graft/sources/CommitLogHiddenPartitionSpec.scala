package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Iceberg-style hidden partitioning: days/months time grains, hash
  * buckets, string-prefix truncation. "Hidden" = queries filter on the
  * SOURCE column only; the layout serves them through tight per-file
  * min/max (time grains) or transform-aware equality pruning
  * (bucket/truncate). Covers the write layout, both pruning paths, spec
  * evolution across generations, the SQL PARTITIONED BY surface, and the
  * drop-column guard on transform sources.
  */
class CommitLogHiddenPartitionSpec extends SparkTestBase {
  import CommitLog._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-hidden").toString

  private def tsDf = {
    // 6 days × 50 rows, ids interleaved across days
    spark.range(300).selectExpr(
      "id",
      "timestamp_micros(CAST(1700000000000000 + (id % 6) * 86400000000 + " +
        "id * 1000000 AS BIGINT)) AS ts",
      "CAST(id % 7 AS DOUBLE) AS v")
  }

  test("days(ts): one grain per file, time-range queries open only that day") {
    val root = tmpTable()
    create(root, tsDf.schema, Seq("days(ts)"))
    append(tsDf, root)
    val m = readManifest(root, 2L)
    // every file carries its day in the partition tuple, parsed from path
    assert(m.statsOrNil.nonEmpty)
    assert(m.statsOrNil.forall(_.partitionsOrEmpty.contains("days_ts")))
    val days = m.statsOrNil.map(_.partitionsOrEmpty("days_ts")).distinct
    assert(days.size == 6, s"expected 6 day partitions, got $days")
    // hidden contract: the QUERY filters on ts only; per-file min/max is
    // one day tight, so stats pruning opens exactly that day's files
    // literal bounds (a function-call bound is Opaque to the pruner)
    val dayLo = lit(new java.sql.Timestamp(1700000000000L))
    val dayHi = lit(new java.sql.Timestamp(1700000000000L + 86400000L))
    val pruned = prunedFiles(spark, m, col("ts") >= dayLo && col("ts") < dayHi)
    assert(pruned.nonEmpty && pruned.size < m.files.size)
    val expectDay = m.statsOrNil.filter(s =>
      pruned.contains(s.path)).map(_.partitionsOrEmpty("days_ts")).distinct
    assert(expectDay.size == 1)
    // and the values match an unpartitioned filter exactly
    val got = readPruned(spark, root, col("ts") >= dayLo && col("ts") < dayHi)
      .select("id").collect().map(_.getLong(0)).sorted
    val want = tsDf.filter(col("ts") >= dayLo && col("ts") < dayHi)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("bucket(8, id): equality on the source column opens one bucket") {
    val root = tmpTable()
    val df = spark.range(400).selectExpr("id", "concat('v', id) AS k")
    create(root, df.schema, Seq("bucket(8, id)"))
    append(df, root)
    val m = readManifest(root, 2L)
    val buckets = m.statsOrNil.map(_.partitionsOrEmpty("bucket_8_id")).distinct
    assert(buckets.size == 8)
    // min/max cannot prune (every bucket spans the id range); the
    // transform probe computes the literal's bucket and keeps only it
    val kept = prunedFiles(spark, m, col("id") === 57L)
    assert(kept.nonEmpty && kept.size < m.files.size)
    val keptBuckets = m.statsOrNil.filter(s => kept.contains(s.path))
      .map(_.partitionsOrEmpty("bucket_8_id")).distinct
    assert(keptBuckets.size == 1)
    assert(readPruned(spark, root, col("id") === 57L)
      .select("k").collect().map(_.getString(0)).toSeq == Seq("v57"))
    // IN over two ids keeps at most two buckets; a conjunct with an
    // unrelated predicate still prunes
    val kept2 = prunedFiles(spark, m, col("id").isin(57L, 123L))
    val kb2 = m.statsOrNil.filter(s => kept2.contains(s.path))
      .map(_.partitionsOrEmpty("bucket_8_id")).distinct
    assert(kb2.size <= 2)
    assert(readPruned(spark, root, col("id").isin(57L, 123L)).count() == 2)
  }

  test("iceberg_bucket(8, id): the SPEC's hash lays out files, equality " +
      "prunes to one bucket, and the tuple matches IcebergHash per file") {
    val root = tmpTable()
    val df = spark.range(400).selectExpr("id", "concat('v', id) AS k")
    create(root, df.schema, Seq("iceberg_bucket(8, id)"))
    append(df, root)
    val m = readManifest(root, 2L)
    val buckets = m.statsOrNil.map(_.partitionsOrEmpty("ibucket_8_id")).distinct
    assert(buckets.size == 8)
    // every file's recorded bucket is EXACTLY the spec hash of its rows
    m.statsOrNil.foreach { st =>
      val declared = st.partitionsOrEmpty("ibucket_8_id").toInt
      val p = if (st.path.startsWith("/") || st.path.contains("://")) st.path
        else s"$root/${st.path}"
      val actual = spark.read.parquet(p)
        .selectExpr("iceberg_bucket(8, id) AS b").distinct().collect()
      assert(actual.length == 1 && actual(0).getInt(0) == declared)
    }
    // equality on the source column opens only the literal's bucket
    val kept = prunedFiles(spark, m, col("id") === 57L)
    assert(kept.nonEmpty && kept.size < m.files.size)
    val keptBuckets = m.statsOrNil.filter(s => kept.contains(s.path))
      .map(_.partitionsOrEmpty("ibucket_8_id")).distinct
    assert(keptBuckets ==
      Seq(graft.functions.IcebergHash.bucketLong(57L, 8).toString))
    assert(readPruned(spark, root, col("id") === 57L)
      .select("k").collect().map(_.getString(0)).toSeq == Seq("v57"))
    // IN over two ids keeps at most two buckets and loses no row
    assert(readPruned(spark, root, col("id").isin(57L, 123L)).count() == 2)
    // rename follows the spec (a stale source name would brick appends)
    CommitLog.renameColumn(root, "id", "ident")
    val m2 = readManifest(root, 3L)
    assert(m2.partitionByOrNil == Seq("iceberg_bucket(8, ident)"))
    append(spark.range(400, 410).selectExpr("id AS ident", "concat('v', id) AS k"),
      root)
    assert(readPruned(spark, root, col("ident") === 405L).count() == 1)
  }

  test("truncate(2, k): prefix partitions serve equality on the full string") {
    val root = tmpTable()
    val df = spark.range(90).selectExpr(
      "id", "concat(CASE WHEN id % 3 = 0 THEN 'aa' WHEN id % 3 = 1 THEN 'ab' " +
        "ELSE 'ba' END, '_', id) AS k")
    create(root, df.schema, Seq("truncate(2, k)"))
    append(df, root)
    val m = readManifest(root, 2L)
    assert(m.statsOrNil.map(_.partitionsOrEmpty("truncate_2_k")).distinct.sorted
      == Seq("aa", "ab", "ba"))
    val kept = prunedFiles(spark, m, col("k") === "ab_4")
    assert(m.statsOrNil.filter(s => kept.contains(s.path))
      .forall(_.partitionsOrEmpty("truncate_2_k") == "ab"))
    assert(readPruned(spark, root, col("k") === "ab_4")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    // empty-string values land in the writer's DEFAULT partition dir —
    // the transform probe must keep that file for `k = ''` (it cannot
    // reconstruct the derived value), never silently drop matching rows
    import spark.implicits._
    append(Seq((1000L, ""), (1001L, "zz_x")).toDF("id", "k").coalesce(1), root)
    val m2 = readManifest(root, 3L)
    assert(readPruned(spark, root, col("k") === "")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1000L))
  }

  test("truncate(W, k): prefixes count CODE POINTS — supplementary chars " +
      "never prune a matching file") {
    val root = tmpTable()
    import spark.implicits._
    // '😀' is ONE code point but TWO UTF-16 units. The write side derives
    // the partition value with substring() (code-point based), so
    // truncate(2) stores "😀a"/"😀b"; a UTF-16 probe (String.take) would
    // compute "😀" for the same key and silently prune the file that
    // holds it.
    val df = Seq((1L, "😀a_1"), (2L, "😀b_2"), (3L, "pl_3")).toDF("id", "k")
    create(root, df.schema, Seq("truncate(2, k)"))
    append(df, root)
    val m = readManifest(root, 2L)
    assert(m.statsOrNil.flatMap(_.partitionsOrEmpty.get("truncate_2_k"))
      .toSet == Set("😀a", "😀b", "pl"))
    // equality on the full key returns the row (probe prefix must match
    // the stored code-point prefix)
    assert(readPruned(spark, root, col("k") === "😀a_1")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // and the probe still PRUNES: only the matching prefix survives
    val kept = prunedFiles(spark, m, col("k") === "😀a_1")
    assert(m.statsOrNil.filter(s => kept.contains(s.path))
      .forall(_.partitionsOrEmpty("truncate_2_k") == "😀a"))
    assert(kept.size < m.files.size)
  }

  test("days/months pre-1970: grains FLOOR, never fold around the epoch") {
    val root = tmpTable()
    // -25 h, -1 h, +1 h around the epoch = three distinct UTC days; `div`
    // (truncation toward zero) would fold both negative instants into
    // epoch-relative day 0 / -1 and misplace them
    val df = spark.range(3).selectExpr("id",
      "timestamp_micros(element_at(array(-90000000000L, -3600000000L, " +
        "3600000000L), CAST(id + 1 AS INT))) AS ts")
    create(root, df.schema, Seq("days(ts)"))
    append(df, root)
    val m = readManifest(root, 2L)
    assert(m.statsOrNil.map(_.partitionsOrEmpty("days_ts")).distinct.sorted
      == Seq("1969-12-30", "1969-12-31", "1970-01-01"))
    // and a pre-epoch month floors to ITS month's first day
    val root2 = tmpTable()
    create(root2, df.schema, Seq("months(ts)"))
    append(df, root2)
    assert(readManifest(root2, 2L).statsOrNil
      .map(_.partitionsOrEmpty("months_ts")).distinct.sorted
      == Seq("1969-12-01", "1970-01-01"))
    // range reads over the boundary stay exact either way
    val got = readPruned(spark, root,
      col("ts") < lit(new java.sql.Timestamp(0L))).count()
    assert(got == 2L)
  }

  test("date/timestamp_ntz grains are session-zone independent") {
    val root = tmpTable()
    def mk = spark.sql("SELECT 1L AS id, DATE'2021-03-15' AS d, " +
      "TIMESTAMP_NTZ'2021-03-15 23:30:00' AS tn")
    create(root, mk.schema, Seq("months(d)", "days(tn)"))
    // UTC+14 and UTC-12 writer sessions: a CAST(… AS TIMESTAMP) detour
    // would shift the same wall-clock value across a day (even a month)
    // boundary between the two writers
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      append(mk, root)
      spark.conf.set("spark.sql.session.timeZone", "Etc/GMT+12")
      append(mk, root)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    val m = readManifest(root, 3L)
    assert(m.statsOrNil.map(_.partitionsOrEmpty("months_d")).distinct
      == Seq("2021-03-01"))
    assert(m.statsOrNil.map(_.partitionsOrEmpty("days_tn")).distinct
      == Seq("2021-03-15"))
  }

  test("spec evolution identity -> days(ts): both generations serve queries") {
    val root = tmpTable()
    val df = tsDf.withColumn("half", (col("id") % 2).cast("string"))
    append(df.filter(col("id") < 150), root, partitionBy = Seq("half"))
    setPartitionSpec(root, Seq("days(ts)"))
    append(df.filter(col("id") >= 150), root)
    val m = readManifest(root, 3L)
    // old files keep their identity tuple, new files the transform tuple
    assert(m.statsOrNil.exists(_.partitionsOrEmpty.contains("half")))
    assert(m.statsOrNil.exists(_.partitionsOrEmpty.contains("days_ts")))
    // a ts-range query prunes BOTH generations through ts stats
    val dayLo = lit(new java.sql.Timestamp(1700000000000L + 5 * 86400000L))
    val got = readPruned(spark, root, col("ts") >= dayLo)
      .select("id").collect().map(_.getLong(0)).sorted
    val want = df.filter(col("ts") >= dayLo)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want) && got.nonEmpty)
    // files of the NEW generation that can't contain the day are skipped
    val pruned = prunedFiles(spark, m, col("ts") >= dayLo)
    assert(pruned.size < m.files.size)
  }

  test("SQL PARTITIONED BY (days(ts), bucket(4, id)) through the catalog") {
    val cat = Files.createTempDirectory("graft-hidden-cat").toString
    spark.conf.set("spark.sql.catalog.ghp",
      classOf[graft.sources.commitlog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ghp.root", cat)
    spark.sql("CREATE TABLE ghp.t (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(4, id))")
    val d = Paths.get(cat, "t").toString
    assert(readManifest(d, 1L).partitionByOrNil == Seq("days(ts)", "bucket(4, id)"))
    spark.sql("INSERT INTO ghp.t SELECT id, " +
      "timestamp_micros(CAST(1700000000000000 + (id % 3) * 86400000000 AS BIGINT)), " +
      "CAST(id AS DOUBLE) FROM range(60)")
    val m = readManifest(d, 2L)
    assert(m.statsOrNil.forall(s =>
      s.partitionsOrEmpty.contains("days_ts") &&
        s.partitionsOrEmpty.contains("bucket_4_id")))
    // 3 days × 4 buckets = 12 partitions
    assert(m.statsOrNil.map(_.partitionsOrEmpty("days_ts")).distinct.size == 3)
    assert(m.statsOrNil.map(_.partitionsOrEmpty("bucket_4_id")).distinct.size == 4)
    // equality on id prunes to one bucket's files ACROSS days
    val kept = prunedFiles(spark, m, col("id") === 11L)
    assert(m.statsOrNil.filter(s => kept.contains(s.path))
      .map(_.partitionsOrEmpty("bucket_4_id")).distinct.size == 1)
    assert(spark.sql("SELECT v FROM ghp.t WHERE id = 11").collect()
      .map(_.getDouble(0)).toSeq == Seq(11.0))
    // DML preserves the layout: deleted bucket rewrites stay transformed
    spark.sql("DELETE FROM ghp.t WHERE id = 11")
    assert(spark.sql("SELECT count(*) FROM ghp.t").collect()(0).getLong(0) == 59L)
    val m3 = readManifest(d, 3L)
    assert(m3.statsOrNil.forall(_.partitionsOrEmpty.contains("days_ts")))
    // DESCRIBE FILES: the per-file metadata view shows the hidden layout
    val files = spark.sql("DESCRIBE FILES ghp.t").collect()
    assert(files.length == m3.statsOrNil.size)
    assert(files.forall(r => r.getString(3).contains("days_ts=") &&
      r.getString(3).contains("bucket_4_id=")))
    assert(files.map(_.getAs[Long]("rows")).sum == 59L)
  }

  test("years(ts): the coarsest grain, same hidden contract") {
    val root = tmpTable()
    // 100 rows across two years (366-day offset for half of them)
    val df = spark.range(100).selectExpr("id",
      "timestamp_micros(CAST(1700000000000000 + (id % 2) * 366 * 86400000000 " +
        "+ id * 1000000 AS BIGINT)) AS ts")
    create(root, df.schema, Seq("years(ts)"))
    append(df, root)
    val m = readManifest(root, 2L)
    assert(m.statsOrNil.map(_.partitionsOrEmpty("years_ts")).distinct.sorted
      == Seq("2023-01-01", "2024-01-01"))
    // a filter on raw ts keeps only the 2024 generation's files
    val lo = lit(new java.sql.Timestamp(1700000000000L + 366L * 86400000L))
    val pruned = prunedFiles(spark, m, col("ts") >= lo)
    assert(pruned.nonEmpty && pruned.size < m.files.size)
    assert(readPruned(spark, root, col("ts") >= lo).count() == 50L)
  }

  test("guards: transform sources cannot drop; invalid specs reject") {
    val root = tmpTable()
    create(root, tsDf.schema, Seq("days(ts)"))
    append(tsDf.limit(10).coalesce(1), root)
    intercept[IllegalArgumentException] { dropColumn(root, "ts") }
    intercept[IllegalArgumentException] {
      create(tmpTable(), tsDf.schema, Seq("days(v)")) // double, not time
    }
    intercept[IllegalArgumentException] {
      create(tmpTable(), tsDf.schema, Seq("bucket(0, id)"))
    }
    intercept[IllegalArgumentException] {
      create(tmpTable(), tsDf.schema, Seq("truncate(3, id)")) // not string
    }
    intercept[IllegalArgumentException] {
      create(tmpTable(), tsDf.schema, Seq("days(nope)"))
    }
  }

  test("RENAME COLUMN follows transform specs; the renamed table keeps working") {
    val root = tmpTable()
    val df = spark.range(40).selectExpr("id", "concat('k', id) AS k")
    create(root, df.schema, Seq("bucket(4, id)"))
    append(df, root)
    renameColumn(root, "id", "uid")
    val m = readManifest(root, currentVersion(root).get)
    assert(m.partitionByOrNil == Seq("bucket(4, uid)"))
    // appends under the new name still derive the layout (same PHYSICAL
    // key, so old and new generations share partition dirs)
    append(spark.range(40, 50).selectExpr("id AS uid", "concat('k', id) AS k"), root)
    val m2 = readManifest(root, currentVersion(root).get)
    assert(m2.statsOrNil.forall(_.partitionsOrEmpty.contains("bucket_4_id")))
    assert(read(spark, root).count() == 50)
    // the spec guard now sees the RENAMED source
    intercept[IllegalArgumentException] { dropColumn(root, "uid") }
  }
}
