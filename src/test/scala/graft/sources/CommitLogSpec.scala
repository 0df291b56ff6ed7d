package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

class CommitLogSpec extends SparkTestBase {
  import CommitLog._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-commitlog").toString

  test("append commits atomically and reads back the latest snapshot") {
    val root = tmpTable()
    val v1 = append(spark.range(3).selectExpr("id", "id * 2 AS v"), root)
    assert(v1 == 1L)
    val v2 = append(spark.range(3, 5).selectExpr("id", "id * 2 AS v"), root)
    assert(v2 == 2L)
    assert(currentVersion(root).contains(2L))
    val latest = read(spark, root)
    assert(latest.count() == 5)
    assert(latest.selectExpr("sum(v)").collect()(0).getLong(0) == 20L) // 2*(0+..+4)
  }

  test("time travel: historical versions stay readable after overwrite") {
    val root = tmpTable()
    append(spark.range(4).toDF("id"), root)
    overwrite(spark.range(100, 102).toDF("id"), root)
    assert(read(spark, root).count() == 2) // latest = overwritten
    assert(read(spark, root, Some(1L)).count() == 4) // pinned old snapshot
    assert(read(spark, root, Some(1L)).selectExpr("max(id)").collect()(0).getLong(0) == 3L)
  }

  test("conflicting writers: second commit to the same version fails") {
    val root = tmpTable()
    append(spark.range(2).toDF("id"), root)
    // Simulate a race: both writers observed version 1, both stage data,
    // both try to publish version 2. The log must admit exactly one.
    val m = readManifest(root, 1L)
    val winner = Commit(2L, "append", m.schemaJson)
    val loser = Commit(2L, "overwrite", m.schemaJson)
    publish(root, winner)
    intercept[CommitConflictException](publish(root, loser))
    // the table is the winner's commit, not a torn mix
    assert(readManifest(root, 2L).op == "append")
  }

  test("zero-row overwrite yields an empty snapshot with the schema intact") {
    val root = tmpTable()
    append(spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s"), root)
    overwrite(spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s"), root)
    val snap = read(spark, root)
    assert(snap.count() == 0)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "s"))
    // history still has the rows
    assert(read(spark, root, Some(1L)).count() == 3)
  }

  test("compaction is one metadata swap; pinned readers keep their snapshot") {
    val root = tmpTable()
    (0 until 4).foreach(i => append(
      spark.range(i * 10, i * 10 + 10).repartition(3).toDF("id"), root))
    val before = readManifest(root, 4L)
    assert(before.files.size > 4) // many small files across 4 commits
    val v = compact(spark, root, nFiles = 1)
    assert(v == 5L)
    val after = readManifest(root, v)
    assert(after.files.size == 1)
    assert(read(spark, root).count() == 40)
    assert(read(spark, root).selectExpr("sum(id)").collect()(0).getLong(0) ==
      (0 until 40).map(_.toLong).sum)
    // version 4 still reads the pre-compaction file set
    assert(read(spark, root, Some(4L)).count() == 40)
  }

  test("vacuum drops expired manifests and unreferenced files, keeps live ones") {
    val root = tmpTable()
    append(spark.range(5).toDF("id"), root)
    overwrite(spark.range(7).toDF("id"), root)
    compact(spark, root, nFiles = 1)
    vacuum(root, keepVersions = 1, retentionMs = 0L)
    // only v3 survives; its data is intact
    assert(currentVersion(root).contains(3L))
    assert(!Files.exists(Paths.get(root, "_graft_log", f"v${1L}%020d.json")))
    assert(!Files.exists(Paths.get(root, "_graft_log", f"v${2L}%020d.json")))
    assert(read(spark, root).count() == 7)
    // every remaining data file is referenced by the surviving manifest
    import scala.jdk.CollectionConverters._
    val live = readManifest(root, 3L).files.toSet
    val onDisk = Files.walk(Paths.get(root, "data")).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => Paths.get(root).relativize(p).toString).toSet
    assert(onDisk == live)
    // time travel to a vacuumed version now fails cleanly
    intercept[IllegalArgumentException](read(spark, root, Some(1L)))
  }

  test("merge: upsert + delete rewrites only touched files") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    // 4 commits of 10 rows each = 4 disjoint key ranges in separate files
    (0 until 4).foreach(i => append(
      spark.range(i * 10, i * 10 + 10)
        .selectExpr("id", "CAST(id * 100 AS LONG) AS v"), root))
    val before = readManifest(root, 4L)
    // source: update ids 5..7, delete id 12, insert ids 100..101 —
    // touches the files of commits 1 and 2 only
    val source = spark.range(5, 8)
      .selectExpr("id", "CAST(-1 AS LONG) AS v")
      .unionByName(spark.sql("SELECT 12L AS id, 0L AS v"))
      .unionByName(spark.range(100, 102).selectExpr("id", "CAST(7 AS LONG) AS v"))
    val v = merge(spark, root, source, Seq("id"),
      deleteWhen = Some(col("v") === 0L))
    val after = readManifest(root, v)
    // commits 3 and 4's files survive by reference (no rewrite)
    val untouchedBefore = before.files.filter { f =>
      val s = before.statsOrNil.find(_.path == f).get
      s.mins("id").toLong >= 20
    }.toSet
    assert(untouchedBefore.subsetOf(after.files.toSet))
    val got = read(spark, root).orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = ((0L until 40L).filterNot(_ == 12L).map(i =>
      if (i >= 5 && i <= 7) (i, -1L) else (i, i * 100)) ++
      Seq((100L, 7L), (101L, 7L))).sortBy(_._1)
    assert(got.toSeq == expect)
    // snapshot isolation: pre-merge version still has id=12, old values
    assert(read(spark, root, Some(4L)).filter("id = 12").count() == 1)
    // duplicate source keys are rejected
    intercept[IllegalArgumentException](
      merge(spark, root, source.unionByName(source), Seq("id")))
  }

  test("delete rewrites only files containing matches") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    (0 until 3).foreach(i => append(
      spark.range(i * 10, i * 10 + 10).toDF("id"), root))
    val before = readManifest(root, 3L)
    val v = delete(spark, root, col("id") === 25L)
    val after = readManifest(root, v)
    // files for ranges [0,10) and [10,20) carried over untouched
    val untouched = before.statsOrNil.filter(_.maxs("id").toLong < 20).map(_.path)
    assert(untouched.nonEmpty && untouched.forall(after.files.contains))
    assert(read(spark, root).count() == 29)
    assert(read(spark, root).filter("id = 25").count() == 0)
  }

  test("manifest stats prune files; pruned read equals full-scan filter") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    // 4 commits with disjoint id ranges and distinct tags
    (0 until 4).foreach { i =>
      append(spark.range(i * 100, i * 100 + 100)
        .selectExpr("id", s"'tag$i' AS tag",
          "IF(id % 10 = 0, CAST(NULL AS LONG), id) AS maybe"), root)
    }
    val m = readManifest(root, 4L)
    assert(m.statsOrNil.size == m.files.size)

    val p1 = col("id") >= 150 && col("id") < 250 // spans commits 2 and 3
    val files1 = prunedFiles(spark, m, p1)
    assert(files1.size < m.files.size)
    assert(readPruned(spark, root, p1).count() ==
      read(spark, root).filter(p1).count())

    val p2 = col("tag") === "tag0" // string equality → one commit's files
    val keptRows = readPruned(spark, root, p2)
    assert(prunedFiles(spark, m, p2).forall(f =>
      m.statsOrNil.find(_.path == f).get.mins("tag") == "tag0"))
    assert(keptRows.count() == 100)

    val p3 = col("maybe").isNull || col("id") === 399L
    assert(readPruned(spark, root, p3).count() ==
      read(spark, root).filter(p3).count())

    // unsupported shape (arithmetic) must not prune or change results
    val p4 = (col("id") % 7) === 3
    assert(prunedFiles(spark, m, p4).size == m.files.size)
    assert(readPruned(spark, root, p4).count() ==
      read(spark, root).filter(p4).count())
  }

  test("additive schema evolution: new columns appear, old files read null") {
    val root = tmpTable()
    append(spark.range(3).selectExpr("id", "id * 2 AS v"), root)
    append(spark.range(3, 5).selectExpr("id", "id * 2 AS v", "'x' AS tag"), root)
    val snap = read(spark, root)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "tag"))
    assert(snap.filter("tag IS NULL").count() == 3) // old files fill null
    assert(snap.filter("tag = 'x'").count() == 2)
    // a later append may omit the evolved column too
    append(spark.range(5, 6).selectExpr("id", "id * 2 AS v"), root)
    assert(read(spark, root).filter("tag IS NULL").count() == 4)
    // time travel keeps version 1's own two-column schema
    assert(read(spark, root, Some(1L)).schema.fieldNames.toSeq == Seq("id", "v"))
    // retyping an existing column is rejected
    intercept[IllegalArgumentException](
      append(spark.range(1).selectExpr("CAST(id AS STRING) AS id"), root))
  }

  test("type widening: int->long and float->double evolve; lossy retyping rejected") {
    val root = tmpTable()
    append(spark.range(3).selectExpr(
      "CAST(id AS INT) AS id", "CAST(id AS FLOAT) AS x"), root)
    // wider append: manifest takes the wider type, old files upcast on read
    append(spark.range(3, 5).selectExpr(
      "id", "CAST(id AS DOUBLE) AS x"), root)
    val snap = read(spark, root)
    assert(snap.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(snap.schema("x").dataType == org.apache.spark.sql.types.DoubleType)
    assert(snap.count() == 5)
    assert(snap.selectExpr("sum(id)").head.getLong(0) == 10L)
    assert(snap.selectExpr("sum(x)").head.getDouble(0) == 10.0)
    // a later NARROW append still lands (manifest stays wide)
    append(spark.range(5, 6).selectExpr(
      "CAST(id AS INT) AS id", "CAST(id AS FLOAT) AS x"), root)
    assert(read(spark, root).selectExpr("sum(id)").head.getLong(0) == 15L)
    // time travel keeps version 1's own narrow schema
    assert(read(spark, root, Some(1L)).schema("id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // stats pruning still works across mixed-width files
    val pruned = readPruned(spark, root,
      org.apache.spark.sql.functions.col("id") >= 5L)
    assert(pruned.count() == 1)
    // lossy retyping is still rejected
    intercept[IllegalArgumentException](
      append(spark.range(1).selectExpr("id", "CAST(id AS STRING) AS x"), root))
  }

  test("tags: named snapshots survive vacuum; names are immutable until untag") {
    val root = tmpTable()
    (1L to 5L).foreach(i => append(spark.range(i * 10, i * 10 + 3).toDF("id"), root))
    val tagged = tag(root, "corpus-v1", Some(2L))
    assert(tagged == 2L)
    assert(tag(root, "latest") == 5L) // default: current version
    // NB: qualified — AnyFunSuite has its own `tags` member that shadows
    assert(CommitLog.tags(root) == Map("corpus-v1" -> 2L, "latest" -> 5L))
    // tag names are immutable until untag
    intercept[IllegalStateException](tag(root, "corpus-v1", Some(3L)))
    // vacuum keeps only the newest version... but the tagged v2 is pinned
    vacuum(root, keepVersions = 1, retentionMs = 0L)
    val v2 = readTag(spark, root, "corpus-v1")
    assert(v2.count() == 6) // versions 1-2's rows
    assert(read(spark, root).count() == 15)
    // untagged history is actually gone
    intercept[Exception](read(spark, root, Some(3L)).count())
    // untag releases the pin: the next vacuum reclaims v2's standalone state
    assert(untag(root, "corpus-v1"))
    vacuum(root, keepVersions = 1, retentionMs = 0L)
    intercept[Exception](read(spark, root, Some(2L)).count())
    assert(read(spark, root).count() == 15) // current unaffected
  }

  test("timestampAsOf: time-based time travel resolves the snapshot current at an instant") {
    val root = tmpTable()
    append(spark.range(3).toDF("id"), root)
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    append(spark.range(3, 8).toDF("id"), root)
    assert(readAsOf(spark, root, between).count() == 3)
    assert(versionAsOf(root, System.currentTimeMillis()) == 2L)
    // before the first commit: no resolvable version
    intercept[IllegalArgumentException](versionAsOf(root, 1L))
    // history carries the publish instant
    val ts = history(spark, root).orderBy("version")
      .collect().map(_.getAs[java.sql.Timestamp]("commit_ts").getTime)
    assert(ts(0) > 0 && ts(0) <= between && between <= ts(1))
    // and through the data source option
    val v1 = spark.read.format("graft-commitlog")
      .option("timestampAsOf", between).load(root)
    assert(v1.count() == 3)
  }

  test("write-audit-publish: a failing batch never reaches the published table") {
    // The WAP pattern composed from existing primitives: land each batch
    // on a STAGING table (atomic commit), audit the staged snapshot, and
    // only a passing batch is appended to the published table — whose
    // readers therefore never observe unaudited rows. A failing batch is
    // restored away on staging and the published table is untouched.
    val staging = tmpTable()
    val prod = tmpTable()
    def audit(df: org.apache.spark.sql.DataFrame): Boolean =
      df.filter("v < 0").isEmpty // the quality gate: no negative values
    def wap(batch: org.apache.spark.sql.DataFrame): Boolean = {
      val v = append(batch, staging)
      val staged = changes(spark, staging, v - 1, v) // exactly this batch
      if (audit(staged)) { append(staged, prod); true }
      else { restore(staging, v - 1); false } // metadata-only reject
    }
    append(spark.range(1).selectExpr("id", "id AS v").limit(0), staging)
    val good = spark.range(5).selectExpr("id", "id AS v")
    val bad = spark.range(5, 8).selectExpr("id", "-id AS v")
    assert(wap(good))
    assert(!wap(bad))
    assert(read(spark, prod).count() == 5) // bad rows never published
    assert(read(spark, staging).count() == 5) // staging restored
    val good2 = spark.range(8, 10).selectExpr("id", "id AS v")
    assert(wap(good2))
    assert(read(spark, prod).count() == 7)
  }

  test("withRetry: losing writer retries against the fresh snapshot and lands") {
    val root = tmpTable()
    append(spark.range(3).toDF("id"), root)
    // Simulate losing the race once: the first attempt is preempted by a
    // competing commit published between its read and its publish.
    var raced = false
    val v = withRetry() {
      val base = currentVersion(root).get
      if (!raced) {
        raced = true
        // competitor lands version base+1 first
        val m = readManifest(root, base)
        publish(root, Commit(base + 1, "append", m.schemaJson))
        // our attempt now conflicts on base+1
        publish(root, Commit(base + 1, "overwrite", m.schemaJson))
        sys.error("unreachable — publish above must conflict")
      }
      append(spark.range(3, 5).toDF("id"), root)
    }
    assert(v == 3L) // competitor took 2, retry landed 3
    assert(read(spark, root).count() == 5)
    // exhausted retries propagate the conflict
    intercept[CommitConflictException](withRetry(maxRetries = 0) {
      val m = readManifest(root, 1L)
      publish(root, Commit(currentVersion(root).get, "append", m.schemaJson))
    })
  }

  test("createView exposes pinned snapshots to the SQL surface") {
    val root = tmpTable()
    append(spark.range(4).toDF("id"), root)
    createView(spark, root, "clv_latest")
    createView(spark, root, "clv_v1", Some(1L))
    append(spark.range(4, 10).toDF("id"), root)
    // views are snapshots: both still read version 1 until re-registered
    assert(spark.sql("SELECT count(*) FROM clv_v1").collect()(0).getLong(0) == 4)
    createView(spark, root, "clv_latest")
    assert(spark.sql("SELECT count(*) FROM clv_latest").collect()(0).getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM clv_v1").collect()(0).getLong(0) == 4)
  }

  test("rowCount answers from manifest stats without reading data") {
    val root = tmpTable()
    append(spark.range(7).toDF("id"), root)
    append(spark.range(7, 12).toDF("id"), root)
    assert(rowCount(root).contains(12L))
    assert(rowCount(root, Some(1L)).contains(7L))
    overwrite(spark.range(0).toDF("id"), root)
    assert(rowCount(root).contains(0L))
    assert(rowCount(java.nio.file.Files.createTempDirectory("empty").toString).isEmpty)
  }

  test("changes() reads exactly the files added between two versions") {
    val v1Data = spark.range(10).toDF("id")
    val root = tmpTable()
    val v1 = append(v1Data, root)
    val v2 = append(spark.range(10, 14).toDF("id"), root)
    val v3 = append(spark.range(14, 15).toDF("id"), root)
    assert(changes(spark, root, v1, v2).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == (10L until 14L))
    assert(changes(spark, root, v1, v3).count() == 5)
    assert(changes(spark, root, v2, v2).count() == 0)
    intercept[IllegalArgumentException](changes(spark, root, v3, v1))
  }

  test("z-order clustering tightens pruning on every clustered column") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    // two independent uniform dimensions; 4 unsorted commits
    (0 until 4).foreach { i =>
      append(spark.range(i * 1000, i * 1000 + 1000)
        .selectExpr("id", "id % 997 AS x", "(id * 7919) % 997 AS y"), root)
    }
    val before = readManifest(root, 4L)
    val pred = col("y") >= 100 && col("y") < 150 // narrow slice of y
    // before clustering every file spans ~all of y → nothing prunes
    assert(prunedFiles(spark, before, pred).size == before.files.size)
    val v = cluster(spark, root, Seq("x", "y"), nFiles = 16)
    val after = readManifest(root, v)
    assert(after.files.size == 16)
    val prunedY = prunedFiles(spark, after, pred)
    val prunedX = prunedFiles(spark, after, col("x") >= 100 && col("x") < 150)
    assert(prunedY.size < after.files.size / 2,
      s"y-pruning kept ${prunedY.size}/${after.files.size}")
    assert(prunedX.size < after.files.size / 2,
      s"x-pruning kept ${prunedX.size}/${after.files.size}")
    // rewrite preserved content exactly
    assert(readPruned(spark, root, pred).agg(sum("id")).collect()(0).getLong(0) ==
      read(spark, root, Some(4L)).filter(pred).agg(sum("id")).collect()(0).getLong(0))
    assert(read(spark, root).count() == 4000)
  }

  test("appendTxn is idempotent per (appId, batchId); independent writers interleave") {
    val root = tmpTable()
    val b0 = spark.range(3).toDF("id")
    appendTxn(b0, root, "app1", 0L)
    appendTxn(spark.range(3, 5).toDF("id"), root, "app1", 1L)
    // replayed batch 1 (failure recovery) must be a no-op
    val vBefore = currentVersion(root).get
    assert(appendTxn(spark.range(100, 200).toDF("id"), root, "app1", 1L) == vBefore)
    assert(read(spark, root).count() == 5)
    // a DIFFERENT writer with the same batchId still commits
    appendTxn(spark.range(5, 6).toDF("id"), root, "app2", 1L)
    assert(read(spark, root).count() == 6)
    // plain appends leave txn state intact for later streaming batches
    append(spark.range(6, 7).toDF("id"), root)
    assert(appendTxn(spark.range(300, 400).toDF("id"), root, "app1", 1L) ==
      currentVersion(root).get) // still deduped
    assert(read(spark, root).count() == 7)
  }

  test("streamingSink commits micro-batches exactly once via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpTable()
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("id").writeStream
      .foreachBatch(streamingSink(root, "stream-spec"))
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt").toString)
      .start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(4L, 5L)
      q.processAllAvailable()
      assert(read(spark, root).count() == 5)
      // txn watermark recorded → re-delivering the last batch is a no-op
      val m = readManifest(root, currentVersion(root).get)
      val last = m.txnOrEmpty("stream-spec")
      assert(appendTxn(spark.range(9).toDF("id"), root, "stream-spec", last) ==
        currentVersion(root).get)
      assert(read(spark, root).count() == 5)
    } finally q.stop()
  }

  test("incremental log: commit bytes are O(1) per commit, not O(files-so-far)") {
    // 1,000 synthetic single-file commits (the data files never exist — this
    // exercises ONLY the log machinery, which is the point). Under the old
    // full-rewrite manifest design commit N carried all N file entries, so
    // the log grew O(N²); here every commit carries exactly its own add.
    val root = tmpTable()
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))).json
    var prior: Option[Manifest] = None
    (1L to 1000L).foreach { v =>
      val c = Commit(v, "append", schemaJson,
        add = Seq(FileStat(s"data/f$v.parquet", 1L, 100L,
          Map("id" -> v.toString), Map("id" -> v.toString), Map("id" -> 0L))))
      commitDelta(root, prior, c)
      prior = Some(foldForTest(prior, c))
    }
    val logFiles = Files.list(Paths.get(root, "_graft_log")).iterator()
    val sizes = scala.jdk.CollectionConverters.IteratorHasAsScala(logFiles).asScala
      .map(p => p.getFileName.toString -> Files.size(p)).toMap
    val commitSizes = sizes.filter(e => e._1.endsWith(".json") && !e._1.contains("checkpoint"))
    assert(commitSizes.size == 1000)
    // O(1) commit records: the last commit is no bigger than the first
    // (±ε for the longer version number)
    assert(commitSizes(f"v${1000L}%020d.json") <= commitSizes(f"v${1L}%020d.json") + 64,
      s"commit 1000 is ${commitSizes(f"v${1000L}%020d.json")}B vs commit 1 ${commitSizes(f"v${1L}%020d.json")}B — log is not incremental")
    // checkpoints every K commits; pointer at the last one
    assert(sizes.contains(f"v${1000L}%020d.checkpoint.json"))
    assert(currentVersion(root).contains(1000L))
    // snapshot resolution needs only checkpoint + tail: drop ALL commits at
    // or below the last checkpoint and the snapshot still materializes
    (1L to 990L).foreach(v => Files.delete(Paths.get(root, "_graft_log", f"v$v%020d.json")))
    val m = readManifest(root, 1000L)
    assert(m.files.size == 1000)
    assert(m.statsOrNil.map(_.rows).sum == 1000L)
    // historical resolution from an interior checkpoint still works too
    assert(readManifest(root, 995L).files.size == 995)
    // log retention bounds the chain: after an unconditional trim exactly
    // one commit record remains and the snapshot still resolves from the
    // boundary checkpoint alone — the streaming-sink "10⁵ commits/week"
    // growth path is capped by a metadata-only maintenance call
    vacuumLog(root, retentionMs = -1L)
    val afterTrim = Files.list(Paths.get(root, "_graft_log")).iterator()
    val commitRecords = scala.jdk.CollectionConverters
      .IteratorHasAsScala(afterTrim).asScala
      .map(_.getFileName.toString)
      .count(n => n.startsWith("v") && n.endsWith(".json") &&
        !n.contains("checkpoint"))
    assert(commitRecords == 1, s"expected 1 commit record, got $commitRecords")
    assert(readManifest(root, 1000L).files.size == 1000)
    assert(currentVersion(root).contains(1000L))
  }

  test("partitioned appends: files are single-valued, stats-pruning is partition pruning") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    val df = spark.range(300).selectExpr(
      "id", "CASE WHEN id % 3 = 0 THEN 'click' WHEN id % 3 = 1 THEN 'view' ELSE 'buy' END AS etype")
    append(df, root, partitionBy = Seq("etype"))
    val m = readManifest(root, 1L)
    assert(m.partitionByOrNil == Seq("etype"))
    // one file per partition value; each single-valued (min = max) with the
    // partition tuple recorded
    assert(m.statsOrNil.size == 3)
    m.statsOrNil.foreach { s =>
      assert(s.mins("etype") == s.maxs("etype"))
      assert(s.partitionsOrEmpty == Map("etype" -> s.mins("etype")))
      assert(s.bytes > 0L)
    }
    // pruning on the partition column opens exactly the matching file
    assert(prunedFiles(spark, m, col("etype") === "view").size == 1)
    assert(readPruned(spark, root, col("etype") === "view").count() == 100)
    // the spec persists: a PLAIN append stays partitioned...
    append(spark.range(300, 330).selectExpr("id", "'click' AS etype"), root)
    val m2 = readManifest(root, 2L)
    assert(m2.partitionByOrNil == Seq("etype"))
    assert(prunedFiles(spark, m2, col("etype") === "view").size == 1)
    // ...a conflicting spec is rejected...
    intercept[IllegalArgumentException](
      append(spark.range(5).selectExpr("id", "'x' AS etype"), root,
        partitionBy = Seq("id")))
    // ...and merge preserves single-valued files
    val src = spark.range(10, 13).selectExpr("id", "'buy' AS etype")
    merge(spark, root, src, Seq("id"))
    val m3 = readManifest(root, currentVersion(root).get)
    assert(m3.partitionByOrNil == Seq("etype"))
    m3.statsOrNil.foreach(s => assert(s.mins("etype") == s.maxs("etype")))
    assert(read(spark, root).count() == 330)
    assert(read(spark, root).filter("id IN (10, 11, 12) AND etype = 'buy'").count() == 3)
    // z-order and optimize rewrites ALSO preserve the layout contract
    cluster(spark, root, Seq("id"), nFiles = 4)
    val m4 = readManifest(root, currentVersion(root).get)
    assert(m4.partitionByOrNil == Seq("etype"))
    m4.statsOrNil.foreach(s => assert(s.mins("etype") == s.maxs("etype")))
    assert(read(spark, root).count() == 330)
    // ...and the z-layout itself survived partitioned staging (staging
    // must not re-shuffle the range-sorted rows): id pruning now works
    assert(prunedFiles(spark, m4, col("id") < 50).size < m4.files.size)
    optimize(spark, root)
    val m5 = readManifest(root, currentVersion(root).get)
    assert(m5.partitionByOrNil == Seq("etype"))
    m5.statsOrNil.foreach(s => assert(s.mins("etype") == s.maxs("etype")))
    assert(prunedFiles(spark, m5, col("etype") === "view").size < m5.files.size)
    assert(read(spark, root).count() == 330)
  }

  test("vacuum retention: young unreferenced files survive (in-flight writer safety)") {
    val root = tmpTable()
    append(spark.range(5).toDF("id"), root)
    compact(spark, root)
    // a concurrent writer's freshly staged, not-yet-published file
    val staged = Paths.get(root, "data", "in-flight")
    Files.createDirectories(staged)
    val f = staged.resolve("part-0.parquet")
    Files.write(f, Array[Byte](1, 2, 3))
    vacuum(root, keepVersions = 1) // default retention: must NOT delete it
    assert(Files.exists(f))
    // out of retention → reclaimed
    vacuum(root, keepVersions = 1, retentionMs = 0L)
    assert(!Files.exists(f))
    assert(read(spark, root).count() == 5)
  }

  test("timestamp stats prune correctly across session timezones") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    // two files with disjoint timestamp ranges, written under UTC
    append(spark.range(2).coalesce(1).selectExpr(
      "id", "timestamp_micros(CAST(1700000000000000 + id * 1000000 AS LONG)) AS ts"), root)
    append(spark.range(2).coalesce(1).selectExpr(
      "id", "timestamp_micros(CAST(1800000000000000 + id * 1000000 AS LONG)) AS ts"), root)
    val m = readManifest(root, 2L)
    val cut = new java.sql.Timestamp(1750000000000L) // between the two ranges
    def check(): Unit = {
      val pred = col("ts") > lit(cut)
      assert(prunedFiles(spark, m, pred).size == 1, "late file only")
      assert(readPruned(spark, root, pred).count() == 2)
    }
    check()
    // a reader session in another zone must prune the same files — the
    // stats are unix micros, not zone-rendered strings
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Pacific/Kiritimati") // UTC+14
      check()
    } finally spark.conf.set(tzKey, saved)
  }

  test("optimize rewrites only under-sized files; right-sized files carry by reference") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    // one "big" file (5k rows) + five tiny single-row commits
    append(spark.range(5000).coalesce(1).selectExpr("id", "id * 3 AS v"), root)
    (0 until 5).foreach(i =>
      append(spark.range(10000 + i, 10001 + i).coalesce(1)
        .selectExpr("id", "id * 3 AS v"), root))
    val before = readManifest(root, currentVersion(root).get)
    assert(before.files.size == 6)
    val bigBytes = before.statsOrNil.map(_.bytes).max
    val v = optimize(spark, root, targetBytes = bigBytes) // big file is "right-sized"
    val after = readManifest(root, v)
    assert(after.op == "optimize")
    // the big file survived BY REFERENCE; the 5 tinies became 1
    val bigPath = before.statsOrNil.maxBy(_.bytes).path
    assert(after.files.contains(bigPath))
    assert(after.files.size == 2)
    // content identical, history intact
    assert(read(spark, root).count() == 5005)
    assert(read(spark, root).agg(sum("v")).collect()(0).getLong(0) ==
      read(spark, root, Some(before.version)).agg(sum("v")).collect()(0).getLong(0))
    // nothing left to do → no-op commit-free return
    assert(optimize(spark, root, targetBytes = 10L) == v)
    // a file in [target/2, target) is a PRODUCT of optimization, never a
    // candidate: selecting up to the full target would re-merge its own
    // output forever (two 0.75·target files → two 0.75·target files)
    val mergedBytes = after.statsOrNil.filterNot(_.path == bigPath).head.bytes
    assert(optimize(spark, root, targetBytes = mergedBytes * 4 / 3) == v)
  }

  test("history lists per-commit audit rows from metadata alone") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    append(spark.range(10).coalesce(1).toDF("id"), root)
    append(spark.range(10, 14).coalesce(1).toDF("id"), root)
    delete(spark, root, col("id") === 11L)
    val h = history(spark, root).orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "append"), (2L, "append"), (3L, "delete")))
    assert(h(0).getAs[Long]("added_rows") == 10L)
    assert(h(1).getAs[Long]("added_rows") == 4L)
    assert(h(2).getAs[Int]("removed_files") == 1)
    assert(h.forall(_.getAs[Long]("added_bytes") > 0L))
    // vacuumed prefixes disappear from history but the rest still lists
    append(spark.range(20, 22).toDF("id"), root)
    vacuum(root, keepVersions = 2, retentionMs = 0L)
    val h2 = history(spark, root).collect()
    assert(h2.map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
  }

  test("optimistic concurrency: racing threads all land via withRetry") {
    val root = tmpTable()
    val errors = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        try {
          (0 until 3).foreach { i =>
            withRetry(maxRetries = 100) {
              append(spark.range(t * 1000 + i * 10, t * 1000 + i * 10 + 1)
                .toDF("id"), root)
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"writer failed: ${errors}")
    // every commit landed exactly once: 4 writers x 3 appends
    assert(currentVersion(root).contains(12L))
    assert(read(spark, root).count() == 12)
    // the log is a dense, uncorrupted chain; every version resolves
    (1L to 12L).foreach(v => assert(readManifest(root, v).version == v))
    // checkpoint machinery behaved under the race (v10 crossed the interval)
    assert(Files.exists(Paths.get(root, "_graft_log", f"v${10L}%020d.checkpoint.json")))
  }

  test("restore rolls current contents back to a snapshot without moving data") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    append(spark.range(5).toDF("id"), root) // v1
    append(spark.range(5, 8).toDF("id"), root) // v2
    delete(spark, root, col("id") === 6L) // v3: the "mistake"
    val v = restore(root, 2L)
    assert(v == 4L)
    val m = readManifest(root, v)
    assert(m.op == "restore")
    // current contents == v2 exactly
    assert(read(spark, root).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L until 8L))
    // the restore re-references v2's ORIGINAL files (metadata-only undo)
    assert(m.files.toSet == readManifest(root, 2L).files.toSet)
    // history intact: the undone delete still time-travels
    assert(read(spark, root, Some(3L)).filter("id = 6").count() == 0)
    // and a restore is itself just a commit — further appends proceed
    append(spark.range(8, 9).toDF("id"), root)
    assert(read(spark, root).count() == 9)
    intercept[IllegalArgumentException](restore(root, 99L))
  }

  test("partition values with URI-special characters round-trip through stats and merge") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    // spaces and percent signs land in directory names URL-encoded;
    // stats matching and the merge touch-probe must decode before compare
    val df = spark.range(20).selectExpr(
      "id", "CASE WHEN id % 2 = 0 THEN 'big sale' ELSE '100% off' END AS tag")
    append(df, root, partitionBy = Seq("tag"))
    val m = readManifest(root, 1L)
    assert(m.statsOrNil.size == 2)
    m.statsOrNil.foreach(s => assert(s.mins("tag") == s.maxs("tag")))
    assert(read(spark, root).count() == 20)
    assert(readPruned(spark, root, col("tag") === "big sale").count() == 10)
    // merge must find the touched files despite the encoded dir names
    val src = spark.range(2, 4).selectExpr("id", "'big sale' AS tag")
    merge(spark, root, src, Seq("id"))
    assert(read(spark, root).count() == 20) // updates, not duplicate inserts
    assert(read(spark, root).filter("id IN (2, 3) AND tag = 'big sale'").count() == 2)
  }

  test("vacuum with a wider window after a narrower one clamps to available history") {
    val root = tmpTable()
    (0 until 6).foreach(i => append(spark.range(i, i + 1).toDF("id"), root))
    vacuum(root, keepVersions = 1, retentionMs = 0L)
    assert(currentVersion(root).contains(6L))
    // a wider window than what survives must clamp, not crash
    vacuum(root, keepVersions = 5, retentionMs = 0L)
    assert(read(spark, root).count() == 6)
    assert(readManifest(root, 6L).files.nonEmpty)
  }

  test("tag-during-vacuum race: a racing tag never ends up naming reclaimed files") {
    val root = tmpTable()
    (1 to 4).foreach(i => append(spark.range(i * 10L, i * 10L + 3).toDF("id"), root))
    // Race a below-boundary tag into the exact window the barrier guards:
    // the contract is "survives with live files OR fails cleanly" — with
    // the barrier the tag backs out, leaving no ref behind.
    var raced: Option[Throwable] = None
    vacuum(root, keepVersions = 1, retentionMs = 0L, barrierHook = () => {
      raced = (try { tag(root, "racer", Some(1L)); None }
      catch { case e: Throwable => Some(e) })
    })
    raced match {
      case Some(e) =>
        assert(e.isInstanceOf[IllegalStateException])
        assert(!CommitLog.tags(root).contains("racer")) // no dangling ref
      case None =>
        // pinned by the vacuum's under-barrier tag snapshot: fully readable
        assert(readTag(spark, root, "racer").count() == 3)
    }
    // the barrier never outlives the vacuum
    assert(!Files.exists(Paths.get(root, "_graft_log", "_vacuum_in_progress")))
    // an AT-boundary tag racing the same window is allowed and survives
    vacuum(root, keepVersions = 1, retentionMs = 0L, barrierHook = () => {
      assert(tag(root, "current-ok", Some(4L)) == 4L)
    })
    assert(readTag(spark, root, "current-ok").count() == 12)
    // after the vacuum, tagging a reclaimed version fails cleanly too
    intercept[Exception](tag(root, "too-late", Some(2L)))
    assert(!CommitLog.tags(root).contains("too-late"))
  }

  test("vacuumLog bounds the metadata chain; tagged and in-window reads survive") {
    val root = tmpTable()
    (1 to 6).foreach(i => append(spark.range(i * 10L, i * 10L + 2).toDF("id"), root))
    tag(root, "pin3", Some(3L))
    vacuumLog(root, retentionMs = -1L) // unconditional: metadata-only trim
    // current snapshot unaffected — DATA files were never touched
    assert(read(spark, root).count() == 12)
    // the tagged below-boundary version still resolves (own checkpoint)
    // and still READS: log retention never invalidates a named snapshot
    assert(readTag(spark, root, "pin3").count() == 6)
    // untagged old versions error cleanly
    intercept[Exception](read(spark, root, Some(2L)).count())
    intercept[Exception](readManifest(root, 5L))
    // the chain is bounded: exactly one commit record (current) remains
    val names = Files.list(Paths.get(root, "_graft_log")).iterator()
    val byKind = scala.jdk.CollectionConverters.IteratorHasAsScala(names).asScala
      .map(_.getFileName.toString).toSeq
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .partition(_.endsWith(".checkpoint.json"))
    assert(byKind._2.size == 1, s"expected 1 commit record, got ${byKind._2}")
    // checkpoints: the boundary's and the pinned tag's
    assert(byKind._1.map(_.take(21)).toSet ==
      Set(f"v${6L}%020d", f"v${3L}%020d"))
    // the table keeps working: appends land on top of the trimmed log
    append(spark.range(100L, 103L).toDF("id"), root)
    assert(currentVersion(root).contains(7L))
    assert(read(spark, root).count() == 15)
    // a second trim converges (nothing below the boundary anymore)
    vacuumLog(root, retentionMs = -1L)
    assert(read(spark, root).count() == 15)
  }

  test("optimize converges on partitioned tables: lone small files per partition are left alone") {
    import org.apache.spark.sql.functions._
    val root = tmpTable()
    append(spark.range(30).selectExpr(
      "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p"), root,
      partitionBy = Seq("p"))
    // one file per partition, both tiny: nothing mergeable → no-op forever
    val v1 = currentVersion(root).get
    assert(optimize(spark, root) == v1)
    assert(optimize(spark, root) == v1) // idempotent, no new commits
    // a second small commit makes partitions 2-filed → one real rewrite
    append(spark.range(30, 40).selectExpr(
      "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p"), root)
    val v2 = optimize(spark, root)
    assert(v2 == currentVersion(root).get && v2 > v1 + 1 - 1)
    val m = readManifest(root, v2)
    assert(m.statsOrNil.size == 2) // one file per partition again
    assert(optimize(spark, root) == v2) // and converged again
    assert(read(spark, root).count() == 40)
  }

  test("partition spec evolution: metadata-only, old files keep pruning") {
    val root = tmpTable()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .selectExpr("id", "CAST(id % 3 AS STRING) AS a", "CAST(id % 5 AS STRING) AS b")
    append(mk(0, 300), root, partitionBy = Seq("a")) // old layout: by a
    val vEvolve = setPartitionSpec(root, Seq("b"))
    assert(vEvolve == 2L)
    assert(readManifest(root, 2L).op == "evolve-partition")
    assert(readManifest(root, 2L).partitionByOrNil == Seq("b"))
    append(mk(300, 600), root) // new layout: by b, inherited
    val m = readManifest(root, 3L)
    assert(m.partitionByOrNil == Seq("b"))
    // every row still reads; both generations coexist
    assert(read(spark, root).count() == 600)
    // old files prune on a (their stats are single-valued on a),
    // new files prune on b — stats-based pruning is layout-agnostic
    import org.apache.spark.sql.functions.col
    val onA = prunedFiles(spark, m, col("a") === "1")
    val onB = prunedFiles(spark, m, col("b") === "2")
    assert(onA.size < m.files.size && onB.size < m.files.size)
    assert(read(spark, root).filter(col("a") === "1").count() ==
      (0L until 600L).count(_ % 3 == 1))
    // a rewrite migrates everything into the CURRENT spec: after compact,
    // every file is single-valued on b (min = max in its stats)
    compact(spark, root)
    val mc = readManifest(root, 4L)
    assert(mc.statsOrNil.forall(st =>
      st.minsOrEmpty.get("b") == st.maxsOrEmpty.get("b")))
    assert(read(spark, root).count() == 600)
    // unknown or stat-less columns are rejected up front
    intercept[IllegalArgumentException](setPartitionSpec(root, Seq("nope")))
  }

  test("legacy full-manifest records fail loudly instead of reading as empty") {
    val root = tmpTable()
    append(spark.range(3).toDF("id"), root)
    // forge a round-3-style record: full `files` list instead of add/remove
    val legacy = """{"version":2,"op":"append","schemaJson":"{}","files":["data/x.parquet"],"fileStats":[]}"""
    Files.write(Paths.get(root, "_graft_log", f"v${2L}%020d.json"), legacy.getBytes)
    val e = intercept[IllegalArgumentException](readManifest(root, 2L))
    assert(e.getMessage.contains("legacy"))
    // version 1 (real format) still reads
    assert(readManifest(root, 1L).files.nonEmpty)
  }

  private def foldForTest(prior: Option[Manifest], c: Commit): Manifest = {
    val removed = c.removeOrNil.toSet
    Manifest(c.version, c.op, c.schemaJson,
      prior.map(_.statsOrNil).getOrElse(Nil).filterNot(s => removed(s.path)) ++ c.addOrNil,
      c.partitionByOrNil, c.txnOrEmpty)
  }

  test("CHECK constraints: violating writes abort atomically on every path") {
    val root = tmpTable()
    append(spark.range(10).selectExpr("id", "id * 2 AS v"), root)
    val vC = addConstraint(spark, root, "v_nonneg", "v >= 0")
    assert(constraintsOf(root) == Map("v_nonneg" -> "v >= 0"))

    // good writes land on every path
    append(spark.range(10, 12).selectExpr("id", "id * 2 AS v"), root)
    merge(spark, root, spark.range(2).selectExpr("id", "id * 3 AS v"), Seq("id"))
    update(spark, root,
      Seq("v" -> org.apache.spark.sql.functions.lit(7L)),
      org.apache.spark.sql.functions.col("id") === 1L)
    val vGood = currentVersion(root).get

    // each violating write throws and publishes NOTHING
    def violates(f: => Any): Unit = {
      val e = intercept[IllegalStateException](f)
      assert(e.getMessage.contains("v_nonneg"))
      assert(currentVersion(root).contains(vGood), "a version leaked")
      assert(read(spark, root).filter("v < 0").isEmpty, "violating rows visible")
    }
    violates(append(spark.range(1).selectExpr("id + 100 AS id", "-1L AS v"), root))
    violates(appendTxn(
      spark.range(1).selectExpr("id + 200 AS id", "-5L AS v"), root, "app", 99L))
    violates(overwrite(spark.range(1).selectExpr("id", "-2L AS v"), root))
    violates(merge(spark, root,
      spark.range(1).selectExpr("id", "-3L AS v"), Seq("id")))
    violates(update(spark, root,
      Seq("v" -> org.apache.spark.sql.functions.lit(-9L)),
      org.apache.spark.sql.functions.col("id") === 0L))

    // NULL passes — SQL CHECK semantics (violation = exactly FALSE)
    append(spark.range(1).selectExpr("id + 300 AS id", "CAST(NULL AS LONG) AS v"), root)

    // drop → the formerly-violating append lands
    dropConstraint(root, "v_nonneg")
    assert(constraintsOf(root).isEmpty)
    append(spark.range(1).selectExpr("id + 400 AS id", "-1L AS v"), root)
    assert(read(spark, root).filter("v < 0").count() == 1)
  }

  test("CHECK constraints: existing violations reject registration; set survives checkpoints") {
    val root = tmpTable()
    append(spark.range(5).selectExpr("id", "id - 3 AS v"), root) // has v < 0
    val e = intercept[IllegalArgumentException](
      addConstraint(spark, root, "v_nonneg", "v >= 0"))
    assert(e.getMessage.contains("existing rows violate"))
    assert(constraintsOf(root).isEmpty)

    addConstraint(spark, root, "v_lo", "v >= -3")
    // push the log well past a checkpoint boundary: the constraint must
    // survive manifold folds from a checkpointed Manifest, not just the
    // registration commit
    (0 until 12).foreach(i =>
      append(spark.range(1).selectExpr(s"id + ${100 + i} AS id", "1L AS v"), root))
    assert(constraintsOf(root) == Map("v_lo" -> "v >= -3"))
    val e2 = intercept[IllegalStateException](
      append(spark.range(1).selectExpr("id", "-4L AS v"), root))
    assert(e2.getMessage.contains("v_lo"))
  }

  test("multiple CHECKs enforce in one scan and name the violated constraint") {
    val root = tmpTable()
    append(spark.range(5).selectExpr("id", "id + 1 AS v"), root)
    addConstraint(spark, root, "a_pos", "v > 0")
    addConstraint(spark, root, "b_small", "v < 100")
    // a row violating ONLY the second constraint must name it, not the first
    val e = intercept[IllegalStateException](
      append(spark.range(1).selectExpr("id + 50 AS id", "500L AS v"), root))
    assert(e.getMessage.contains("b_small") && !e.getMessage.contains("a_pos"))
    val e2 = intercept[IllegalStateException](
      append(spark.range(1).selectExpr("id + 60 AS id", "-1L AS v"), root))
    assert(e2.getMessage.contains("a_pos"))
    // both still enforced; a clean row lands
    append(spark.range(1).selectExpr("id + 70 AS id", "5L AS v"), root)
    assert(read(spark, root).filter("id = 70 AND v = 5").count() == 1)
  }

  test("RESTORE reverts the CHECK set along with the data (Delta semantics)") {
    val root = tmpTable()
    // v1: rows with v < 0 — valid because no constraint exists yet
    append(spark.range(5).selectExpr("id", "id - 3 AS v"), root)
    // v2: replace with non-negative rows; v3: constrain
    overwrite(spark.range(5).selectExpr("id", "id + 1 AS v"), root)
    val vConstrained = addConstraint(spark, root, "v_nonneg", "v >= 0")

    // Restoring v1 revives rows that were NEVER validated against
    // v_nonneg; carrying the newer constraint forward would publish a
    // snapshot that silently violates it. The restore commit must carry
    // v1's (empty) constraint set instead.
    restore(root, 1L)
    assert(read(spark, root).filter("v < 0").count() == 3)
    assert(constraintsOf(root).isEmpty,
      "restore must revert constraints with the data")
    // and the reverted set is LIVE: a formerly-violating append lands
    append(spark.range(1).selectExpr("id + 100 AS id", "-7L AS v"), root)

    // Restoring forward to the constrained version reinstates both its
    // data (non-negative) and its CHECK set atomically.
    restore(root, vConstrained)
    assert(constraintsOf(root) == Map("v_nonneg" -> "v >= 0"))
    assert(read(spark, root).filter("v < 0").isEmpty)
    val e = intercept[IllegalStateException](
      append(spark.range(1).selectExpr("id", "-1L AS v"), root))
    assert(e.getMessage.contains("v_nonneg"))
  }
}
