package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Per-file bloom index sidecars: write-time build (conf-gated, same stats
  * pass as min/max), equality/IN file skipping where min/max cannot prune
  * (high-cardinality unsorted keys whose per-file ranges all overlap),
  * and the lifecycle interop — rewrites re-index, vacuum reclaims orphaned
  * sidecars but never live ones, shallow clones probe across roots.
  */
class CommitLogBloomSpec extends SparkTestBase {
  import CommitLog._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-bloom").toString

  /** 8 single-file appends of interleaved ids (file i holds id % 8 == i),
    * so every file's [min,max] spans nearly the whole id domain and
    * min/max skipping is structurally useless — exactly the regime the
    * bloom index exists for. String key is derived 1:1 from the id.
    */
  private def writeInterleaved(root: String, n: Long = 800L): Unit = {
    val df = spark.range(n).selectExpr("id", "concat('key_', id) AS k",
      "CAST(id AS DOUBLE) / 7 AS score")
    (0 until 8).foreach { i =>
      append(df.filter(col("id") % 8 === i).coalesce(1), root)
    }
  }

  private def withBloomConf[T](cols: String, bits: Long = 65536L)(body: => T): T = {
    spark.conf.set(BloomColumnsConf, cols)
    spark.conf.set(BloomBitsConf, bits.toString)
    spark.conf.set(BloomItemsConf, "4000")
    try body
    finally {
      spark.conf.unset(BloomColumnsConf)
      spark.conf.unset(BloomBitsConf)
      spark.conf.unset(BloomItemsConf)
    }
  }

  test("equality lookup opens one file where min/max would open all eight") {
    val root = tmpTable()
    withBloomConf("id,k") { writeInterleaved(root) }
    val m = readManifest(root, 8L)
    assert(m.statsOrNil.forall(_.bloomOpt.isDefined), "every file indexed")
    // min/max alone: ranges interleave, nothing prunes
    assert(prunedFiles(spark, m, col("id") === 42L).size == 8)
    // bloom: id 42 lives only in file 42 % 8 == 2
    val hit = prunedFiles(spark, root, m, col("id") === 42L)
    assert(hit.size == 1, s"expected 1 surviving file, got $hit")
    // and the surviving file is the right one
    val got = readPruned(spark, root, col("id") === 42L)
      .select("k").collect().map(_.getString(0)).toSeq
    assert(got == Seq("key_42"))
    // string-key probe prunes identically
    assert(prunedFiles(spark, root, m, col("k") === "key_43").size == 1)
    assert(readPruned(spark, root, col("k") === "key_43")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(43L))
  }

  test("IN keeps the union of matching files; absent values keep none") {
    val root = tmpTable()
    withBloomConf("id") { writeInterleaved(root) }
    val m = readManifest(root, 8L)
    // 17 % 8 == 1 and 20 % 8 == 4 → two distinct files
    assert(prunedFiles(spark, root, m, col("id").isin(17L, 20L)).size == 2)
    assert(readPruned(spark, root, col("id").isin(17L, 20L))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(17L, 20L))
    // a value outside the table: bloom proves absence everywhere
    assert(prunedFiles(spark, root, m, col("id") === 1000000L).isEmpty)
    assert(readPruned(spark, root, col("id") === 1000000L).count() == 0)
    // conjunct with an unindexed column still prunes on the indexed one
    assert(prunedFiles(spark, root, m,
      col("id") === 42L && col("score") > 0).size == 1)
  }

  test("unindexed tables and unsupported column types degrade to no-op") {
    val root = tmpTable()
    writeInterleaved(root) // no conf → no sidecars
    val m = readManifest(root, 8L)
    assert(m.statsOrNil.forall(_.bloomOpt.isEmpty))
    assert(prunedFiles(spark, root, m, col("id") === 42L).size == 8)
    // double column named in the conf: skipped at build, never probed
    val root2 = tmpTable()
    withBloomConf("score,id") { writeInterleaved(root2, 160L) }
    val m2 = readManifest(root2, 8L)
    assert(m2.statsOrNil.forall(_.bloomOpt.isDefined)) // id still indexed
    assert(prunedFiles(spark, root2, m2,
      col("id") === 42L && col("score") === 6.0).size == 1)
    assert(readPruned(spark, root2, col("id") === 42L).count() == 1)
  }

  test("the registered data source probes the index through pushed filters") {
    val root = tmpTable()
    withBloomConf("id") { writeInterleaved(root) }
    val m = readManifest(root, 8L)
    import org.apache.spark.sql.sources.EqualTo
    assert(pruneForSourceFilters(spark, m, Array(EqualTo("id", 42L)),
      Some(root)).size == 1)
    // end-to-end through the V1 relation: same rows as a raw filter
    val viaSource = spark.read.format("graft-commitlog").load(root)
      .filter(col("id") === 42L).select("k").collect().map(_.getString(0))
    assert(viaSource.toSeq == Seq("key_42"))
  }

  test("rewrites re-index under the conf and vacuum reclaims orphans") {
    val root = tmpTable()
    withBloomConf("id") {
      writeInterleaved(root, 160L)
      assert(bloomFilesOnDisk(root) == 8)
      compact(spark, root, nFiles = 2) // rewrite WITH conf → fresh sidecars
    }
    val m = readManifest(root, 9L)
    assert(m.statsOrNil.size == 2 && m.statsOrNil.forall(_.bloomOpt.isDefined))
    assert(prunedFiles(spark, root, m, col("id") === 1000000L).isEmpty)
    assert(bloomFilesOnDisk(root) == 10) // 8 orphaned + 2 live
    vacuum(root, keepVersions = 1, retentionMs = -1L)
    assert(bloomFilesOnDisk(root) == 2, "orphaned sidecars reclaimed")
    // live sidecars still prune after vacuum
    assert(prunedFiles(spark, root, readManifest(root, 9L),
      col("id") === 42L).size <= 2)
    assert(read(spark, root).count() == 160L)
    // a rewrite WITHOUT the conf drops the index; correctness unaffected
    compact(spark, root, nFiles = 1)
    val m2 = readManifest(root, 10L)
    assert(m2.statsOrNil.forall(_.bloomOpt.isEmpty))
    assert(readPruned(spark, root, col("id") === 42L).count() == 1)
  }

  test("streaming appendTxn commits index their files; DESCRIBE DETAIL counts them") {
    val root = tmpTable()
    val even = spark.range(50).selectExpr("id * 2 AS id", "concat('s_', id) AS k")
    val odd = spark.range(50).selectExpr("id * 2 + 1 AS id", "concat('s_', id) AS k")
    withBloomConf("id") {
      assert(appendTxn(even.coalesce(1), root, "bloom-app", 0L) == 1L)
    }
    appendTxn(odd.coalesce(1), root, "bloom-app", 1L) // conf off → unindexed
    val m = readManifest(root, 2L)
    assert(m.statsOrNil.count(_.bloomOpt.isDefined) == 1)
    // id 3 is inside BOTH files' [min,max]; the indexed even file's bloom
    // proves absence, the unindexed odd file conservatively survives
    assert(prunedFiles(spark, root, m, col("id") === 3L).size == 1)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW bloom_d USING `graft-commitlog` " +
      s"OPTIONS (path '$root')")
    val r = spark.sql("DESCRIBE DETAIL bloom_d").collect()(0)
    assert(r.getAs[Long]("num_bloom_indexed_files") == 1L)
  }

  test("shallow clones probe the source's sidecars by absolute path") {
    val src = tmpTable()
    withBloomConf("id") { writeInterleaved(src) }
    val dst = tmpTable() + "/clone"
    shallowClone(src, dst)
    val m = readManifest(dst, 1L)
    assert(m.statsOrNil.forall(_.bloomOpt.exists(_.startsWith("/"))))
    assert(prunedFiles(spark, dst, m, col("id") === 42L).size == 1)
    assert(readPruned(spark, dst, col("id") === 42L).count() == 1)
  }

  test("bloom.columns table property indexes every writer; restore reverts props") {
    val root = tmpTable()
    val df = spark.range(100).selectExpr("id", "concat('k', id) AS k")
    create(root, df.schema, Nil, Map("bloom.columns" -> "id",
      "bloom.bits" -> "65536", "bloom.items" -> "4000"))
    // NO session conf: the property alone indexes appends and rewrites
    append(df.filter(col("id") % 2 === 0).coalesce(1), root)
    append(df.filter(col("id") % 2 === 1).coalesce(1), root)
    val m = readManifest(root, 3L)
    assert(m.statsOrNil.forall(_.bloomOpt.isDefined))
    assert(prunedFiles(spark, root, m, col("id") === 2L).size == 1)
    compact(spark, root, nFiles = 1) // rewrite stays indexed via the property
    assert(readManifest(root, 4L).statsOrNil.forall(_.bloomOpt.isDefined))
    // property changes are commits, so RESTORE reverts them with the rest
    setTableProperties(root, Map("bloom.columns" -> "k"), unset = Seq("bloom.bits"))
    assert(tablePropertiesOf(root) ==
      Map("bloom.columns" -> "k", "bloom.items" -> "4000"))
    restore(root, 4L)
    assert(tablePropertiesOf(root).get("bloom.columns").contains("id"))
    // a non-numeric sizing property is rejected AT the ALTER, not at the
    // next writer's append
    intercept[IllegalArgumentException] {
      setTableProperties(root, Map("bloom.bits" -> "lots"))
    }
    // the session conf OVERRIDES the table property when both are set
    spark.conf.set(BloomColumnsConf, "k")
    try append(df.coalesce(1), root)
    finally spark.conf.unset(BloomColumnsConf)
    val last = readManifest(root, currentVersion(root).get).statsOrNil.last
    val sk = last.bloomOpt.map(bp => dataPathFor(root, bp)).get
    // the freshest sidecar indexes k (conf override), not id
    assert(prunedFiles(spark, root,
      readManifest(root, currentVersion(root).get),
      col("k") === "nope").size < currentFileCount(root))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(sk)))
  }

  test("bloom sizes over Spark's BloomFilterAggregate caps reject at SET " +
      "time, not at some later writer's staging pass") {
    val root = tmpTable()
    append(spark.range(10).selectExpr("id").coalesce(1), root)
    intercept[IllegalArgumentException] {
      setTableProperties(root, Map("bloom.bits" -> "1000000000"))
    }
    intercept[IllegalArgumentException] {
      setTableProperties(root, Map("bloom.items" -> "100000000"))
    }
    // at-cap values are accepted and writable
    setTableProperties(root,
      Map("bloom.bits" -> "67108864", "bloom.items" -> "4000000",
        "bloom.columns" -> "id"))
    append(spark.range(10, 20).selectExpr("id").coalesce(1), root)
    assert(readManifest(root, currentVersion(root).get)
      .statsOrNil.last.bloomOpt.isDefined)
  }

  test("byte-bounded sidecar cache: a cap below one sidecar still prunes " +
      "and reads correctly (eviction is a perf knob, never correctness)") {
    val root = tmpTable()
    spark.conf.set(BloomCacheBytesConf, "1024")
    try {
      withBloomConf("id") { writeInterleaved(root) }
      val m = readManifest(root, 8L)
      // every probe forces a (batched, parallel) cold load of 8 sidecars
      assert(prunedFiles(spark, root, m, col("id") === 42L).size == 1)
      assert(prunedFiles(spark, root, m, col("id") === 43L).size == 1)
      assert(readPruned(spark, root, col("id") === 42L).count() == 1L)
      assert(readPruned(spark, root, col("id") === 799L)
        .select("k").collect().map(_.getString(0)).toSeq == Seq("key_799"))
    } finally spark.conf.unset(BloomCacheBytesConf)
  }

  private def dataPathFor(root: String, rel: String): String =
    if (rel.startsWith("/")) rel else s"$root/$rel"

  private def currentFileCount(root: String): Int =
    readManifest(root, currentVersion(root).get).files.size

  private def bloomFilesOnDisk(root: String): Int = {
    val d = Paths.get(root, "data", "_bloom")
    if (!Files.isDirectory(d)) 0
    else {
      val s = Files.list(d)
      try s.filter(p => p.toString.endsWith(".gblm")).count().toInt
      finally s.close()
    }
  }
}
