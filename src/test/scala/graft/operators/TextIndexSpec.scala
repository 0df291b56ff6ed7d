package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** The persisted inverted index: incremental maintenance ≡ full rebuild
  * (both index kinds), absent-query-term robustness, and the no-cartesian
  * plan guard on the serving join.
  */
class TextIndexSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over a sleeping dog"),
    (3L, "spark table query spark table"),
    (4L, "completely unrelated text about nothing at all"),
    (5L, "spark query engines scan table files"),
    (6L, "the quick brown fox naps under the lazy dog"))
    .toDF("doc_id", "text")

  test("incremental append ≡ single-shot rebuild for both index kinds") {
    val d = corpus
    val split = col("doc_id") % 2 === 0
    for ((build, names) <- Seq(
        ((x: org.apache.spark.sql.DataFrame) => TextIndex.shingleIndex(x),
          Seq("postings", "sizes")),
        ((x: org.apache.spark.sql.DataFrame) => TextIndex.tokenIndex(x),
          Seq("postings", "doclen")))) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-textindex").toString
      val (a0, b0) = build(d.filter(!split))
      CommitLog.append(a0, s"$root/${names(0)}")
      CommitLog.append(b0, s"$root/${names(1)}")
      val (ad, bd) = build(d.filter(split))
      CommitLog.append(ad, s"$root/${names(0)}")
      CommitLog.append(bd, s"$root/${names(1)}")
      val (af, bf) = build(d)
      assert(CommitLog.read(spark, s"$root/${names(0)}")
        .exceptAll(af).isEmpty
        && af.exceptAll(CommitLog.read(spark, s"$root/${names(0)}")).isEmpty)
      assert(CommitLog.read(spark, s"$root/${names(1)}")
        .exceptAll(bf).isEmpty
        && bf.exceptAll(CommitLog.read(spark, s"$root/${names(1)}")).isEmpty)
    }
  }

  test("bm25Serve scores every doc; a term absent from the corpus " +
      "contributes via df = 0, never an empty result") {
    val (p, l) = TextIndex.tokenIndex(corpus)
    val served = TextIndex.bm25Serve(p, l, Seq("spark", "zzz_absent"))
    val rows = served.collect()
    assert(rows.length == 6) // every doc scored, zero-hit docs included
    assert(rows.forall(r => !r.isNullAt(2) &&
      !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    // docs 3 and 5 contain 'spark' → strictly positive; doc 4 scores 0.0
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(3L) > 0.0 && byId(5L) > 0.0 && byId(4L) == 0.0)
  }

  test("shingleIndexSink: streamed index ≡ batch build, replays are " +
      "no-ops, and postings/sizes versions advance in lockstep") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft-idx-stream")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val all = corpus.as[(Long, String)].collect().toSeq
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(TextIndex.shingleIndexSink(root, "idx-test"))
      .option("checkpointLocation", tmpDir("graft-idx-ckpt"))
      .start()
    try {
      mem.addData(all.take(3): _*)
      q.processAllAvailable()
      mem.addData(all.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val (pf, zf) = TextIndex.shingleIndex(corpus)
    val pRead = CommitLog.read(spark, s"$root/postings")
    val zRead = CommitLog.read(spark, s"$root/sizes")
    assert(pRead.exceptAll(pf).isEmpty && pf.exceptAll(pRead).isEmpty)
    assert(zRead.exceptAll(zf).isEmpty && zf.exceptAll(zRead).isEmpty)
    val cut = CommitLog.consistentSnapshot(
      Seq(s"$root/postings", s"$root/sizes"))
    assert(cut(s"$root/postings") == cut(s"$root/sizes"))
    // manual replay of an already-committed batch: versions unchanged
    TextIndex.shingleIndexSink(root, "idx-test")(
      corpus.filter(col("doc_id") <= 3), 0L)
    assert(CommitLog.consistentSnapshot(
      Seq(s"$root/postings", s"$root/sizes")) == cut)
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("jaccardTopK matches a brute-force recompute and plans no " +
      "cartesian product") {
    val (p, z) = TextIndex.shingleIndex(corpus)
    val served = TextIndex.jaccardTopK(p, z, col("doc_id") <= 2, k = 2)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // brute force over collected shingle sets
    val sets = p.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = (for {
      q <- Seq(1L, 2L)
      c <- sets.keys if c != q
      inter = (sets(q) & sets(c)).size if inter > 0
    } yield (q, c, inter,
      inter.toDouble / (sets(q).size + sets(c).size - inter)))
      .groupBy(_._1).flatMap { case (_, cands) =>
        cands.sortBy(t => (-t._4, t._2)).take(2).zipWithIndex
          .map { case ((qq, cc, ii, jj), i) => (qq, i + 1, cc, ii, jj) }
      }.toSet
    val got = served.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expect.map(t => (t._1, t._2, t._3, t._4.toLong, t._5)))
  }
}
