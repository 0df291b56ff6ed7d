package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase
import StreamingAnalytics._

class StreamingAnalyticsSpec extends SparkTestBase {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("watermarked windowed counts aggregate per minute and drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = windowedCounts(df).writeStream
      .format("memory").queryName("win_counts").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0, 10), "click", 1.0), (ts(0, 40), "click", 2.0), (ts(1, 5), "view", 3.0))
      q.processAllAvailable()
      // advance event time far beyond watermark so earlier windows finalize
      mem.addData((ts(30), "click", 1.0))
      q.processAllAvailable()
      // a very late row (before the watermark) must be dropped
      mem.addData((ts(0, 50), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains((ts(0), "click", 2L, 3.0))) // late row NOT counted
      assert(rows.contains((ts(1), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming near-dup probe equals batch q80 and appends exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    // the static index, built once (persisted in production)
    val fp = graft.operators.Dedup.fingerprints(corpus).cache()
    val bands = graft.operators.Dedup.bandIndex(fp).cache()
    val root = java.nio.file.Files.createTempDirectory("graft-neardup-stream").toString
    val sink = neardupProbeSink(fp, bands, root, "neardup-spec")

    // the q80 CDC slice arrives as a stream, split across two micro-batches
    val slice = corpus.filter($"doc_id" % 3 === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    val (b0, b1) = slice.splitAt(slice.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    def tableRows = graft.sources.CommitLog.read(spark, root)
      .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"),
        r.getAs[Int]("hamming"))).toSet
    val streamed = tableRows
    // batch twin: the registered q80 on the same sf directory
    val batch = graft.SparkEntry.queries("q80_incremental_dedup")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"),
        r.getAs[Int]("hamming"))).toSet
    assert(streamed == batch, "per-batch probes must union to the full CDC probe")
    assert(streamed.nonEmpty) // the sf0.001 corpus carries near-dups

    // restart replay of the last micro-batch is a no-op (exactly-once)
    val vBefore = graft.sources.CommitLog.currentVersion(root)
    sink(b1.toSeq.toDF("doc_id", "text"), 1L)
    assert(graft.sources.CommitLog.currentVersion(root) == vBefore)
    assert(tableRows == streamed)
    fp.unpersist(); bands.unpersist()
  }

  test("streaming ExactSubstr fold equals the one-shot batch fold and " +
      "replays are whole-batch no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val old = corpus.filter($"doc_id" % 5 =!= 0)
    // monotone doc_ids across batches — the contract that makes
    // batch-by-batch folding ≡ one concatenated fold
    val stream = corpus.filter($"doc_id" % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    val (b0, b1) = stream.splitAt(stream.length / 2)

    val idxS = java.nio.file.Files
      .createTempDirectory("graft-substr-idx-s").toString
    graft.operators.Dedup.substrIndexInit(spark, old, idxS)
    val outRoot = java.nio.file.Files
      .createTempDirectory("graft-substr-out").toString
    val sink = substrDedupSink(idxS, outRoot, "substr-spec")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("n_cut"), r.getAs[String]("clean_text"))).toSet
    val streamed = rows(graft.sources.CommitLog.read(spark, outRoot))

    // batch twin: ONE fold of the concatenation against a fresh index
    val idxB = java.nio.file.Files
      .createTempDirectory("graft-substr-idx-b").toString
    graft.operators.Dedup.substrIndexInit(spark, old, idxB)
    val batchOut = rows(graft.operators.Dedup.substrFold(
      spark, stream.toSeq.toDF("doc_id", "text"), idxB))
    assert(streamed == batchOut,
      "batch-by-batch folds must equal one concatenated fold")
    assert(streamed.exists(_._3 > 0), "sf0.001 carries duplicated spans")
    // and both index paths converge to the same canon map
    def canon(root: String) = graft.sources.CommitLog.read(spark, root)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("canon"))).toSet
    assert(canon(idxS) == canon(idxB))

    // restart replay of the last micro-batch: skipped whole — neither
    // the index nor the output table commits again
    val vIdx = graft.sources.CommitLog.currentVersion(idxS)
    val vOut = graft.sources.CommitLog.currentVersion(outRoot)
    sink(b1.toSeq.toDF("doc_id", "text"), 1L)
    assert(graft.sources.CommitLog.currentVersion(idxS) == vIdx)
    assert(graft.sources.CommitLog.currentVersion(outRoot) == vOut)
  }

  test("streaming LM scoring against a frozen model release equals batch " +
      "scoring and appends exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    // model release, built once and FROZEN as a versioned table
    val (model0, v) = graft.operators.Corpus.lmModel(corpus)
    val modelRoot = java.nio.file.Files
      .createTempDirectory("graft-lm-model").toString
    graft.sources.CommitLog.append(model0, modelRoot)
    val model = graft.sources.CommitLog.read(spark, modelRoot)
    val root = java.nio.file.Files
      .createTempDirectory("graft-lm-stream").toString
    val sink = lmScoreSink(model, v, root, "lm-spec")

    val docsArr = corpus.as[(Long, String)].collect().sortBy(_._1)
    val (b0, b1) = docsArr.splitAt(docsArr.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    def tableRows = graft.sources.CommitLog.read(spark, root)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("p_sum_q"),
        r.getAs[Long]("avg_p_q"))).toSet
    val streamed = tableRows
    // per-doc scoring is batch-split-invariant: the union must equal one
    // batch pass with the same frozen model
    val batch = graft.operators.Corpus.lmScore(corpus, model, v)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("p_sum_q"),
        r.getAs[Long]("avg_p_q"))).toSet
    assert(streamed == batch && streamed.nonEmpty)

    // restart replay of the last micro-batch is a no-op (exactly-once)
    val vBefore = graft.sources.CommitLog.currentVersion(root)
    sink(b1.toSeq.toDF("doc_id", "text"), 1L)
    assert(graft.sources.CommitLog.currentVersion(root) == vBefore)
    assert(tableRows == streamed)

    // a document of vocabulary the model never saw scores at the
    // Laplace floor 1/V — smoothed, never dropped
    sink(Seq((999999L, "zzqxj wvvkp zzqxj wvvkp"))
      .toDF("doc_id", "text"), 2L)
    val novel = graft.sources.CommitLog.read(spark, root)
      .filter($"doc_id" === 999999L).collect()(0)
    assert(novel.getAs[Long]("n_bigrams") == 3L)
    assert(novel.getAs[Long]("avg_p_q") ==
      math.floor(1e12 * (1.0 / v.toDouble)).toLong)
  }

  test("streaming incremental view equals the batch aggregate and " +
      "replays exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_id", "event_type", "value")
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivw-stream").toString
    val sink = incrementalViewSink(root, Seq("event_type"), "value", "ivw-spec")
    val rows = events.as[(Long, String, Double)].collect().sortBy(_._1)
    val (b0, b1) = rows.splitAt(rows.length / 3)
    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("event_id", "event_type", "value").writeStream
      .foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    def viewRows = graft.sources.IncrementalView.serve(spark, root)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("cnt"), r.getAs[Double]("sum_value"))).toSet
    val streamed = viewRows
    val batch = events.groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum($"value".cast("decimal(18,6)"))
          .cast("decimal(18,6)").cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch && streamed.nonEmpty)
    // restart replay of the last micro-batch is a no-op (exactly-once):
    // without the watermark this would double-fold b1
    val vBefore = graft.sources.CommitLog.currentVersion(root)
    sink(b1.toSeq.toDF("event_id", "event_type", "value"), 1L)
    assert(graft.sources.CommitLog.currentVersion(root) == vBefore)
    assert(viewRows == streamed)
    // a fresh batch keeps folding
    sink(Seq((-1L, "zz_new_type", 2.5)).toDF("event_id", "event_type", "value"), 2L)
    assert(viewRows.contains(("zz_new_type", 1L, 2.5)))
  }

  test("streaming contamination screen equals batch q67 and appends exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    // eval-set release artifacts, built once: shingle set + bloom sketch
    val evalSh = graft.operators.Dedup
      .evalShingles(corpus.filter($"doc_id" % 11 === 0)).cache()
    val bloom = graft.operators.Dedup
      .contaminationBloom(spark, evalSh, 1 << 14, 1 << 17)
    val root = java.nio.file.Files.createTempDirectory("graft-contam-stream").toString
    val sink = contaminationScreenSink(evalSh, bloom, root, "contam-spec")

    // train docs land as a stream across two micro-batches
    val train = corpus.filter($"doc_id" % 11 =!= 0)
      .as[(Long, String)].collect().sortBy(_._1)
    val (b0, b1) = train.splitAt(train.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    def tableRows = graft.sources.CommitLog.read(spark, root)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared")))
      .toSet
    val streamed = tableRows
    // batch twin: the registered q67 on the same sf directory (each doc
    // lives wholly inside one micro-batch, so per-doc shingle counts are
    // batch-split-invariant and the union must equal the batch sweep)
    val batch = graft.SparkEntry.queries("q67_contamination")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared")))
      .toSet
    assert(streamed == batch, "per-batch screens must union to the batch sweep")
    assert(streamed.nonEmpty) // the sf0.001 corpus shares shingles with its eval slice

    // restart replay of the last micro-batch is a no-op (exactly-once)
    val vBefore = graft.sources.CommitLog.currentVersion(root)
    sink(b1.toSeq.toDF("doc_id", "text"), 1L)
    assert(graft.sources.CommitLog.currentVersion(root) == vBefore)
    assert(tableRows == streamed)
    evalSh.unpersist()
  }

  test("hopping windows: stream result equals the batch q74 shape on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (ts(2), "click", 1.0), (ts(4), "click", 2.0),
      (ts(7), "view", 3.0), (ts(12), "click", 4.0))
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = hoppingCounts(stream).writeStream
      .format("memory").queryName("hop_counts").outputMode(OutputMode.Append()).start()
    try {
      data.foreach(mem.addData(_))
      q.processAllAvailable()
      mem.addData((ts(59), "click", 0.5)) // advance watermark: finalize all
      q.processAllAvailable()
      val streamed = spark.table("hop_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .filter(_._1.before(ts(50))).toSet
      // batch twin: the q74 groupBy over the same rows (no watermark cut)
      val batch = data.toDF("ts", "event_type", "value")
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "10 minutes", "5 minutes"),
          org.apache.spark.sql.functions.col("event_type"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          graft.operators.Exact.dsum(
            org.apache.spark.sql.functions.col("value")).as("sum_value"))
        .select("window.start", "event_type", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      // each event contributed to exactly 2 windows
      assert(streamed.toSeq.map(_._3).sum == data.size * 2)
    } finally q.stop()
  }

  test("streaming transition deltas sum to the batch q72 matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two users, interleaved and OUT OF ORDER within the batch
    val data = Seq(
      StreamingAnalytics.TransEvent(1L, ts(5), 3L, "view"),
      StreamingAnalytics.TransEvent(1L, ts(2), 1L, "view"),
      StreamingAnalytics.TransEvent(2L, ts(3), 2L, "click"),
      StreamingAnalytics.TransEvent(1L, ts(9), 4L, "purchase"),
      StreamingAnalytics.TransEvent(2L, ts(7), 5L, "view"))
    val late = StreamingAnalytics.TransEvent(2L, ts(12), 6L, "purchase")
    val mem = MemoryStream[StreamingAnalytics.TransEvent]
    val q = StreamingAnalytics.transitionsStream(mem.toDS()).writeStream
      .format("memory").queryName("trans_deltas")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData(late) // later batch chains onto the stored last event
      q.processAllAvailable()
      val streamed = spark.table("trans_deltas")
        .groupBy("event_type", "next_type")
        .agg(org.apache.spark.sql.functions.sum("delta").as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy("ts", "event_id")
      val batch = (data :+ late).toDF()
        .withColumn("next_type",
          org.apache.spark.sql.functions.lead("event_type", 1).over(w))
        .filter(org.apache.spark.sql.functions.col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-static enrichment joins each batch against the dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "pro"), (2L, "free")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    val q = enrich(stream, dim, Seq("user_id")).writeStream
      .format("memory").queryName("enriched").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(0), 5.0), (3L, ts(1), 7.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), Option(r.getString(3)))).toSet
      assert(rows == Set((1L, Some("pro")), (3L, None))) // left join keeps unmatched
    } finally q.stop()
  }

  test("stream-stream join matches clicks within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = joinWithinWindow(
      imps.toDF().toDF("key", "imp_ts"),
      clicks.toDF().toDF("key_c", "click_ts"),
      windowMinutes = 10, watermarkDelay = "0 seconds")
    val q = joined.writeStream
      .format("memory").queryName("attributed").outputMode(OutputMode.Append()).start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(5)))   // within 10 min of imp 1 → match
      clicks.addData((2L, ts(40)))  // 40 min after imp 2 → no match
      clicks.addData((3L, ts(2)))   // no impression → no match
      q.processAllAvailable()
      val rows = spark.table("attributed").collect()
        .map(r => (r.getLong(0), r.getTimestamp(3))).toSet
      assert(rows == Set((1L, ts(5))))
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = dedupStream(df, Seq("event_id"), watermarkDelay = "5 minutes").writeStream
      .format("memory").queryName("deduped").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(0), "click"), (2L, ts(1), "view"))
      q.processAllAvailable()
      // re-delivery of id 1 (same batch-later), plus a fresh id
      mem.addData((1L, ts(0, 30), "click"), (3L, ts(2), "click"))
      q.processAllAvailable()
      val ids = spark.table("deduped").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // id 1 exactly once
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMs = 5L * 60 * 1000, watermarkDelay = "0 seconds")
      .writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      // user 1: two bursts 40 min apart -> first burst closes when the second
      // arrives (gap exceeded in-stream). user 2: one burst, then silence ->
      // closes via event-time timeout once the watermark (driven by user 1's
      // later event) passes last + gap.
      mem.addData(Event(1L, ts(0), "click"), Event(1L, ts(2), "view"), Event(2L, ts(1), "click"))
      q.processAllAvailable()
      mem.addData(Event(1L, ts(42), "click"))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[SessionUpdate].collect().filter(_.closed)
      assert(closed.length == 2)
      val byUser = closed.map(c => c.user_id -> c).toMap
      assert(byUser(1L).n_events == 2L)
      assert(byUser(1L).session_start == ts(0) && byUser(1L).session_end == ts(2))
      assert(byUser(2L).n_events == 1L)
      assert(byUser(2L).session_start == ts(1) && byUser(2L).session_end == ts(1))
      // user 1's second session is still open -> not emitted in Append mode
      assert(spark.table("sessions").as[SessionUpdate].collect().count(!_.closed) == 0)
    } finally q.stop()
  }

  test("streaming funnel equals the batch funnel on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // u1 completes all stages; u2 skips click (purchase ignored);
    // u3's first click precedes any view (ignored), second counts;
    // u4 purchases before viewing (ignored); u99 is the watermark driver
    val wave1 = Seq(
      FunnelEvent(1L, ts(0), "view"), FunnelEvent(2L, ts(1), "view"),
      FunnelEvent(3L, ts(0), "click"), FunnelEvent(3L, ts(1), "view"),
      FunnelEvent(4L, ts(0), "purchase"), FunnelEvent(1L, ts(2), "click"),
      FunnelEvent(2L, ts(2), "purchase"))
    val wave2 = Seq(
      FunnelEvent(3L, ts(3), "click"), FunnelEvent(4L, ts(4), "view"),
      FunnelEvent(1L, ts(5), "purchase"))
    val wave3 = Seq(FunnelEvent(99L, Timestamp.valueOf("2024-01-01 15:00:00"), "view"))
    val mem = MemoryStream[FunnelEvent]
    val q = funnelStream(mem.toDS(), ttlMs = 60L * 60 * 1000,
      watermarkDelay = "0 seconds").writeStream
      .format("memory").queryName("funnel_stream").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(wave1: _*); q.processAllAvailable()
      mem.addData(wave2: _*); q.processAllAvailable()
      mem.addData(wave3: _*); q.processAllAvailable()
      val updates = spark.table("funnel_stream").as[FunnelUpdate].collect()
      def reachedAtLeast(k: Int): Set[Long] =
        updates.filter(_.reached >= k).map(_.user_id).toSet
      // batch reference: the q61 chain over the SAME events
      val all = (wave1 ++ wave2 ++ wave3).toDS()
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = all.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val c = all.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min(col("us")).as("t2"))
      val p = all.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min(col("us")).as("t3"))
      assert(reachedAtLeast(1) == v.collect().map(_.getLong(0)).toSet)
      assert(reachedAtLeast(2) == c.collect().map(_.getLong(0)).toSet)
      assert(reachedAtLeast(3) == p.collect().map(_.getLong(0)).toSet)
      // the watermark evicted settled users with their final stage times
      val closed = updates.filter(_.closed).map(u => u.user_id -> u).toMap
      assert(Set(1L, 2L, 3L, 4L).subsetOf(closed.keySet))
      assert(closed(1L).times ==
        Seq(ts(0), ts(2), ts(5)).map(_.getTime * 1000L))
      assert(closed(3L).times == Seq(ts(1), ts(3)).map(_.getTime * 1000L))
    } finally q.stop()
  }

  test("funnel state survives batches of non-stage traffic (timeout not re-armed to the watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def tm(minute: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")
    val mem = MemoryStream[FunnelEvent]
    val q = funnelStream(mem.toDS(), ttlMs = 60L * 60 * 1000,
      watermarkDelay = "0 seconds").writeStream
      .format("memory").queryName("funnel_idle").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(FunnelEvent(1L, tm(0), "view")); q.processAllAvailable()
      // a batch with ONLY a non-stage event for u1 (plus a watermark driver)
      mem.addData(FunnelEvent(1L, tm(1), "scroll"), FunnelEvent(99L, tm(10), "view"))
      q.processAllAvailable()
      // watermark advances well past the (buggy) watermark+1 re-arm but
      // stays inside u1's real 60-minute TTL — u1 must NOT be evicted
      mem.addData(FunnelEvent(99L, tm(30), "view")); q.processAllAvailable()
      val early = spark.table("funnel_idle").as[FunnelUpdate].collect()
      assert(!early.exists(u => u.user_id == 1L && u.closed),
        "idle-traffic batch re-armed the timeout and evicted live funnel state")
      // the funnel then completes normally
      mem.addData(FunnelEvent(1L, tm(31), "click"), FunnelEvent(1L, tm(32), "purchase"))
      q.processAllAvailable()
      val updates = spark.table("funnel_idle").as[FunnelUpdate].collect()
      assert(updates.filter(_.user_id == 1L).map(_.reached).max == 3)
    } finally q.stop()
  }

  test("streaming cohort deltas sum to the batch retention matrix, with late-cohort repair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    def d(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val wave1 = Seq(
      CohortEvent(1L, d("2024-01-02")), CohortEvent(1L, d("2024-01-09")),
      CohortEvent(2L, d("2024-01-10")))
    // u2's EARLIER event arrives late -> cohort moves W1 -> W0 (retraction);
    // u3 is a fresh later cohort
    val wave2 = Seq(
      CohortEvent(2L, d("2024-01-03")), CohortEvent(3L, d("2024-01-16")))
    val mem = MemoryStream[CohortEvent]
    val q = cohortRetentionStream(mem.toDS(), watermarkDelay = "30 days")
      .writeStream
      .format("memory").queryName("cohort_stream").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(wave1: _*); q.processAllAvailable()
      mem.addData(wave2: _*); q.processAllAvailable()
      val got = spark.table("cohort_stream").as[CohortDelta].collect()
        .groupBy(cd => (cd.cohort_day, cd.week_day))
        .view.mapValues(_.map(_.delta).sum).toMap
        .filter(_._2 != 0)
      // batch reference: the q63 shape over the SAME events, weeks as epoch days
      val e = (wave1 ++ wave2).toDS()
        .select(col("user_id"),
          datediff(to_date(date_trunc("week", col("ts"))), lit("1970-01-01")).as("wk"))
      val cohorts = e.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      val want = e.distinct().join(cohorts, Seq("user_id"))
        .groupBy("cohort", "wk").agg(count(lit(1)).as("users"))
        .collect()
        .map(r => (r.getAs[Int]("cohort").toLong, r.getAs[Int]("wk").toLong) ->
          r.getAs[Long]("users").toInt).toMap
      assert(got == want)
      // the retraction actually happened: a negative delta was emitted
      assert(spark.table("cohort_stream").as[CohortDelta].collect().exists(_.delta < 0))
    } finally q.stop()
  }

  test("streaming SemDeDup probe maintains the index and equals batch q109") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val e0 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val aug = e0.unionByName(e0.filter($"vec_id" < 50)
      .select((-($"vec_id" + 1)).cast("long").as("vec_id"), $"embedding"))
    val init = aug.filter($"vec_id" < 300)
    val cents = init.filter($"vec_id" % 50 === 0 && $"vec_id" >= 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("ce"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-semdedup-stream").toString
    // initial release: the delta round against an EMPTY member table IS
    // the batch build (no prior mates, only intra-release lower ids)
    val emptyMembers = aug.limit(0).withColumn("cid", lit(0L))
      .select("vec_id", "cid", "embedding")
    graft.sources.CommitLog.append(cents, s"$root/cells")
    graft.sources.CommitLog.append(
      graft.operators.Similarity.semdedupDelta(spark, init, cents, emptyMembers),
      s"$root/members")

    // the delta arrives as a stream, two id-monotone micro-batches
    val delta = aug.filter($"vec_id" >= 300)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (b0, b1) = delta.splitAt(delta.length / 2)
    val sink = semdedupProbeSink(root, "semdedup-spec")
    val mem = MemoryStream[(Long, Array[Float])]
    // MemoryStream's tuple encoder yields array<float> containsNull=false;
    // cast to the table's nullable element type before the sink sees it
    val q = mem.toDF().toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .writeStream.foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    def indexRows = graft.sources.CommitLog.read(spark, s"$root/members")
      .select("vec_id", "cid", "dropped")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = indexRows
    val batch = graft.SparkEntry.queries("q109_semdedup_incremental")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      "streamed index must equal the batch incremental-SemDeDup answer")
    assert(streamed.exists(_._3 == 1L)) // planted dups produce drops

    // restart replay of the last micro-batch is a no-op (exactly-once)
    val vBefore = graft.sources.CommitLog.currentVersion(s"$root/members")
    sink(b1.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding")), 1L)
    assert(graft.sources.CommitLog.currentVersion(s"$root/members") == vBefore)
    assert(indexRows == streamed)
  }

  test("streaming perceptron training: versioned weights, sequential determinism, exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextAnalysis
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "n_chars")
    // centering stats FROZEN at the initial release
    val center = TextAnalysis.perceptronCenter(docsDf)
    val root = java.nio.file.Files.createTempDirectory("graft-perc-stream").toString
    val sink = perceptronTrainSink(center, root, "perc-spec")

    val rows = docsDf.as[(Long, String, Long)].collect().sortBy(_._1)
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("doc_id", "text", "n_chars").writeStream
      .foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    // batch twin: the same two rounds applied sequentially
    def df(xs: Array[(Long, String, Long)]) =
      xs.toSeq.toDF("doc_id", "text", "n_chars")
    val w1 = TextAnalysis.perceptronUpdate(
      TextAnalysis.perceptronFeatures(df(b0), center), Seq(0L, 0L, 0L, 0L))
    val w2 = TextAnalysis.perceptronUpdate(
      TextAnalysis.perceptronFeatures(df(b1), center), w1)
    val table = graft.sources.CommitLog.read(spark, root)
      .orderBy("update_id").collect()
      .map(r => (r.getAs[Long]("update_id"),
        Seq(r.getAs[Long]("w2"), r.getAs[Long]("w3"),
          r.getAs[Long]("w4"), r.getAs[Long]("w5"))))
    assert(table.map(_._1).toSeq == Seq(0L, 1L))
    assert(table(0)._2 == w1 && table(1)._2 == w2)
    assert(w1 != w2, "second round must actually move the weights")

    // the state is a VERSIONED table: the pre-second-batch weights stay
    // queryable by time travel
    assert(graft.sources.CommitLog.read(spark, root, Some(1L)).count() == 1)

    // restart replay of the last micro-batch is a no-op (exactly-once)
    val vBefore = graft.sources.CommitLog.currentVersion(root)
    sink(df(b1), 1L)
    assert(graft.sources.CommitLog.currentVersion(root) == vBefore)
    assert(graft.sources.CommitLog.read(spark, root).count() == 2)
  }

  test("streaming corpus-drift monitor equals the batch q171 JSD " +
      "bit-for-bit and replays exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-drift-sink").toString
    val sink = driftSink(root, "drift-spec")
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val (b0, rest) = rows.splitAt(rows.length / 3)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink).start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.operators.Corpus.driftReport(spark, root)
      .collect()(0).toSeq
    // ground truth: the BATCH q171 over the same corpus — every column
    // (totals, vocab, both KLs, JSD) must match exactly, Q20 included
    val batch = graft.SparkEntry
      .queries("q171_corpus_drift")(spark, sf0001).collect()(0).toSeq
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // restart replay of the last micro-batch is a no-op (exactly-once):
    // a double fold would shift every count and move the JSD
    val vBefore = graft.sources.CommitLog.currentVersion(root)
    sink(b2.toSeq.toDF("doc_id", "text"), 2L)
    assert(graft.sources.CommitLog.currentVersion(root) == vBefore)
    assert(graft.operators.Corpus.driftReport(spark, root)
      .collect()(0).toSeq == batch)
  }
}
