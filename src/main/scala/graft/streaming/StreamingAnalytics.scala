package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events stream: watermarked tumbling-window
  * aggregation and custom stateful sessionization — the north-star
  * streaming surface (the reference itself has no real streaming; its
  * 30-minute poll is covered by [[FileStreamIngest]]).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 min is dropped, state evicted); sessionization
  * state is per-key and evicted via processing-time timeout, so state size
  * tracks ACTIVE users, not history. Both run identically on a cluster —
  * state lives in the HDFS-backed state store, keyed by the shuffle
  * partition.
  */
object StreamingAnalytics {

  /** Streaming twin of q80's incremental near-dup: each micro-batch of
    * newly ingested documents (doc_id, text) is fingerprinted and probed
    * against the STATIC corpus band index — the exact
    * [[graft.operators.Dedup.probeIndex]] the batch path runs — and the
    * dedup decisions append to a CommitLog table EXACTLY ONCE (the
    * appendTxn watermark makes micro-batch replays after a restart
    * no-ops). This is the production CDC-dedup pattern: the index is
    * built once and persisted/broadcast (KBs per million docs), the
    * probe cost is O(batch × collisions) per trigger, and state lives in
    * the table's txn map, not the state store — nothing grows with
    * stream history. Usage:
    * `docsStream.writeStream.foreachBatch(neardupProbeSink(fp, bands,
    * root, "dedup-app")).start()`.
    *
    * Semantics contract (inherited from q80): the index is the corpus
    * INCLUDING the streamed documents (the CDC slice of an already-landed
    * table). Duplicates WITHIN a micro-batch are caught through the index,
    * not by a batch self-join — if the stream carries documents the index
    * has never seen, refresh the index between triggers (rebuild or the
    * q80 incremental append) or intra-batch duplicate pairs go undetected.
    */
  def neardupProbeSink(
      indexFp: DataFrame, indexBands: DataFrame,
      root: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val decisions = graft.operators.Dedup.probeIndex(
        graft.operators.Dedup.fingerprints(batch), indexFp, indexBands)
      graft.sources.CommitLog.appendTxn(decisions, root, appId, batchId)
      ()
    }

  /** Streaming twin of q109's incremental SemDeDup: each micro-batch of
    * newly ingested embeddings (vec_id, embedding) is assigned against
    * the persisted cell table, flagged against the CURRENT member table
    * (plus lower-id batch mates), and appended to the member table
    * exactly once — so the stream MAINTAINS the semantic-dedup index,
    * and every batch is deduped against everything that landed before
    * it. Per-trigger cost is O(batch × cell size); no state-store state
    * (the index tables ARE the state, versioned and time-travelable).
    *
    * CONTRACT (inherited from [[graft.operators.Similarity.semdedupDelta]]):
    * batch ids must be monotone above all landed member ids, and the
    * cell set is frozen at index build. Usage:
    * `embStream.writeStream.foreachBatch(semdedupProbeSink(root,
    * "semdedup-app")).start()` with `root/cells` and `root/members`
    * CommitLog tables built by the q109 initial release.
    */
  def semdedupProbeSink(root: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val s = batch.sparkSession
      val out = graft.operators.Similarity.semdedupDelta(s, batch,
        graft.sources.CommitLog.read(s, s"$root/cells"),
        graft.sources.CommitLog.read(s, s"$root/members"))
      graft.sources.CommitLog.appendTxn(out, s"$root/members", appId, batchId)
      ()
    }

  /** Streaming twin of q121's classifier training: each micro-batch of
    * newly landed documents (text, n_chars) runs ONE full-batch
    * perceptron round against the CURRENT weights and appends the new
    * weight row to a CommitLog table exactly once — incremental model
    * training whose state is a VERSIONED TABLE (time-travelable: every
    * historical weight vector stays queryable; restart replays are
    * no-ops via the txn watermark; no state store at all). Centering
    * stats are FROZEN at the initial release
    * ([[graft.operators.TextAnalysis.perceptronCenter]]) — the q109
    * frozen-cells discipline — so every round computes identical integer
    * features and the whole training trajectory is deterministic given
    * the batch sequence. Per-trigger cost: one 4-number aggregate over
    * the batch plus a 1-row read of the weights table.
    */
  def perceptronTrainSink(center: graft.operators.TextAnalysis.PerceptronCenter,
      root: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val s = batch.sparkSession
      val cur: Seq[Long] =
        graft.sources.CommitLog.currentVersion(root) match {
          case None => Seq(0L, 0L, 0L, 0L)
          case Some(_) =>
            graft.sources.CommitLog.read(s, root)
              .orderBy(col("update_id").desc).limit(1)
              .select("w2", "w3", "w4", "w5").collect().headOption
              .map(r => (0 until 4).map(r.getLong).toSeq)
              .getOrElse(Seq(0L, 0L, 0L, 0L))
        }
      val w = graft.operators.TextAnalysis.perceptronUpdate(
        graft.operators.TextAnalysis.perceptronFeatures(batch, center), cur)
      val row = s.createDataFrame(Seq((batchId, w(0), w(1), w(2), w(3))))
        .toDF("update_id", "w2", "w3", "w4", "w5")
      graft.sources.CommitLog.appendTxn(row, root, appId, batchId)
      ()
    }

  /** Streaming twin of q123's LM quality scoring: each micro-batch of
    * newly landed documents (doc_id, text) scores against a FROZEN
    * bigram model (the q109/q121 frozen-release discipline — persist
    * [[graft.operators.Corpus.lmModel]]'s table as a CommitLog release),
    * and the per-doc scores append exactly once. Bigrams the model never
    * saw score at the Laplace floor 1/V, so new-vocabulary documents get
    * the standard smoothed assignment instead of silently dropping
    * features. The quality gate run AT INGEST: per-trigger cost is
    * O(batch bigrams ⋈ model); no state-store state (the model table IS
    * the state); restart replays are no-ops via the txn watermark.
    */
  def lmScoreSink(model: DataFrame, v: Long,
      root: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val scored = graft.operators.Corpus.lmScore(batch, model, v)
      graft.sources.CommitLog.appendTxn(scored, root, appId, batchId)
      ()
    }

  /** Streaming twin of q59/q130's incremental materialized view: each
    * micro-batch folds its per-group (count, exact-decimal sum) delta
    * into the view table — a live dashboard aggregate maintained at
    * ingest, group-cardinality-sized however much data streams through.
    * The fold is [[graft.sources.IncrementalView.refresh]]'s own combine
    * (exact decimal sums are order- and batching-independent, so the
    * streamed view ≡ one batch aggregate bit-for-bit), and replays are
    * no-ops via the view table's txn watermark (the state IS the table —
    * no state store). The per-batch overwrite is the right cost model:
    * the view is dimension-sized, so rewriting it per trigger is
    * KB-scale metadata work, while the alternative (appending deltas and
    * compacting at read) would push a re-aggregation onto every reader.
    */
  def incrementalViewSink(viewRoot: String, groupCols: Seq[String],
      valueCol: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      graft.sources.IncrementalView.foldBatch(
        batch, viewRoot, groupCols, valueCol, appId, batchId)
      ()
    }

  /** Streaming corpus-drift monitor — the live twin of q171/q174: each
    * micro-batch of documents folds its per-slice vocab counts into the
    * persisted drift view (exactly-once through the view's txn
    * watermark; vocab-sized work per batch, the corpus never rescans);
    * `Corpus.driftReport(spark, viewRoot)` then answers "did tonight's
    * crawl shift the distribution" on demand with q171's exact Q20 JSD —
    * bit-identical to the batch recompute over everything ingested.
    */
  def driftSink(viewRoot: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      graft.operators.Corpus.driftFoldBatch(batch, viewRoot, appId, batchId)
      ()
    }

  /** Streaming twin of [[graft.sources.Scd2]]: each micro-batch of
    * dimension updates (key + tracked attributes) merges as one SCD2
    * generation, effective at `effOf(batchId)` — a pure function of the
    * batch id, so a replayed batch re-derives the SAME effective date and
    * the merge's value-identical change probe makes the replay a no-op
    * (exactly-once by semantic idempotence; no txn watermark needed).
    * The continuously-maintained dimension every streaming warehouse
    * needs: late attribute corrections land as new versions, history is
    * never rewritten, and readers join facts against the open slice.
    */
  def scd2Sink(root: String, key: String,
      effOf: Long => java.sql.Date): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      graft.sources.Scd2.merge(batch.sparkSession, root, batch, key,
        effOf(batchId))
      ()
    }

  /** Streaming twin of q95/q67's benchmark-contamination screen: each
    * micro-batch of newly landed documents (doc_id, text) is shingled,
    * prescreened by the DRIVER-HELD eval bloom sketch (re-inserted as a
    * plan literal per batch — the same runtime-filter shape batch q95
    * plans), exact-verified against the static eval shingle set, and the
    * contaminated-doc flags append to a CommitLog table exactly once.
    * The decontamination gate run AT INGEST instead of as a pre-eval
    * batch sweep. No state-store state at all: the sketch is bits/8
    * driver bytes built once per eval-set release
    * ([[graft.operators.Dedup.contaminationBloom]]), the eval shingles
    * are a static side (benchmark-sized → broadcast), and restart
    * replays are no-ops via the table's txn watermark. Per-trigger cost
    * is O(batch shingles), corpus history never re-scans.
    *
    * DELIVERY CONTRACT: the source must deliver each document WHOLE
    * within one micro-batch, exactly one row per doc_id across the
    * stream's lifetime (the file-per-batch ingest shape upstream of this
    * sink). `n_shared` is computed per batch and rows are blind-appended:
    * a document whose rows span two batches, or one re-delivered under a
    * DIFFERENT batchId, produces duplicate/under-counted doc_id flag
    * rows. Wire row-level or at-least-once-WITHOUT-same-batchId sources
    * through a doc-grained dedup (e.g. [[dedupStream]]) first, or merge
    * on doc_id into the flags table instead of appending.
    */
  def contaminationScreenSink(evalSh: DataFrame, bloom: Array[Byte],
      root: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val flags = graft.operators.Dedup.bloomScreen(
        batch.sparkSession, batch, evalSh, bloom)
      graft.sources.CommitLog.appendTxn(flags, root, appId, batchId)
      ()
    }

  /** Streaming twin of q145's incremental ExactSubstr: each micro-batch
    * of newly ingested documents (doc_id, text) folds its 15-token
    * windows into the PERSISTED window index at `indexRoot` (one MERGE
    * commit per batch — [[graft.operators.Dedup.substrFold]]), cuts the
    * batch's duplicated spans against the updated index, and appends the
    * per-doc cleaning output (doc_id, n_toks, n_cut, clean_text) to
    * `outRoot` exactly once. The duplicated-span gate run AT INGEST: each
    * document is cleaned against everything that landed before it plus
    * its batch-mates; per-trigger cost is O(batch windows) and the
    * historical corpus text is never rescanned. State is the two
    * commit-log tables themselves — versioned, time-travelable, no state
    * store.
    *
    * Exactly-once: a replayed batchId is skipped WHOLE via the output
    * table's txn watermark (the fold is least()-idempotent, so even a
    * crash between the index merge and the output append just re-merges
    * to identical canon values on replay before appending once).
    * CONTRACT (the q80 monotone rule): doc_ids must be monotone across
    * batches; then batch-by-batch folding ≡ folding the concatenation
    * once (DedupSpec asserts this associativity).
    */
  def substrDedupSink(indexRoot: String, outRoot: String,
      appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val replayed = graft.sources.CommitLog
        .txnWatermark(outRoot, appId).exists(batchId <= _)
      if (!replayed) {
        val out = graft.operators.Dedup.substrFold(
          batch.sparkSession, batch, indexRoot)
        graft.sources.CommitLog.appendTxn(out, outRoot, appId, batchId)
      }
      ()
    }

  /** Tumbling 1-minute per-type counts with a 10-minute watermark (late
    * rows older than the watermark are dropped; window state is evicted
    * once the watermark passes — bounded state at any scale).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding (hopping) windows — the streaming twin of batch q74: each
    * event lands in windowDuration/slide overlapping windows; watermark
    * eviction works per window end exactly as for tumbling windows, so
    * state is (watermark delay / slide + duration/slide) windows per key —
    * still time-bounded, never corpus-bounded.
    */
  def hoppingCounts(
      events: DataFrame,
      duration: String = "10 minutes",
      slide: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), duration, slide), col("event_type"))
      // exact-decimal sum (q74's dsum): the streamed total is
      // order-independent, hence bit-equal to the batch twin
      .agg(count(lit(1)).as("n"),
        graft.operators.Exact.dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream event-time join: match each impression with clicks on
    * the same key arriving within `windowMinutes` after it. Watermarks on
    * BOTH sides plus the time-range join condition let the engine evict
    * buffered rows once they can no longer match — state is bounded by
    * (watermark delay + window), not by stream length, which is what makes
    * an unbounded⋈unbounded join feasible at all.
    *
    * Expects `impressions(key, imp_ts, …)` and `clicks(key_c, click_ts, …)`.
    */
  def joinWithinWindow(
      impressions: DataFrame,
      clicks: DataFrame,
      windowMinutes: Int = 10,
      watermarkDelay: String = "10 minutes"): DataFrame =
    impressions.withWatermark("imp_ts", watermarkDelay)
      .join(
        clicks.withWatermark("click_ts", watermarkDelay),
        expr(s"""key = key_c AND
                |click_ts >= imp_ts AND
                |click_ts <= imp_ts + interval $windowMinutes minutes""".stripMargin))

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * against a static dimension (re-read per batch, so slowly-changing
    * dims pick up updates). The static side broadcasts when small — the
    * stream is never shuffled for the join, which is the only sane shape
    * when the stream side is unbounded.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      on: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), on, "left")

  /** Streaming dedup: drop re-deliveries of the same `idCols` arriving
    * within the watermark window. `dropDuplicatesWithinWatermark` keeps
    * per-key state only until the watermark passes it — bounded state at
    * any scale (a plain streaming dropDuplicates would retain every key
    * forever), which makes at-least-once sources effectively exactly-once
    * for downstream aggregation.
    */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionUpdate(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, closed: Boolean)
  final case class SessionState(
      start: Long, last: Long, n: Long)

  // --------------------------------------------------------------------
  // Streaming funnel: the q61 ordered-stage semantics, continuously
  // --------------------------------------------------------------------

  final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** One change record per user whose funnel position advanced in a
    * micro-batch: `reached` stages entered so far, `times` their entry
    * micros (size == reached). `closed = true` marks the final record
    * emitted when the watermark evicts the user's state.
    */
  final case class FunnelUpdate(
      user_id: Long, reached: Int, times: Seq[Long], closed: Boolean)

  final case class FunnelState(times: Array[Long])

  /** Streaming twin of the q61 batch funnel: per-user ordered stages
    * (stage k's entry is the first qualifying event strictly AFTER stage
    * k-1's entry), maintained in `flatMapGroupsWithState` keyed by user.
    * State is one timestamp per ENTERED stage — O(stages) per active user,
    * never an event list; event-time timeout evicts users `ttlMs` of
    * event time after their last funnel movement (the q06 sessionization
    * pattern), so state tracks active users, not history.
    *
    * Ordering: events are sorted within each micro-batch, so any
    * intra-batch disorder is exact. Across batches, a late event that
    * IMPROVES an already-entered stage updates it and invalidates deeper
    * stages (they re-fill from later events) — the conservative repair;
    * with in-order delivery (or disorder bounded by one batch) the stream
    * result is exactly the batch result, which is what the spec asserts.
    */
  def funnelStream(
      events: Dataset[FunnelEvent],
      stages: Seq[String] = Seq("view", "click", "purchase"),
      ttlMs: Long = 60L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(FunnelUpdate(userId, s.times.length, s.times.toSeq, closed = true))
          } else {
            val before = state.getOption.map(_.times).getOrElse(Array.empty[Long])
            var times = before
            val sorted = rows.toSeq
              .filter(e => stages.contains(e.event_type)).sortBy(_.ts.getTime)
            // No funnel-relevant events in this batch: leave state AND the
            // existing timeout alone — re-arming it to watermark+1 here
            // would evict the user as soon as the watermark moves, dropping
            // stages that arrive minutes later.
            if (sorted.isEmpty) Iterator.empty
            else {
            sorted.foreach { e =>
              val k = stages.indexOf(e.event_type)
              val us = e.ts.getTime * 1000L
              if (k == times.size && (k == 0 || us > times(k - 1))) {
                times = times :+ us // entered the next stage
              } else if (k < times.size && us < times(k) &&
                (k == 0 || us > times(k - 1))) {
                // late improvement: earlier entry invalidates deeper stages
                times = times.take(k) :+ us
              }
            }
            if (times.sameElements(before) && state.getOption.isEmpty) Iterator.empty
            else {
              state.update(FunnelState(times))
              state.setTimeoutTimestamp(math.max(
                sorted.lastOption.map(_.ts.getTime + ttlMs).getOrElse(0L),
                state.getCurrentWatermarkMs() + 1))
              if (times.sameElements(before)) Iterator.empty
              else Iterator.single(FunnelUpdate(userId, times.length, times.toSeq, closed = false))
            }
            }
          }
      }
  }

  // --------------------------------------------------------------------
  // Streaming transition matrix: the q72 semantics as a changelog
  // --------------------------------------------------------------------

  final case class TransEvent(
      user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

  /** Changelog record: +1 to the (event_type → next_type) transition count.
    * Summing deltas reproduces the q72 batch matrix.
    */
  final case class TransDelta(event_type: String, next_type: String, delta: Int)

  final case class TransState(lastMs: Long, lastId: Long, lastType: String)

  /** Streaming twin of q72's behavioral transition matrix: per-user state
    * is ONE event (the last seen) — O(1) per active user, evicted by
    * event-time timeout. Each micro-batch sorts its rows per user by
    * (ts, event_id) — the batch window's exact order — chains them onto
    * the stored last event, and emits one +1 delta per adjacent pair.
    * Intra-batch disorder is exact; with delivery disorder bounded by one
    * batch the summed deltas equal the batch matrix (the funnelStream
    * caveat, asserted by the spec).
    */
  def transitionsStream(
      events: Dataset[TransEvent],
      ttlMs: Long = 60L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[TransDelta] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[TransEvent], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            if (sorted.isEmpty) Iterator.empty
            else {
              val types = state.getOption.map(_.lastType).toSeq ++
                sorted.map(_.event_type)
              val out = types.sliding(2).collect {
                case Seq(a, b) => TransDelta(a, b, 1)
              }.toSeq
              val last = sorted.last
              state.update(TransState(last.ts.getTime, last.event_id, last.event_type))
              state.setTimeoutTimestamp(math.max(
                last.ts.getTime + ttlMs, state.getCurrentWatermarkMs() + 1))
              out.iterator
            }
          }
      }
  }

  // --------------------------------------------------------------------
  // Streaming cohort retention: the q63 semantics as a changelog
  // --------------------------------------------------------------------

  final case class CohortEvent(user_id: Long, ts: Timestamp)

  /** Changelog record: `delta` of +1/-1 to the (cohort_week, active_week)
    * user count, weeks as epoch days of their Monday start. Summing deltas
    * per (cohort, week) — e.g. through [[graft.sources.IncrementalView]] —
    * yields exactly the q63 batch retention matrix.
    */
  final case class CohortDelta(cohort_day: Long, week_day: Long, delta: Int)

  final case class CohortState(cohort: Long, weeks: Array[Long])

  /** Streaming twin of q63 cohort retention. Per-user state is (cohort
    * week, set of active weeks already reported) — bounded by the analysis
    * horizon in weeks, not by event volume. Each micro-batch emits deltas
    * for newly seen weeks; a LATE event that moves a user's cohort
    * earlier retracts every previously reported (cohort, week) pair and
    * re-emits it under the new cohort — the streaming answer to "cohort =
    * min over all history" under out-of-order arrival. Downstream sums
    * deltas (update-mode agg or an incremental view), so corrections
    * compose instead of double-counting.
    */
  def cohortRetentionStream(
      events: Dataset[CohortEvent],
      watermarkDelay: String = "10 minutes"): Dataset[CohortDelta] = {
    import events.sparkSession.implicits._
    // Monday-aligned UTC week of an instant, as the epoch day of its start:
    // epoch day 0 was a Thursday, so shifting by +3 makes weeks Monday-
    // based — zone-free integer math, ≡ date_trunc('week') in a UTC session.
    def weekOf(ts: Timestamp): Long = {
      val day = Math.floorDiv(ts.getTime, 86400000L)
      Math.floorDiv(day + 3, 7L) * 7L - 3L
    }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[CohortEvent], state: GroupState[CohortState]) =>
          val weeks = rows.map(e => weekOf(e.ts)).toSet
          if (weeks.isEmpty) Iterator.empty
          else {
            val prior = state.getOption
            val newCohort = math.min(weeks.min, prior.map(_.cohort).getOrElse(Long.MaxValue))
            val known = prior.map(_.weeks).getOrElse(Array.empty[Long])
            val moved = prior.exists(_.cohort > newCohort)
            val retract = if (moved)
              known.toSeq.flatMap(w => Seq(
                CohortDelta(prior.get.cohort, w, -1), CohortDelta(newCohort, w, +1)))
            else Seq.empty[CohortDelta]
            val fresh = (weeks -- known).toSeq.sorted
            state.update(CohortState(newCohort, known ++ fresh))
            (retract ++ fresh.map(w => CohortDelta(newCohort, w, +1))).iterator
          }
      }
  }

  /** Custom stateful sessionization (flatMapGroupsWithState): a session
    * closes after `gapMs` of EVENT-TIME silence per user — either a later
    * event of the same user arrives past the gap, or the watermark passes
    * `last + gapMs` (event-time timeout) and the state is evicted with a
    * final closed record. ≡ the batch q06_sessionize semantics, continuously.
    *
    * Event-time (not processing-time) timeout on purpose: semantics are
    * deterministic w.r.t. the data (replayable, testable), and the engine
    * only schedules extra batches when the watermark actually advances —
    * a processing-time timeout makes every batch schedule a successor
    * (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is uncondition-
    * ally true there), which busy-loops micro-batches on an idle stream.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(
              userId, new Timestamp(s.start), new Timestamp(s.last), s.n, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var out = List.empty[SessionUpdate]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) => // gap exceeded: close previous, open new
                  out ::= SessionUpdate(
                    userId, new Timestamp(s.start), new Timestamp(s.last), s.n, closed = true)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // evict once the watermark passes the session gap; max() guards
              // the "timeout must exceed current watermark" engine check when
              // a straggler row arrives just ahead of the watermark
              state.setTimeoutTimestamp(math.max(
                s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.reverseIterator
          }
      }
  }
}
