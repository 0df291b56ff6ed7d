package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance over a CommitLog source:
  * an additive aggregate view (COUNT + exact DECIMAL SUM per group) kept
  * up to date by folding in ONLY the rows committed since the last refresh
  * — `CommitLog.changes(lastV, currentV)` — never rescanning the table.
  *
  * The view itself is a CommitLog table, so refreshes are atomic commits
  * and readers keep snapshot isolation while a refresh lands. Sums are
  * stored as DECIMAL(18,6): exact and associative, so folding deltas in
  * any order equals the full recompute bit-for-bit (a double sum would
  * drift per refresh order); cast to double only at serving time.
  *
  * At 100 TB the refresh cost is O(new data) + O(view); for a view keyed
  * by bounded-cardinality dimensions (the normal case) the view side is
  * tiny. Deletes/updates in the source between refreshes are out of scope
  * (append-only ranges — the same contract as `changes()`).
  */
object IncrementalView {

  private val dec = DecimalType(18, 6)

  /** Fold source commits (fromV, toV] into the view; returns the source
    * version now reflected (pass it back as `fromV` next time; `fromV = 0`
    * bootstraps from the full table). No new commits → no-op.
    */
  def refresh(
      spark: SparkSession,
      srcRoot: String,
      viewRoot: String,
      groupCols: Seq[String],
      valueCol: String,
      fromV: Long): Long = {
    val toV = CommitLog.currentVersion(srcRoot)
      .getOrElse(throw new IllegalStateException(s"no commits at $srcRoot"))
    if (toV == fromV) return toV
    val combined = combine(spark, viewRoot,
      aggDelta(CommitLog.changes(spark, srcRoot, fromV, toV),
        groupCols, valueCol), groupCols)
    // the view's identity + reflected source version ride IN the
    // overwrite commit (one atomic commit per refresh) — the recorded
    // version is the MvRewrite rule's exactness gate, so it must never be
    // observable apart from the rows it describes
    CommitLog.overwrite(combined, viewRoot, setProps = Map(
      "mv.src" -> srcRoot,
      "mv.group" -> groupCols.mkString(","),
      "mv.value" -> valueCol,
      "mv.srcVersion" -> toV.toString))
    MvRegistry.register(MvRegistry.Mv(srcRoot, viewRoot, groupCols,
      valueCol, toV))
    toV
  }

  /** Per-group (cnt, sum_val) aggregate of a delta slice —
    * sum(DECIMAL(18,6)) widens to (28,6); pin the stored type so every
    * view version carries the same schema.
    */
  private def aggDelta(rows: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    rows.groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(dec)).cast(dec).as("sum_val"))

  /** Fold an aggregated delta into the stored view state. */
  private def combine(spark: SparkSession, viewRoot: String,
      delta: DataFrame, groupCols: Seq[String]): DataFrame =
    CommitLog.currentVersion(viewRoot) match {
      case None => delta
      case Some(_) =>
        val prior = CommitLog.read(spark, viewRoot).toDF(
          groupCols.map(c => s"p_$c") ++ Seq("p_cnt", "p_sum"): _*)
        // Null-safe (<=>) join keys: a plain USING join never matches a
        // NULL group to itself, which would duplicate the null group's row
        // on every refresh instead of folding it.
        val cond = groupCols.map(c => prior(s"p_$c") <=> delta(c)).reduce(_ && _)
        prior.join(delta, cond, "full_outer")
          .select(groupCols.map(c => coalesce(delta(c), prior(s"p_$c")).as(c)) ++ Seq(
            (coalesce(col("p_cnt"), lit(0L)) + coalesce(col("cnt"), lit(0L))).as("cnt"),
            (coalesce(col("p_sum"), lit(0).cast(dec)) +
              coalesce(col("sum_val"), lit(0).cast(dec))).cast(dec).as("sum_val")): _*)
    }

  /** Streaming maintenance: fold ONE micro-batch of source rows into the
    * view, exactly once — the `foreachBatch` body of a live-dashboard
    * sink. The fold is the SAME combine [[refresh]] uses (so stream ≡
    * batch bit-for-bit — exact decimal sums are order- and
    * batching-independent); idempotence comes from the view table's own
    * txn watermark: a replayed batchId returns without committing. A
    * streaming view carries no `mv.srcVersion` (there is no source TABLE
    * version to reflect), so the MvRewrite rule never reroutes to it —
    * serving is explicit via [[serve]].
    */
  def foldBatch(
      batch: DataFrame,
      viewRoot: String,
      groupCols: Seq[String],
      valueCol: String,
      appId: String,
      batchId: Long): Long = {
    val spark = batch.sparkSession
    if (CommitLog.txnWatermark(viewRoot, appId).exists(batchId <= _))
      return CommitLog.currentVersion(viewRoot).get // replay — no-op
    val combined = combine(spark, viewRoot,
      aggDelta(batch, groupCols, valueCol), groupCols)
    CommitLog.overwriteTxn(combined, viewRoot, appId, batchId)
  }

  /** Serving projection: exact decimals cast to double for consumers. */
  def serve(spark: SparkSession, viewRoot: String): DataFrame = {
    val v = CommitLog.read(spark, viewRoot)
    v.select((v.columns.filterNot(Set("cnt", "sum_val")).map(col) ++
      Seq(col("cnt"), col("sum_val").cast("double").as("sum_value")))
      .toIndexedSeq: _*)
  }
}
