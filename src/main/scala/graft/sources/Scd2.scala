package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kimball slowly-changing-dimension (type 2) maintenance over a CommitLog
  * table: the dimension carries `(valid_from, valid_to, is_current)`
  * validity metadata next to its tracked attributes, and [[merge]] applies
  * one update batch in ONE merge commit — closing the open version of
  * every key whose tracked attributes actually changed, opening the new
  * version, and inserting first versions for unseen keys.
  *
  * Single-merge encoding: the merge key is `(key, valid_from)` — close
  * rows carry the CURRENT row's full image (they match the open version
  * exactly and replace it with `valid_to = eff, is_current = false`),
  * new/first versions carry `valid_from = eff` (matching nothing → they
  * insert). Value-identical update rows are dropped by the null-safe
  * change probe, so replaying a batch is a NO-OP — the sink twin
  * ([[graft.streaming.StreamingAnalytics.scd2Sink]]) gets its exactly-once
  * effect from this semantic idempotence rather than a txn watermark.
  *
  * Scale: change detection is one equi-join of the (small) batch against
  * the OPEN slice; the merge rewrites only files holding a changed key —
  * closed-version history files never match and move by reference, so a
  * daily dimension sync costs the churn, never the accumulated history.
  */
object Scd2 {

  val OpenEnd: java.sql.Date = java.sql.Date.valueOf("2099-12-31")

  private val Meta = Seq("valid_from", "valid_to", "is_current")

  /** Initialize the dimension from a full snapshot: every row opens at
    * `eff` with the open-end sentinel.
    */
  def init(snapshot: DataFrame, root: String, eff: java.sql.Date): Long =
    CommitLog.append(
      snapshot.withColumn("valid_from", lit(eff))
        .withColumn("valid_to", lit(OpenEnd))
        .withColumn("is_current", lit(true)),
      root)

  /** Apply one update batch effective `eff`. `updates` carries the key
    * plus the tracked attribute columns (same names as the table). Returns
    * the table version after the merge (unchanged when the batch is a
    * complete no-op).
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
      key: String, eff: java.sql.Date): Long = {
    val base = CommitLog.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no SCD2 table at $root"))
    val tracked = updates.columns.filterNot(_ == key).toSeq
    val dimCols = (key +: tracked) ++ Meta
    // updates are evaluated against the open slice AND again while
    // staging; keep one deterministic copy
    val u = updates.persist()
    try {
      val cur = CommitLog.read(spark, root).filter(col("is_current"))
      val joined = u.as("u").join(cur.as("t"), Seq(key))
      val changed = joined.filter(
        tracked.map(c => !(col(s"u.$c") <=> col(s"t.$c"))).reduce(_ || _))
      val close = changed.select(
        (col(key) +: tracked.map(c => col(s"t.$c").as(c))) ++ Seq(
          col("t.valid_from").as("valid_from"),
          lit(eff).as("valid_to"), lit(false).as("is_current")): _*)
      val open = changed.select(
        (col(key) +: tracked.map(c => col(s"u.$c").as(c))) ++ Seq(
          lit(eff).as("valid_from"),
          lit(OpenEnd).as("valid_to"), lit(true).as("is_current")): _*)
      val first = u.join(
          CommitLog.read(spark, root).select(col(key)).distinct(),
          Seq(key), "left_anti")
        .select((col(key) +: tracked.map(col)) ++ Seq(
          lit(eff).as("valid_from"),
          lit(OpenEnd).as("valid_to"), lit(true).as("is_current")): _*)
      val source = close.unionByName(open).unionByName(first)
        .select(dimCols.map(col): _*)
      if (source.isEmpty) base // complete no-op (e.g. a replayed batch)
      else CommitLog.merge(spark, root, source, keys = Seq(key, "valid_from"))
    } finally { u.unpersist(); () }
  }
}
