package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.CommitLog

/** Join-time FILE skipping over a commitlog fact table — the
  * runtime-filter / dynamic-partition-pruning idea (Spark's own
  * InSubqueryExec-based DPP, Trino's dynamic filters) applied at the table
  * format's pruning layer: the dimension side's key set is evaluated
  * FIRST, and the fact scan opens only the files whose min/max range,
  * partition transform, or bloom sidecar can contain one of those keys.
  *
  * Spark's built-in DPP needs a hive-partitioned layout; this works on any
  * commitlog table because pruning rides the SAME per-file stats the
  * filter pruner uses — range-clustered files prune by min/max, hash
  * layouts by `bucket(N, k)`, everything else by the bloom sidecars. At
  * 100 TB with a range-clustered fact table, a selective dim filter turns
  * the fact side of the join from a full scan into a handful of files,
  * BEFORE the join executes — the shuffle never sees the skipped rows.
  *
  * Contract: the filtered dim key set must be bounded (`maxKeys`) — the
  * same smallness assumption a broadcast join already makes; the key
  * collect is one driver-sized aggregate, never the fact table. The
  * surviving fact rows then broadcast-join the dim side, so the whole
  * plan is scan-prune → row-filter → BroadcastHashJoin: zero shuffles.
  */
object RuntimeFilter {

  /** `fact ⋈ dim` on `factKey = dimKey` with file skipping from the dim
    * side's distinct keys. Throws if the dim side exceeds `maxKeys`
    * distinct keys (at that size the caller wants a plain shuffle join,
    * not a runtime filter).
    */
  def keyPrunedJoin(
      spark: SparkSession,
      factRoot: String,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      maxKeys: Int = 10000,
      version: Option[Long] = None): DataFrame = {
    val keys = dimKeys(dim, dimKey, maxKeys)
    val fact =
      if (keys.isEmpty) // no dim keys ⇒ no fact file can contribute
        CommitLog.read(spark, factRoot, version).limit(0)
      else CommitLog.readPruned(spark, factRoot, pred(factKey, keys), version)
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey))
  }

  /** The file subset the join would open — exposed for tests/EXPLAIN. */
  def prunedFactFiles(
      spark: SparkSession,
      factRoot: String,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      maxKeys: Int = 10000): Seq[String] = {
    val v = CommitLog.currentVersion(factRoot).getOrElse(
      throw new IllegalStateException(s"no commits at $factRoot"))
    val keys = dimKeys(dim, dimKey, maxKeys)
    if (keys.isEmpty) Nil
    else CommitLog.prunedFiles(spark, factRoot,
      CommitLog.readManifest(factRoot, v), pred(factKey, keys))
  }

  private def pred(factKey: String, keys: Seq[Any]): Column =
    col(factKey).isInCollection(keys)

  private def dimKeys(dim: DataFrame, dimKey: String, maxKeys: Int): Seq[Any] = {
    val keys = dim.select(col(dimKey)).where(col(dimKey).isNotNull)
      .distinct().limit(maxKeys + 1).collect().map(_.get(0)).toSeq
    require(keys.size <= maxKeys,
      s"dim side has more than $maxKeys distinct join keys — use a plain " +
        "join; a runtime filter this wide skips nothing and bloats the plan")
    keys
  }
}
