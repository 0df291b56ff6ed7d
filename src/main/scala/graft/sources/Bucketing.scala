package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables — the co-located-join layout lever.
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) on the
  * join key by the SAME bucket count lets Spark plan a sort-merge join with
  * NO shuffle exchange on either side: each task reads bucket i of both
  * tables. At 100 TB this converts the nightly fact⋈fact join from a
  * full-cluster shuffle (TBs over the network) into embarrassingly parallel
  * per-bucket merges. The reference (Postgres heap + Trino) has no
  * equivalent physical layout control.
  *
  * Rules of thumb encoded here: bucket count is a power of two sized so a
  * bucket of the LARGER table stays under a few hundred MB; both sides must
  * use identical count + key order; `sortBy` the key so the merge needs no
  * per-task sort.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwrite). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the co-location check for bucketed joins.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
