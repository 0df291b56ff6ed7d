package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exposure: a Spark query over a scale-factor dir
  * plus (when SQL-expressible) its DuckDB oracle mirror. Column aliases and
  * ORDER BY must agree between the two — the driver's compare sorts columns
  * by name and hashes values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Merge module registries into the SparkEntry maps. */
  def queriesOf(ms: Map[String, QueryDef]*): Map[String, (SparkSession, String) => DataFrame] =
    ms.flatten.map { case (k, v) => k -> v.fn }.toMap
  def oraclesOf(ms: Map[String, QueryDef]*): Map[String, String] =
    ms.flatten.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }.toMap
}
