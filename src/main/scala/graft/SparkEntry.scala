package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Exact._
import graft.operators.{Analytic, Corpus, Dedup, QueryDef, Relational, Similarity, TableOps, TextAnalysis, TextIndex}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; where
  * the semantics are ANSI-SQL-expressible, `oracleSql` carries the DuckDB
  * mirror (identical column aliases + ORDER BY so the driver's sorted-column
  * value hash matches).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Monthly per-type rollup of the events table — the reference's
    * StockMarketsMonthly cube shape (conf/cube/schema/StockMarketsMonthly.js:14-112).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_monthly_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.queriesOf(Relational.queries, Analytic.queries, Dedup.queries,
      Similarity.queries, TextAnalysis.queries, TableOps.queries, Corpus.queries,
      TextIndex.queries, graft.semantic.ReferenceCubes.queries,
      graft.multimodal.Multimodal.queries) ++ base

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2b aggregations + grouping dimensions (cube measure set:
    // count/sum/avg/min/max over a time dimension at month granularity).
    "q01_monthly_rollup" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          col("event_type"),
          to_date(date_trunc("month", col("ts"))).as("month"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          davg(col("value")).as("avg_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("event_type"), col("month"))
    },
    // §2b projection/filter + aggregation: TPC-H Q1-shaped pricing summary.
    "q02_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omit for non-SQL-expressible ops (driver then records a
    * weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    QueryDef.oraclesOf(Relational.queries, Analytic.queries, Dedup.queries,
      Similarity.queries, TextAnalysis.queries, TableOps.queries, Corpus.queries,
      TextIndex.queries, graft.semantic.ReferenceCubes.queries,
      graft.multimodal.Multimodal.queries) ++ baseOracle

  private def baseOracle: Map[String, String] = Map(
    "q01_monthly_rollup" ->
      s"""SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
         |  count(*) AS n,
         |  ${sqlSum("value")} AS sum_value,
         |  ${sqlAvg("value")} AS avg_value,
         |  min(value) AS min_value,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  ${sqlSum("l_extendedprice")} AS sum_base_price,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  ${sqlAvg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
