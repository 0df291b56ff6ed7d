package graft.semantic

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Exact

/** Semantic aggregation layer ≡ the reference's cube.dev schemas
  * (/root/reference conf/cube/schema/StockMarkets.js:1-133,
  * StockMarketsMonthly.js:1-133, StockMarketsPrediction.js:1-76): a cube is
  * a base table (optionally left-joined to others on a composite key), a
  * set of typed measures (count/sum/avg/min/max), and string/time
  * dimensions where time dimensions support a granularity
  * (day/week/month/year, ≡ cube.dev time-dimension granularity).
  *
  * A measure/dimension selection renders to ONE declarative DataFrame
  * aggregation — Catalyst owns the physical plan (partial aggregation,
  * broadcast of small join sides, AQE), so a cube query scales exactly like
  * the hand-written equivalent.
  *
  * Determinism: sum/avg over doubles render via [[Exact]] (order-independent
  * decimal sums) so semantic-layer results are reproducible run-to-run and
  * engine-to-engine.
  */
final case class Measure(name: String, typ: String, sql: String = "") {
  def toCol: Column = typ match {
    case "count" => count(lit(1)).as(name)
    case "sum"   => Exact.dsum(expr(sql)).as(name)
    case "avg"   => Exact.davg(expr(sql)).as(name)
    case "min"   => min(expr(sql)).as(name)
    case "max"   => max(expr(sql)).as(name)
    case other   => throw new IllegalArgumentException(s"unknown measure type: $other")
  }
}

/** `typ` is "string" or "time" (≡ cube.dev dimension types,
  * StockMarkets.js:116-129).
  */
final case class Dimension(name: String, sql: String, typ: String) {
  def toCol(granularity: Option[String]): Column = (typ, granularity) match {
    case ("time", Some(g)) =>
      val valid = Set("day", "week", "month", "year")
      require(valid(g), s"unknown granularity: $g")
      to_date(date_trunc(g, expr(sql))).as(s"${name}_$g")
    case ("time", None) => expr(sql).as(name)
    case ("string", _)  => expr(sql).as(name)
    case (other, _)     => throw new IllegalArgumentException(s"unknown dimension type: $other")
  }
}

/** Composite-key left join onto the base table
  * (≡ StockMarketsPrediction.js:10-11 `LEFT JOIN ... ON p.dt = m.dt AND
  * p.symbol = m.symbol`).
  */
final case class CubeJoin(other: String, on: Seq[String], how: String = "left")

final case class CubeDef(
    name: String,
    table: String,
    measures: Seq[Measure],
    dimensions: Seq[Dimension],
    joins: Seq[CubeJoin] = Nil) {

  private def measure(n: String): Measure =
    measures.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"$name: no measure $n"))
  private def dimension(n: String): Dimension =
    dimensions.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"$name: no dimension $n"))

  /** Render a selection into a DataFrame aggregation.
    *
    * @param resolve  table name → DataFrame (catalog table, parquet path, …)
    * @param dims     (dimension name, optional granularity for time dims)
    */
  def query(
      resolve: String => DataFrame,
      measureNames: Seq[String],
      dims: Seq[(String, Option[String])]): DataFrame = {
    val base = joins.foldLeft(resolve(table)) { (df, j) =>
      df.join(resolve(j.other), j.on, j.how)
    }
    val dimCols = dims.map { case (n, g) => dimension(n).toCol(g) }
    val aggCols = measureNames.map(measure(_).toCol)
    val grouped =
      if (dimCols.isEmpty) base.agg(aggCols.head, aggCols.tail: _*)
      else base.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
    // deterministic output order over the dimension columns
    val outDims = dims.map { case (n, g) =>
      if (g.isDefined) s"${n}_${g.get}" else n
    }
    if (outDims.isEmpty) grouped else grouped.orderBy(outDims.map(col): _*)
  }
}

/** Materialized rollup maintenance ≡ the reference's separate
  * `gold.stock_markets_monthly` table (StockMarketsMonthly.js:2): recompute
  * the month-grain aggregate of a cube and save it as a managed table that
  * a *Monthly cube (or a rewrite rule) can serve directly. Idempotent
  * (`overwrite`), run on a schedule like the ingest jobs.
  */
object RollupJob {
  def materializeMonthly(
      spark: SparkSession,
      cube: CubeDef,
      resolve: String => DataFrame,
      timeDim: String,
      targetTable: String): Unit = {
    val all = cube.measures.map(_.name)
    val stringDims = cube.dimensions.filter(_.typ == "string").map(d => (d.name, None))
    val df = cube.query(resolve, all, stringDims :+ (timeDim -> Some("month")))
    df.write.mode("overwrite").saveAsTable(targetTable)
  }
}
