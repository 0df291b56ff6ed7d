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

/** A materialized rollup this cube can serve coarse selections from —
  * the live version of cube.dev's `preAggregations` stub
  * (StockMarkets.js:4-7, empty in the reference; the reference instead
  * ships a manually-maintained separate monthly table+cube). The table
  * (built by [[RollupJob.materializeMonthly]]) holds every string
  * dimension × the time dimension truncated to `grain`, all measures, and
  * additive components (`__sum`/`__cnt`) for avg measures.
  */
final case class PreAggregation(
    table: String,
    timeDim: String,
    grain: String = "month",
    stringDims: Seq[String])

final case class CubeDef(
    name: String,
    table: String,
    measures: Seq[Measure],
    dimensions: Seq[Dimension],
    joins: Seq[CubeJoin] = Nil,
    preAggregations: Seq[PreAggregation] = Nil) {

  private def measure(n: String): Measure =
    measures.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"$name: no measure $n"))
  private def dimension(n: String): Dimension =
    dimensions.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"$name: no dimension $n"))

  /** Render a selection into a DataFrame aggregation. Selections at a
    * granularity a registered [[PreAggregation]] can serve (its grain or
    * coarser, over a subset of its dimensions, with composable measures)
    * are rewritten onto the rollup table — the scan drops from every raw
    * row to one row per (dims × grain), the decisive 100 TB win for
    * dashboard-grain queries.
    *
    * @param resolve  table name → DataFrame (catalog table, parquet path, …)
    * @param dims     (dimension name, optional granularity for time dims)
    */
  def query(
      resolve: String => DataFrame,
      measureNames: Seq[String],
      dims: Seq[(String, Option[String])],
      filters: Seq[Column] = Nil): DataFrame = {
    // filtered selections render on the RAW path: a pre-aggregation can
    // only serve a filter over dimensions it stores, and proving that per
    // operator buys little — dashboard-grain UNfiltered selections (the
    // rollup's reason to exist) still route
    val base = (if (filters.isEmpty)
      preAggregations.find(servableBy(_, measureNames, dims)) else None) match {
      case Some(p) => return finish(rollupAgg(resolve(p.table), p, measureNames, dims), dims)
      case None =>
        val joined = joins.foldLeft(resolve(table)) { (df, j) =>
          df.join(resolve(j.other), j.on, j.how)
        }
        filters.foldLeft(joined)(_.filter(_))
    }
    val dimCols = dims.map { case (n, g) => dimension(n).toCol(g) }
    val aggCols = measureNames.map(measure(_).toCol)
    val grouped =
      if (dimCols.isEmpty) base.agg(aggCols.head, aggCols.tail: _*)
      else base.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
    finish(grouped, dims)
  }

  /** The SQL expression behind a member name — the REST persona's filter
    * target (a filter addresses a dimension's expression, pre-aggregation).
    */
  private[graft] def dimensionExpr(n: String): (Column, String) = {
    val d = dimension(n)
    (expr(d.sql), d.typ)
  }

  /** deterministic output order over the dimension columns */
  private def finish(grouped: DataFrame, dims: Seq[(String, Option[String])]): DataFrame = {
    val outDims = dims.map { case (n, g) =>
      if (g.isDefined) s"${n}_${g.get}" else n
    }
    if (outDims.isEmpty) grouped else grouped.orderBy(outDims.map(col): _*)
  }

  /** Grains a materialized grain can roll further up to (weeks do not align
    * with month boundaries, so month serves only month/year).
    */
  private val coarserOf: Map[String, Set[String]] =
    Map("month" -> Set("month", "year"), "day" -> Set("day", "month", "year"))

  private[semantic] def servableBy(
      p: PreAggregation,
      measureNames: Seq[String],
      dims: Seq[(String, Option[String])]): Boolean =
    dims.forall {
      case (n, None)    => p.stringDims.contains(n) && dimension(n).typ == "string"
      case (n, Some(g)) => n == p.timeDim && coarserOf.getOrElse(p.grain, Set.empty)(g)
    } && measureNames.forall(m =>
      Set("count", "sum", "avg", "min", "max")(measure(m).typ))

  /** Measure composition over the rollup rows: counts/sums re-sum, min/max
    * re-extremize, avg = re-summed additive components. Double re-sums ride
    * the [[Exact]] decimal path (order-independent), though a composed
    * double sum can differ from the raw-grain sum in the final ulps (the
    * rollup stores doubles) — callers comparing across routes should use
    * tolerance, not hashes.
    */
  private def rollupAgg(
      rollup: DataFrame,
      p: PreAggregation,
      measureNames: Seq[String],
      dims: Seq[(String, Option[String])]): DataFrame = {
    val dimCols = dims.map {
      case (n, None)                     => col(n)
      case (n, Some(g)) if g == p.grain  => col(s"${p.timeDim}_${p.grain}").as(s"${n}_$g")
      case (n, Some(g)) =>
        to_date(date_trunc(g, col(s"${p.timeDim}_${p.grain}"))).as(s"${n}_$g")
    }
    val aggCols = measureNames.map { m =>
      measure(m).typ match {
        case "count" => sum(col(m)).as(m)
        case "sum"   => Exact.dsum(col(m)).as(m)
        case "min"   => min(col(m)).as(m)
        case "max"   => max(col(m)).as(m)
        case "avg"   =>
          (Exact.dsum(col(s"${m}__sum")) / sum(col(s"${m}__cnt"))).as(m)
      }
    }
    if (dimCols.isEmpty) rollup.agg(aggCols.head, aggCols.tail: _*)
    else rollup.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Rollup materialization frame: all string dims × `grain(timeDim)`,
    * every measure, plus additive `__sum`/`__cnt` components for avg
    * measures (avg is not additive; its components are).
    */
  private[semantic] def rollupFrame(
      resolve: String => DataFrame,
      timeDim: String,
      grain: String): DataFrame = {
    val base = joins.foldLeft(resolve(table)) { (df, j) =>
      df.join(resolve(j.other), j.on, j.how)
    }
    // string dims group by their SQL expression (toCol), not col(name) —
    // the API allows sql != name, where col(name) would miss or mis-bind
    val dimCols = dimensions.filter(_.typ == "string").map(_.toCol(None)) :+
      dimension(timeDim).toCol(Some(grain))
    val aggCols = measures.map(_.toCol) ++ measures.collect {
      case m if m.typ == "avg" => Seq(
        Exact.dsum(expr(m.sql)).as(s"${m.name}__sum"),
        count(expr(m.sql)).as(s"${m.name}__cnt"))
    }.flatten
    base.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
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
    cube.rollupFrame(resolve, timeDim, grain = "month")
      .write.mode("overwrite").saveAsTable(targetTable)
  }

  /** Materialize PARTITIONED by the month column — required for
    * [[refreshMonths]] and the right layout for month-pruned serving.
    */
  def materializeMonthlyPartitioned(
      spark: SparkSession,
      cube: CubeDef,
      resolve: String => DataFrame,
      timeDim: String,
      targetTable: String): Unit = {
    cube.rollupFrame(resolve, timeDim, grain = "month")
      .write.mode("overwrite")
      .partitionBy(s"${timeDim}_month")
      .saveAsTable(targetTable)
  }

  /** CDC-DRIVEN incremental maintenance: derive the months touched by the
    * fact table's commits since `fromVersion` from COMMIT METADATA alone
    * ([[graft.sources.CommitLog.changedFileStats]] — the min/max stats of
    * every file added OR removed span the months whose rollup rows could
    * have changed; removed-file stats make deletes and rewrites visible,
    * which row-level CDC cannot), then [[refreshMonths]] exactly those
    * partitions from the CURRENT snapshot. Returns (newVersion, months
    * refreshed) — the caller persists newVersion as its next watermark.
    *
    * The time dimension must be a plain fact-table column with collected
    * stats (timestamps are stored zone-independently as unix micros;
    * DATE/ISO strings pass through). Files without usable stats for it
    * (e.g. zero-row files) are skipped. Conservative by construction: a
    * removed file spanning three months refreshes all three even if one
    * row changed — over-refresh is correct, under-refresh is not.
    *
    * 100 TB shape: the month derivation is a driver-side fold over ≤
    * (commits × files/commit) FileStats — no data file opens, no scan;
    * the refresh then reads only the touched months' fact rows (the month
    * filter prunes the scan) and swaps only those rollup partitions.
    */
  def refreshFromChanges(
      spark: SparkSession,
      cube: CubeDef,
      resolve: String => DataFrame,
      factRoot: String,
      timeDim: String,
      targetTable: String,
      fromVersion: Long): (Long, Seq[String]) = {
    import graft.sources.CommitLog
    val toV = CommitLog.currentVersion(factRoot).getOrElse(
      throw new IllegalStateException(s"no commits at $factRoot"))
    if (toV <= fromVersion) return (toV, Nil)
    val tsCol = cube.dimensions.find(_.name == timeDim).getOrElse(
      throw new IllegalArgumentException(s"${cube.name}: no dimension $timeDim")
    ).sql // plain column contract (see scaladoc)
    val isTs = {
      val m = CommitLog.readManifest(factRoot, toV)
      CommitLog.manifestSchema(m).fields.find(_.name == tsCol)
        .exists(_.dataType == org.apache.spark.sql.types.TimestampType)
    }
    def monthOf(stat: String): Option[java.time.LocalDate] = {
      val d =
        if (isTs) // unix-micros string (zone-independent stat encoding)
          stat.toLongOption.map(us => java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L)).atZone(java.time.ZoneOffset.UTC).toLocalDate)
        else scala.util.Try(java.time.LocalDate.parse(stat.take(10))).toOption
      d.map(_.withDayOfMonth(1))
    }
    val months = scala.collection.mutable.SortedSet[String]()
    for {
      (_, _, added, removed) <- CommitLog.changedFileStats(factRoot, fromVersion, toV)
      f <- added ++ removed if f.rows > 0
      lo <- f.minsOrEmpty.get(tsCol).flatMap(monthOf)
      hi <- f.maxsOrEmpty.get(tsCol).flatMap(monthOf)
    } {
      var m = lo
      while (!m.isAfter(hi)) { months += m.toString; m = m.plusMonths(1) }
    }
    if (months.nonEmpty)
      refreshMonths(spark, cube, resolve, timeDim, targetTable, months.toSeq)
    (toV, months.toSeq)
  }

  /** Incremental maintenance: recompute ONLY the given months and swap
    * exactly those partitions (dynamic partition overwrite). At 100 TB the
    * nightly job recomputes the current month — source rows outside it are
    * never read (the month filter prunes the fact scan) and history
    * partitions are untouched. Full recompute stays available for backfill.
    */
  def refreshMonths(
      spark: SparkSession,
      cube: CubeDef,
      resolve: String => DataFrame,
      timeDim: String,
      targetTable: String,
      months: Seq[String]): Unit = {
    val monthCol = s"${timeDim}_month"
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // month filter FIRST so the fact scan prunes to the refreshed window
      val timeSql = cube.dimensions.find(_.name == timeDim).get.sql
      val filtered: String => DataFrame = { name =>
        val df = resolve(name)
        if (name == cube.table)
          df.filter(to_date(date_trunc("month", expr(timeSql))).isin(months: _*))
        else df
      }
      val frame = cube.rollupFrame(filtered, timeDim, grain = "month")
      // Dynamic partition overwrite only swaps partitions PRESENT in the
      // recomputed frame — a refreshed month whose source rows all vanished
      // would keep its stale rollup partition. Drop the requested months
      // explicitly first so zero-row months end up empty, not stale.
      months.foreach { m =>
        spark.sql(
          s"ALTER TABLE $targetTable DROP IF EXISTS PARTITION ($monthCol = '$m')")
      }
      // insertInto maps POSITIONALLY and partitioned tables store the
      // partition column last — reorder to (data..., month)
      val ordered = frame.columns.filterNot(_ == monthCol) :+ monthCol
      frame.select(ordered.toIndexedSeq.map(col): _*)
        .write.mode("overwrite")
        .insertInto(targetTable) // dynamic mode: only touched partitions swap
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
