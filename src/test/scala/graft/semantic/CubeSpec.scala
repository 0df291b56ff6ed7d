package graft.semantic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class CubeSpec extends SparkTestBase {

  test("cube render equals hand-written aggregation") {
    val viaCube = ReferenceCubes.eventsCube.query(
      Tables.load(spark, sf0001, _),
      Seq("n", "avg_value"),
      Seq("event_type" -> None, "ts" -> Some("month")))
    val byHand = Tables.load(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(date_trunc("month", col("ts"))).as("ts_month"))
      .agg(count(lit(1)).as("n"), graft.operators.Exact.davg(col("value")).as("avg_value"))
      .orderBy("event_type", "ts_month")
    assert(viaCube.columns.toSeq == Seq("event_type", "ts_month", "n", "avg_value"))
    assert(viaCube.collect().toSeq == byHand.collect().toSeq)
  }

  test("cube views: registered view ≡ direct rendering; unresolvable cubes skip") {
    // only `events` resolves in this session — the monthly rollup and the
    // prediction tables don't exist, so those cubes must skip, not fail
    Tables.load(spark, sf0001, "events").createOrReplaceTempView("events")
    try {
      val registered = CubeViews.register(spark, grain = "month")
      assert(registered == Seq("global_temp.events_cube"))
      val direct = ReferenceCubes.eventsCube.query(
        spark.table(_),
        ReferenceCubes.eventsCube.measures.map(_.name),
        Seq("event_type" -> None, "ts" -> Some("month")))
      val viaView = spark.table("global_temp.events_cube")
      assert(viaView.columns.toSeq == direct.columns.toSeq)
      assert(viaView.collect().toSeq == direct.collect().toSeq)
      // the view is plain SQL surface: a client can roll it up further —
      // and it resolves from a FORKED session too (the thrift-server
      // per-connection shape; session temp views would not)
      val n = spark.newSession().sql(
        "SELECT sum(n) AS total FROM global_temp.events_cube")
        .collect().head.getLong(0)
      assert(n == Tables.load(spark, sf0001, "events").count())
    } finally {
      spark.catalog.dropTempView("events")
      spark.catalog.dropGlobalTempView("events_cube")
    }
  }

  test("granularity bucketing: year collapses months") {
    val byYear = ReferenceCubes.eventsCube.query(
      Tables.load(spark, sf0001, _), Seq("n"), Seq("ts" -> Some("year")))
    val rows = byYear.collect()
    assert(rows.length >= 1)
    assert(byYear.columns.toSeq == Seq("ts_year", "n"))
  }

  test("no-dimension selection yields a single total row") {
    val total = ReferenceCubes.eventsCube.query(
      Tables.load(spark, sf0001, _), Seq("n", "sum_value"), Nil)
    val r = total.collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == Tables.load(spark, sf0001, "events").count())
  }

  test("prediction cube: composite-key left join preserves unmatched rows") {
    import spark.implicits._
    val actual = Seq(
      ("click", "2024-01", 10.0),
      ("view", "2024-01", 20.0),
      ("view", "2024-02", 30.0)).toDF("event_type", "month", "avg_value")
    val pred = Seq(
      ("click", "2024-01", 11.0)).toDF("event_type", "month", "avg_predicted")
    val tables = Map("events_actual" -> actual, "events_prediction_tbl" -> pred)
    val out = ReferenceCubes.eventsPrediction.query(
      tables(_), Seq("n", "avg_actual", "avg_predicted"),
      Seq("event_type" -> None, "month" -> None)).collect()
    assert(out.length == 3) // left join keeps the two unpredicted groups
    val click = out.find(r => r.getString(0) == "click").get
    assert(click.getDouble(4) == 11.0)
    assert(out.count(_.isNullAt(4)) == 2)
  }

  test("RollupJob materializes a monthly table the Monthly cube can serve") {
    val resolver = Tables.load(spark, sf0001, _: String)
    RollupJob.materializeMonthly(spark, ReferenceCubes.eventsCube, resolver,
      timeDim = "ts", targetTable = "events_monthly_t")
    val rolled = spark.table("events_monthly_t")
    assert(rolled.columns.toSeq ==
      Seq("event_type", "ts_month", "n", "sum_value", "avg_value", "min_value", "max_value",
        "avg_value__sum", "avg_value__cnt")) // additive components for avg
    // serving month-grain queries from the rollup matches the base cube
    val base = ReferenceCubes.eventsCube.query(resolver,
      Seq("n", "sum_value"), Seq("event_type" -> None, "ts" -> Some("month")))
      .collect().toSeq
    val served = rolled.select("event_type", "ts_month", "n", "sum_value")
      .orderBy("event_type", "ts_month").collect().toSeq
    assert(base.map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
      == served.map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3))))
  }

  test("preAggregation routing: coarse selections read the rollup, fine ones the base") {
    val resolver = Tables.load(spark, sf0001, _: String)
    RollupJob.materializeMonthly(spark, ReferenceCubes.eventsCube, resolver,
      timeDim = "ts", targetTable = "events_monthly_pa")
    val cube = ReferenceCubes.eventsCube.copy(preAggregations = Seq(
      PreAggregation("events_monthly_pa", timeDim = "ts", grain = "month",
        stringDims = Seq("event_type"))))

    // resolver that records which tables a query actually asked for
    var asked = List.empty[String]
    val tracking: String => DataFrame = { n =>
      asked ::= n
      if (n == "events_monthly_pa") spark.table(n) else resolver(n)
    }

    // YEAR granularity (coarser than the month grain) with an avg measure:
    // served from the rollup, composed from additive components
    val served = cube.query(tracking, Seq("n", "sum_value", "avg_value"),
      Seq("event_type" -> None, "ts" -> Some("year"))).collect()
    assert(asked == List("events_monthly_pa"))
    val direct = ReferenceCubes.eventsCube.query(resolver,
      Seq("n", "sum_value", "avg_value"),
      Seq("event_type" -> None, "ts" -> Some("year"))).collect()
    assert(served.length == direct.length)
    served.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) == d.getString(0))
      assert(s.getDate(1) == d.getDate(1))
      assert(s.getLong(2) == d.getLong(2))
      assert(math.abs(s.getDouble(3) - d.getDouble(3)) <= 1e-9 * math.abs(d.getDouble(3)))
      assert(math.abs(s.getDouble(4) - d.getDouble(4)) <= 1e-9 * math.abs(d.getDouble(4)))
    }

    // WEEK granularity does not align with month boundaries → base route
    asked = Nil
    cube.query(tracking, Seq("n"), Seq("ts" -> Some("week"))).collect()
    assert(asked == List("events"))
  }

  test("incremental rollup refresh swaps only the requested month partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two-month synthetic source (the shipped corpus spans a single month)
    val twoMonths = Seq(
      ("click", "2024-01-05 10:00:00", 1.0), ("click", "2024-01-20 11:00:00", 2.0),
      ("view", "2024-01-07 09:00:00", 3.0),
      ("click", "2024-02-03 08:00:00", 4.0), ("view", "2024-02-11 17:00:00", 5.0))
      .toDF("event_type", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val resolver: String => DataFrame = {
      case "events" => twoMonths
      case other    => Tables.load(spark, sf0001, other)
    }
    RollupJob.materializeMonthlyPartitioned(spark, ReferenceCubes.eventsCube,
      resolver, timeDim = "ts", targetTable = "events_monthly_inc")
    val before = spark.table("events_monthly_inc")
      .select("event_type", "ts_month", "n").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val months = before.keys.map(_._2).toSeq.distinct.sorted
    assert(months.nonEmpty)

    // refresh the FIRST month from a doctored source (one event type's rows
    // for that month are dropped) — other months must keep their old values
    val target = months.head
    val doctored: String => DataFrame = {
      case "events" => twoMonths.filter(!(col("event_type") === "click" &&
        to_date(date_trunc("month", col("ts"))) === target))
      case other => resolver(other)
    }
    RollupJob.refreshMonths(spark, ReferenceCubes.eventsCube, doctored,
      timeDim = "ts", targetTable = "events_monthly_inc", months = Seq(target))

    val after = spark.table("events_monthly_inc")
      .select("event_type", "ts_month", "n").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    // refreshed month: click row disappeared
    assert(before.contains(("click", target)))
    assert(!after.contains(("click", target)))
    // untouched months identical
    val untouched = before.keys.filter(_._2 != target)
    assert(untouched.nonEmpty)
    untouched.foreach(k => assert(after(k) == before(k)))
    spark.sql("DROP TABLE events_monthly_inc")
  }

  test("CDC-driven rollup refresh: commit metadata → exactly the touched months") {
    import org.apache.spark.sql.functions._
    import graft.sources.CommitLog
    val factRoot = java.nio.file.Files.createTempDirectory("cube-cdc-fact").toString
    val target = "events_monthly_cdc"
    def monthRows(month: String, typ: String, n: Int, base: Double) =
      spark.range(n).selectExpr(
        s"'$typ' AS event_type",
        s"timestamp'$month-15 12:00:00' + make_interval(0, 0, 0, 0, 0, CAST(id AS INT), 0) AS ts",
        s"CAST(id AS DOUBLE) + $base AS value")
    // three appends, one per month → each data file spans exactly one month
    CommitLog.append(monthRows("2024-01", "click", 4, 1.0), factRoot)
    CommitLog.append(monthRows("2024-02", "view", 3, 2.0), factRoot)
    CommitLog.append(monthRows("2024-03", "click", 5, 3.0), factRoot)
    val resolver: String => org.apache.spark.sql.DataFrame = {
      case "events" => CommitLog.read(spark, factRoot)
      case other    => Tables.load(spark, sf0001, other)
    }
    RollupJob.materializeMonthlyPartitioned(spark, ReferenceCubes.eventsCube,
      resolver, timeDim = "ts", targetTable = target)
    val watermark = CommitLog.currentVersion(factRoot).get // = 3

    def rollupEqualsFullRecompute(): Unit = {
      val cols = spark.table(target).columns.sorted.toSeq
      val got = spark.table(target).select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
      val want = ReferenceCubes.eventsCube
        .rollupFrame(resolver, "ts", "month").select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want)
    }

    // APPEND touching only February → metadata derives exactly that month
    CommitLog.append(monthRows("2024-02", "click", 2, 9.0), factRoot)
    val (v4, m1) = RollupJob.refreshFromChanges(spark, ReferenceCubes.eventsCube,
      resolver, factRoot, timeDim = "ts", targetTable = target,
      fromVersion = watermark)
    assert(v4 == watermark + 1 && m1 == Seq("2024-02-01"))
    rollupEqualsFullRecompute()

    // DELETE all of March — a copy-on-write rewrite; the REMOVED file's
    // stats make the month visible (row-level CDC could not), and the
    // refresh leaves the vanished month EMPTY, not stale
    CommitLog.delete(spark, factRoot,
      to_date(date_trunc("month", col("ts"))) === "2024-03-01")
    val (v5, m2) = RollupJob.refreshFromChanges(spark, ReferenceCubes.eventsCube,
      resolver, factRoot, timeDim = "ts", targetTable = target, fromVersion = v4)
    assert(v5 == v4 + 1 && m2 == Seq("2024-03-01"))
    assert(spark.table(target).filter(col("ts_month") === "2024-03-01").isEmpty)
    rollupEqualsFullRecompute()

    // caught-up watermark → no-op, no months touched
    val (v6, m3) = RollupJob.refreshFromChanges(spark, ReferenceCubes.eventsCube,
      resolver, factRoot, timeDim = "ts", targetTable = target, fromVersion = v5)
    assert(v6 == v5 && m3.isEmpty)

    // MERGE-ON-READ delete (deletion vectors): no file is added OR
    // removed, yet rows in January died — the DV'd file's stats surface
    // through changedFileStats as removed-range, so the refresh still
    // derives exactly January and the rollup tracks the live rows
    CommitLog.deleteDV(spark, factRoot,
      to_date(date_trunc("month", col("ts"))) === "2024-01-01" &&
        col("value") >= 3.0)
    val (v7, m4) = RollupJob.refreshFromChanges(spark, ReferenceCubes.eventsCube,
      resolver, factRoot, timeDim = "ts", targetTable = target, fromVersion = v6)
    assert(v7 == v6 + 1 && m4 == Seq("2024-01-01"))
    rollupEqualsFullRecompute()
    spark.sql(s"DROP TABLE $target")
  }
}
