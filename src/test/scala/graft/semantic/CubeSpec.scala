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
      Seq("event_type", "ts_month", "n", "sum_value", "avg_value", "min_value", "max_value"))
    // serving month-grain queries from the rollup matches the base cube
    val base = ReferenceCubes.eventsCube.query(resolver,
      Seq("n", "sum_value"), Seq("event_type" -> None, "ts" -> Some("month")))
      .collect().toSeq
    val served = rolled.select("event_type", "ts_month", "n", "sum_value")
      .orderBy("event_type", "ts_month").collect().toSeq
    assert(base.map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
      == served.map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3))))
  }
}
