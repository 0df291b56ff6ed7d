package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import Exact._

/** Analytical operator surface beyond the core relational set (SURVEY.md
  * §2b "window functions / grouping sets" row — capability the reference
  * delegates to Trino, here first-class): CUBE grouping sets, frame-bounded
  * moving aggregates, multi-column DISTINCT aggregation, an AS-OF temporal
  * join, batch tumbling time-windows (the batch twin of
  * [[graft.streaming.StreamingAnalytics.windowedCounts]]), exact quantiles,
  * and deterministic two-variable statistics (corr via exact moment sums).
  *
  * Scale notes (100 TB):
  *  - the AS-OF join is the union+window formulation — one shuffle on the
  *    join key, no range cross-join, no per-row probe; state per key is one
  *    running "last order" value, so it survives arbitrarily long histories;
  *  - CUBE/ROLLUP expand rows 4× BEFORE the partial aggregate, which Spark
  *    combines map-side — no extra shuffle vs a plain groupBy;
  *  - moving averages partition by bounded keys (event_type) and the frame
  *    is row-bounded (7), so window state is O(1) per partition stream;
  *  - quantiles use Spark's exact `percentile` (single agg over the group;
  *    at true 100 TB scale swap for `percentile_approx` — same plan shape,
  *    bounded memory — the exact form is chosen here because the oracle
  *    hash-compares bit-exact values).
  *
  * Determinism: every double SUM rides through exact DECIMAL (see [[Exact]]);
  * moving sums/moments do the same inside window frames, so Spark and the
  * DuckDB oracle agree bit-for-bit regardless of aggregation order.
  */
object Analytic {

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)
  private val dec = DecimalType(18, 6)

  val queries: Map[String, QueryDef] = Map(

    // Full CUBE over (returnflag, linestatus) with grouping indicators —
    // the grouping-sets family member q08_rollup doesn't cover.
    "q25_cube" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            dsum(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some(
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
           |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
           |  ${sqlSum("l_extendedprice")} AS sum_price, count(*) AS n
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)),

    // Frame-bounded moving aggregate: 7-day (7-row over daily grain) moving
    // average of event value per type. The moving SUM stays in exact decimal
    // inside the frame; the divide happens once in double.
    "q26_moving_avg" -> QueryDef(
      fn = { (s, dir) =>
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast(dec)).as("d_dec"), count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-6, Window.currentRow)
        daily
          .withColumn("mov_avg",
            sum(col("d_dec")).over(w).cast("double") / count(lit(1)).over(w))
          .select(col("event_type"), col("day"),
            col("d_dec").cast("double").as("day_total"), col("n"), col("mov_avg"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |    SUM(CAST(value AS DECIMAL(18,6))) AS d_dec, count(*) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, day, CAST(d_dec AS DOUBLE) AS day_total, n,
          |  CAST(SUM(d_dec) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS mov_avg
          |FROM daily
          |WINDOW w AS (PARTITION BY event_type ORDER BY day
          |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
          |ORDER BY event_type, day""".stripMargin)),

    // Multi-column DISTINCT aggregation: Spark plans this as a single
    // grouping-sets expand + two-phase aggregate — no per-column re-scan.
    "q27_distinct_agg" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("nd_parts"),
            countDistinct(col("l_suppkey")).as("nd_supps"),
            countDistinct(col("l_orderkey")).as("nd_orders"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      oracle = Some(
        """SELECT l_returnflag,
          |  count(DISTINCT l_partkey) AS nd_parts,
          |  count(DISTINCT l_suppkey) AS nd_supps,
          |  count(DISTINCT l_orderkey) AS nd_orders,
          |  count(*) AS n
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // AS-OF join: each event picks up the most recent order (by
    // o_orderdate <= ts) of the same user. Implementation is the scalable
    // union+window form: tag both sides, one shuffle on the key, running
    // `last(_, ignoreNulls)` ordered by (time, side, orderkey) — never a
    // range cross-join. Orders are deduped per (custkey, date) to the max
    // orderkey first so the as-of pick is total-order deterministic.
    "q28_asof_join" -> QueryDef(
      fn = { (s, dir) =>
        val ev = t(s, dir, "events")
          .select(col("user_id").as("k"), col("ts").as("t"),
            lit(0).as("side"), lit(null).cast("long").as("okey"),
            lit(null).cast("double").as("oprice"), col("event_type"))
        val orct = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
          .agg(max_by(struct(col("o_orderkey"), col("o_totalprice")), col("o_orderkey")).as("o"))
          .select(col("k"), col("t"), lit(1).as("side"),
            col("o.o_orderkey").as("okey"), col("o.o_totalprice").as("oprice"),
            lit(null).cast("string").as("event_type"))
        // Order within a key: time asc, orders before events at equal time
        // (inclusive as-of), so `last(okey, ignoreNulls)` at an event row is
        // exactly the latest order with t_order <= t_event.
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("side").desc, col("okey").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.unionAll(orct)
          .withColumn("asof_okey", last(col("okey"), ignoreNulls = true).over(w))
          .withColumn("asof_price", last(col("oprice"), ignoreNulls = true).over(w))
          .filter(col("side") === 0)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            count(col("asof_okey")).as("n_matched"),
            dsum(col("asof_price")).as("sum_price"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH orct AS (
           |  SELECT o_custkey AS k, o_orderdate AS t,
           |    max(o_orderkey) AS okey,
           |    max_by(o_totalprice, o_orderkey) AS oprice
           |  FROM orders GROUP BY 1, 2)
           |SELECT e.event_type,
           |  count(*) AS n_events,
           |  count(o.okey) AS n_matched,
           |  ${sqlSum("o.oprice")} AS sum_price
           |FROM events e ASOF LEFT JOIN orct o
           |  ON e.user_id = o.k AND e.ts >= o.t
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Batch tumbling time-window aggregation (the batch twin of the
    // streaming windowedCounts): UTC-aligned 1-day buckets via window().
    // win_start rides as DATE — timestamp outputs carry ns-vs-us parquet
    // dtype skew between the engines (SKILL gotcha).
    "q29_tumbling_window" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(to_date(col("window.start")).as("win_start"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy("win_start", "event_type")
      },
      oracle = Some(
        s"""SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS win_start, event_type,
           |  count(*) AS n, ${sqlSum("value")} AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Time-series gap fill: a generated minute-grain date spine PER SERIES,
    // left-joined to observed sums, forward-filled with the running last
    // non-null (`last(_, ignoreNulls)` frame). The spine generates INSIDE
    // the row (sequence + explode) from per-series bounds — no driver-side
    // range materialization — and the forward-fill window is PARTITIONED by
    // the series key, so no single task ever sorts the whole spine: at
    // 100 TB each series' fill runs in its own task, the one shape a global
    // `Window.orderBy` (a single-partition sort) cannot survive.
    "q40_gap_fill" -> QueryDef(
      fn = { (s, dir) =>
        val obs = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
          .agg(count(lit(1)).as("n_obs"), dsum(col("value")).as("v_obs"))
        val spine = obs
          .groupBy(col("event_type"))
          .agg(min(col("m")).as("m0"), max(col("m")).as("m1"))
          .select(col("event_type"),
            explode(expr("sequence(m0, m1, interval 1 minute)")).as("m"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(obs, Seq("event_type", "m"), "left")
          .withColumn("is_gap", col("n_obs").isNull)
          .withColumn("v_filled", last(col("v_obs"), ignoreNulls = true).over(w))
          .select(col("event_type"), unix_micros(col("m")).as("m_us"), col("is_gap"),
            coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("v_filled"))
          .orderBy("event_type", "m_us")
      },
      oracle = Some(
        s"""WITH obs AS (
           |  SELECT event_type, CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m,
           |         count(*) AS n_obs, ${sqlSum("value")} AS v_obs
           |  FROM events GROUP BY 1, 2),
           |bounds AS (
           |  SELECT event_type, min(m) AS m0, max(m) AS m1 FROM obs GROUP BY 1),
           |spine AS (
           |  SELECT event_type, unnest(generate_series(m0, m1, INTERVAL 1 minute)) AS m
           |  FROM bounds)
           |SELECT spine.event_type, epoch_us(spine.m) AS m_us,
           |  obs.n_obs IS NULL AS is_gap,
           |  coalesce(obs.n_obs, 0) AS n_obs,
           |  last_value(obs.v_obs IGNORE NULLS) OVER (PARTITION BY spine.event_type
           |    ORDER BY spine.m
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
           |FROM spine LEFT JOIN obs
           |  ON obs.event_type = spine.event_type AND obs.m = spine.m
           |ORDER BY 1, 2""".stripMargin)),

    // Exact quantiles (linear interpolation — identical definition in Spark
    // `percentile` and DuckDB `quantile_cont`).
    "q30_quantiles" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.25)").as("q25"),
            expr("percentile(l_quantity, 0.5)").as("median"),
            expr("percentile(l_quantity, 0.75)").as("q75"),
            expr("percentile(l_extendedprice, 0.5)").as("price_median"))
          .orderBy("l_returnflag")
      },
      oracle = Some(
        """SELECT l_returnflag,
          |  quantile_cont(l_quantity, 0.25) AS q25,
          |  quantile_cont(l_quantity, 0.5) AS median,
          |  quantile_cont(l_quantity, 0.75) AS q75,
          |  quantile_cont(l_extendedprice, 0.5) AS price_median
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Deterministic two-variable statistics: Pearson corr + stddev over
    // integer-QUANTIZED variables (xq = floor(1000·qty), yq = floor(10·price))
    // with exact BIGINT moment sums — built-in corr/stddev sum doubles in
    // engine-specific order (not reproducible), and even exact-decimal
    // moments fail at the decimal→double cast (DuckDB double-rounds int128
    // decimals, Spark single-rounds BigDecimal — observed 1-ulp corr drift).
    // BIGINT→double casts and the fixed closing formula are IEEE-identical
    // in both engines — the same scheme the embedding dot products use.
    // Bounds: syy ≤ n·1e12 — safe in int64 through ~sf1 (6M rows → 6e18).
    "q31_stats" -> QueryDef(
      fn = { (s, dir) =>
        val xq = floor(col("l_quantity") * 1000).cast("long")
        val yq = floor(col("l_extendedprice") * 10).cast("long")
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(xq).as("sx"), sum(yq).as("sy"),
            sum(xq * yq).as("sxy"), sum(xq * xq).as("sxx"), sum(yq * yq).as("syy"))
          .select(
            col("l_returnflag"), col("n"),
            ((col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / col("n")) /
              sqrt((col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n")) *
                   (col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / col("n"))))
              .as("corr_qty_price"),
            (sqrt((col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n")) /
                 (col("n") - 1)) / 1000.0).as("stddev_qty"))
          .orderBy("l_returnflag")
      },
      oracle = Some(
        """WITH q AS (
          |  SELECT l_returnflag,
          |    CAST(floor(l_quantity * 1000) AS BIGINT) AS xq,
          |    CAST(floor(l_extendedprice * 10) AS BIGINT) AS yq
          |  FROM lineitem),
          |m AS (
          |  SELECT l_returnflag, count(*) AS n,
          |    CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
          |    CAST(SUM(xq * yq) AS BIGINT) AS sxy,
          |    CAST(SUM(xq * xq) AS BIGINT) AS sxx,
          |    CAST(SUM(yq * yq) AS BIGINT) AS syy
          |  FROM q GROUP BY 1)
          |SELECT l_returnflag, n,
          |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
          |    sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
          |         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))
          |    AS corr_qty_price,
          |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) / 1000.0
          |    AS stddev_qty
          |FROM m ORDER BY 1""".stripMargin)),

    // PIVOT: wide-format aggregation (one column per pivot value). Spark
    // plans this as a single aggregate with conditional branches — one
    // pass, no per-value re-scan; values are enumerated explicitly, which
    // is the only scalable form (an unenumerated pivot needs a distinct
    // pre-pass over 100 TB).
    "q36_pivot" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(dsum(col("l_quantity")))
          .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
          .orderBy("l_returnflag")
      },
      oracle = Some(
        s"""SELECT l_returnflag,
           |  ${sqlSum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
           |  ${sqlSum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Generator / lateral view: explode the tokenized text stream and
    // aggregate the flattened rows (1 row in → n rows out inside the task —
    // no shuffle until the final count).
    "q37_explode_tokens" -> QueryDef(
      fn = { (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) >= 6)
          .groupBy("tok").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .limit(20)
      },
      oracle = Some(
        """SELECT tok, count(*) AS n
          |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |      FROM documents)
          |WHERE length(tok) >= 6
          |GROUP BY 1 ORDER BY n DESC, tok LIMIT 20""".stripMargin)),

    // Correlated scalar subquery through the spark.sql front end (M3): the
    // same ANSI text runs in both engines; Catalyst decorrelates the
    // subquery into a join + aggregate (no per-row re-execution) — check
    // the plan for the rewritten Aggregate⋈Join, not a Subquery node.
    "q38_correlated_subquery" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql(
          """SELECT c_mktsegment, count(*) AS n_above
            |FROM customer_v c
            |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v i
            |                   WHERE i.c_mktsegment = c.c_mktsegment)
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      oracle = Some(
        """SELECT c_mktsegment, count(*) AS n_above
          |FROM customer c
          |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
          |                   WHERE i.c_mktsegment = c.c_mktsegment)
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Range (point-in-interval) join, binned: for each purchase event,
    // count view/click activity of the SAME user in the preceding hour. A
    // naive theta-join is a cross product; binning by hour buckets turns it
    // into an equi-join on (user, bucket) — each activity row lands in its
    // bucket, each purchase probes its two covering buckets — with the
    // exact range predicate as a residual filter. Work scales with
    // rows-per-bucket, not corpus².
    "q39_range_join" -> QueryDef(
      fn = { (s, dir) =>
        val hourUs = 3600L * 1000000L
        val ev = t(s, dir, "events")
          .select(col("user_id").as("k"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("t"))
        val activity = ev.filter(col("event_type").isin("view", "click"))
          .select(col("k"), col("t").as("t_act"))
          .withColumn("bucket", expr(s"t_act div $hourUs"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("k"), col("event_id"), col("t").as("t_p"))
          .withColumn("bucket", explode(array_distinct(
            expr(s"array(t_p div $hourUs, (t_p - $hourUs) div $hourUs)"))))
        purchases.join(activity, Seq("k", "bucket"))
          .filter(col("t_act") >= col("t_p") - lit(hourUs) && col("t_act") < col("t_p"))
          .groupBy(col("event_id")).agg(count(lit(1)).as("n_prior"))
          .orderBy("event_id")
      },
      oracle = Some(
        """SELECT p.event_id, count(*) AS n_prior
          |FROM events p JOIN events a
          |  ON a.user_id = p.user_id
          | AND a.event_type IN ('view', 'click')
          | AND epoch_us(a.ts) >= epoch_us(p.ts) - 3600000000
          | AND epoch_us(a.ts) <  epoch_us(p.ts)
          |WHERE p.event_type = 'purchase'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // RANGE-framed sliding window (value-based frame, not row-based): each
    // event sees the count of same-type events in the PRECEDING 10 minutes
    // of event time; rolled up to the per-type peak ("max 10-min burst").
    // The frame bound is in exact integer microseconds on both engines.
    "q41_range_frame" -> QueryDef(
      fn = { (s, dir) =>
        val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
          .rangeBetween(-600L * 1000000L, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"))
          .withColumn("burst", count(lit(1)).over(w))
          .groupBy(col("event_type"))
          .agg(max(col("burst")).as("peak_10min"), count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      oracle = Some(
        """SELECT event_type, max(burst) AS peak_10min, count(*) AS n
          |FROM (
          |  SELECT event_type,
          |    count(*) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
          |      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS burst
          |  FROM events)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Argmin/argmax + boolean aggregate family: max_by/min_by (which row
    // holds the extreme) and bool_or-style predicates — single partial+final
    // aggregate pass, no window needed for "row of the max".
    "q44_argmax" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
              .as("top_order"),
            min_by(col("o_orderkey"), struct(col("o_totalprice"), -col("o_orderkey")))
              .as("cheapest_order"),
            max(col("o_totalprice")).as("top_price"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"))
          .orderBy("o_orderpriority")
      },
      oracle = Some(
        // DuckDB's arg_max can't take a composite ordering value; the
        // window-rank formulation expresses the identical tie-broken pick
        // (Spark struct comparison ≡ lexicographic ORDER BY)
        """WITH ranked AS (
          |  SELECT o_orderpriority, o_orderkey, o_totalprice, o_orderstatus,
          |    row_number() OVER (PARTITION BY o_orderpriority
          |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
          |    row_number() OVER (PARTITION BY o_orderpriority
          |      ORDER BY o_totalprice ASC, o_orderkey DESC) AS rmin
          |  FROM orders)
          |SELECT o_orderpriority,
          |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_order,
          |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS cheapest_order,
          |  max(o_totalprice) AS top_price,
          |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled
          |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin)),

    // UNPIVOT (melt): wide → long normalization, the inverse of q36 —
    // narrow transformation (n columns → n rows inside the task, no
    // shuffle until the downstream aggregate).
    "q43_unpivot" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            dsum(col("l_quantity")).as("qty"),
            dsum(col("l_extendedprice")).as("price"),
            dsum(col("l_discount")).as("disc"))
          .unpivot(
            ids = Array(col("l_returnflag")),
            values = Array(col("qty"), col("price"), col("disc")),
            variableColumnName = "measure",
            valueColumnName = "v")
          .orderBy("l_returnflag", "measure")
      },
      oracle = Some(
        s"""SELECT l_returnflag, measure, v FROM (
           |  SELECT l_returnflag,
           |    ${sqlSum("l_quantity")} AS qty,
           |    ${sqlSum("l_extendedprice")} AS price,
           |    ${sqlSum("l_discount")} AS disc
           |  FROM lineitem GROUP BY 1)
           |UNPIVOT (v FOR measure IN (qty, price, disc))
           |ORDER BY l_returnflag, measure""".stripMargin)),

    // JSON functions: schema-on-read over the semi-structured props column
    // via from_json (codegen'd Jackson parse, SURVEY.md §2b array/map/json
    // row) — the structured counterpart of q10's regex extraction.
    "q42_json_extract" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "events")
          .withColumn("j", from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType)))))
          .groupBy(col("event_type"))
          .agg(
            count(col("j.k")).as("n_parsed"),
            davg(col("j.k")).as("avg_k"),
            min(col("j.k")).as("min_k"),
            max(col("j.k")).as("max_k"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""SELECT event_type, count(k) AS n_parsed,
           |  ${sqlAvg("k")} AS avg_k, min(k) AS min_k, max(k) AS max_k
           |FROM (SELECT event_type,
           |        CAST(json_extract(props, '$$.k') AS BIGINT) AS k
           |      FROM events)
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sketch-based distinct counting — THE 100 TB cardinality path: HLL++
    // partial sketches merge map-side, so the shuffle carries one sketch per
    // partition instead of the distinct-key stream (contrast q27, whose
    // exact counts shuffle every distinct key). The sketch estimate itself
    // is engine-specific, so the query emits only deterministic columns:
    // the exact count plus `within_bound` = (|approx−exact|/exact ≤ 3·rsd).
    // Spark's HLL++ is deterministic for a fixed input, so the boolean is
    // stable; the DuckDB oracle emits exact distinct + literal TRUE, and the
    // hash matches iff the sketch is in bound — an oracle-checkable accuracy
    // contract rather than an uncheckable estimate.
    "q32_approx_distinct" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("nd_exact"),
            approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("nd_approx"))
          .select(
            col("l_returnflag"), col("nd_exact"),
            (abs(col("nd_approx") - col("nd_exact")).cast("double") / col("nd_exact")
              <= lit(3 * 0.02)).as("within_bound"))
          .orderBy("l_returnflag")
      },
      oracle = Some(
        """SELECT l_returnflag, count(DISTINCT l_orderkey) AS nd_exact,
          |  TRUE AS within_bound
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Approximate quantiles with an oracle-checked ACCURACY CONTRACT (the
    // q32 pattern applied to percentile sketches): the GK sketch value
    // itself is engine-specific, but its rank-error guarantee is not.
    // With accuracy=10000 the rank error is ≤ n/10000; the query emits the
    // deterministic witness `count(x ≤ approx)/n ∈ [0.499, 0.501]` — true
    // whenever the sketch honors its bound for the 0.5 quantile — plus the
    // exact group sizes. Sketches merge map-side (two-phase aggregate):
    // the 100 TB path exact `percentile` (q30) cannot take.
    "q58_approx_quantile" -> QueryDef(
      fn = { (s, dir) =>
        val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice"))
        val ap = li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap"))
        // The returned value's rank is any r in (count(x < ap), count(x ≤ ap)]
        // — with duplicated values that interval is wide, so the witness
        // checks INTERVAL overlap with [0.499n, 0.501n], not a point:
        // lt/n ≤ 0.501 ∧ le/n ≥ 0.499. Robust to ties; still falsified
        // whenever the sketch's ±1e-4·n rank guarantee is violated.
        li.join(broadcast(ap), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_extendedprice") < col("ap"), 1L).otherwise(0L)).as("lt"),
            sum(when(col("l_extendedprice") <= col("ap"), 1L).otherwise(0L)).as("le"))
          .select(col("l_returnflag"), col("n"),
            (col("lt").cast("double") / col("n") <= 0.501 &&
              col("le").cast("double") / col("n") >= 0.499).as("within_bound"))
          .orderBy("l_returnflag")
      },
      oracle = Some(
        """SELECT l_returnflag, count(*) AS n, TRUE AS within_bound
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Fixed-width histogram (width_bucket analytics): value binned at
    // width 50, counts + bounds per (event_type, bin). One two-phase
    // aggregate over a single scan — bin assignment is per-row IEEE
    // division, identical in both engines.
    "q60_histogram" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "events")
          .withColumn("bin", floor(col("value") / 50.0).cast("long"))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("lo"), max(col("value")).as("hi"))
          .orderBy("event_type", "bin")
      },
      oracle = Some(
        """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
          |  count(*) AS n, min(value) AS lo, max(value) AS hi
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Funnel analysis: strictly-ordered view → click → purchase per user.
    // Stage k's entry time is the user's earliest qualifying event AFTER
    // stage k-1 — computed as a chain of filtered min-aggregates joined on
    // user_id (each stage: one shuffle on the user key; the per-user state
    // is one timestamp, never an event list). All time math in exact
    // integer microseconds (unix_micros ≡ epoch_us).
    "q61_funnel" -> QueryDef(
      fn = { (s, dir) =>
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("t1"))
        val c = e.filter(col("event_type") === "click")
          .join(v, Seq("user_id")).filter(col("us") > col("t1"))
          .groupBy("user_id").agg(min(col("us")).as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("us") > col("t2"))
          .groupBy("user_id").agg(min(col("us")).as("t3"))
        v.agg(count(lit(1)).as("users")).select(lit("stage1_view").as("stage"), col("users"))
          .unionByName(c.agg(count(lit(1)).as("users"))
            .select(lit("stage2_click").as("stage"), col("users")))
          .unionByName(p.agg(count(lit(1)).as("users"))
            .select(lit("stage3_purchase").as("stage"), col("users")))
          .orderBy("stage")
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
          |v AS (SELECT user_id, min(us) AS t1 FROM e
          |      WHERE event_type = 'view' GROUP BY 1),
          |c AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN v USING (user_id)
          |      WHERE event_type = 'click' AND us > t1 GROUP BY 1),
          |p AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN c USING (user_id)
          |      WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
          |SELECT 'stage1_view' AS stage, count(*) AS users FROM v
          |UNION ALL SELECT 'stage2_click', count(*) FROM c
          |UNION ALL SELECT 'stage3_purchase', count(*) FROM p
          |ORDER BY stage""".stripMargin)),

    // Cohort retention: users grouped by the ISO week of their first event
    // (cohort), counted in every week they were active. Shape: one
    // min-aggregate for cohorts + one distinct for activity + one join on
    // the user key — each a single shuffle; the output is bounded by
    // weeks², not users. DATE output dodges ns-vs-us dtype skew.
    "q63_cohort_retention" -> QueryDef(
      fn = { (s, dir) =>
        val e = t(s, dir, "events")
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
        val cohorts = e.groupBy("user_id").agg(min(col("wk")).as("cohort"))
        val active = e.distinct()
        active.join(cohorts, Seq("user_id"))
          .groupBy(col("cohort"), col("wk").as("active_week"))
          .agg(count(lit(1)).as("users"))
          .orderBy("cohort", "active_week")
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
          |  FROM events),
          |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
          |a AS (SELECT DISTINCT user_id, wk FROM e)
          |SELECT cohort, wk AS active_week, count(*) AS users
          |FROM a JOIN f USING (user_id)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Classical seasonal decomposition (the moving-average method, e.g.
    // Hyndman & Athanasopoulos FPP §6.3 "classical decomposition") of the
    // hourly event series: y(h) − trend (centered 24-hour moving sum) −
    // seasonal (per hour-of-day mean of the detrended series) = residual;
    // the 20 largest |residual| points are the seasonality-aware anomaly
    // batch — what the plain z-score screen (q73) flags as outliers
    // includes every rush hour; THIS flags departures from the expected
    // daily shape. Exactness: values quantize to the 1e6 BIGINT grid
    // before summation; the trend is kept as the 24-bucket SUM (detrended
    // d = 24·y − sum24, exact — no division rounding); the seasonal mean
    // divides with Spark `div` ≡ DuckDB `//` (BOTH truncate toward zero —
    // verified, so the idiom is safe even though d goes negative).
    // Plan at 100 TB: the series collapses to (event_type, hour)
    // buckets FIRST (map-side combined; buckets ≪ events), so the window
    // and seasonal passes run on bucket-sized data; final top-20 is a
    // TakeOrderedAndProject.
    "q162_seasonal_decompose" -> QueryDef(
      fn = { (s, dir) =>
        val hourly = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("h"),
            floor(col("value").cast("double") * 1000000.0).cast("long").as("vq"))
          .groupBy(col("event_type"), col("h"))
          .agg(sum(col("vq")).as("y"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(-12, 11)
        val trended = hourly
          .withColumn("sum24", sum(col("y")).over(w))
          .withColumn("cnt24", count(lit(1)).over(w))
          .filter(col("cnt24") === 24)
          .withColumn("d", lit(24) * col("y") - col("sum24"))
        val seasonal = trended
          .withColumn("phase", pmod(col("h"), lit(24)))
          .withColumn("sd", expr(
            "sum(d) OVER (PARTITION BY event_type, phase)" +
              " div count(1) OVER (PARTITION BY event_type, phase)"))
          .withColumn("resid", col("d") - col("sd"))
        seasonal
          .select(col("event_type"), col("h"), col("y"),
            col("sum24"), col("sd").as("seasonal_q"), col("resid"))
          .orderBy(abs(col("resid")).desc, col("event_type"), col("h"))
          .limit(20)
      },
      oracle = Some(
        """WITH hourly AS (
          |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
          |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT))
          |      AS BIGINT) AS y
          |  FROM events GROUP BY 1, 2),
          |trended AS (
          |  SELECT event_type, h, y,
          |    CAST(sum(y) OVER wf AS BIGINT) AS sum24,
          |    CAST(count(*) OVER wf AS BIGINT) AS cnt24
          |  FROM hourly
          |  WINDOW wf AS (PARTITION BY event_type ORDER BY h
          |    ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
          |detr AS (
          |  SELECT event_type, h, y, sum24, 24 * y - sum24 AS d,
          |    h % 24 AS phase
          |  FROM trended WHERE cnt24 = 24),
          |seas AS (
          |  SELECT event_type, h, y, sum24, d,
          |    CAST(sum(d) OVER pf AS BIGINT)
          |      // CAST(count(*) OVER pf AS BIGINT) AS sd
          |  FROM detr
          |  WINDOW pf AS (PARTITION BY event_type, phase))
          |SELECT event_type, h, y, sum24, sd AS seasonal_q, d - sd AS resid
          |FROM seas
          |ORDER BY abs(d - sd) DESC, event_type, h LIMIT 20""".stripMargin)),
  )
}
