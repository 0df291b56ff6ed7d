package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** The Trino/Postgres-delegated relational surface (SURVEY.md §2b): joins
  * (composite-key left outer, star broadcast, semi/anti), window functions,
  * set operations, ROLLUP, sort/limit, and regex/date scalar functions —
  * each as an oracle-verified query over the synthetic corpus.
  *
  * Scale notes (100 TB design):
  *  - dimension sides of star joins are `broadcast()`-hinted — no shuffle of
  *    the fact table for the join itself;
  *  - every aggregate is partial+final (map-side combine) by construction;
  *  - windows partition by bounded keys (brand, user) so no single-partition
  *    global sort appears anywhere except the explicit top-k, which Spark
  *    executes as TakeOrderedAndProject (per-partition heap + driver merge),
  *    not a full sort.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  val queries: Map[String, QueryDef] = Map(

    // Composite-key LEFT OUTER join ≡ the StockMarketsPrediction cube join
    // (conf/cube/schema/StockMarketsPrediction.js:10-11: ON p.dt = m.dt AND
    // p.symbol = m.symbol) with its avg(price_predicted) measure: the
    // "prediction" side is a first-half-of-month estimate, left-joined onto
    // the full monthly rollup.
    "q03_prediction_join" -> QueryDef(
      fn = { (s, dir) =>
        val ev = t(s, dir, "events")
        val monthly = ev
          .groupBy(col("event_type"), to_date(date_trunc("month", col("ts"))).as("month"))
          .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
        val firstHalf = ev
          .filter(dayofmonth(col("ts")) <= 15)
          .groupBy(col("event_type"), to_date(date_trunc("month", col("ts"))).as("month"))
          .agg(davg(col("value")).as("avg_predicted"))
        monthly.join(firstHalf, Seq("event_type", "month"), "left")
          .select("event_type", "month", "n", "avg_value", "avg_predicted")
          .orderBy("event_type", "month")
      },
      oracle = Some(
        s"""WITH monthly AS (
           |  SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
           |         count(*) AS n, ${sqlAvg("value")} AS avg_value
           |  FROM events GROUP BY 1, 2),
           |first_half AS (
           |  SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
           |         ${sqlAvg("value")} AS avg_predicted
           |  FROM events WHERE EXTRACT(day FROM ts) <= 15 GROUP BY 1, 2)
           |SELECT m.event_type, m.month, m.n, m.avg_value, f.avg_predicted
           |FROM monthly m LEFT JOIN first_half f
           |  ON f.event_type = m.event_type AND f.month = m.month
           |ORDER BY 1, 2""".stripMargin)),

    // Star join with broadcast dimensions (TPC-H Q5 shape): revenue per
    // nation for one region and a date window. customer/nation/region are
    // broadcast — the lineitem⋈orders core is the only shuffled join.
    "q04_star_join" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders")
              .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                      col("o_orderdate") <  lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy(col("n_name"))
      },
      oracle = Some(
        s"""SELECT n_name,
           |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
           |  count(DISTINCT o_orderkey) AS n_orders
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Window function: per-brand top-3 parts by revenue. rank() over a
    // deterministic (revenue DESC, p_partkey) order; the part dimension is
    // broadcast so the only shuffle is the groupBy and the window's
    // partition-by-brand exchange (bounded cardinality — no skew).
    "q05_top_parts_window" -> QueryDef(
      fn = { (s, dir) =>
        val rev = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_partkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("revenue").desc, col("p_partkey"))
        rev.withColumn("rnk", rank().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("p_brand", "p_partkey", "revenue", "rnk")
          .orderBy("p_brand", "rnk", "p_partkey")
      },
      oracle = Some(
        s"""WITH rev AS (
           |  SELECT p_brand, p_partkey,
           |    ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  GROUP BY 1, 2)
           |SELECT p_brand, p_partkey, revenue, rnk FROM (
           |  SELECT *, CAST(rank() OVER (PARTITION BY p_brand
           |           ORDER BY revenue DESC, p_partkey) AS BIGINT) AS rnk
           |  FROM rev) WHERE rnk <= 3
           |ORDER BY p_brand, rnk, p_partkey""".stripMargin)),

    // Sessionization via lag + running sum: a new session starts after a
    // >30-minute gap per user. All time math in integer MICROSECONDS
    // (unix_micros ≡ DuckDB epoch_us) — exact in both engines; second-level
    // epoch() would round vs floor differently across engines.
    "q06_sessionize" -> QueryDef(
      fn = { (s, dir) =>
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = t(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("us"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_idx", sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ev.groupBy(col("user_id"), col("session_idx"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("us")).as("start_us"),
            max(col("us")).as("end_us"))
          .orderBy("user_id", "session_idx")
      },
      oracle = Some(
        """WITH flagged AS (
          |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
          |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
          |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
          |         THEN 1 ELSE 0 END AS new_session
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sessions AS (
          |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
          |  FROM flagged)
          |SELECT user_id, session_idx, count(*) AS n_events,
          |  min(us) AS start_us, max(us) AS end_us
          |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Set operations: INTERSECT / EXCEPT / UNION over customer-key sets.
    "q07_setops" -> QueryDef(
      fn = { (s, dir) =>
        val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k"))
        val active = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
        val mk = (tag: String, df: DataFrame) =>
          df.agg(count(lit(1)).as("n")).select(lit(tag).as("tag"), col("n"))
        mk("both", rich.intersect(active))
          .unionAll(mk("only_rich", rich.except(active)))
          .unionAll(mk("either", rich.union(active).distinct()))
          .orderBy("tag")
      },
      oracle = Some(
        """WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
          |active AS (SELECT DISTINCT o_custkey AS k FROM orders)
          |SELECT 'both' AS tag, count(*) AS n FROM (SELECT * FROM rich INTERSECT SELECT * FROM active)
          |UNION ALL
          |SELECT 'only_rich', count(*) FROM (SELECT * FROM rich EXCEPT SELECT * FROM active)
          |UNION ALL
          |SELECT 'either', count(*) FROM (SELECT * FROM rich UNION SELECT * FROM active)
          |ORDER BY tag""".stripMargin)),

    // ROLLUP with grouping indicators (cube/grouping-sets family).
    "q08_rollup" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some(
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
           |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
           |  ${sqlSum("l_quantity")} AS sum_qty, count(*) AS n
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)),

    // Global top-k: Spark plans this as TakeOrderedAndProject (per-partition
    // heaps merged on the driver), not a full global sort — the right plan at
    // any scale. Total order via (o_totalprice DESC, o_orderkey).
    "q09_top_orders" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "o_custkey", "o_totalprice")
      },
      oracle = Some(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Regex scalar functions over semi-structured props (≡ the reference's
    // regex extraction surface, assets.py:175-205, applied to a JSON-ish
    // column): regexp_extract group capture + cast + aggregation.
    "q10_regex_extract" -> QueryDef(
      fn = { (s, dir) =>
        t(s, dir, "events")
          .withColumn("k", regexp_extract(col("props"), """"k": *([0-9]+)""", 1).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), davg(col("k")).as("avg_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""SELECT event_type, count(*) AS n,
           |  ${sqlAvg("k")} AS avg_k, min(k) AS min_k, max(k) AS max_k
           |FROM (SELECT event_type,
           |        CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) AS k
           |      FROM events)
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Semi + anti joins: customers with vs without orders, counted per
    // market segment. Spark left_semi/left_anti ≡ EXISTS / NOT EXISTS.
    "q11_semi_anti" -> QueryDef(
      fn = { (s, dir) =>
        val cust = t(s, dir, "customer")
        val okeys = t(s, dir, "orders").select(col("o_custkey"))
        val semi = cust.join(okeys, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("with_orders"))
        val anti = cust.join(okeys, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("no_orders"))
        semi.unionAll(anti).select("tag", "c_mktsegment", "n").orderBy("tag", "c_mktsegment")
      },
      oracle = Some(
        """SELECT 'with_orders' AS tag, c_mktsegment, count(*) AS n FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          |GROUP BY 2
          |UNION ALL
          |SELECT 'no_orders', c_mktsegment, count(*) FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          |GROUP BY 2
          |ORDER BY tag, c_mktsegment""".stripMargin)),

    // Salted join — the manual skew-mitigation pattern (for when AQE's
    // runtime skew split can't apply, e.g. aggregations after the join):
    // the probe side salts its key into SALT buckets, the build side
    // replicates each row SALT× via an in-row explode, and the equi-join
    // runs on (key, salt) — a hot key's rows now spread over SALT tasks.
    // The oracle proves the decomposition is exactly the plain join.
    "q33_salted_join" -> QueryDef(
      fn = { (s, dir) =>
        val SALT = 8
        val fact = t(s, dir, "lineitem")
          .withColumn("salt", pmod(hash(col("l_linenumber"), col("l_partkey")), lit(SALT)))
        val dim = t(s, dir, "orders")
          .withColumn("salt", explode(lit((0 until SALT).toArray)))
        fact.join(dim,
            fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("o_orderpriority")
      },
      oracle = Some(
        s"""SELECT o_orderpriority, count(*) AS n,
           |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Distribution window functions — ntile/percent_rank/cume_dist (the
    // rank/lag/frame families are covered by q05/q06/q26/q41). The window
    // order carries a unique (orderkey, linenumber) tie-break so quartile
    // boundaries are engine-independent; partitioned by bounded-cardinality
    // l_returnflag — same scale shape as q05.
    "q56_distribution_windows" -> QueryDef(
      fn = { (s, dir) =>
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        t(s, dir, "lineitem")
          .filter(col("l_partkey") < 30)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      },
      oracle = Some(
        """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
          |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          |  percent_rank() OVER w AS pr,
          |  cume_dist() OVER w AS cd
          |FROM lineitem WHERE l_partkey < 30
          |WINDOW w AS (PARTITION BY l_returnflag
          |             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
          |ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber""".stripMargin)),

    // Join-key skew diagnosis — the operational report that DECIDES
    // between q33's salting, a broadcast, and a plain shuffle join before
    // any cluster time is spent: bucket the candidate key, report key
    // cardinality, the worst/p99 bucket, the top-10 keys' mass share, and
    // a machine-readable verdict (max bucket > 10× the fair share).
    // Every number is an exact integer (shares ×1e6 with BIGINT div,
    // p99 by ordered rank); plan shape: ONE map-side-combined groupBy on
    // the key, then all statistics run over the BUCKET table (|keys| ≪
    // |rows|) — the diagnosis of a 100 TB join costs one aggregate of
    // the probe side, and the verdict threshold is exactly the skew
    // criterion AQE's runtime skew-join uses (a partition far above the
    // median), evaluated before the job instead of during it.
    "q167_skew_report" -> QueryDef(
      fn = { (s, dir) =>
        val buckets = t(s, dir, "events")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("n").desc, col("user_id"))
        val ranked = buckets.withColumn("r", row_number().over(w))
        val stats = ranked.agg(
          sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("n")).as("max_bucket"),
          sum(when(col("r") <= 10, col("n")).otherwise(lit(0L)))
            .as("top10_rows"))
        val p99 = ranked
          .withColumn("asc_r", row_number().over(
            Window.orderBy(col("n"), col("user_id"))))
          .crossJoin(broadcast(stats.select(col("n_keys").as("nk"))))
          .filter(col("asc_r") === expr("CAST(ceil(0.99 * nk) AS BIGINT)"))
          .select(col("n").as("p99_bucket"))
        stats.crossJoin(broadcast(p99))
          .select(col("n_rows"), col("n_keys"), col("max_bucket"),
            col("p99_bucket"),
            expr("(top10_rows * 1000000) div n_rows").as("top10_share_micro"),
            expr("CASE WHEN max_bucket * n_keys > 10 * n_rows" +
              " THEN 'salt_or_broadcast' ELSE 'plain_shuffle' END")
              .as("verdict"))
      },
      oracle = Some(
        """WITH b AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1),
          |r AS (SELECT user_id, n,
          |    row_number() OVER (ORDER BY n DESC, user_id) AS r,
          |    row_number() OVER (ORDER BY n, user_id) AS asc_r
          |  FROM b),
          |st AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
          |    CAST(count(*) AS BIGINT) AS n_keys,
          |    max(n) AS max_bucket,
          |    CAST(sum(CASE WHEN r <= 10 THEN n ELSE 0 END) AS BIGINT)
          |      AS top10_rows
          |  FROM r),
          |p AS (SELECT n AS p99_bucket FROM r, st
          |  WHERE asc_r = CAST(ceil(0.99 * n_keys) AS BIGINT))
          |SELECT n_rows, n_keys, max_bucket, p99_bucket,
          |  (top10_rows * 1000000) // n_rows AS top10_share_micro,
          |  CASE WHEN max_bucket * n_keys > 10 * n_rows
          |    THEN 'salt_or_broadcast' ELSE 'plain_shuffle' END AS verdict
          |FROM st, p""".stripMargin)),

    // Data-quality expectations report — the validation step a pipeline
    // runs before publishing a dataset (the batch-report complement of
    // CommitLog's write-time CHECK constraints): one row per rule with
    // checked/violation counts. Rules cover the four standard families —
    // range (qty within declared bounds), business rule (qty ≤ 45 — fires
    // on this corpus, proving detection), null check, key uniqueness
    // (violations = rows minus distinct (orderkey, linenumber) — fires),
    // and referential integrity (orders → customer — clean).
    //
    // 100 TB shape: all lineitem rules ride ONE map-side-combined scan
    // (the distinct-key count shares the pass via Spark's expand);
    // referential is one equi-join on the key, counted map-side. No rule
    // materializes violating rows — counts only; a drill-down query
    // filters for one rule on demand.
    "q101_quality_report" -> QueryDef(
      fn = { (s, dir) =>
        val li = t(s, dir, "lineitem").agg(
          count(lit(1)).as("n"),
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)).as("v_range"),
          sum(when(col("l_quantity") > 45, 1L).otherwise(0L)).as("v_tight"),
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_null"),
          countDistinct(struct(col("l_orderkey"), col("l_linenumber")))
            .as("n_keys"))
        val liRules = li.select(expr(
          """stack(4,
            |  'lineitem_pk_unique', n, n - n_keys,
            |  'lineitem_qty_le_45', n, v_tight,
            |  'lineitem_qty_range', n, v_range,
            |  'lineitem_shipdate_notnull', n, v_null)
            |AS (rule, n_checked, n_violations)""".stripMargin))
        val oRules = t(s, dir, "orders")
          .join(t(s, dir, "customer")
            .select(col("c_custkey").as("o_custkey"), lit(1).as("ok")),
            Seq("o_custkey"), "left")
          .agg(count(lit(1)).as("n"),
            sum(when(col("ok").isNull, 1L).otherwise(0L)).as("v_ref"))
          .select(lit("orders_custkey_ref").as("rule"),
            col("n").as("n_checked"), col("v_ref").as("n_violations"))
        liRules.unionByName(oRules).orderBy("rule")
      },
      oracle = Some(
        """WITH li AS (
          |  SELECT count(*) AS n,
          |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_range,
          |    sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS v_tight,
          |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_null,
          |    count(DISTINCT (l_orderkey, l_linenumber)) AS n_keys
          |  FROM lineitem),
          |o AS (
          |  SELECT count(*) AS n,
          |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS v_ref
          |  FROM orders LEFT JOIN customer c ON c.c_custkey = o_custkey)
          |SELECT * FROM (
          |  SELECT 'lineitem_pk_unique' AS rule, n AS n_checked,
          |    CAST(n - n_keys AS BIGINT) AS n_violations FROM li
          |  UNION ALL SELECT 'lineitem_qty_le_45', n, CAST(v_tight AS BIGINT) FROM li
          |  UNION ALL SELECT 'lineitem_qty_range', n, CAST(v_range AS BIGINT) FROM li
          |  UNION ALL SELECT 'lineitem_shipdate_notnull', n, CAST(v_null AS BIGINT) FROM li
          |  UNION ALL SELECT 'orders_custkey_ref', n, CAST(v_ref AS BIGINT) FROM o)
          |ORDER BY rule""".stripMargin)),
  )
}
