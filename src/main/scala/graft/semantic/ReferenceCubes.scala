package graft.semantic

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.QueryDef

/** The three cube schemas the reference ships, re-expressed over the
  * synthetic corpus (events ≙ gold.stock_markets with event_type ≙ symbol,
  * ts ≙ dt, value ≙ volume):
  *
  *  - `events_cube` ≡ StockMarkets.js:2-129 — count + sum/avg/min/max
  *    measures over string (symbol) and time (dt) dimensions;
  *  - `events_monthly` ≡ StockMarketsMonthly.js:2-133 — the same measure
  *    set over the materialized monthly rollup table (RollupJob);
  *  - `events_prediction` ≡ StockMarketsPrediction.js:2-76 — a composite-key
  *    LEFT JOIN (dt, symbol) onto a prediction table with an avg measure.
  */
object ReferenceCubes {

  val eventsCube: CubeDef = CubeDef(
    name = "events_cube",
    table = "events",
    measures = Seq(
      Measure("n", "count"),
      Measure("sum_value", "sum", "value"),
      Measure("avg_value", "avg", "value"),
      Measure("min_value", "min", "value"),
      Measure("max_value", "max", "value")),
    dimensions = Seq(
      Dimension("event_type", "event_type", "string"),
      Dimension("ts", "ts", "time")))

  val eventsMonthly: CubeDef = eventsCube.copy(
    name = "events_monthly",
    table = "events_monthly")

  val eventsPrediction: CubeDef = CubeDef(
    name = "events_prediction",
    table = "events_actual",
    measures = Seq(
      Measure("n", "count"),
      Measure("avg_actual", "avg", "avg_value"),
      Measure("avg_predicted", "avg", "avg_predicted")),
    dimensions = Seq(
      Dimension("event_type", "event_type", "string"),
      Dimension("month", "month", "string")),
    joins = Seq(CubeJoin("events_prediction_tbl", Seq("event_type", "month"), "left")))

  /** Oracle-verified exposure of the semantic layer: rendering
    * [all 5 measures] × [event_type, month(ts)] through `eventsCube` must
    * equal the hand-written monthly-rollup SQL — proves the layer generates
    * the correct aggregation, not just a plausible one.
    */
  val queries: Map[String, QueryDef] = Map(
    "q23_cube_render" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        val resolve: String => DataFrame = name => Tables.load(s, dir, name)
        eventsCube.query(resolve,
          Seq("n", "sum_value", "avg_value", "min_value", "max_value"),
          Seq("event_type" -> None, "ts" -> Some("month")))
      },
      oracle = Some {
        import graft.operators.Exact._
        s"""SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS ts_month,
           |  count(*) AS n,
           |  ${sqlSum("value")} AS sum_value,
           |  ${sqlAvg("value")} AS avg_value,
           |  min(value) AS min_value,
           |  max(value) AS max_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // The cube through its SQL-SURFACE persona: CubeViews registers the
    // cube as a global_temp view (what a thrift/JDBC client sees —
    // cube.dev's SQL port, conf/cube/.env:9-11) and the query is PLAIN SQL
    // against that view. Same oracle as q23 — proving the view rendering
    // is the Scala rendering, with the view machinery (global-temp
    // registration, cross-session resolution, column order) on the
    // oracle-checked path, not just spec-checked.
    "q102_cube_view_sql" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        val resolve: String => DataFrame = name => Tables.load(s, dir, name)
        CubeViews.register(s, Seq(eventsCube), Some(resolve), grain = "month")
        s.sql("""SELECT event_type, ts_month, n, sum_value, avg_value,
                |  min_value, max_value
                |FROM global_temp.events_cube
                |ORDER BY event_type, ts_month""".stripMargin)
      },
      oracle = Some {
        import graft.operators.Exact._
        s"""SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS ts_month,
           |  count(*) AS n,
           |  ${sqlSum("value")} AS sum_value,
           |  ${sqlAvg("value")} AS avg_value,
           |  min(value) AS min_value,
           |  max(value) AS max_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // CDC-driven rollup maintenance end to end, oracle-proven: the fact
    // table is a CommitLog table loaded with ~2/3 of events; the monthly
    // rollup materializes; the remaining third APPENDS as a new commit;
    // refreshFromChanges derives the touched months from COMMIT METADATA
    // (file min/max stats — zero data opens) and swaps exactly those
    // rollup partitions. The served rollup must equal the hand-written
    // GROUP BY over the FULL events table — any under-refresh (missed
    // month) or stale partition hash-mismatches. The nightly-maintenance
    // loop of the semantic layer at 100 TB: watermark → metadata diff →
    // partition-pruned recompute of only what moved.
    "q103_cdc_rollup" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import graft.sources.CommitLog
        import org.apache.spark.sql.functions.col
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("ts"), col("value"))
        val fact = java.nio.file.Files
          .createTempDirectory("graft-q103-fact").toString
        CommitLog.append(ev.filter(col("event_id") % 3 =!= 0), fact)
        val resolve: String => DataFrame = {
          case "events" => CommitLog.read(s, fact)
            .select(col("event_type"), col("ts"), col("value"))
          case other => Tables.load(s, dir, other)
        }
        RollupJob.materializeMonthlyPartitioned(s, eventsCube, resolve,
          timeDim = "ts", targetTable = "q103_rollup_cdc")
        val watermark = CommitLog.currentVersion(fact).get
        CommitLog.append(ev.filter(col("event_id") % 3 === 0), fact)
        RollupJob.refreshFromChanges(s, eventsCube, resolve, fact,
          timeDim = "ts", targetTable = "q103_rollup_cdc",
          fromVersion = watermark)
        s.table("q103_rollup_cdc")
          .select(col("event_type"), col("ts_month"), col("n"),
            col("sum_value"), col("avg_value"), col("min_value"),
            col("max_value"))
          .orderBy("event_type", "ts_month")
      },
      oracle = Some {
        import graft.operators.Exact._
        s"""SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS ts_month,
           |  count(*) AS n,
           |  ${sqlSum("value")} AS sum_value,
           |  ${sqlAvg("value")} AS avg_value,
           |  min(value) AS min_value,
           |  max(value) AS max_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // The cube through the POSTGRES WIRE persona (r10): the reference
    // exposes pg-wire twice — direct Postgres JDBC (README.md:74-76) and
    // cube.dev's SQL port (conf/cube/.env:9-11, CUBEJS_PG_SQL_PORT +
    // CUBEJS_SQL_USER/PASSWORD) — and this entry drives the full q23/q102
    // selection through a REAL pg-wire socket: server renders to protocol
    // text, the one-shot client parses the frames back, and the rows are
    // re-typed for the oracle hash. Double/long/date survive the
    // text round trip bit-exactly (Java's shortest-repr Double.toString ↔
    // parse), so a green hash here means the protocol carried every value
    // intact — the persona is on the oracle-checked path, like the
    // global_temp view face (q102) and the REST face (CubeRestSpec).
    // Scale: the wire adds render/parse per emitted row of a BOUNDED
    // selection (event_type × month); execution is the same cube plan.
    "q179_pgwire_cube" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        val resolve: String => DataFrame = name => Tables.load(s, dir, name)
        CubeViews.register(s, Seq(eventsCube), Some(resolve), grain = "month")
        val server = graft.tools.PgWire.start(s,
          user = "cube", password = "wire-check")
        val (_, rows) =
          try graft.tools.PgWire.queryOnce("127.0.0.1", server.port,
            "cube", "wire-check",
            """SELECT event_type, ts_month, n, sum_value, avg_value,
              |  min_value, max_value
              |FROM global_temp.events_cube
              |ORDER BY event_type, ts_month""".stripMargin)
          finally server.stop()
        import s.implicits._
        rows.map(r => (r(0).get, r(1).get, r(2).get, r(3).get, r(4).get,
            r(5).get, r(6).get))
          .toDF("event_type", "ts_month", "n", "sum_value", "avg_value",
            "min_value", "max_value")
          .select(col("event_type"),
            to_date(col("ts_month")).as("ts_month"),
            col("n").cast("long").as("n"),
            col("sum_value").cast("double").as("sum_value"),
            col("avg_value").cast("double").as("avg_value"),
            col("min_value").cast("double").as("min_value"),
            col("max_value").cast("double").as("max_value"))
          .orderBy("event_type", "ts_month")
      },
      oracle = Some {
        import graft.operators.Exact._
        s"""SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS ts_month,
           |  count(*) AS n,
           |  ${sqlSum("value")} AS sum_value,
           |  ${sqlAvg("value")} AS avg_value,
           |  min(value) AS min_value,
           |  max(value) AS max_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // pg-DIALECT SQL through the wire onto the oracle path (r11): the
    // statement a stock pg client would write — double-quoted identifier
    // aliases, `~`/`!~` regex operators, a `::text` cast — crosses the
    // socket, the [[graft.tools.PgCatalog.rewrite]] layer translates it
    // to Spark SQL, and DuckDB recomputes the same semantics natively. A
    // green hash proves the DIALECT translation value-exact, not just
    // parseable — the q179 discipline applied to the client-compat
    // layer. Scale: the rewrite is a driver-side string pass gated to
    // statements containing pg-isms; the query itself is one scan + one
    // map-side-combined aggregate.
    "q182_pgwire_dialect" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "customer")
          .createOrReplaceGlobalTempView("pg_customers")
        val server = graft.tools.PgWire.start(s,
          user = "cube", password = "wire-check")
        val (_, rows) =
          try graft.tools.PgWire.queryOnce("127.0.0.1", server.port,
            "cube", "wire-check",
            """SELECT c.c_mktsegment AS "Segment",
              |  count(*) AS n,
              |  sum(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS cents
              |FROM global_temp.pg_customers c
              |WHERE c.c_mktsegment !~ '^A' AND c.c_name ~ 'Customer'
              |  AND c.c_custkey::pg_catalog.text <> '-1'
              |GROUP BY c.c_mktsegment
              |ORDER BY c.c_mktsegment""".stripMargin)
          finally server.stop()
        import s.implicits._
        rows.map(r => (r(0).get, r(1).get, r(2).get))
          .toDF("Segment", "n", "cents")
          .select(col("Segment"), col("n").cast("long").as("n"),
            col("cents").cast("long").as("cents"))
          .orderBy("Segment")
      },
      oracle = Some(
        """SELECT c_mktsegment AS Segment, count(*) AS n,
          |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM customer
          |WHERE NOT regexp_matches(c_mktsegment, '^A')
          |  AND regexp_matches(c_name, 'Customer')
          |  AND CAST(c_custkey AS VARCHAR) <> '-1'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TRANSACTION BLOCKS through the wire onto the oracle path (r12):
    // the reference's Postgres endpoint gives clients real BEGIN/COMMIT/
    // ROLLBACK (docker-compose.yml:40-57); here a pg script stages two
    // INSERTs into two commitlog catalog tables and COMMITs them as ONE
    // atomic CommitLog.multiAppend cross-table transaction, a second
    // script proves ROLLBACK discards (version counters asserted
    // in-query), and the final join reads the committed state back
    // through the same socket. A green hash proves the transactional
    // write path lands EXACTLY the rows the autocommit path would — and
    // that the rollback left no trace. Scale: staging is
    // wire-interactive-sized by contract (bulk loads take the streaming
    // append paths); the commit point is multiAppend's one KB-scale
    // marker write regardless of table size.
    "q183_pgwire_txn" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        import graft.sources.{CatalogOps, CommitLog}
        val cust = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val root = java.nio.file.Files
          .createTempDirectory("graft-q183-pgtxn").toString
        CommitLog.append(cust.filter(col("c_custkey") % 4 === 0),
          s"$root/cust")
        CommitLog.append(ord.filter(col("o_orderkey") % 8 === 0),
          s"$root/ord")
        val db = "pgtxn_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        CatalogOps.createCommitLogTable(s, db, "cust", s"$root/cust")
        CatalogOps.createCommitLogTable(s, db, "ord", s"$root/ord")
        // global temp views are cross-session — the INSERT sources the
        // connection's isolated session can see
        cust.filter(col("c_custkey") % 4 === 1)
          .createOrReplaceGlobalTempView("pgtxn_src_c")
        ord.filter(col("o_orderkey") % 8 === 1)
          .createOrReplaceGlobalTempView("pgtxn_src_o")
        val server = graft.tools.PgWire.start(s,
          user = "cube", password = "wire-check")
        val rows =
          try {
            graft.tools.PgWire.queryOnce("127.0.0.1", server.port,
              "cube", "wire-check",
              s"""BEGIN;
                 |INSERT INTO $db.cust SELECT * FROM global_temp.pgtxn_src_c;
                 |INSERT INTO $db.ord SELECT * FROM global_temp.pgtxn_src_o;
                 |COMMIT""".stripMargin)
            // atomic: exactly ONE new commit per table (the txn prepare)
            require(CommitLog.currentVersion(s"$root/cust").contains(2L) &&
              CommitLog.currentVersion(s"$root/ord").contains(2L),
              "txn COMMIT must land exactly one commit per table")
            // and ROLLBACK must discard without a trace
            graft.tools.PgWire.queryOnce("127.0.0.1", server.port,
              "cube", "wire-check",
              s"""BEGIN;
                 |INSERT INTO $db.cust SELECT * FROM global_temp.pgtxn_src_c;
                 |ROLLBACK""".stripMargin)
            require(CommitLog.currentVersion(s"$root/cust").contains(2L),
              "ROLLBACK must leave the table untouched")
            graft.tools.PgWire.queryOnce("127.0.0.1", server.port,
              "cube", "wire-check",
              s"""SELECT c.c_mktsegment AS seg, count(*) AS n_ord,
                 |  sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS cents
                 |FROM $db.cust c JOIN $db.ord o ON o.o_custkey = c.c_custkey
                 |GROUP BY c.c_mktsegment
                 |ORDER BY c.c_mktsegment""".stripMargin)._2
          } finally server.stop()
        import s.implicits._
        rows.map(r => (r(0).get, r(1).get, r(2).get))
          .toDF("seg", "n_ord", "cents")
          .select(col("seg"), col("n_ord").cast("long").as("n_ord"),
            col("cents").cast("long").as("cents"))
          .orderBy("seg")
      },
      oracle = Some(
        """SELECT c.c_mktsegment AS seg, count(*) AS n_ord,
          |  CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM (SELECT * FROM customer WHERE c_custkey % 4 <= 1) c
          |JOIN (SELECT * FROM orders WHERE o_orderkey % 8 <= 1) o
          |  ON o.o_custkey = c.c_custkey
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The COPY sub-protocol onto the oracle path (r12): `COPY … TO
    // STDOUT (FORMAT csv)` streams the part table through the socket,
    // the client re-sends the SAME payload as `COPY … FROM STDIN`, which
    // lands as ONE atomic commitlog commit, and the aggregate read back
    // through SQL hashes against DuckDB computing straight off the
    // parquet. A green hash proves the full journey — CSV render, frame
    // chunking, CSV parse, schema-cast, atomic commit — value-exact in
    // both directions (psql `\copy`'s path against the reference's
    // endpoint). Scale: COPY is single-socket by nature; OUT streams via
    // toLocalIterator, IN is one append commit — cluster-width ingest
    // stays the file/streaming surface's job.
    "q184_pgwire_copy" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        import graft.sources.{CatalogOps, CommitLog}
        val part = Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        part.createOrReplaceGlobalTempView("pgcopy_src")
        val root = java.nio.file.Files
          .createTempDirectory("graft-q184-copy").toString
        CommitLog.append(part.limit(0), root) // schema-only seed
        val db = "pgcopy_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        CatalogOps.createCommitLogTable(s, db, "dst", root)
        val server = graft.tools.PgWire.start(s,
          user = "cube", password = "wire-check")
        val rows =
          try {
            val payload = graft.tools.PgWire.copyOnceOut("127.0.0.1",
              server.port, "cube", "wire-check",
              "COPY (SELECT p_partkey, p_name, p_retailprice FROM " +
                "global_temp.pgcopy_src) TO STDOUT WITH (FORMAT csv)")
            val tag = graft.tools.PgWire.copyOnceIn("127.0.0.1",
              server.port, "cube", "wire-check",
              s"COPY $db.dst FROM STDIN WITH (FORMAT csv)",
              payload.mkString("\n") + "\n")
            require(tag == s"COPY ${payload.size}",
              s"COPY IN tag $tag for ${payload.size} rows")
            require(CommitLog.currentVersion(root).contains(2L),
              "COPY FROM must land exactly one commit")
            graft.tools.PgWire.queryOnce("127.0.0.1", server.port,
              "cube", "wire-check",
              s"""SELECT count(*) AS n, sum(p_partkey) AS sum_key,
                 |  sum(CAST(floor(p_retailprice * 100) AS BIGINT)) AS cents,
                 |  min(p_name) AS min_name, max(p_name) AS max_name
                 |FROM $db.dst""".stripMargin)._2
          } finally server.stop()
        import s.implicits._
        rows.map(r => (r(0).get, r(1).get, r(2).get, r(3).get, r(4).get))
          .toDF("n", "sum_key", "cents", "min_name", "max_name")
          .select(col("n").cast("long").as("n"),
            col("sum_key").cast("long").as("sum_key"),
            col("cents").cast("long").as("cents"),
            col("min_name"), col("max_name"))
      },
      oracle = Some(
        """SELECT count(*) AS n, CAST(sum(p_partkey) AS BIGINT) AS sum_key,
          |  CAST(sum(CAST(floor(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS cents,
          |  min(p_name) AS min_name, max(p_name) AS max_name
          |FROM part""".stripMargin)),

    // FEDERATED JDBC READ onto the oracle path (r12): the reference's
    // Trino federates into Postgres through a connector catalog
    // (trino/conf/trino/catalog/my_catalog.properties:1-4); here the
    // engine CONSUMES JDBC the same way — spark.read.jdbc (Hive driver,
    // [[graft.sources.interop.JdbcFederation]]'s hive2 dialect) against
    // the engine's own thrift endpoint as the "foreign database", with
    // the region predicate PUSHED into the remote scan (asserted on the
    // physical plan) and the remote dimension joined against the local
    // supplier parquet. A green hash proves the federated read
    // value-exact end to end. Scale: pushdown ships the filter to the
    // remote side so the wire carries the reduced dimension; the local
    // fact side never leaves the cluster; partitionColumn splits bigger
    // federated scans into parallel range fetches (JdbcFederationSpec).
    "q186_jdbc_federation" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        val url = s"jdbc:hive2://localhost:${federationPort(s)}/default"
        val remote = graft.sources.interop.JdbcFederation
          .readTable(s, url, fedNationTable(s, dir))
          .filter(col("n_regionkey") <= 2)
          .select(col("n_nationkey"), col("n_name"))
        val joined = Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
          .join(remote, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_sup"),
            sum(expr("CAST(floor(s_acctbal * 100) AS BIGINT)")).as("cents"))
          .orderBy("n_name")
        // the federation contract, asserted: the predicate and the
        // projection both reached the REMOTE scan
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.contains("JDBCRelation") &&
          plan.contains("LessThanOrEqual(n_regionkey,2)"),
          s"region predicate not pushed into the remote scan:\n$plan")
        joined
      },
      oracle = Some(
        """SELECT n.n_name, count(*) AS n_sup,
          |  CAST(sum(CAST(floor(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
          |WHERE n.n_regionkey <= 2
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TRANSACTIONAL ROW-LEVEL DML through the wire onto the oracle path
    // (r13, verdict #4): a pg script runs UPDATE + DELETE + INSERT
    // between BEGIN and COMMIT; the block's ordered ops fold over the
    // pinned snapshot's position-tagged rows ([[CommitLog.multiDml]]) —
    // dead positions become deletion vectors, updated images and inserts
    // append — landing as EXACTLY ONE commit under one coordinator
    // marker (version asserted in-query), and a ROLLBACK script with the
    // same verbs leaves no trace (asserted too). DuckDB recomputes the
    // final state from the raw parquet with set algebra. Scale: the DML
    // write cost is O(matched rows) merge-on-read (DV + new images,
    // never a table rewrite), and the commit point stays one KB-scale
    // marker write.
    "q187_pgwire_txn_dml" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        import graft.sources.{CatalogOps, CommitLog}
        // r13 verdict #4: the base table, catalog db, insert-source view
        // and the PgWire server all stage ONCE per (JVM, sf-dir); each
        // measure gets a fresh mutable table via zero-copy SHALLOW CLONE
        // (a KB-scale metadata commit) — the timed body is the txn
        // scripts + read-back, not fixture construction
        val (db, baseRoot, srcView) = pgDmlFixture(s, dir)
        val port = pgDmlPort(s)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q187-clone").toString
        CommitLog.shallowClone(baseRoot, root)
        val tbl = "ord_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        CatalogOps.createCommitLogTable(s, db, tbl, root)
        val rows =
          try {
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""USE $db;
                 |BEGIN;
                 |UPDATE $tbl SET o_totalprice = o_totalprice * 2
                 |  WHERE o_orderkey % 3 = 0;
                 |DELETE FROM $tbl WHERE o_orderkey % 5 = 0;
                 |INSERT INTO $tbl SELECT * FROM global_temp.$srcView;
                 |COMMIT""".stripMargin)
            require(CommitLog.currentVersion(root).contains(2L),
              "the whole DML block must land as exactly ONE commit")
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""USE $db;
                 |BEGIN;
                 |UPDATE $tbl SET o_totalprice = 0 WHERE o_orderkey > 0;
                 |DELETE FROM $tbl WHERE o_custkey % 2 = 0;
                 |ROLLBACK""".stripMargin)
            require(CommitLog.currentVersion(root).contains(2L),
              "ROLLBACK must leave the table untouched")
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""SELECT o_custkey % 10 AS bucket, count(*) AS n,
                 |  sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
                 |FROM $db.$tbl
                 |GROUP BY o_custkey % 10
                 |ORDER BY bucket""".stripMargin)._2
          } finally s.sql(s"DROP TABLE IF EXISTS $db.`$tbl`")
        import s.implicits._
        rows.map(r => (r(0).get, r(1).get, r(2).get))
          .toDF("bucket", "n", "cents")
          .select(col("bucket").cast("long").as("bucket"),
            col("n").cast("long").as("n"),
            col("cents").cast("long").as("cents"))
          .orderBy("bucket")
      },
      oracle = Some(
        """SELECT o_custkey % 10 AS bucket, count(*) AS n,
          |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM (
          |  SELECT o_custkey,
          |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
          |         ELSE o_totalprice END AS o_totalprice
          |  FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 5 <> 0
          |  UNION ALL
          |  SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 1
          |) u
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // FEDERATED JDBC WRITE onto the oracle path (r13, verdict #6): the
    // nation dimension travels TO the remote catalog through
    // [[graft.sources.interop.JdbcFederation.writeTable]] (dialect-typed
    // CREATE TABLE + batched literal INSERTs — the Trino `postgresql`
    // connector's write persona), then comes BACK through the federated
    // read with a predicate pushed into the remote scan, and joins the
    // local customer parquet. A green hash proves the write path is
    // value-exact for strings/ints after a full wire round trip. The
    // write is staged once per (JVM, sf-dir) like every federation
    // fixture; the timed body is the federated scan + join.
    "q188_jdbc_federated_write" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        val url = s"jdbc:hive2://localhost:${federationPort(s)}/default"
        val remote = graft.sources.interop.JdbcFederation
          .readTable(s, url, fedWrittenNation(s, dir))
          .filter(col("n_regionkey") >= 3)
          .select(col("n_nationkey"), col("n_name"))
        val joined = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
          .join(remote, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            sum(expr("CAST(floor(c_acctbal * 100) AS BIGINT)")).as("cents"))
          .orderBy("n_name")
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.contains("JDBCRelation") &&
          plan.contains("GreaterThanOrEqual(n_regionkey,3)"),
          s"region predicate not pushed into the written-table scan:\n$plan")
        joined
      },
      oracle = Some(
        """SELECT n.n_name, count(*) AS n_cust,
          |  CAST(sum(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          |WHERE n.n_regionkey >= 3
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // AGGREGATE PUSHDOWN over federation via the DataSource-V2 JDBC
    // catalog (r13, verdict #7): Trino 406 pushes aggregations into its
    // connectors; Spark's V1 `read.jdbc` pushes only predicates and
    // projections. Registering the endpoint as a `JDBCTableCatalog`
    // (with the hive2 dialect declaring the aggregate vocabulary) makes
    // `count/sum/min` compute REMOTELY — `PushedAggregates` is
    // require-asserted on the plan, so the wire carries one row per
    // group instead of the table. At 100 TB that is shipping a result
    // vs shipping a table.
    "q189_jdbc_agg_pushdown" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions.col
        val url = s"jdbc:hive2://localhost:${federationPort(s)}/default"
        graft.sources.interop.JdbcFederation.registerCatalog(s, "fedcat", url)
        val qualified = fedNationTable(s, dir) // "<db>.nation"
        val Array(db, tbl) = qualified.split("\\.", 2)
        val agg = s.sql(
          s"""SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS sk,
             |  min(n_nationkey) AS mn
             |FROM fedcat.`$db`.`$tbl`
             |GROUP BY n_regionkey""".stripMargin)
        val plan = agg.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        require(plan.contains("PushedAggregates"),
          s"aggregates not pushed to the remote side:\n$plan")
        agg.orderBy(col("n_regionkey"))
      },
      oracle = Some(
        """SELECT n_regionkey, count(*) AS n,
          |  CAST(sum(n_nationkey) AS BIGINT) AS sk,
          |  min(n_nationkey) AS mn
          |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STATEMENT-TIME SUBQUERY DML through the wire (r14, verdict #2):
    // `DELETE … WHERE k IN (SELECT …)` and a scalar-subquery UPDATE run
    // between BEGIN and COMMIT — the subqueries evaluate AT STATEMENT
    // TIME against the block's pinned cut and collapse into literal key
    // sets / values (pg's contract; the ORM idiom the r13 refusal
    // blocked), then the ordered ops fold into ONE commit. DuckDB
    // recomputes the post-txn state with plain set algebra. Scale: the
    // evaluated key set is wire-interactive-sized by contract; the fold
    // keeps multiDml's O(matched rows) merge-on-read cost.
    "q190_pgwire_txn_subquery" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        import graft.sources.{CatalogOps, CommitLog}
        val (db, baseRoot, _) = pgDmlFixture(s, dir)
        val port = pgDmlPort(s)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q190-clone").toString
        CommitLog.shallowClone(baseRoot, root)
        val tbl = "ordq_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        CatalogOps.createCommitLogTable(s, db, tbl, root)
        val rows =
          try {
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""USE $db;
                 |BEGIN;
                 |DELETE FROM $tbl WHERE o_custkey IN
                 |  (SELECT c_custkey FROM vip);
                 |UPDATE $tbl SET o_totalprice = o_totalprice +
                 |  (SELECT count(*) FROM vip)
                 |  WHERE o_orderkey % 7 = 0;
                 |COMMIT""".stripMargin)
            require(CommitLog.currentVersion(root).contains(2L),
              "the subquery-DML block must land as exactly ONE commit")
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""SELECT o_custkey % 10 AS bucket, count(*) AS n,
                 |  sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
                 |FROM $db.$tbl
                 |GROUP BY o_custkey % 10
                 |ORDER BY bucket""".stripMargin)._2
          } finally s.sql(s"DROP TABLE IF EXISTS $db.`$tbl`")
        import s.implicits._
        rows.map(r => (r(0).get, r(1).get, r(2).get))
          .toDF("bucket", "n", "cents")
          .select(col("bucket").cast("long").as("bucket"),
            col("n").cast("long").as("n"),
            col("cents").cast("long").as("cents"))
          .orderBy("bucket")
      },
      oracle = Some(
        """SELECT o_custkey % 10 AS bucket, count(*) AS n,
          |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM (
          |  SELECT o_custkey,
          |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice +
          |      (SELECT count(*) FROM customer WHERE c_acctbal > 9000)
          |    ELSE o_totalprice END AS o_totalprice
          |  FROM orders
          |  WHERE o_orderkey % 4 = 0 AND o_custkey NOT IN
          |    (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
          |) u
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TRANSACTIONAL MERGE through the wire (r14, verdict #3): MERGE INTO
    // between BEGIN and COMMIT stages its SOURCE at statement time and
    // folds the clause structure (update-matched / insert-unmatched) at
    // COMMIT alongside a later DELETE — ordered ops, one marker commit,
    // version asserted in-query. DuckDB recomputes the merge as
    // source ∪ (base ∖ matched-keys) followed by the delete. Scale: the
    // fold's touch probe semi-joins the source keys, so commit cost is
    // O(files holding a matched key), never O(table).
    "q191_pgwire_txn_merge" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        import org.apache.spark.sql.functions._
        import graft.sources.{CatalogOps, CommitLog}
        val (db, baseRoot, _) = pgDmlFixture(s, dir)
        val port = pgDmlPort(s)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q191-clone").toString
        CommitLog.shallowClone(baseRoot, root)
        val tbl = "ordm_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        CatalogOps.createCommitLogTable(s, db, tbl, root)
        val rows =
          try {
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""USE $db;
                 |BEGIN;
                 |MERGE INTO $tbl t USING msrc src
                 |  ON t.o_orderkey = src.o_orderkey
                 |  WHEN MATCHED THEN UPDATE SET *
                 |  WHEN NOT MATCHED THEN INSERT *;
                 |DELETE FROM $tbl WHERE o_custkey % 11 = 0;
                 |COMMIT""".stripMargin)
            require(CommitLog.currentVersion(root).contains(2L),
              "the MERGE block must land as exactly ONE commit")
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""USE $db;
                 |BEGIN;
                 |MERGE INTO $tbl t USING msrc src
                 |  ON t.o_orderkey = src.o_orderkey
                 |  WHEN MATCHED THEN UPDATE SET *;
                 |ROLLBACK""".stripMargin)
            require(CommitLog.currentVersion(root).contains(2L),
              "ROLLBACK must leave the merged table untouched")
            graft.tools.PgWire.queryOnce("127.0.0.1", port,
              "cube", "wire-check",
              s"""SELECT o_custkey % 10 AS bucket, count(*) AS n,
                 |  sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
                 |FROM $db.$tbl
                 |GROUP BY o_custkey % 10
                 |ORDER BY bucket""".stripMargin)._2
          } finally s.sql(s"DROP TABLE IF EXISTS $db.`$tbl`")
        import s.implicits._
        rows.map(r => (r(0).get, r(1).get, r(2).get))
          .toDF("bucket", "n", "cents")
          .select(col("bucket").cast("long").as("bucket"),
            col("n").cast("long").as("n"),
            col("cents").cast("long").as("cents"))
          .orderBy("bucket")
      },
      oracle = Some(
        """SELECT o_custkey % 10 AS bucket, count(*) AS n,
          |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM (
          |  SELECT o_orderkey, o_custkey, o_totalprice * 3 AS o_totalprice
          |  FROM orders WHERE o_orderkey % 8 = 0 OR o_orderkey % 4 = 1
          |  UNION ALL
          |  SELECT o_orderkey, o_custkey, o_totalprice
          |  FROM orders WHERE o_orderkey % 4 = 0 AND NOT (o_orderkey % 8 = 0)
          |) m
          |WHERE o_custkey % 11 <> 0
          |GROUP BY 1 ORDER BY 1""".stripMargin)))

  /** The federation endpoint, started ONCE per JVM and never stopped
    * (HiveThriftServer2 does not rebind after stop — SqlEndpointSpec's
    * documented constraint — and BenchOne's best-of-3 re-runs q186 in
    * one process). Poll-until-accepting so the first caller returns a
    * usable port.
    */
  private val fedPortHolder = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The q186 remote-side fixture (nation as a commitlog catalog table),
    * staged ONCE per (JVM, sf-dir) — r12 verdict #3: the in-query
    * fixture commit + catalog DDL (and, on the first call, the endpoint
    * spin-up) dominated the bench number (~14 s, 5–8 % of the sweep),
    * masking real regressions elsewhere. The timed body is now the
    * federated scan + join; the fixture cost lands on the warmup pass /
    * first run only, which best-of-N sheds.
    */
  private val fedFixtures = scala.collection.mutable.Map[String, String]()

  /** q188's remote-side fixture: nation PUSHED to the endpoint through
    * the federated WRITE path (dialect-typed CREATE + batched literal
    * INSERTs), once per (JVM, sf-dir). Returns the remote table name.
    */
  private val fedWritten = scala.collection.mutable.Map[String, String]()

  private def fedWrittenNation(s: SparkSession, dir: String): String =
    fedWritten.synchronized {
      fedWritten.getOrElseUpdate(dir, {
        import org.apache.spark.sql.functions.col
        val url = s"jdbc:hive2://localhost:${federationPort(s)}/default"
        val name = "fedw_nation_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        graft.sources.interop.JdbcFederation.writeTable(
          Tables.load(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
          url, s"default.$name", overwrite = true)
        s"default.$name"
      })
    }

  private def fedNationTable(s: SparkSession, dir: String): String =
    fedFixtures.synchronized {
      fedFixtures.getOrElseUpdate(dir, {
        import org.apache.spark.sql.functions.col
        import graft.sources.{CatalogOps, CommitLog}
        val nationRoot = java.nio.file.Files
          .createTempDirectory("graft-q186-nation").toString
        CommitLog.append(Tables.load(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
          nationRoot)
        val db = "fed_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        CatalogOps.createCommitLogTable(s, db, "nation", nationRoot)
        s"$db.nation"
      })
    }

  /** One PgWire server per JVM for the transactional-DML oracle queries
    * (q187/q190/q191) — starting/stopping a server per measure put ~1 s
    * of socket/accept setup inside the timed body (r13 verdict #4).
    */
  private val pgPortHolder = new java.util.concurrent.atomic.AtomicInteger(0)

  private def pgDmlPort(s: SparkSession): Int = pgPortHolder.synchronized {
    if (pgPortHolder.get == 0) {
      val server = graft.tools.PgWire.start(s,
        user = "cube", password = "wire-check")
      pgPortHolder.set(server.port)
    }
    pgPortHolder.get
  }

  /** The txn-DML base fixture, staged ONCE per (JVM, sf-dir): an orders/4
    * commitlog root (each measure SHALLOW-CLONEs it — zero-copy), a
    * catalog db holding the read-only companions (`vip` for q190's
    * subqueries, `msrc` for q191's merge source), and the per-dir
    * insert-source global temp view (dir-scoped name: the Bench warmup
    * runs a DIFFERENT sf-dir first, and a fixed view name would leak its
    * rows into the timed run). Returns (db, baseRoot, srcView).
    */
  private val pgDmlBases =
    scala.collection.mutable.Map[String, (String, String, String)]()

  private def pgDmlFixture(s: SparkSession, dir: String)
      : (String, String, String) =
    pgDmlBases.synchronized {
      pgDmlBases.getOrElseUpdate(dir, {
        import org.apache.spark.sql.functions._
        import graft.sources.{CatalogOps, CommitLog}
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val baseRoot = java.nio.file.Files
          .createTempDirectory("graft-pgdml-base").toString
        CommitLog.append(ord.filter(col("o_orderkey") % 4 === 0), baseRoot)
        val db = "pgdml_" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(10)
        val vipRoot = java.nio.file.Files
          .createTempDirectory("graft-pgdml-vip").toString
        CommitLog.append(Tables.load(s, dir, "customer")
          .filter(col("c_acctbal") > 9000).select(col("c_custkey")), vipRoot)
        CatalogOps.createCommitLogTable(s, db, "vip", vipRoot)
        val msrcRoot = java.nio.file.Files
          .createTempDirectory("graft-pgdml-msrc").toString
        CommitLog.append(ord
          .filter(col("o_orderkey") % 8 === 0 || col("o_orderkey") % 4 === 1)
          .withColumn("o_totalprice", col("o_totalprice") * 3), msrcRoot)
        CatalogOps.createCommitLogTable(s, db, "msrc", msrcRoot)
        val srcView = "pgdml_src_o_" + db.stripPrefix("pgdml_")
        ord.filter(col("o_orderkey") % 4 === 1)
          .createOrReplaceGlobalTempView(srcView)
        (db, baseRoot, srcView)
      })
    }

  private def federationPort(s: SparkSession): Int = fedPortHolder.synchronized {
    if (fedPortHolder.get == 0) {
      val (port, _) = graft.tools.SqlEndpoint.start(s)
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      var conn: java.sql.Connection = null
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (conn == null && System.nanoTime() < deadline) {
        try conn = java.sql.DriverManager.getConnection(url, "anonymous", "")
        catch { case _: Exception => Thread.sleep(300) }
      }
      require(conn != null, "federation endpoint never came up")
      conn.close()
      fedPortHolder.set(port)
    }
    fedPortHolder.get
  }
}
