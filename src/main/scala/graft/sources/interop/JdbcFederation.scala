package graft.sources.interop

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Federated JDBC READ — the consumer side of the wire. The engine has
  * served JDBC since r8 ([[graft.tools.SqlEndpoint]]); this is the
  * reference's OTHER JDBC persona: its Trino deploys a `postgresql`
  * connector catalog (reference `trino/conf/trino/catalog/
  * my_catalog.properties:1-4`) so queries FEDERATE into a foreign
  * database and join against local tables. Here the foreign database is
  * anything with a JDBC driver on the classpath; the spec and q186 prove
  * the loop end-to-end by federating into the engine's OWN thrift
  * endpoint — reader and server exercising both halves of the contract.
  *
  * What Spark needs beyond `spark.read.jdbc`:
  *
  *   - **A HiveServer2 dialect.** Spark ships no `jdbc:hive2` dialect,
  *     and the default quotes identifiers `"col"` — HiveQL syntax
  *     errors. [[Hive2Dialect]] quotes with backticks, so Spark's
  *     generated probes (`SELECT * FROM (…) WHERE 1=0` schema
  *     resolution, pushed-filter WHERE clauses, column pruning) all
  *     parse server-side. Registered once, process-wide.
  *   - **Predicate + projection pushdown** come free from Spark's JDBC
  *     relation: pruned columns and pushable filters travel INSIDE the
  *     generated remote query (visible as `PushedFilters` on the scan),
  *     so the wire carries the reduced result, not the table.
  *   - **Parallel scan**: `partitionColumn`/`numPartitions` splits the
  *     remote read into range-predicate queries executed concurrently —
  *     the federation scale path (N executor-side connections each
  *     fetching a slice, instead of one driver-side firehose).
  *
  * Scale note: a federated read is bounded by the remote endpoint's
  * throughput; the design obligations on THIS side are to push
  * filters/projections (done, via dialect-correct SQL), to parallelize
  * the fetch (partitioned reads), and never to collect the result to
  * the driver — the JDBC relation streams partition-wise into whatever
  * plan consumes it.
  */
object JdbcFederation {

  /** HiveServer2 (Spark thrift / Hive) dialect: backtick identifier
    * quoting — the one thing HiveQL needs that the default dialect gets
    * wrong. Everything else (type mapping, LIMIT framing) matches the
    * defaults the thrift server accepts.
    */
  object Hive2Dialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:hive2")
    override def quoteIdentifier(colName: String): String =
      s"`${colName.replace("`", "``")}`"
    // Aggregate pushdown gate: the base dialect declares NO function
    // supported (compileExpression then refuses every aggregate, so the
    // DSv2 catalog route falls back to shipping raw rows). The remote
    // side here is a full SQL engine — declare the core aggregate /
    // arithmetic vocabulary Spark's V2 SQL builder emits.
    private val SupportedFns = Set(
      "COUNT", "SUM", "MIN", "MAX", "AVG",
      "+", "-", "*", "/", "%", "ABS", "COALESCE", "CASE_WHEN",
      "FLOOR", "CEIL", "ROUND", "UPPER", "LOWER", "SUBSTRING")
    override def isSupportedFunction(funcName: String): Boolean =
      SupportedFns.contains(funcName)

    // DDL the remote (Spark SQL / HiveQL) parser actually accepts — the
    // default dialect emits TEXT and DOUBLE PRECISION, neither of which
    // is a Spark SQL type
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType => Some(JdbcType("STRING", java.sql.Types.VARCHAR))
      case DoubleType => Some(JdbcType("DOUBLE", java.sql.Types.DOUBLE))
      case FloatType => Some(JdbcType("FLOAT", java.sql.Types.FLOAT))
      case ByteType => Some(JdbcType("TINYINT", java.sql.Types.TINYINT))
      case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
      case BinaryType => Some(JdbcType("BINARY", java.sql.Types.BINARY))
      case _ => None // INTEGER/BIGINT/DECIMAL/DATE/TIMESTAMP defaults fit
    }
  }

  private val registered = new AtomicBoolean(false)

  /** Register [[Hive2Dialect]] (idempotent, process-wide). */
  def registerDialect(): Unit =
    if (registered.compareAndSet(false, true))
      JdbcDialects.registerDialect(Hive2Dialect)

  /** Read one remote table (or `(subquery) alias`) over JDBC. With
    * `partitionColumn`, the scan splits into `numPartitions` range
    * queries fetched in parallel by executors.
    */
  def readTable(spark: SparkSession, url: String, dbtable: String,
      user: String = "anonymous", password: String = "",
      driver: String = "org.apache.hive.jdbc.HiveDriver",
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L, upperBound: Long = 0L,
      numPartitions: Int = 1): DataFrame = {
    registerDialect()
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("driver", driver)
      .option("user", user)
      .option("password", password)
      // pooled sessions ([[Hive2Pool]]): HiveServer2 session open/close
      // against an embedded metastore costs seconds PER CONNECTION, and
      // Spark opens one per probe and per task — reuse them instead
      .option("connectionProvider", "hive2-pooled")
    val withParts = partitionColumn match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)
      case None => base
    }
    withParts.load()
  }

  /** Federated JDBC WRITE — the Trino `postgresql` connector's other
    * persona (INSERT/CTAS into the remote catalog, reference
    * `my_catalog.properties:1-4`). CREATE TABLE runs driver-side through
    * the dialect's type mapping; rows land as batched multi-row
    * `INSERT INTO … VALUES` statements executed PARTITION-WISE on the
    * executors, each over its own connection — generated-SQL writes,
    * because the HiveServer2 driver supports neither `executeBatch` nor
    * server-side prepared statements, so `df.write.jdbc`'s
    * PreparedStatement path cannot serve this wire.
    *
    * Semantics: the default (`atomic = false`) matches the Trino
    * connector's per-statement atomicity — a mid-write failure can leave
    * a prefix; re-run with `overwrite = true`. `atomic = true` closes
    * that window with the staging-table pattern: rows land in a
    * uniquely-named stage table first, and only a complete stage
    * publishes — overwrite swaps it in via DROP + RENAME (the target is
    * never partial; the swap itself is two metadata statements), append
    * ships ONE remote `INSERT INTO target SELECT * FROM stage` (on a
    * Spark SQL remote that statement commits through the file-commit
    * protocol, so partial task output is never visible). Any failure
    * drops the stage and leaves the target untouched. Scale:
    * `writePartitions` controls fan-in — the default 1 writes serially
    * (an interactive fixture push); raise it for parallel inserts when
    * the remote end handles concurrent appends.
    */
  def writeTable(df: DataFrame, url: String, table: String,
      user: String = "anonymous", password: String = "",
      driver: String = "org.apache.hive.jdbc.HiveDriver",
      overwrite: Boolean = false, batchRows: Int = 500,
      writePartitions: Int = 1, atomic: Boolean = false): Unit = {
    registerDialect()
    val fields = df.schema.fields
    fields.foreach(f => ddlType(f.dataType)) // unsupported types fail NOW
    val ddl = fields.map(f =>
      s"${Hive2Dialect.quoteIdentifier(f.name)} ${ddlType(f.dataType)}")
      .mkString(", ")
    def exec(statements: String*): Unit = {
      Class.forName(driver)
      val c = Hive2Pool.borrow(url, user, password,
        () => java.sql.DriverManager.getConnection(url, user, password))
      try {
        val st = c.createStatement()
        try statements.foreach(st.execute) finally st.close()
      } finally c.close() // returns the session to the pool
    }
    def insertInto(target: String): Unit =
      df.coalesce(math.max(1, writePartitions)).foreachPartition {
        (rows: Iterator[Row]) =>
          if (rows.hasNext) {
            Class.forName(driver)
            val c = Hive2Pool.borrow(url, user, password,
              () => java.sql.DriverManager.getConnection(url, user, password))
            try {
              val st = c.createStatement()
              try rows.grouped(batchRows).foreach { batch =>
                val values = batch.map(r => fields.indices.map(i =>
                  sqlLiteral(r, i, fields(i).dataType))
                  .mkString("(", ", ", ")")).mkString(", ")
                st.execute(s"INSERT INTO $target VALUES $values")
              } finally st.close()
            } finally c.close()
          }
      }
    def writeBody(): Unit = if (!atomic) {
      exec((if (overwrite) Seq(s"DROP TABLE IF EXISTS $table") else Nil) :+
        s"CREATE TABLE IF NOT EXISTS $table ($ddl)": _*)
      insertInto(table)
    } else {
      // stage in the SAME namespace so RENAME stays a same-db move
      val (ns, leaf) = table.lastIndexOf('.') match {
        case -1 => ("", table)
        case i => (table.substring(0, i + 1), table.substring(i + 1))
      }
      val stage =
        s"$ns${leaf}__graft_stage_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      exec(s"CREATE TABLE $stage ($ddl)")
      try {
        insertInto(stage)
        if (overwrite)
          exec(s"DROP TABLE IF EXISTS $table",
            s"ALTER TABLE $stage RENAME TO $table")
        else
          exec(s"CREATE TABLE IF NOT EXISTS $table ($ddl)",
            s"INSERT INTO $table SELECT * FROM $stage",
            s"DROP TABLE $stage")
      } catch {
        case t: Throwable =>
          try exec(s"DROP TABLE IF EXISTS $stage")
          catch { case cleanup: Exception => t.addSuppressed(cleanup) }
          throw t
      }
    }
    try writeBody()
    finally
      // sessions that served other work while this write ran hold stale
      // relation caches (per-session catalogs in HiveServer2): a swap
      // rename serves FILE_NOT_EXIST through them, an append silently
      // misses the new files. Invalidate the key so stale sessions never
      // recycle and the next borrow opens fresh.
      Hive2Pool.invalidate(url, user, password)
  }

  private def ddlType(dt: DataType): String = dt match {
    case StringType => "STRING"
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case BooleanType => "BOOLEAN"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new UnsupportedOperationException(
      s"federated JDBC write of type $other is not supported")
  }

  /** One value as a remote-parseable SQL literal. Floating point rides a
    * string cast (`toString` round-trips doubles exactly, including
    * Infinity/NaN); strings escape backslash-style (Spark SQL's default
    * literal rules). Timestamps ship as `timestamp_micros(<epoch>)` —
    * zone-FREE by construction: a `TIMESTAMP'…'` string literal would
    * render in the writer JVM's default zone and re-parse in the remote
    * SESSION's zone, silently shifting instants whenever the two differ
    * (ADVICE r13). Epoch micros name the instant itself; the remote
    * (a Spark SQL engine — this dialect's declared target) reconstructs
    * it exactly. Dates stay literal: `DATE'yyyy-MM-dd'` is zone-free in
    * both rendering and parsing.
    */
  private def sqlLiteral(r: Row, i: Int, dt: DataType): String =
    if (r.isNullAt(i)) "NULL" else dt match {
      case StringType =>
        "'" + r.getString(i).replace("\\", "\\\\").replace("'", "\\'") + "'"
      case BooleanType | ByteType | ShortType | IntegerType | LongType =>
        String.valueOf(r.get(i))
      case FloatType => s"CAST('${r.getFloat(i)}' AS FLOAT)"
      case DoubleType => s"CAST('${r.getDouble(i)}' AS DOUBLE)"
      case d: DecimalType =>
        s"CAST('${r.getDecimal(i)}' AS DECIMAL(${d.precision},${d.scale}))"
      case DateType => s"DATE'${r.getDate(i)}'"
      case TimestampType =>
        val ts = r.getTimestamp(i)
        val micros =
          Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
        s"timestamp_micros(${micros}L)"
      case other => throw new UnsupportedOperationException(
        s"federated JDBC write of type $other is not supported")
    }

  /** Register the remote endpoint as a DataSource-V2 JDBC CATALOG
    * (`spark.sql.catalog.<name>` → Spark's `JDBCTableCatalog`), the
    * route with AGGREGATE pushdown: `SELECT count(*), sum(x) FROM
    * <name>.<db>.<table> GROUP BY g` ships the aggregation to the remote
    * side (`PushedAggregates` on the scan) and the wire carries one row
    * per group instead of the table — Trino-406-parity at the
    * wire-bytes level, which at 100 TB is the difference between
    * shipping a table and shipping a result. The V1 `spark.read.jdbc`
    * route ([[readTable]]) pushes only predicates/projections.
    */
  def registerCatalog(spark: SparkSession, name: String, url: String,
      user: String = "anonymous", password: String = "",
      driver: String = "org.apache.hive.jdbc.HiveDriver"): Unit = {
    registerDialect()
    val p = s"spark.sql.catalog.$name"
    spark.conf.set(p,
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"$p.url", url)
    spark.conf.set(s"$p.driver", driver)
    spark.conf.set(s"$p.user", user)
    spark.conf.set(s"$p.password", password)
    spark.conf.set(s"$p.pushDownAggregate", "true")
    spark.conf.set(s"$p.pushDownLimit", "true")
    // catalog metadata probes (listNamespaces/tableExists/schema) each
    // ride their own connection — pool them like the reads
    spark.conf.set(s"$p.connectionProvider", "hive2-pooled")
  }
}
