package graft.sources.interop

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

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
}
