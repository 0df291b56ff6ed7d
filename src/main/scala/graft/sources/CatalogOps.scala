package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Namespace + catalog bookkeeping ≡ the reference's Postgres DDL helpers.
  *
  *  - bucket → schema: `create schema if not exists {bucket}` (assets.py:35)
  *    → Spark database;
  *  - `info.files (table_name varchar, creation TIMESTAMP)` catalog table
  *    (assets.py:418-425), one row per table creation (assets.py:411-416,
  *    166-168);
  *  - schema-existence predicate (assets.py:393-401) →
  *    `spark.catalog.databaseExists`.
  */
object CatalogOps {

  /** ≡ check_if_schema_exists (assets.py:393-401). */
  def schemaExists(spark: SparkSession, db: String): Boolean =
    spark.catalog.databaseExists(db)

  /** ≡ create schema if not exists (assets.py:35) — idempotent. */
  def ensureSchema(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** ≡ create_info_table (assets.py:418-425) — idempotent. Memoized per
    * session: the CREATE-IF-NOT-EXISTS pair costs two metastore round
    * trips, and registerTable invoked it once per ingested table —
    * measurable against small human-authored workbooks where per-table
    * constants, not row throughput, dominate.
    */
  def ensureInfoTable(spark: SparkSession): Unit = {
    if (infoTableEnsured.containsKey(spark)) return
    ensureSchema(spark, "info")
    spark.sql(
      "CREATE TABLE IF NOT EXISTS info.files (table_name STRING, creation TIMESTAMP) USING parquet")
    infoTableEnsured.put(spark, java.lang.Boolean.TRUE)
  }

  private val infoTableEnsured =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** ≡ the info.files INSERT (assets.py:411-416). Second-precision
    * timestamp parity with `str(datetime.now()).split(".")[0]`
    * (assets.py:404).
    */
  def registerTable(spark: SparkSession, qualifiedName: String): Unit = {
    ensureInfoTable(spark)
    val now = new Timestamp(System.currentTimeMillis() / 1000 * 1000)
    import spark.implicits._
    Seq((qualifiedName, now)).toDF("table_name", "creation")
      .write.mode(SaveMode.Append).insertInto("info.files")
  }

  /** Register a CommitLog table in the persistent catalog
    * (`CREATE TABLE … USING graft-commitlog`): after this, `spark.table
    * ("db.t")`, SQL by name, and `INSERT INTO db.t` all resolve through
    * the format's data source — reads are the FileIndex-driven vectorized
    * scan (current snapshot per query), writes land atomic commits. The
    * catalog stores only the pointer (provider + path); the log stays the
    * single source of truth, so external writers' commits are visible
    * with no re-registration.
    */
  def createCommitLogTable(
      spark: SparkSession, db: String, table: String, root: String): Unit = {
    ensureSchema(spark, db)
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$db`.`$table` " +
      s"USING `graft-commitlog` OPTIONS (path '$root')")
    registerTable(spark, s"$db.$table")
  }

  /** Idempotent table write ≡ `create table if not exists` + per-row INSERT
    * (assets.py:403-410 + 105-114), as one batch append.
    *
    * `partitionBy` is the 100 TB layout lever the reference (Postgres heap
    * tables) lacks: partition ingested facts by a low-cardinality column —
    * typically `to_date(ts)` or a month derivation — so time-ranged queries
    * prune partitions at the source listing instead of scanning history.
    * Only applied on first creation; appends to an existing table follow
    * its layout (Spark validates the spec matches).
    */
  def appendTable(
      spark: SparkSession,
      df: DataFrame,
      db: String,
      table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    ensureSchema(spark, db)
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(s"`$db`.`$table`")
    registerTable(spark, s"$db.$table")
  }
}
