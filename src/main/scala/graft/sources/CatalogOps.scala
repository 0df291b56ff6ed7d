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
    // coalesce(1): a 1-row local relation otherwise writes at session
    // parallelism — 32 task commits (31 empty) for one registry row
    Seq((qualifiedName, now)).toDF("table_name", "creation")
      .coalesce(1)
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
  /** Output-file sizing conf (guide §6): each append aims for files of
    * this size; a batch smaller than one target lands as ONE file instead
    * of `defaultParallelism` KB-scale shards (the r15 profile measured a
    * 10k-row sheet writing 32 ~12 KB files — 32 task commits per append
    * and a small-files tax on every later read).
    */
  val TargetFileBytesConf = "spark.graft.ingest.targetFileBytes"
  private val DefaultTargetFileBytes = 128L << 20

  /** Size-adaptive write-side partition count: estimated plan bytes over
    * the target file size, clamped to [1, current partitioning]. Never
    * RAISES parallelism (a big scan keeps its layout); only collapses
    * over-parallel small batches.
    */
  private def sizedForWrite(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.conf.getOption(TargetFileBytesConf)
      .flatMap(_.toLongOption).getOrElse(DefaultTargetFileBytes)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (!est.isValidLong) return df // unknown size: leave the plan alone
    val want = math.max(1L, (est.toLong + target - 1) / target)
    val cur = df.rdd.getNumPartitions
    if (want >= cur) df
    // round-robin repartition (not coalesce): the upstream parse keeps
    // its parallelism; only the write narrows
    else df.repartition(want.toInt)
  }

  def appendTable(
      spark: SparkSession,
      df: DataFrame,
      db: String,
      table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    ensureSchema(spark, db)
    val w = sizedForWrite(spark, df).write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(s"`$db`.`$table`")
    registerTable(spark, s"$db.$table")
  }

  // --------------------------------------------------------------------
  // Catalog backup/restore ≡ the reference's bin/backup_hive_metastore.sh
  // (a mysqldump of the Hive metastore). The metastore holds POINTERS —
  // database names, table names → (provider, location, schema, partition
  // spec) plus view DDL — while every byte of data lives in the tables'
  // own storage (commitlog roots, parquet directories). So a backup is a
  // KB-scale JSON dump of those pointers, and restore re-creates every
  // table as an EXTERNAL pointer at its recorded location: data is never
  // copied, exactly like the reference's SQL dump. Works against any
  // catalog implementation (in-memory, Hive-on-Derby, a remote HMS).
  // --------------------------------------------------------------------

  private final case class TableDump(
      db: String, name: String, tableType: String, provider: String,
      location: String, schemaJson: String, partitionCols: Seq[String],
      options: Map[String, String], viewText: String)
  private final case class CatalogDump(
      version: Int, databases: Seq[String], tables: Seq[TableDump])

  private val dumpMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Dump every database's table/view pointers to one JSON file; returns
    * the number of tables dumped. `dbs` restricts the scope (default: all
    * non-default databases plus any tables in `default`).
    */
  def exportCatalog(spark: SparkSession, path: String,
      dbs: Seq[String] = Nil): Int = {
    val cat = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    val databases =
      (if (dbs.nonEmpty) dbs else cat.listDatabases())
        .filterNot(_ == "global_temp") // session-scoped, not metastore state
    val tables = databases.flatMap { db =>
      // exclude session temp views: listTables merges them into every db
      // listing, but they are not metastore state and have no metadata
      cat.listTables(db, "*", includeLocalTempViews = false).map(id =>
        cat.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
          id.table, Some(db))))
    } // persistent views dump too — their DDL restores below
    val dumps = tables.map { t =>
      TableDump(
        t.identifier.database.getOrElse("default"), t.identifier.table,
        t.tableType.name, t.provider.getOrElse(""),
        t.storage.locationUri.map(_.toString).getOrElse(""),
        t.schema.json, t.partitionColumnNames,
        t.storage.properties, t.viewText.getOrElse(""))
    }
    val dump = CatalogDump(1, databases.filterNot(_ == "default"), dumps)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, dumpMapper.writeValueAsBytes(dump))
    dumps.size
  }

  /** Re-create every dumped database and table pointer in THIS session's
    * catalog; data is never touched (tables restore as pointers at their
    * recorded locations). Existing objects are left alone (IF NOT EXISTS
    * semantics), so restore is idempotent and safe on a half-initialized
    * metastore. Returns the number of tables restored.
    */
  def importCatalog(spark: SparkSession, path: String): Int = {
    val dump = dumpMapper.readValue(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      classOf[CatalogDump])
    Option(dump.databases).getOrElse(Nil).foreach(ensureSchema(spark, _))
    var n = 0
    // tables first, views second — a view's text may reference any table
    val (views, tabs) = Option(dump.tables).getOrElse(Nil)
      .partition(_.tableType == "VIEW")
    tabs.foreach { t =>
      ensureSchema(spark, t.db)
      if (!spark.catalog.tableExists(s"${t.db}.${t.name}")) {
        val schema = org.apache.spark.sql.types.DataType.fromJson(t.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val cols = schema.fields.map(f =>
          s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        val part =
          if (Option(t.partitionCols).getOrElse(Nil).isEmpty) ""
          else t.partitionCols.map(c => s"`$c`").mkString(
            " PARTITIONED BY (", ", ", ")")
        val opts = Option(t.options).getOrElse(Map.empty) ++
          (if (t.location.nonEmpty &&
              !Option(t.options).getOrElse(Map.empty).contains("path"))
            Map("path" -> t.location) else Map.empty)
        val optSql =
          if (opts.isEmpty) ""
          else opts.map { case (k, v) =>
            s"'${k.replace("'", "''")}' '${v.replace("'", "''")}'"
          }.mkString(" OPTIONS (", ", ", ")")
        val provider = if (t.provider.nonEmpty) t.provider else "parquet"
        spark.sql(s"CREATE TABLE IF NOT EXISTS `${t.db}`.`${t.name}` " +
          s"($cols) USING `$provider`$optSql$part")
        n += 1
      }
    }
    // CREATE VIEW analyzes its text immediately, so a view referencing
    // another view later in the dump would fail a single pass (views-on-
    // views are common; the dump order is arbitrary). Retry failures in
    // passes until a fix-point — each pass creates at least the views
    // whose dependencies now exist — and only surface errors for views
    // still failing when a pass makes no progress (genuinely broken text
    // or a reference outside the dump).
    var pending = views.filter(v => v.viewText.nonEmpty &&
      !spark.catalog.tableExists(s"${v.db}.${v.name}"))
    var progressed = true
    while (pending.nonEmpty && progressed) {
      progressed = false
      val failed = Seq.newBuilder[(TableDump, Exception)]
      pending.foreach { v =>
        ensureSchema(spark, v.db)
        try {
          spark.sql(s"CREATE VIEW IF NOT EXISTS `${v.db}`.`${v.name}` " +
            s"AS ${v.viewText}")
          n += 1; progressed = true
        } catch {
          case e: Exception => failed += ((v, e))
        }
      }
      val stillFailing = failed.result()
      pending = stillFailing.map(_._1)
      if (!progressed && stillFailing.nonEmpty) {
        val (v, e) = stillFailing.head
        throw new IllegalStateException(
          s"view `${v.db}`.`${v.name}` failed to restore after resolving " +
            s"every other restorable view: ${e.getMessage}", e)
      }
    }
    n
  }
}
