package graft.tools

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.sources.CommitLog
import graft.sources.commitlog.{CommitLogFileIndex, MergeOnReadRelation}

/** Per-connection transaction state for the [[PgWire]] endpoint —
  * BEGIN/COMMIT/ROLLBACK with REAL multi-statement atomicity instead of
  * the r11 autocommit no-ops.
  *
  * The reference's Postgres endpoint (reference `docker-compose.yml:
  * 40-57`, `README.md:74-76`) gives clients genuine transaction blocks:
  * two INSERTs between BEGIN and COMMIT become visible together, and
  * ROLLBACK really undoes. This maps those verbs onto machinery the
  * table format already trusts:
  *
  *   - **Writes stage, COMMIT publishes.** `INSERT INTO <commitlog
  *     table>` inside an open transaction evaluates its source query AT
  *     STATEMENT TIME (pg's contract — the rows are fixed when the
  *     INSERT runs, not when COMMIT does) and buffers the result;
  *     nothing touches any table log. COMMIT hands every staged batch to
  *     [[CommitLog.multiAppend]] — the Percolator-style two-phase
  *     protocol whose atomicity is ONE create-if-absent marker write —
  *     so all tables move at one instant or none ever do, and a crash
  *     between prepare and marker is force-aborted by the first reader
  *     after the grace window (`spark.graft.txn.graceMs`), exactly as
  *     any other multiAppend coordinator crash.
  *   - **ROLLBACK discards** the in-memory staging; no table ever saw a
  *     byte. A connection dropping mid-transaction rolls back the same
  *     way (PgWire's teardown calls [[rollback]]).
  *   - **Reads see a consistent cut.** The first statement inside the
  *     transaction takes a [[CommitLog.consistentSnapshot]] over the
  *     current database's commitlog catalog tables and SHADOWS each with
  *     a version-pinned temp view in the connection's isolated session —
  *     repeatable-read snapshot isolation for the rest of the block
  *     (temp views resolve before catalog tables for unqualified names;
  *     the cut can never show a concurrent multi-table transaction
  *     partially). Shadow views also union the transaction's OWN staged
  *     rows, so a client reads its uncommitted writes back — pg's
  *     read-your-writes contract. Shadows drop at COMMIT/ROLLBACK.
  *   - **Errors poison the block** (pg's contract): after any statement
  *     fails, everything until COMMIT/ROLLBACK answers SQLSTATE 25P02,
  *     and COMMIT on a failed block rolls back (returning pg's honest
  *     `ROLLBACK` tag).
  *
  * Documented boundaries (each refused loudly with 0A000, never half
  * honored): only `INSERT INTO` stages — UPDATE/DELETE/MERGE/DDL inside
  * a block would need cross-table conflict analysis the append-only txn
  * protocol deliberately avoids (same restriction as
  * [[CommitLog.multiAppend]] itself); qualified (`db.table`) references
  * bypass temp-view shadowing, so in-block reads of OTHER databases see
  * latest-committed rather than the pin; non-commitlog relations cannot
  * stage.
  *
  * Scale: staged batches are `localCheckpoint`ed (statement-time
  * evaluation, executor-resident blocks) — transaction payloads are
  * wire-interactive-sized by contract; bulk loads take the autocommit
  * append/COPY paths, which stream at cluster width. The COMMIT itself
  * is multiAppend's cost: data staging at cluster width, then one
  * KB-scale marker write as the atomic visibility point.
  */
final class PgTxn(session: SparkSession) {
  import PgTxn._

  private var open = false
  private var failedFlag = false
  private var pinned = false
  private var pins: Map[String, Long] = Map.empty    // root -> pinned version
  private var shadows: Map[String, String] = Map.empty // table name -> root
  private val staged = mutable.LinkedHashMap[String, mutable.Buffer[DataFrame]]()

  def isOpen: Boolean = open
  def isFailed: Boolean = failedFlag

  /** ReadyForQuery status byte: I idle, T in transaction, E failed. */
  def status: Char = if (!open) 'I' else if (failedFlag) 'E' else 'T'

  /** A statement inside the block errored — poison until COMMIT/ROLLBACK. */
  def fail(): Unit = if (open) failedFlag = true

  /** pg's 25P02 gate: statements in a failed block are refused. */
  def guard(): Unit =
    if (open && failedFlag) throw new PgTxnAbortedException

  def begin(): String = {
    // BEGIN inside an open block: pg warns and keeps the block — the
    // existing transaction (and its staging) is NOT restarted
    if (!open) { open = true; failedFlag = false }
    "BEGIN"
  }

  def rollback(): String = { cleanup(); "ROLLBACK" }

  /** COMMIT: publish all staged batches as ONE [[CommitLog.multiAppend]]
    * transaction. On a failed block this is a rollback (pg's own tag
    * contract). A publish failure (constraint violation, force-abort)
    * still closes the block — the error travels to the client and no
    * table shows any effect.
    */
  def commit(): String = {
    if (!open) return "COMMIT"
    if (failedFlag) { cleanup(); return "ROLLBACK" }
    try {
      if (staged.nonEmpty) {
        val batches = staged.toSeq.map { case (root, dfs) =>
          (dfs.reduceLeft(_ unionByName _), root)
        }
        // marker dir beside the first table's log (vacuum walks only
        // `data/`, so markers are never reclaimed out from under
        // historical fold resolution)
        val coord = batches.head._2 + "/_txn"
        CommitLog.multiAppend(batches, coord)
      }
      "COMMIT"
    } finally cleanup()
  }

  /** Route one Spark-bound statement while the block is open. Returns
    * `Some(tag)` when the transaction absorbed it (a staged INSERT),
    * `None` when the caller should execute it as a read against the
    * shadowed session. Throws [[PgTxnAbortedException]] in a failed
    * block and `UnsupportedOperationException` (0A000) for verbs the
    * append-only protocol cannot honor transactionally.
    */
  def intercept(sql: String): Option[String] = {
    guard()
    ensurePins()
    val head = sql.trim.split("\\s+").headOption.getOrElse("")
      .toUpperCase(java.util.Locale.ROOT)
    if (head == "INSERT") Some(stageInsert(sql))
    else if (PgWire.isRowQuery(sql) || ReadVerbs(head)) None
    else throw new UnsupportedOperationException(
      s"$head is not supported inside a transaction block — only INSERT " +
        "and read statements are transactional here (the atomic commit " +
        "protocol is append-only); run it in autocommit")
  }

  /** Reads at Describe/plan time also need the pins (a portal described
    * inside the block must already see the shadowed cut).
    */
  def beforePlan(): Unit = if (open) { guard(); ensurePins() }

  // ------------------------------------------------------------ internals

  /** Take the consistent cut ONCE per block, lazily at the first
    * statement: enumerate the current database's commitlog catalog
    * tables, pin them with [[CommitLog.consistentSnapshot]], and shadow
    * each behind a pinned temp view. Metadata-only (two probes + one
    * head fold per table), catalog-sized at any data scale.
    */
  private def ensurePins(): Unit = if (open && !pinned) {
    pinned = true
    val db = session.catalog.currentDatabase
    val cat = session.sessionState.catalog
    val named = session.catalog.listTables(db).collect().toSeq
      .filter(t => t.tableType == "MANAGED" || t.tableType == "EXTERNAL")
      .flatMap { t =>
        try {
          val meta = cat.getTableMetadata(TableIdentifier(t.name, Some(db)))
          if (meta.provider.exists(_.equalsIgnoreCase("graft-commitlog")))
            // Spark promotes the `path` OPTION into storage.locationUri
            meta.storage.properties.get("path")
              .orElse(meta.storage.locationUri.map(u =>
                java.nio.file.Paths.get(u).toString))
              .map(t.name -> _)
          else None
        } catch { case NonFatal(_) => None }
      }
      // a table with no commits yet has nothing to pin (and nothing a
      // concurrent writer could partially show)
      .filter { case (_, r) => CommitLog.currentVersion(r).isDefined }
    if (named.nonEmpty) {
      pins = CommitLog.consistentSnapshot(named.map(_._2).distinct)
      shadows = named.toMap
      shadows.foreach { case (name, root) => refreshShadow(name, root) }
    }
  }

  /** (Re)register one table's shadow view: the pinned snapshot unioned
    * with the block's own staged batches (read-your-writes).
    */
  private def refreshShadow(name: String, root: String): Unit = {
    val base = CommitLog.read(session, root, pins.get(root))
    val v = staged.getOrElse(root, mutable.Buffer.empty)
      .foldLeft(base)((d, s) => d.unionByName(s, allowMissingColumns = true))
    v.createOrReplaceTempView(name)
  }

  private def cleanup(): Unit = {
    shadows.keys.foreach { n =>
      try session.catalog.dropTempView(n) catch { case NonFatal(_) => }
    }
    shadows = Map.empty; pins = Map.empty; pinned = false
    staged.clear(); open = false; failedFlag = false
  }

  /** Stage one `INSERT INTO` statement: parse (never execute — Spark's
    * `sql()` is eager for DML), resolve the commitlog target, align the
    * source query to the table schema exactly as the append path would
    * (positional, or by the statement's explicit column list with NULLs
    * for omitted columns), evaluate it NOW, and buffer.
    */
  private def stageInsert(sql: String): String = {
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    val ins = parsed match {
      case i: InsertIntoStatement => i
      case _ => throw new UnsupportedOperationException(
        "only plain INSERT INTO is transactional (CTE-prefixed and " +
          "multi-insert forms are not); run it in autocommit")
    }
    if (ins.overwrite) throw new UnsupportedOperationException(
      "INSERT OVERWRITE inside a transaction block is not supported " +
        "(the atomic commit protocol is append-only)")
    if (ins.partitionSpec.exists(_._2.isDefined))
      throw new UnsupportedOperationException(
        "static PARTITION values inside a transaction block are not " +
          "supported — partition columns travel in the rows")
    val parts = ins.table match {
      case u: UnresolvedRelation => u.multipartIdentifier
      case other => throw new UnsupportedOperationException(
        s"unsupported INSERT target inside a transaction: $other")
    }
    val name = parts.map(p =>
      if (p.matches("[A-Za-z0-9_]+")) p else s"`${p.replace("`", "``")}`")
      .mkString(".")
    val resolverPre = session.sessionState.conf.resolver
    // an unqualified name may resolve to OUR shadow view, whose pinned
    // plan no longer carries the commitlog index — the shadow map is the
    // authority for those
    val shadowRoot =
      if (parts.size == 1)
        shadows.collectFirst { case (nm, r) if resolverPre(nm, parts.head) => r }
      else None
    val root = shadowRoot.orElse(rootOfName(name)).getOrElse(
      throw new UnsupportedOperationException(
        s"$name is not a commitlog table — only commitlog tables " +
          "participate in transaction blocks"))
    val schema = tableSchema(root, name)
    val resolver = session.sessionState.conf.resolver
    val src0 = GraftBridge.ofRows(session, ins.query)
    val aligned =
      if (ins.userSpecifiedCols.nonEmpty) {
        require(ins.userSpecifiedCols.size == src0.columns.length,
          s"INSERT column list names ${ins.userSpecifiedCols.size} columns " +
            s"but the query produces ${src0.columns.length}")
        val named = src0.toDF(ins.userSpecifiedCols: _*)
        named.select(schema.fields.toIndexedSeq.map { f =>
          ins.userSpecifiedCols.find(resolver(_, f.name)) match {
            case Some(c) => col(s"`${c.replace("`", "``")}`")
              .cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
      } else {
        require(src0.columns.length == schema.length,
          s"INSERT needs ${schema.length} columns, query produces " +
            s"${src0.columns.length}")
        // positional bind, cast to the declared types — the analyzer's
        // own INSERT alignment, done here because the statement never
        // reaches the analyzer as DML
        src0.toDF(schema.fieldNames.toIndexedSeq: _*)
          .select(schema.fields.toIndexedSeq.map(f =>
            col(s"`${f.name.replace("`", "``")}`")
              .cast(f.dataType).as(f.name)): _*)
      }
    // statement-time evaluation (pg's contract) + single evaluation for
    // the row-count tag and the eventual commit staging
    val mat = aligned.localCheckpoint(true)
    val n = mat.count()
    staged.getOrElseUpdate(root, mutable.Buffer.empty) += mat
    // read-your-writes: the shadow now includes this batch
    shadows.collectFirst { case (nm, r) if r == root => nm }
      .foreach(nm => refreshShadow(nm, root))
    s"INSERT 0 $n"
  }

  /** Resolve a (possibly shadowed) table name to its commitlog root and
    * current schema — [[PgCopy]]'s target face, valid in or out of a
    * block (shadows only exist while one is open).
    */
  private[tools] def resolveTable(name: String): Option[(String, StructType)] = {
    val resolver = session.sessionState.conf.resolver
    val bare = name.stripPrefix("`").stripSuffix("`")
    val fromShadow =
      if (!name.contains("."))
        shadows.collectFirst { case (nm, r) if resolver(nm, bare) => r }
      else None
    fromShadow.orElse(rootOfName(name)).map(r => (r, tableSchema(r, name)))
  }

  /** Stage one already-aligned batch into the open block ([[PgCopy]]'s
    * COPY FROM inside BEGIN): same contract as a staged INSERT.
    */
  private[tools] def stageBatch(root: String, df: DataFrame): Unit = {
    guard(); ensurePins()
    val mat = df.localCheckpoint(true)
    staged.getOrElseUpdate(root, mutable.Buffer.empty) += mat
    shadows.collectFirst { case (nm, r) if r == root => nm }
      .foreach(nm => refreshShadow(nm, root))
  }

  /** The table's current schema: manifest-declared when commits exist
    * (the authority the append path unions against), catalog-declared
    * for a registered-but-empty table.
    */
  private def tableSchema(root: String, name: String): StructType =
    CommitLog.currentVersion(root) match {
      case Some(v) =>
        CommitLog.manifestSchema(CommitLog.readManifest(root, v))
      case None => session.table(name).schema
    }

  /** Resolve a (possibly shadowed) table name to its commitlog root.
    * Digs through view/alias layers and tolerates a version-pinned
    * relation — OUR shadow views are pinned by design, and staging into
    * a shadowed table is exactly the point (the DML-refuses-pinned rule
    * guards time-travel reads, not transaction staging).
    */
  private def rootOfName(name: String): Option[String] =
    try {
      session.table(name).queryExecution.analyzed.collectFirst {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location match {
            case idx: CommitLogFileIndex => Some(idx.root)
            case _ => None
          }
          case mor: MergeOnReadRelation => Some(mor.root)
          case _ => None
        }
        // catalog tables resolve through the V2 route (GraftTable)
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
            if r.table.isInstanceOf[graft.sources.commitlog.GraftTable] =>
          Some(r.table.asInstanceOf[graft.sources.commitlog.GraftTable].rootDir)
      }.flatten
    } catch { case NonFatal(_) => None }
}

object PgTxn {
  /** pg's 25P02: statements in a failed transaction block are ignored. */
  final class PgTxnAbortedException extends RuntimeException(
    "current transaction is aborted, commands ignored until end of " +
      "transaction block")

  /** Head verbs that execute as reads inside a block (on top of the
    * row-query prefixes [[PgWire.isRowQuery]] already recognizes).
    */
  private val ReadVerbs = Set("SHOW", "DESCRIBE", "DESC", "EXPLAIN")
}
