package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal versioned-manifest table format: the ACID layer the plain
  * managed-parquet path lacks (BASELINE names "Spark + Delta/Iceberg table
  * ops"; zero egress rules those jars out, so this implements the core of
  * the published commit-protocol design — a log of immutable manifests with
  * atomic publication — directly).
  *
  * Layout:
  * {{{
  *   <root>/_graft_log/v00000000000000000001.json   // one manifest per commit
  *   <root>/data/<commit-uuid>/part-*.parquet        // immutable data files
  * }}}
  *
  * Guarantees:
  *  - **Atomic commit**: data files are fully written into a fresh
  *    `data/<uuid>/` dir FIRST; the commit is a single hard-link creation of
  *    the next manifest (`Files.createLink` fails atomically if the version
  *    exists). A crash mid-write leaves unreferenced garbage, never a
  *    half-visible table.
  *  - **Optimistic concurrency**: two writers racing to version N+1 — one
  *    wins the link creation, the other gets [[CommitConflictException]]
  *    and must re-read and retry (the documented Delta/Iceberg protocol).
  *  - **Snapshot isolation / time travel**: a reader resolves ONE manifest
  *    and reads only files it references; compaction and overwrite publish
  *    new manifests and never mutate old files, so `read(version = Some(n))`
  *    keeps returning the historical snapshot until [[vacuum]].
  *  - **Schema on empty**: each manifest carries the Spark schema JSON, so a
  *    zero-file snapshot still reads as an empty, correctly-typed DataFrame
  *    (the dynamic-partition-overwrite zero-row hole does not exist here).
  *
  * At 100 TB the log is metadata-only (KBs per commit, data moves never),
  * and reads list one manifest instead of walking the directory tree —
  * exactly why table formats beat directory-scan tables at scale.
  */
object CommitLog {

  final class CommitConflictException(msg: String) extends RuntimeException(msg)

  /** Per-file column statistics for scan pruning: min/max rendered as
    * strings via `CAST(x AS STRING)` (re-cast to the column type at prune
    * time, so comparisons are typed, never lexicographic), plus null counts.
    * Only atomic comparable types are tracked; other columns simply never
    * prune. This is the manifest-level stats design of the published
    * Delta/Iceberg protocols — KBs of metadata per commit that let a reader
    * skip whole files without opening a footer.
    */
  final case class FileStat(
      path: String, // relative to root
      rows: Long,
      mins: Map[String, String],
      maxs: Map[String, String],
      nullCounts: Map[String, Long])

  final case class Manifest(
      version: Long,
      op: String,
      schemaJson: String,
      files: Seq[String], // relative to root
      fileStats: Seq[FileStat] = Nil,
      txn: Map[String, Long] = Map.empty) { // appId → last committed batchId
    /** Jackson leaves `fileStats` null when reading a pre-stats manifest. */
    def statsOrNil: Seq[FileStat] = Option(fileStats).getOrElse(Nil)
    /** Same guard for pre-txn manifests; values widen via Number (erasure). */
    def txnOrEmpty: Map[String, Long] =
      Option(txn).getOrElse(Map.empty[String, Long])
        .asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[Number].longValue }
  }

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  private def logDir(root: String): Path = Paths.get(root, "_graft_log")
  private def manifestPath(root: String, v: Long): Path =
    logDir(root).resolve(f"v$v%020d.json")

  /** Largest committed version, if any. */
  def currentVersion(root: String): Option[Long] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) None
    else {
      val vs = Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toLong
        }
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def readManifest(root: String, v: Long): Manifest = {
    val p = manifestPath(root, v)
    require(Files.exists(p), s"no manifest for version $v under $root")
    mapper.readValue(Files.readAllBytes(p), classOf[Manifest])
  }

  /** Atomically publish `m` as version `m.version`. The manifest is staged
    * to a temp file and hard-linked into place — link creation is the
    * atomic, fail-if-exists commit point.
    */
  private[sources] def publish(root: String, m: Manifest): Unit = {
    Files.createDirectories(logDir(root))
    val tmp = logDir(root).resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.write(tmp, mapper.writeValueAsBytes(m))
    try Files.createLink(manifestPath(root, m.version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"version ${m.version} was committed concurrently at $root")
    } finally Files.deleteIfExists(tmp)
  }

  /** Write `df`'s rows as a new immutable file set under `data/<uuid>/` and
    * return their root-relative paths. Nothing is visible until a manifest
    * referencing them is published.
    */
  private def stage(df: DataFrame, root: String): Seq[String] = {
    val sub = s"data/${UUID.randomUUID()}"
    df.write.parquet(s"$root/$sub")
    Files.list(Paths.get(root, sub)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$sub/$n")
      .toSeq.sorted
  }

  private def statTracked(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
        TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** One columnar metadata pass over freshly-staged files: per-file
    * row count + min/max/null-count for every stat-tracked column. Reads
    * only the tracked columns, groups by `input_file_name()` — cost is a
    * footer-and-stat-column scan of data just written, paid once per commit.
    */
  private def statsFor(
      spark: SparkSession,
      root: String,
      files: Seq[String],
      schema: StructType): Seq[FileStat] = {
    if (files.isEmpty) return Nil
    val tracked = schema.fields.filter(f => statTracked(f.dataType)).map(_.name).toSeq
    val df = spark.read.schema(schema).parquet(files.map(f => s"$root/$f"): _*)
    val aggs = tracked.flatMap { c =>
      Seq(
        min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"))
    } :+ count(lit(1)).as("rows__")
    val rows = df.groupBy(input_file_name().as("file__"))
      .agg(aggs.head, aggs.tail: _*).collect() // one row per staged file
    rows.toSeq.map { r =>
      val abs = r.getAs[String]("file__")
      val rel = files.find(f => abs.endsWith(f))
        .getOrElse(sys.error(s"staged file $abs not in manifest set"))
      def s(prefix: String): Map[String, String] = tracked.flatMap { c =>
        Option(r.getAs[String](s"${prefix}__$c")).map(c -> _)
      }.toMap
      FileStat(rel, r.getAs[Long]("rows__"), s("min"), s("max"),
        tracked.map(c => c -> r.getAs[Long](s"nulls__$c")).toMap)
    }
  }

  private def stageWithStats(df: DataFrame, root: String): (Seq[String], Seq[FileStat]) = {
    val files = stage(df, root)
    (files, statsFor(df.sparkSession, root, files, df.schema))
  }

  /** Additive schema union: every field of `old` plus fields only in `nw`
    * (appended, nullable). A field present in both must keep its type —
    * widening/retyping is rejected, matching the Delta/Iceberg default.
    */
  private def unionSchema(old: StructType, nw: StructType): StructType = {
    val byName = old.fields.map(f => f.name -> f).toMap
    nw.fields.foreach { f =>
      byName.get(f.name).foreach { o =>
        require(o.dataType == f.dataType,
          s"schema evolution cannot retype ${f.name}: ${o.dataType} -> ${f.dataType}")
      }
    }
    StructType(old.fields ++
      nw.fields.filterNot(f => byName.contains(f.name)).map(_.copy(nullable = true)))
  }

  /** Append `df` as one atomic commit; returns the new version. Additive
    * schema evolution: `df` may carry new columns (old files read them as
    * null) or omit existing ones (new files read them as null) — the
    * manifest records the union schema, so every snapshot reads with one
    * consistent shape and time travel keeps each version's own schema.
    */
  def append(df: DataFrame, root: String): Long = {
    val base = currentVersion(root)
    val prior = base.map(readManifest(root, _))
    val v = base.getOrElse(0L) + 1
    val schema = prior.map(m => unionSchema(schemaOf(m), df.schema))
      .getOrElse(df.schema)
    val (files, stats) = stageWithStats(df, root)
    publish(root, Manifest(v, "append", schema.json,
      prior.map(_.files).getOrElse(Nil) ++ files,
      prior.map(_.statsOrNil).getOrElse(Nil) ++ stats,
      prior.map(_.txnOrEmpty).getOrElse(Map.empty)))
    v
  }

  /** Idempotent transactional append for streaming sinks: the manifest
    * records, per writer id, the last batch it committed; a replayed batch
    * (same `appId`, `batchId` ≤ recorded) is a no-op. This is the published
    * Delta `txnAppId`/`txnVersion` idempotence protocol — combined with
    * Structured Streaming's `foreachBatch` (which replays a batch after a
    * failure with the SAME batchId) it yields exactly-once table commits on
    * top of at-least-once batch delivery. See [[streamingSink]].
    */
  def appendTxn(df: DataFrame, root: String, appId: String, batchId: Long): Long = {
    val base = currentVersion(root)
    val prior = base.map(readManifest(root, _))
    val last = prior.map(_.txnOrEmpty.getOrElse(appId, Long.MinValue))
      .getOrElse(Long.MinValue)
    if (batchId <= last) return base.get // replay — already committed
    val v = base.getOrElse(0L) + 1
    val schema = prior.map(m => unionSchema(schemaOf(m), df.schema))
      .getOrElse(df.schema)
    val (files, stats) = stageWithStats(df, root)
    publish(root, Manifest(v, "append", schema.json,
      prior.map(_.files).getOrElse(Nil) ++ files,
      prior.map(_.statsOrNil).getOrElse(Nil) ++ stats,
      prior.map(_.txnOrEmpty).getOrElse(Map.empty) + (appId -> batchId)))
    v
  }

  /** `foreachBatch` body writing a stream into a CommitLog table with
    * exactly-once semantics: `df.writeStream.foreachBatch(
    * CommitLog.streamingSink(root, "my-app")).start()`.
    */
  def streamingSink(root: String, appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => { appendTxn(batch, root, appId, batchId); () }

  /** Optimistic-concurrency retry loop: re-run `commit` (which must
    * re-read the current version itself, as every DML here does) until it
    * publishes without a [[CommitConflictException]]. Appends always
    * logically succeed on retry; rewriting ops re-derive their touch set
    * from the fresh snapshot — the documented Delta/Iceberg loser-retries
    * protocol.
    */
  def withRetry[A](maxRetries: Int = 5)(commit: => A): A = {
    var attempt = 0
    while (true) {
      try return commit
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    sys.error("unreachable")
  }

  /** Expose a snapshot to the SQL surface (SqlMagic `%sql`, the JDBC
    * thrift endpoint, `spark.sql`): registers a temp view over the current
    * (or pinned) version. Re-register after new commits to advance the
    * snapshot — the view itself stays immutable, which is exactly snapshot
    * isolation as seen from SQL.
    */
  def createView(spark: SparkSession, root: String, name: String,
      version: Option[Long] = None): Unit =
    read(spark, root, version).createOrReplaceTempView(name)

  /** Metadata-only COUNT(*): the sum of per-file row counts when every
    * file in the snapshot carries stats (None otherwise — e.g. pre-stats
    * manifests). At 100 TB this answers the most common query of all
    * without touching a single data file.
    */
  def rowCount(root: String, version: Option[Long] = None): Option[Long] = {
    val v = version.orElse(currentVersion(root)).getOrElse(return None)
    val m = readManifest(root, v)
    val stats = m.statsOrNil
    if (m.files.isEmpty) Some(0L)
    else if (stats.map(_.path).toSet == m.files.toSet) Some(stats.map(_.rows).sum)
    else None
  }

  /** Files added between two versions, read as a DataFrame — the
    * incremental-consumption surface (CDC-lite): a downstream job that
    * processed version `fromV` reads exactly the new data in `toV` without
    * rescanning the table. Append-only history between the two versions is
    * required (a rewrite op in between means "added files" ≠ "new rows").
    */
  def changes(spark: SparkSession, root: String, fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"changes($fromV, $toV): versions out of order")
    // Enforce the append-only contract instead of trusting the caller: a
    // rewrite op (compact/merge/delete/overwrite/cluster) in the range
    // re-stages EXISTING rows into new files, which this file-diff would
    // silently return as "new" — e.g. IncrementalView would double-count.
    ((fromV + 1) to toV).foreach { v =>
      val op = readManifest(root, v).op
      require(op == "append",
        s"changes($fromV, $toV): version $v is '$op' — the range must be " +
          "append-only (rewrites re-stage existing rows as new files)")
    }
    // fromV = 0 is the empty pre-table baseline: everything in toV is new
    val before =
      if (fromV == 0L) Set.empty[String]
      else readManifest(root, fromV).files.toSet
    val after = readManifest(root, toV)
    readFiles(spark, root, after, after.files.filterNot(before))
  }

  /** Replace the table contents with `df` (zero rows allowed) atomically. */
  def overwrite(df: DataFrame, root: String): Long = {
    val prior = currentVersion(root).map(readManifest(root, _))
    val v = prior.map(_.version).getOrElse(0L) + 1
    val (files, stats) =
      if (df.isEmpty) (Nil, Nil) else stageWithStats(df, root)
    publish(root, Manifest(v, "overwrite", df.schema.json, files, stats,
      prior.map(_.txnOrEmpty).getOrElse(Map.empty)))
    v
  }

  /** Read a snapshot: latest by default, or a pinned historical version.
    * Always reads with the MANIFEST schema, never parquet footer inference —
    * footer sampling picks an arbitrary file (wrong under schema evolution,
    * and nondeterministic), and skipping it avoids a footer-listing pass.
    */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(root))
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val m = readManifest(root, v)
    readFiles(spark, root, m, m.files)
  }

  /** Small-file compaction as ONE metadata commit: rewrite the current
    * snapshot into `nFiles` files and publish a manifest swap. Readers
    * pinned to older versions keep their exact snapshot — the property
    * `Maintenance.compact`'s stage-and-swap on plain tables cannot give.
    */
  def compact(spark: SparkSession, root: String, nFiles: Int = 1): Long = {
    val base = currentVersion(root)
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val df = read(spark, root, Some(base)).repartition(nFiles)
    val (files, stats) = stageWithStats(df, root)
    val v = base + 1
    publish(root, Manifest(v, "compact", df.schema.json, files, stats,
      readManifest(root, base).txnOrEmpty))
    v
  }

  // --------------------------------------------------------------------
  // DML: copy-on-write MERGE / DELETE
  // --------------------------------------------------------------------

  private def schemaOf(m: Manifest): StructType =
    DataType.fromJson(m.schemaJson).asInstanceOf[StructType]

  private def readFiles(spark: SparkSession, root: String, m: Manifest,
      files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf(m))
    else spark.read.schema(schemaOf(m)).parquet(files.map(f => s"$root/$f"): _*)

  /** Root-relative paths of files containing ≥1 row matching `cond` —
    * the copy-on-write touch set. One pass over the snapshot projecting only
    * the columns `cond` needs; the collect is file-path metadata, not data.
    */
  private def touchedFiles(spark: SparkSession, root: String, m: Manifest)(
      mark: DataFrame => DataFrame): Seq[String] = {
    val withFile = readFiles(spark, root, m, m.files)
      .withColumn("_graft_file", input_file_name())
    val abs = mark(withFile).select("_graft_file").distinct()
      .collect().map(_.getString(0))
    m.files.filter(f => abs.exists(_.endsWith(f)))
  }

  /** Delta-style MERGE, file-granular copy-on-write:
    *  - target rows whose key matches a `source` row are replaced by that
    *    source row (full-row UPDATE), or dropped when the source row
    *    satisfies `deleteWhen` (MERGE … WHEN MATCHED DELETE);
    *  - source rows matching no target key are appended (INSERT);
    *  - only files containing a matched key are rewritten — every other
    *    file moves into the new manifest by reference, stats intact.
    *
    * `source` must carry exactly the table schema and unique keys (checked:
    * two source rows for one key would make the merge nondeterministic).
    * At 100 TB the rewrite cost is proportional to the touched files, not
    * the table, and the key-match probe reads only the key columns.
    */
  def merge(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keys: Seq[String],
      deleteWhen: Option[Column] = None): Long = {
    val base = currentVersion(root)
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val m = readManifest(root, base)
    val schema = schemaOf(m)
    require(source.schema.fieldNames.sorted.sameElements(schema.fieldNames.sorted),
      s"merge source columns ${source.columns.mkString(",")} != table schema")
    // Names AND types must match: a widened source (e.g. long → double)
    // would otherwise stage parquet files whose physical types contradict
    // the published manifest schema, making the table unreadable.
    schema.fields.foreach { f =>
      val st = source.schema(f.name).dataType
      require(st == f.dataType,
        s"merge source retypes ${f.name}: ${f.dataType.simpleString} -> ${st.simpleString}")
    }
    // The source is evaluated three times (dup-key check, touch probe,
    // staging) — persist it so an expensive upstream pipeline runs once.
    val src = source.select(schema.fieldNames.map(col).toIndexedSeq: _*).persist()
    try {
      require(src.groupBy(keys.map(col).toIndexedSeq: _*)
        .count().filter(col("count") > 1).isEmpty,
        "merge source has duplicate keys — ambiguous MATCHED action")

      val srcKeys = src.select(keys.map(col).toIndexedSeq: _*)
      val touched = touchedFiles(spark, root, m)(
        _.join(srcKeys, keys, "left_semi"))
      val untouched = m.files.filterNot(touched.contains)
      val tTouched = readFiles(spark, root, m, touched)

      // Full-row replace collapses the merged touch-set to one anti-join and
      // a union: (touched target rows with no source key) ∪ (every surviving
      // source row). A surviving source row that matched is the UPDATE; one
      // that matched nothing anywhere is the INSERT (any matching key would
      // have made its file touched); a source row failing `deleteWhen` simply
      // never reappears — MERGE … WHEN MATCHED DELETE.
      val keep = deleteWhen.map(c => src.filter(!coalesce(c, lit(false))))
        .getOrElse(src)
      val merged = tTouched.join(srcKeys, keys, "left_anti")
        .unionByName(keep)

      val (files, stats) = stageWithStats(merged, root)
      val priorStats = m.statsOrNil.filter(s => untouched.contains(s.path))
      publish(root, Manifest(base + 1, "merge", schema.json,
        untouched ++ files, priorStats ++ stats, m.txnOrEmpty))
      base + 1
    } finally src.unpersist()
  }

  /** Copy-on-write DELETE: rewrite only files containing a matching row. */
  def delete(spark: SparkSession, root: String, cond: Column): Long = {
    val base = currentVersion(root)
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val m = readManifest(root, base)
    val touched = touchedFiles(spark, root, m)(_.filter(cond))
    val untouched = m.files.filterNot(touched.contains)
    val kept = readFiles(spark, root, m, touched)
      .filter(!coalesce(cond, lit(false)))
    val (files, stats) =
      if (touched.isEmpty) (Nil, Nil) else stageWithStats(kept, root)
    val priorStats = m.statsOrNil.filter(s => untouched.contains(s.path))
    publish(root, Manifest(base + 1, "delete", m.schemaJson,
      untouched ++ files, priorStats ++ stats, m.txnOrEmpty))
    base + 1
  }

  // --------------------------------------------------------------------
  // Stats-pruned scan (data skipping)
  // --------------------------------------------------------------------

  /** Conservative file-survival condition for a predicate over per-file
    * min/max stats: true means "this file MIGHT contain a matching row".
    * Unsupported predicate shapes map to `true` (never wrong, just
    * unpruned) — the standard data-skipping contract. Supported:
    * comparisons and IN against literals, IS [NOT] NULL, AND/OR.
    */
  private def surviveCond(p: GraftBridge.Pred, tracked: Set[String]): Column = {
    import GraftBridge.{Attr, Fn, Lit}
    // Wrap a min/max comparison so files with no stats for the column
    // (or an untracked column) always survive.
    def guarded(c: String)(cond: (Column, Column) => Column): Column =
      if (!tracked.contains(c)) lit(true)
      else {
        val mn = col(s"min__$c"); val mx = col(s"max__$c")
        when(mn.isNull || mx.isNull, lit(true)).otherwise(cond(mn, mx))
      }
    p match {
      case Fn("and", Seq(l, r)) => surviveCond(l, tracked) && surviveCond(r, tracked)
      case Fn("or", Seq(l, r)) => surviveCond(l, tracked) || surviveCond(r, tracked)
      case Fn("=" | "==", Seq(Attr(a), Lit(v))) =>
        guarded(a)((mn, mx) => mn <= v && mx >= v)
      case Fn("=" | "==", Seq(Lit(v), Attr(a))) =>
        guarded(a)((mn, mx) => mn <= v && mx >= v)
      case Fn(">", Seq(Attr(a), Lit(v))) => guarded(a)((_, mx) => mx > v)
      case Fn(">", Seq(Lit(v), Attr(a))) => guarded(a)((mn, _) => mn < v)
      case Fn(">=", Seq(Attr(a), Lit(v))) => guarded(a)((_, mx) => mx >= v)
      case Fn(">=", Seq(Lit(v), Attr(a))) => guarded(a)((mn, _) => mn <= v)
      case Fn("<", Seq(Attr(a), Lit(v))) => guarded(a)((mn, _) => mn < v)
      case Fn("<", Seq(Lit(v), Attr(a))) => guarded(a)((_, mx) => mx > v)
      case Fn("<=", Seq(Attr(a), Lit(v))) => guarded(a)((mn, _) => mn <= v)
      case Fn("<=", Seq(Lit(v), Attr(a))) => guarded(a)((_, mx) => mx >= v)
      case Fn("in", Attr(a) +: vs) if vs.forall(_.isInstanceOf[Lit]) =>
        vs.collect { case Lit(v) => guarded(a)((mn, mx) => mn <= v && mx >= v) }
          .reduceOption(_ || _).getOrElse(lit(true))
      case Fn("isnull", Seq(Attr(a))) =>
        if (!tracked.contains(a)) lit(true)
        else coalesce(col(s"nulls__$a") > 0L, lit(true))
      case Fn("isnotnull", Seq(Attr(a))) =>
        if (!tracked.contains(a)) lit(true)
        else coalesce(col(s"nulls__$a") < col("rows__"), lit(true))
      case _ => lit(true)
    }
  }

  /** Snapshot read with manifest-stats file skipping: resolves the version,
    * evaluates [[surviveCond]] over the per-file stats (typed — min/max
    * strings are cast back to the column's type) with Catalyst on a
    * metadata-sized local DataFrame, reads only surviving files, and applies
    * `predicate` as the residual filter. Semantically identical to
    * `read(...).filter(predicate)`; at 100 TB it reads the manifest instead
    * of the data to decide what to open.
    */
  def readPruned(
      spark: SparkSession,
      root: String,
      predicate: Column,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(root))
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val m = readManifest(root, v)
    val surviving = prunedFiles(spark, m, predicate)
    readFiles(spark, root, m, surviving).filter(predicate)
  }

  /** The file subset [[readPruned]] would open (exposed for tests/EXPLAIN). */
  def prunedFiles(spark: SparkSession, m: Manifest, predicate: Column): Seq[String] =
    prunedByPred(spark, m, GraftBridge.pred(predicate))

  /** Manifest schema / file reading / V1-filter pruning, exposed for the
    * `graft-commitlog` data source ([[graft.sources.commitlog.DefaultSource]]).
    */
  def manifestSchema(m: Manifest): StructType = schemaOf(m)

  def readManifestFiles(spark: SparkSession, root: String, m: Manifest,
      files: Seq[String]): DataFrame = readFiles(spark, root, m, files)

  /** Translate Catalyst-pushed V1 `sources.Filter`s to the pruning ADT and
    * return the surviving file set. Unsupported filter shapes degrade to
    * "keep" (the V1 contract re-applies all filters above the scan, so
    * pruning only ever skips I/O).
    */
  def pruneForSourceFilters(spark: SparkSession, m: Manifest,
      filters: Array[org.apache.spark.sql.sources.Filter]): Seq[String] = {
    import org.apache.spark.sql.{sources => sf}
    import GraftBridge.{Attr, Fn, Lit, Opaque, Pred}
    def l(v: Any): Pred = Lit(lit(v))
    def conv(f: sf.Filter): Pred = f match {
      case sf.EqualTo(a, v) => Fn("=", Seq(Attr(a), l(v)))
      case sf.GreaterThan(a, v) => Fn(">", Seq(Attr(a), l(v)))
      case sf.GreaterThanOrEqual(a, v) => Fn(">=", Seq(Attr(a), l(v)))
      case sf.LessThan(a, v) => Fn("<", Seq(Attr(a), l(v)))
      case sf.LessThanOrEqual(a, v) => Fn("<=", Seq(Attr(a), l(v)))
      case sf.In(a, vs) => Fn("in", Attr(a) +: vs.toIndexedSeq.map(l))
      case sf.IsNull(a) => Fn("isnull", Seq(Attr(a)))
      case sf.IsNotNull(a) => Fn("isnotnull", Seq(Attr(a)))
      case sf.And(x, y) => Fn("and", Seq(conv(x), conv(y)))
      case sf.Or(x, y) => Fn("or", Seq(conv(x), conv(y)))
      case _ => Opaque
    }
    val pred = filters.map(conv)
      .reduceOption((a, b) => Fn("and", Seq(a, b))).getOrElse(Opaque)
    prunedByPred(spark, m, pred)
  }

  private def prunedByPred(spark: SparkSession, m: Manifest,
      pred: GraftBridge.Pred): Seq[String] = {
    val schema = schemaOf(m)
    val stats = m.statsOrNil
    val withStats = stats.map(_.path).toSet
    val statless = m.files.filterNot(withStats) // always survive
    if (stats.isEmpty) return m.files
    val tracked = schema.fields.filter(f => statTracked(f.dataType)).map(_.name)
    val statRows = stats.map { s =>
      org.apache.spark.sql.Row.fromSeq(
        s.path +: s.rows +: tracked.toIndexedSeq.flatMap(c =>
          Seq(s.mins.get(c).orNull, s.maxs.get(c).orNull,
            // Map[String, Long] values arrive from Jackson as boxed Integers
            // (erasure): widen via Any → Number — a Long-typed lambda would
            // insert an unbox and throw.
            s.nullCounts.asInstanceOf[Map[String, Any]].get(c)
              .map(v => java.lang.Long.valueOf(v.asInstanceOf[Number].longValue))
              .orNull)))
    }
    val statSchema = StructType(
      StructField("path__", StringType) +: StructField("rows__", LongType) +:
        tracked.toIndexedSeq.flatMap(c => Seq(
          StructField(s"mins__$c", StringType),
          StructField(s"maxs__$c", StringType),
          StructField(s"nulls__$c", LongType))))
    val typed = spark.createDataFrame(statRows.asJava, statSchema)
      .select(col("path__") +: col("rows__") +:
        tracked.toIndexedSeq.flatMap { c =>
          val dt = schema(c).dataType
          Seq(col(s"mins__$c").cast(dt).as(s"min__$c"),
            col(s"maxs__$c").cast(dt).as(s"max__$c"),
            col(s"nulls__$c"))
        }: _*)
    val survive = surviveCond(pred, tracked.toSet)
    val kept = typed.filter(survive).select("path__").collect().map(_.getString(0))
    m.files.filter(f => statless.contains(f) || kept.contains(f))
  }

  /** Z-order clustering rewrite (OPTIMIZE … ZORDER BY): sort the snapshot
    * by the interleaved-bit order of the given numeric columns and split it
    * into `nFiles` range partitions, so every file covers a small
    * hyper-rectangle of the clustering space — manifest min/max stats then
    * prune effectively on ANY of the clustered columns, not just the first
    * sort key (lexicographic sort only tightens the leading column).
    *
    * Each column is min/max-normalized to 16 bits (one metadata-sized
    * aggregate), bits are interleaved into one BIGINT z-value, and the
    * write is `repartitionByRange(z)` — a single shuffle of the snapshot,
    * the same cost as any compaction rewrite. One new manifest; pinned
    * readers keep their snapshot.
    */
  def cluster(spark: SparkSession, root: String, cols: Seq[String],
      nFiles: Int = 16): Long = {
    require(cols.nonEmpty && cols.size <= 4, "cluster on 1-4 numeric columns")
    val base = currentVersion(root)
      .getOrElse(throw new IllegalStateException(s"no commits at $root"))
    val df = read(spark, root, Some(base))
    val aggCols = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"mn$i"),
        max(col(c)).cast("double").as(s"mx$i"))
    }
    val ranges = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    // 16-bit normalized coordinate per column, bit-interleaved into z
    val coords = cols.zipWithIndex.map { case (c, i) =>
      val mn = ranges.getAs[Double](s"mn$i")
      val span = math.max(ranges.getAs[Double](s"mx$i") - mn, java.lang.Double.MIN_VALUE)
      least(floor((col(c).cast("double") - lit(mn)) / lit(span) * 65536.0), lit(65535.0))
        .cast("long").as(s"u$i")
    }
    val k = cols.size
    val zExpr = (0 until 16).flatMap { b =>
      (0 until k).map { i =>
        shiftleft(shiftright(col(s"u$i"), b).bitwiseAND(lit(1L)), b * k + i)
      }
    }.reduce[Column](_.bitwiseOR(_))
    val out = df
      .select(df.columns.map(col) ++ coords: _*)
      .withColumn("_graft_z", zExpr)
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop((cols.indices.map(i => s"u$i") :+ "_graft_z"): _*)
    val (files, stats) = stageWithStats(out, root)
    val v = base + 1
    publish(root, Manifest(v, "cluster", df.schema.json, files, stats,
      readManifest(root, base).txnOrEmpty))
    v
  }

  /** Drop manifests older than the last `keepVersions` and delete data files
    * referenced by NO surviving manifest. Bounds time-travel history.
    */
  def vacuum(root: String, keepVersions: Int = 1): Unit = {
    val cur = currentVersion(root).getOrElse(return)
    val keepFrom = math.max(1L, cur - keepVersions + 1)
    val live = (keepFrom to cur)
      .filter(v => Files.exists(manifestPath(root, v)))
      .flatMap(v => readManifest(root, v).files).toSet
    // remove expired manifests
    (1L until keepFrom).foreach(v => Files.deleteIfExists(manifestPath(root, v)))
    // remove unreferenced data files (and then empty commit dirs)
    val dataRoot = Paths.get(root, "data")
    if (Files.isDirectory(dataRoot)) {
      Files.walk(dataRoot).iterator().asScala.toSeq.reverse.foreach { p =>
        val rel = Paths.get(root).relativize(p).toString
        if (Files.isRegularFile(p) && !live.contains(rel)) Files.delete(p)
        else if (Files.isDirectory(p) && !Files.list(p).iterator().hasNext &&
          p != dataRoot) Files.delete(p)
      }
    }
  }
}
