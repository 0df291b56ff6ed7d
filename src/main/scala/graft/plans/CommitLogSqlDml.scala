package graft.plans

import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.TimestampType

import graft.sources.CommitLog
import graft.sources.commitlog.{CommitLogFileIndex, DefaultSource}

/** SQL-level row DML and time travel for CommitLog tables.
  *
  * The reference's analytical persona speaks SQL over JDBC — its asset code
  * issues DML statements as text (reference `projects/dagster/assets/
  * assets.py:105-114`) and its README points BI clients at a SQL endpoint
  * (reference `README.md:74-76`). A V1 `InsertableRelation` covers `INSERT
  * INTO`/`INSERT OVERWRITE` but cannot express row-level `MERGE`/`UPDATE`/
  * `DELETE`, and Spark's analyzer rejects those verbs on V1 relations in
  * `checkAnalysis`. These rules close the gap the way Delta did before
  * DataSourceV2 existed: an injected analyzer rule recognizes a fully
  * resolved `MergeIntoTable`/`UpdateTable`/`DeleteFromTable` whose target is
  * a commitlog relation and replaces it with a `RunnableCommand` that drives
  * the table format's native copy-on-write primitives
  * ([[CommitLog.merge]]/[[CommitLog.update]]/[[CommitLog.delete]]).
  *
  * Interception happens AFTER resolution (conditions and assignments arrive
  * type-checked, star-actions pre-expanded by the analyzer) and BEFORE
  * `checkAnalysis` would reject the V1 target — the scratch-verified window.
  *
  * Time travel (`FROM t VERSION AS OF n` / `TIMESTAMP AS OF ts`) instead
  * needs the HINT-resolution batch: the default `ResolveRelations` throws
  * `UNSUPPORTED_FEATURE.TIME_TRAVEL` for non-V2 relations during the main
  * resolution fixed point, before any appended resolution rule runs. The
  * hint batch runs earlier, so [[ResolveCommitLogTimeTravel]] swaps the
  * `RelationTimeTravel` for a version-pinned commitlog relation there.
  *
  * Scale note: nothing here executes on the driver beyond metadata — each
  * command re-enters the DataFrame API and the underlying primitives rewrite
  * only touched files (cost O(matched data), never O(table)).
  */
object CommitLogSqlDml {

  /** Unwrap view/alias layers down to a commitlog-backed relation's table
    * root. Time-travel-pinned relations refuse DML (same contract as the
    * InsertableRelation write path).
    */
  object CommitLogTarget {
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case v: View => unapply(v.child)
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: CommitLogFileIndex =>
            if (idx.pinned.isDefined) throw new IllegalArgumentException(
              "cannot run DML through a version-pinned (time travel) relation")
            Some(idx.root)
          case _ => None
        }
        // a snapshot carrying deletion vectors resolves to the
        // merge-on-read relation — DML targets it the same way
        case mor: graft.sources.commitlog.MergeOnReadRelation =>
          if (mor.pinned.isDefined) throw new IllegalArgumentException(
            "cannot run DML through a version-pinned (time travel) relation")
          Some(mor.root)
        case _ => None
      }
      case _ => None
    }
  }

  /** Rebind a resolved expression by NAME: the commands re-read the table
    * through fresh relations whose attributes carry new expression ids, so
    * resolved `AttributeReference`s from the analyzed statement would never
    * bind — swap each for an unresolved attribute that re-resolves by name
    * against whatever DataFrame the condition is applied to.
    */
  private[graft] def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other => other
  }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-commitlog MERGE supports equi-key ON, WHEN MATCHED [AND cond] " +
        s"THEN DELETE, WHEN MATCHED THEN UPDATE SET * (all columns from the " +
        s"source row), WHEN NOT MATCHED THEN INSERT *, and one WHEN NOT " +
        s"MATCHED BY SOURCE [AND cond] THEN DELETE | UPDATE SET … clause " +
        s"over target columns — got: $what")

  /** Analyzer rule: resolved V1-rejected DML onto commitlog commands. */
  class ResolveDml(spark: SparkSession) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case d @ DeleteFromTable(CommitLogTarget(root), cond)
          if d.childrenResolved && cond.resolved =>
        GraftDeleteCommand(root, cond)

      case u @ UpdateTable(CommitLogTarget(root), assignments, cond)
          if u.resolved =>
        val set = assignments.map {
          case Assignment(k: AttributeReference, v) => k.name -> v
          case a => throw new UnsupportedOperationException(
            s"UPDATE of a non-column target is not supported: ${a.sql}")
        }
        GraftUpdateCommand(root, set, cond)

      case m @ MergeIntoTable(target @ CommitLogTarget(root), source, cond,
          matched, notMatched, notMatchedBySource, withSchemaEvolution)
          if m.resolved =>
        if (withSchemaEvolution) unsupported("WITH SCHEMA EVOLUTION")
        translateMerge(root, target, source, cond, matched, notMatched,
          notMatchedBySource)

      // Dynamic partition overwrite on a catalog table: Spark ships no V1
      // write fallback for OverwritePartitionsDynamic (its capability
      // check demands a real V2 BATCH_WRITE), so the plan rewrites here —
      // before CheckAnalysis — onto the commitlog's own partition-replace
      // commit, the same interception route every other commitlog DML
      // statement takes.
      case o @ OverwritePartitionsDynamic(
          r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation,
          query, _, _, _)
          if o.childrenResolved &&
            r.table.isInstanceOf[graft.sources.commitlog.GraftTable] =>
        val t = r.table.asInstanceOf[graft.sources.commitlog.GraftTable]
        if (t.pinned.isDefined) throw new IllegalArgumentException(
          "cannot write through a version-pinned (time travel) relation")
        GraftDynamicOverwriteCommand(t.rootDir, query)

      case _ => plan
    }

    private def translateMerge(
        root: String,
        target: LogicalPlan,
        source: LogicalPlan,
        cond: Expression,
        matched: Seq[MergeAction],
        notMatched: Seq[MergeAction],
        notMatchedBySource: Seq[MergeAction]): LogicalPlan = {
      val spec = translateMergeSpec(spark.sessionState.conf.resolver,
        target, source, cond, matched, notMatched, notMatchedBySource)
      GraftMergeCommand(root, source, spec.keys, spec.deleteWhen,
        spec.insertUnmatched, replaceMatched = spec.replaceMatched,
        spec.bySource)
    }
  }

  /** The clause structure [[GraftMergeCommand]] executes, extracted from
    * a RESOLVED MergeIntoTable — shared by the analyzer rule (autocommit
    * SQL MERGE) and [[graft.tools.PgTxn]] (MERGE staged inside a
    * transaction block, folded at COMMIT).
    */
  private[graft] case class MergeSpec(
      keys: Seq[String],
      deleteWhen: Option[Expression],
      insertUnmatched: Boolean,
      replaceMatched: Boolean,
      bySource: Option[MergeBySource])

  private[graft] def translateMergeSpec(
      resolver: (String, String) => Boolean,
      target: LogicalPlan,
      source: LogicalPlan,
      cond: Expression,
      matched: Seq[MergeAction],
      notMatched: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction]): MergeSpec = {
      val tOut = target.outputSet
      val sOut = source.outputSet

      // ON must be a conjunction of target.k = source.k equalities over
      // SAME-NAMED columns — the key-join contract CommitLog.merge executes.
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      // An analyzer-inserted widening cast on the SOURCE side is fine: the
      // command projects the source to the table schema before joining, so
      // the key comparison runs in the target's type either way. A cast on
      // the TARGET side is not (the ON would compare in the source's wider
      // type while the projection narrows — different match set).
      def sourceKey(e: Expression, targetType: org.apache.spark.sql.types.DataType)
          : Option[AttributeReference] = stripCast(e) match {
        case b: AttributeReference
            if sOut.contains(b) && (e.eq(b) || e.dataType == targetType) => Some(b)
        case _ => None
      }
      val keys = conjuncts(cond).map {
        case EqualTo(a: AttributeReference, se)
            if tOut.contains(a) && sourceKey(se, a.dataType)
              .exists(b => resolver(a.name, b.name)) =>
          a.name
        case EqualTo(se, a: AttributeReference)
            if tOut.contains(a) && sourceKey(se, a.dataType)
              .exists(b => resolver(a.name, b.name)) =>
          a.name
        case other => unsupported(s"ON clause term ${other.sql}")
      }

      // A star-shaped assignment list: every target column set from the
      // same-named source column (analyzer-inserted casts tolerated).
      def isStar(assignments: Seq[Assignment]): Boolean = {
        val covered = assignments.forall {
          case Assignment(k: AttributeReference, v) => stripCast(v) match {
            case s: AttributeReference => sOut.contains(s) && resolver(k.name, s.name)
            case _ => false
          }
          case _ => false
        }
        covered && assignments.size == target.output.size
      }

      // Matched actions, in order. First-match-wins SQL semantics restrict
      // the supported shapes to: [UPDATE*], [DELETE(cond), UPDATE*],
      // [DELETE(cond)+UPDATE* in either order when DELETE is conditional].
      var deleteWhen: Option[Expression] = None
      var sawUpdate = false
      matched.foreach {
        case UpdateAction(None, assignments, _) if isStar(assignments) =>
          if (sawUpdate) unsupported("two WHEN MATCHED UPDATE clauses")
          sawUpdate = true
        case UpdateAction(Some(_), _, _) =>
          unsupported("conditional WHEN MATCHED UPDATE")
        case UpdateAction(_, _, _) =>
          unsupported("UPDATE SET with a non-star assignment list " +
            "(full-row replace needs every column from the source row)")
        case DeleteAction(Some(c)) =>
          if (sawUpdate) unsupported(
            "WHEN MATCHED DELETE after an unconditional UPDATE (unreachable)")
          if (deleteWhen.isDefined) unsupported("two WHEN MATCHED DELETE clauses")
          if (!c.references.subsetOf(sOut)) unsupported(
            s"DELETE condition referencing target columns: ${c.sql}")
          deleteWhen = Some(c)
        case DeleteAction(None) =>
          unsupported("unconditional WHEN MATCHED DELETE without UPDATE " +
            "(use DELETE FROM … WHERE key IN (…) instead)")
        case a => unsupported(a.toString)
      }
      if (!sawUpdate && matched.nonEmpty) unsupported(
        "WHEN MATCHED DELETE without an UPDATE clause")

      val insertUnmatched = notMatched match {
        case Nil => false
        case Seq(InsertAction(None, assignments)) if isStar(assignments) => true
        case Seq(InsertAction(Some(_), _)) => unsupported(
          "conditional WHEN NOT MATCHED INSERT")
        case other => unsupported(other.mkString("; "))
      }
      // WHEN NOT MATCHED BY SOURCE acts on TARGET rows with no source
      // match, so its condition and assignment values may reference only
      // target columns. One clause of either kind is supported (the
      // first-match-wins interplay of several is not).
      val bySource = notMatchedBySource match {
        case Nil => None
        case Seq(DeleteAction(c)) =>
          c.filterNot(_.references.subsetOf(tOut)).foreach(cc => unsupported(
            s"NOT MATCHED BY SOURCE DELETE condition referencing source " +
              s"columns: ${cc.sql}"))
          Some(MergeBySource(delete = true, Nil, c))
        case Seq(UpdateAction(c, assignments, _)) =>
          c.filterNot(_.references.subsetOf(tOut)).foreach(cc => unsupported(
            s"NOT MATCHED BY SOURCE UPDATE condition referencing source " +
              s"columns: ${cc.sql}"))
          val set = assignments.map {
            case Assignment(k: AttributeReference, v)
                if tOut.contains(k) && v.references.subsetOf(tOut) =>
              k.name -> v
            case a => unsupported(
              s"NOT MATCHED BY SOURCE assignment ${a.sql} (target columns " +
                s"from target-row expressions only)")
          }
          Some(MergeBySource(delete = false, set, c))
        case other => unsupported(
          s"multiple WHEN NOT MATCHED BY SOURCE clauses: ${other.mkString("; ")}")
      }
      if (matched.isEmpty && !insertUnmatched && bySource.isEmpty)
        unsupported("no actions")

      MergeSpec(keys, deleteWhen, insertUnmatched,
        replaceMatched = sawUpdate, bySource)
    }

  /** Resolved `WHEN NOT MATCHED BY SOURCE` clause carried to the command:
    * `delete = true` drops qualifying target rows, otherwise `set` rewrites
    * them in place; `cond` restricts the clause (target-row scope).
    */
  case class MergeBySource(
      delete: Boolean,
      set: Seq[(String, Expression)],
      cond: Option[Expression])

  /** `DELETE FROM t WHERE …` → copy-on-write [[CommitLog.delete]], or
    * merge-on-read [[CommitLog.deleteDV]] when the session sets
    * `spark.graft.commitlog.deletionVectors=true`.
    */
  /** `INSERT OVERWRITE` in `partitionOverwriteMode=dynamic` → ONE
    * [[CommitLog.overwritePartitionsDynamic]] commit replacing exactly the
    * partitions present in the query's rows. Columns rebind positionally
    * to the table schema (the analyzer has already aligned and cast the
    * insert query by the time this command is built).
    */
  case class GraftDynamicOverwriteCommand(root: String, query: LogicalPlan)
      extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      val schema = CommitLog.manifestSchema(CommitLog.readManifest(root,
        CommitLog.currentVersion(root).getOrElse(
          throw new IllegalStateException(s"no commits at $root"))))
      val df = GraftBridge.ofRows(spark, query)
        .toDF(schema.fieldNames.toIndexedSeq: _*)
      CommitLog.overwritePartitionsDynamic(spark, root, df)
      Nil
    }
  }

  case class GraftDeleteCommand(root: String, cond: Expression)
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      CommitLog.deleteConfigured(spark, root, GraftBridge.column(byName(cond)))
      Nil
    }
  }

  /** `UPDATE t SET … WHERE …` → copy-on-write [[CommitLog.update]]. */
  case class GraftUpdateCommand(
      root: String,
      set: Seq[(String, Expression)],
      cond: Option[Expression]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      CommitLog.updateConfigured(spark, root,
        set.map { case (n, e) => n -> GraftBridge.column(byName(e)) },
        cond.map(e => GraftBridge.column(byName(e))).getOrElse(lit(true)))
      Nil
    }
  }

  /** `MERGE INTO t USING s ON … WHEN …` → [[CommitLog.mergeRows]]. The
    * source plan is kept as the ANALYZED tree and re-entered via
    * `Dataset.ofRows`, so the delete condition's resolved attribute ids
    * still bind; it is evaluated BEFORE the star projection, letting it
    * reference source columns the projection drops.
    */
  case class GraftMergeCommand(
      root: String,
      source: LogicalPlan,
      keys: Seq[String],
      deleteWhen: Option[Expression],
      insertUnmatched: Boolean,
      replaceMatched: Boolean,
      bySource: Option[MergeBySource] = None) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(spark: SparkSession): Seq[Row] = {
      val src0 = GraftBridge.ofRows(spark, source)
      val bs = bySource.map(b => CommitLog.BySourceClause(b.delete,
        b.set.map { case (n, e) => n -> GraftBridge.column(byName(e)) },
        b.cond.map(e => GraftBridge.column(byName(e)))))
      val schema = CommitLog.manifestSchema(CommitLog.readManifest(root,
        CommitLog.currentVersion(root).getOrElse(throw new IllegalStateException(
          s"no commits at $root"))))
      // Project source columns to the table schema BY NAME (star contract:
      // same names; the rule already proved one exists per target column),
      // casting to the table's declared types. The delete flag is computed
      // BEFORE the projection so it can use dropped source columns.
      val flag = "__graft_merge_delete_sql"
      val base = src0.withColumn(flag,
        deleteWhen.map(GraftBridge.column).getOrElse(lit(false)))
      val projected = base.select(
        (schema.fields.toIndexedSeq.map(f => col(f.name).cast(f.dataType).as(f.name))
          :+ col(flag)): _*)
      if (replaceMatched) {
        CommitLog.mergeRows(spark, root, projected, keys,
          deleteFlag = Some(flag), insertUnmatched = insertUnmatched,
          bySource = bs)
      } else if (bs.isDefined) {
        // No WHEN MATCHED clause but a BY SOURCE one: the engine carries
        // matched target rows through unchanged (replaceMatched = false)
        // while the clause rewrites/drops unmatched ones; the FULL source
        // is passed so "not matched by source" means the original source.
        CommitLog.mergeRows(spark, root, projected.drop(flag), keys,
          deleteFlag = None, insertUnmatched = insertUnmatched,
          replaceMatched = false, bySource = bs)
      } else {
        // Insert-only merge (no WHEN MATCHED clause): matched TARGET rows
        // must survive untouched, so restrict the source to unmatched rows
        // first — then the merge degenerates to an atomic append (no file
        // is touched) while keeping the dup-key check and commit metadata.
        val targetKeys = CommitLog.read(spark, root)
          .select(keys.map(col).toIndexedSeq: _*)
        CommitLog.mergeRows(spark, root,
          projected.drop(flag).join(targetKeys, keys, "left_anti"),
          keys, deleteFlag = None, insertUnmatched = true)
      }
      Nil
    }
  }

  // ------------------------------------------------------------------
  // Time travel: SELECT … FROM t VERSION AS OF n / TIMESTAMP AS OF ts
  // ------------------------------------------------------------------

  /** Hint-batch rule: materialize `RelationTimeTravel` over a commitlog
    * table/view as a version-pinned relation before `ResolveRelations`
    * rejects it. `VERSION AS OF` accepts a numeric version or a TAG name
    * (the Iceberg ref concept the format already implements);
    * `TIMESTAMP AS OF` accepts any foldable timestamp expression.
    * Non-commitlog relations pass through untouched.
    */
  class ResolveTimeTravel(spark: SparkSession) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        commitLogRoot(u.multipartIdentifier) match {
          case Some(root) =>
            val v: Long = ver match {
              case Some(s) if s.nonEmpty && s.forall(_.isDigit) => s.toLong
              case Some(tag) => CommitLog.tags(root).getOrElse(tag,
                throw new IllegalArgumentException(
                  s"VERSION AS OF '$tag': no such version or tag at $root"))
              case None => CommitLog.versionAsOf(root, evalTsMs(ts.get))
            }
            val rel = new DefaultSource().createRelation(
              spark.sqlContext, Map("path" -> root, "version" -> v.toString))
            SubqueryAlias(u.multipartIdentifier.last, LogicalRelation(rel))
          case None => tt
        }
    }

    private def evalTsMs(e: Expression): Long = {
      if (!(e.resolved && e.foldable)) throw new IllegalArgumentException(
        s"TIMESTAMP AS OF needs a literal/foldable timestamp, got ${e.sql}")
      val zone = spark.sessionState.conf.sessionLocalTimeZone
      val micros = Cast(e, TimestampType, Some(zone)).eval(null)
      if (micros == null) throw new IllegalArgumentException(
        s"TIMESTAMP AS OF: cannot interpret ${e.sql} as a timestamp")
      Math.floorDiv(micros.asInstanceOf[Long], 1000L)
    }

    /** Resolve a (possibly qualified) identifier to a commitlog table root:
      * temp views and `USING graft-commitlog` catalog tables both qualify.
      */
    private def commitLogRoot(ident: Seq[String]): Option[String] = {
      val cat = spark.sessionState.catalog
      def dig(p: LogicalPlan): Option[String] = p.collectFirst {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location match {
            case idx: CommitLogFileIndex => Some(idx.root)
            case _ => None
          }
          case _ => None
        }
      }.flatten
      val globalTempDb =
        spark.conf.get("spark.sql.globalTempDatabase", "global_temp")
      val fromTempView = ident match {
        case Seq(name) => cat.getTempView(name).flatMap(dig)
        case Seq(db, name) if resolverEq(db, globalTempDb) =>
          cat.getGlobalTempView(name).flatMap(dig)
        case _ => None
      }
      fromTempView.orElse {
        val id = ident match {
          case Seq(name) => Some(TableIdentifier(name))
          case Seq(db, name) => Some(TableIdentifier(name, Some(db)))
          case _ => None
        }
        id.flatMap { tid =>
          try {
            val meta = cat.getTableMetadata(tid)
            if (meta.provider.exists(_.equalsIgnoreCase("graft-commitlog")))
              meta.storage.properties.get("path")
                .orElse(meta.storage.locationUri.map(u =>
                  java.nio.file.Paths.get(u).toString))
            else None
          } catch { case _: Exception => None }
        }
      }
    }

    private def resolverEq(a: String, b: String): Boolean =
      spark.sessionState.conf.resolver(a, b)
  }
}
