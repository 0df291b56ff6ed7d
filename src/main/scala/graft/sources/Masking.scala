package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level masking policies, declared as table properties and
  * rendered as views — the lakehouse governance pattern (Snowflake
  * masking policies, Databricks column masks) at the altitude this
  * engine's table format allows: `mask.<col> = <policy>` sticks to the
  * table across sessions and writers, and [[maskedView]] materializes the
  * SELECT that every downstream consumer (thrift/JDBC clients included —
  * views registered at session init travel over the existing SQL surface)
  * should read instead of the raw table.
  *
  * Policies are DETERMINISTIC expressions (no salts, no RNG), so masked
  * data keeps its analytical utility — equal raw values mask equal,
  * bucketed numerics aggregate consistently — and the whole masked
  * surface stays oracle-checkable:
  *
  *  - `hash64`     — 64-bit pseudonym: the md5-prefix integer idiom
  *                   (equal inputs → equal pseudonyms; irreversible
  *                   short of brute force over the value domain)
  *  - `last4`      — `***` + the last 4 characters (the classic
  *                   phone/account tail)
  *  - `bucket:<N>` — numeric generalization to N-sized buckets
  *                   (k-anonymity-style coarsening)
  *  - `redact`     — NULL of the column's own type
  *
  * Masking is per-row expression work inside whole-stage codegen — at
  * 100 TB the masked view costs exactly what the raw scan costs.
  */
object Masking {

  private[graft] val Prefix = "mask."

  /** Row-level security: `rowfilter` is a boolean SQL expression over the
    * table's columns; the governed view keeps only rows satisfying it
    * (NULL → hidden, the usual RLS semantics). Declared once, applied to
    * every consumer of [[masked]]/[[maskedView]].
    */
  private[graft] val RowFilterProp = "rowfilter"

  private val BucketRe = """bucket:(\d+(?:\.\d+)?)""".r

  /** Declared (column → policy) map of a table. */
  def policiesOf(root: String): Map[String, String] =
    CommitLog.tablePropertiesOf(root).collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }

  private[sources] def validPolicy(p: String): Boolean = p match {
    case "hash64" | "last4" | "redact" => true
    case BucketRe(n) => n.toDouble > 0
    case _ => false
  }

  /** The masking expression for one column under one policy. */
  def maskExpr(c: String, policy: String,
      dt: org.apache.spark.sql.types.DataType): Column = policy match {
    case "hash64" =>
      when(col(c).isNull, lit(null).cast("long"))
        .otherwise(conv(substring(md5(col(c).cast("string")), 1, 8), 16, 10)
          .cast("long"))
    case "last4" =>
      when(col(c).isNull, lit(null).cast("string"))
        .otherwise(concat(lit("***"), expr(s"right(`$c`, 4)")))
    case BucketRe(n) =>
      (floor(col(c).cast("double") / lit(n.toDouble)) * lit(n.toDouble))
        .as(c)
    case "redact" => lit(null).cast(dt)
    case other =>
      throw new IllegalArgumentException(
        s"unknown masking policy '$other' for column $c")
  }

  /** The masked projection of the table's CURRENT snapshot: every column
    * with a declared policy renders through [[maskExpr]], everything else
    * passes through untouched.
    */
  def masked(spark: SparkSession, root: String): DataFrame = {
    val df0 = CommitLog.read(spark, root)
    val props = CommitLog.tablePropertiesOf(root)
    // row filter BEFORE masking: the policy is written over raw columns,
    // and filtering first also lets it push down to the scan
    val df = props.get(RowFilterProp)
      .map(f => df0.filter(coalesce(expr(f).cast("boolean"), lit(false))))
      .getOrElse(df0)
    val pol = props.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      pol.get(f.name)
        .map(p => maskExpr(f.name, p, f.dataType).as(f.name))
        .getOrElse(col(f.name))
    }: _*)
  }

  /** Register the masked projection as a (global or local) temp view so
    * SQL-only consumers read the governed surface by name.
    */
  def maskedView(spark: SparkSession, root: String, name: String): Unit =
    masked(spark, root).createOrReplaceTempView(name)
}
