package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Sanitize

/** Sample-based schema inference with the reference's semantics.
  *
  * Reference (assets.py:227-244, 294-301): per column, take the first value
  * (file order) that is not in the bad-word list `["nan","NULL",""]`;
  * classify it — `^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d{1,6})?$` →
  * Timestamp(0), else varchar; all-null column → varchar.
  *
  * `Extended` mode additionally wires in the reference's dead-code intent
  * (`to_sql`, assets.py:253-260): integer → bigint, `yyyy-MM-dd` → date —
  * flagged in SURVEY.md §7 as an intentional improvement.
  *
  * Distributed: ONE aggregate pass — `min_by(value, row_idx)` per column
  * (nulls in the ordering key are ignored, so bad-word rows don't
  * participate). No collect of data rows; only the 1-row sample reaches
  * the driver. At 100 TB one could sample with `LIMIT n` first; kept exact
  * here because it is a single map-side-combinable agg.
  */
object SchemaInference {

  /** Inference bad-word list ≡ the reference's `bad_words`
    * (assets.py:227-240): exactly `["nan","NULL",""]`. A column whose first
    * value is "NaT" therefore samples as varchar, same as the reference.
    */
  val badWords: Seq[String] = Seq("nan", "NULL", "")

  /** Coercion null list: inference bad words plus "NaT", which the reference
    * drops per-row at insert time (`reformat_rows`, assets.py:373-380) — it
    * participates in inference but becomes NULL in stored rows.
    */
  val coerceNulls: Seq[String] = badWords :+ "NaT"

  private val tsPattern = """^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d{1,6})?$""".r
  private val intPattern = """^-?\d{1,18}$""".r
  private val datePattern = """^\d{4}-\d{2}-\d{2}$""".r

  /** ≡ identify_string_type (assets.py:294-301). */
  def identifyStringType(s: String): DataType =
    if (tsPattern.findFirstIn(s).isDefined) TimestampType else StringType

  /** Extended classification (wires in the dead to_sql intent). */
  def identifyExtended(s: String): DataType =
    if (tsPattern.findFirstIn(s).isDefined) TimestampType
    else if (datePattern.findFirstIn(s).isDefined) DateType
    else if (intPattern.findFirstIn(s).isDefined) LongType
    else StringType

  /** First non-bad-word value per column, in row order.
    *
    * Fast path: probe the first `SampleRows` rows (an early-stopping
    * `limit` — for a local relation no job at all, for a file source a
    * single-split scan). When every column finds its sample there, or the
    * probe exhausted the data, the full pass is skipped — profiling showed
    * the full-scan aggregate's job + codegen cost dominating small-table
    * ingest. Columns still unsampled after the probe (good values only
    * beyond row 1024) fall back to the exact distributed agg, so the
    * result is identical in all cases.
    */
  def firstGoodValues(df: DataFrame): Map[String, Option[String]] = {
    val SampleRows = 1024
    def goodOf(v: String): Boolean = v != null && !badWords.contains(v)
    val head = df.limit(SampleRows).collect()
    val probed: Map[String, Option[String]] = df.columns.zipWithIndex.map {
      case (c, i) =>
        c -> head.iterator
          .map(r => Option(r.get(i)).map(_.toString).orNull)
          .find(goodOf)
    }.toMap
    if (head.length < SampleRows || probed.values.forall(_.isDefined)) probed
    else {
      val idx = monotonically_increasing_id()
      val withIdx = df.withColumn("__graft_idx", idx)
      val aggs: Seq[Column] = df.columns.toSeq.map { c =>
        val v = col(c).cast(StringType)
        val good = v.isNotNull && !v.isin(badWords: _*)
        min_by(v, when(good, col("__graft_idx"))).as(c)
      }
      val row = withIdx.agg(aggs.head, aggs.tail: _*).collect()(0)
      df.columns.zipWithIndex.map { case (c, i) =>
        c -> Option(row.get(i)).map(_.toString)
      }.toMap
    }
  }

  /** Infer a schema over a stringly-typed DataFrame. Column names are
    * sanitized (unidecode + sanitize_db_name ≡ assets.py:235).
    */
  def infer(df: DataFrame, extended: Boolean = false): StructType = {
    val samples = firstGoodValues(df)
    StructType(df.columns.toSeq.map { c =>
      val dt = samples(c) match {
        case None    => StringType // all-null → varchar (assets.py:241-243)
        case Some(v) => if (extended) identifyExtended(v) else identifyStringType(v)
      }
      StructField(Sanitize.sanitizeDbName(Sanitize.unidecode(c)), dt, nullable = true)
    })
  }

  /** Apply an inferred schema: sanitize/rename columns, null out bad words,
    * cast. Timestamp parsing truncates to seconds parity only when the
    * source carries no fraction (Timestamp(0) ≡ assets.py:299).
    * ≡ reformat_rows' coercions (assets.py:346-382) — dropped cells become
    * NULL (SURVEY.md §7 hard-part 2).
    */
  def coerce(df: DataFrame, schema: StructType): DataFrame = {
    val cols = df.columns.toSeq.zip(schema.fields.toSeq).map { case (orig, f) =>
      val v = col(orig).cast(StringType)
      val cleaned = when(v.isin(coerceNulls: _*), lit(null)).otherwise(v)
      (f.dataType match {
        case TimestampType => to_timestamp(cleaned)
        case DateType      => to_date(cleaned)
        case LongType      => cleaned.cast(LongType)
        case _             => cleaned
      }).as(f.name)
    }
    df.select(cols: _*)
  }
}
