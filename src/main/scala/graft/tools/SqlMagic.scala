package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive SQL runner ≡ the reference's `%sql` line/cell magic
  * (aio/conf/ipython/startup/00-prettytables.py:42-61) — the one place the
  * reference's lineage shows a Spark-SQL REPL as the intended interactive
  * query API (SURVEY.md §2c).
  *
  * Semantics mirrored:
  *  - default render collects at most 100 rows (`--limit`, default 100,
  *    00-prettytables.py:41,17,29);
  *  - `--limit 1` renders the single row TRANSPOSED as (Column, Value)
  *    pairs (`_row_as_table`, 00-prettytables.py:12-22);
  *  - `--var name` captures the DataFrame under a name
  *    (00-prettytables.py:52-53); the Python module attribute becomes a
  *    temp view here, so later SQL can reference it — plus programmatic
  *    access via [[SqlMagic.vars]];
  *  - right-aligned pretty table (`t.align = "r"`).
  *
  * The `limit(n).collect()` bound means at most n rows ever reach the
  * driver — safe against any result size at 100 TB (Spark plans it as
  * CollectLimit, an early-out scan, not a full materialization).
  */
final class SqlMagic(spark: SparkSession) {

  private val captured = mutable.LinkedHashMap.empty[String, DataFrame]

  /** Captured `--var` DataFrames by name. */
  def vars: Map[String, DataFrame] = captured.toMap

  /** Run a cell: `args` is the magic's option line ("--limit 5 --var x"). */
  def run(query: String, args: String = ""): String = {
    val df = spark.sql(query)
    val tokens = args.trim.split("\\s+").filter(_.nonEmpty).toList
    val limit = tokens.sliding(2).collectFirst {
      case "--limit" :: v :: Nil => v.toInt
    }.getOrElse(100)
    tokens.sliding(2).collectFirst { case "--var" :: v :: Nil => v }.foreach { name =>
      captured(name) = df
      df.createOrReplaceTempView(name)
    }
    if (limit == 1) renderRow(df) else renderTable(df, limit)
  }

  /** ≡ _to_table (00-prettytables.py:24-33). */
  def renderTable(df: DataFrame, numRows: Int = 100): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(numRows).collect().toSeq
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))))
    format(cols, rows)
  }

  /** ≡ _row_as_table (00-prettytables.py:12-22). */
  def renderRow(df: DataFrame): String = {
    val cols = df.columns.toSeq
    val row = df.limit(1).collect()(0)
    format(Seq("Column", "Value"),
      cols.zipWithIndex.map { case (c, i) => Seq(c, String.valueOf(row.get(i))) })
  }

  /** Right-aligned ASCII grid in the prettytable style. */
  private def format(header: Seq[String], rows: Seq[Seq[String]]): String = {
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def line = widths.map(w => "-" * (w + 2)).mkString("+", "+", "+")
    def fmt(cells: Seq[String]) = cells.zip(widths)
      .map { case (c, w) => " " + (" " * (w - c.length)) + c + " " }
      .mkString("|", "|", "|")
    (Seq(line, fmt(header), line) ++ rows.map(fmt) :+ line).mkString("\n")
  }
}
