package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic numeric aggregation.
  *
  * Floating-point SUM/AVG are order-dependent; Spark and the DuckDB oracle
  * aggregate in different orders, so a raw `sum(double)` would hash-mismatch
  * at the last few bits. Summing an exact DECIMAL rendition and casting the
  * exact total back to double makes the result independent of aggregation
  * order in BOTH engines, at zero extra shuffle cost (still one partial+final
  * agg). On a 1000-executor cluster this also makes results run-to-run
  * deterministic, which plain double sums are not.
  *
  * The SQL oracle must use the mirrored formulation — see
  * [[graft.SparkEntry.oracleSql]]:
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  */
object Exact {
  private val dec = DecimalType(18, 6)

  /** Order-independent SUM(double): exact decimal sum, cast back to double. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast(DoubleType)

  /** Order-independent AVG(double): exact sum divided by count (double/long
    * division is a single deterministic IEEE op in both engines).
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment mirrors (DuckDB + ANSI). */
  def sqlSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlAvg(x: String): String = s"${sqlSum(x)} / COUNT($x)"
}
