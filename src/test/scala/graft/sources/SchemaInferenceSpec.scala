package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** FIXTURES.md §2 — Excel-style inference golden cases. */
class SchemaInferenceSpec extends SparkTestBase {
  import spark.implicits._

  test("timestamp regex hit → TimestampType; fractional variant too") {
    val df = Seq(
      ("2023-01-05 10:30:00", "2023-01-05 10:30:00.123456"),
      ("2023-01-06 11:00:00", "nan")
    ).toDF("fecha_registro", "frac")
    val s = SchemaInference.infer(df)
    assert(s("fecha_registro").dataType == TimestampType)
    assert(s("frac").dataType == TimestampType)
  }

  test("numeric-looking values stay varchar in strict mode (dead to_sql)") {
    val df = Seq(("12", "2023-01-05")).toDF("cantidad", "dia")
    val s = SchemaInference.infer(df)
    assert(s("cantidad").dataType == StringType)
    assert(s("dia").dataType == StringType)
  }

  test("extended mode wires the to_sql intent: bigint + date") {
    val df = Seq(("12", "2023-01-05")).toDF("cantidad", "dia")
    val s = SchemaInference.infer(df, extended = true)
    assert(s("cantidad").dataType == LongType)
    assert(s("dia").dataType == DateType)
  }

  test("all-null / bad-word-only column defaults to varchar (assets.py:241-243)") {
    val df = Seq(("nan", "a"), ("NULL", "b"), ("", "c")).toDF("columna_vacia", "x")
    val s = SchemaInference.infer(df)
    assert(s("columna_vacia").dataType == StringType)
  }

  test("first non-bad-word value decides, in row order (assets.py:227-240)") {
    // first good value '2023-01-05 10:30:00' (row 2) → timestamp, even though
    // later rows hold non-timestamp strings
    val df = Seq("nan", "2023-01-05 10:30:00", "plainly text")
      .toDF("c")
    assert(SchemaInference.infer(df)("c").dataType == TimestampType)
  }

  test("column names are unidecoded + sanitized (assets.py:235)") {
    val df = Seq(("1", "2")).toDF("niño año", "% desc")
    val s = SchemaInference.infer(df)
    // unidecode("niño año")="nino ano"; sanitize_db_name strips the space
    assert(s.fieldNames.toSeq == Seq("ninoano", "desc"))
  }

  test("coerce: bad words → NULL, timestamps parsed, longs cast") {
    val df = Seq(
      ("2023-01-05 10:30:00", "42", "nan"),
      ("nan", "NaT", "x")
    ).toDF("ts", "n", "s")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("n", LongType),
      StructField("s", StringType)))
    val out = SchemaInference.coerce(df, schema).collect()
    assert(out(0).getTimestamp(0).toString == "2023-01-05 10:30:00.0")
    assert(out(0).getLong(1) == 42L)
    assert(out(0).isNullAt(2))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(1).getString(2) == "x")
  }
}
