package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native NFC expression: composition correctness, the zero-copy
  * fast path for already-normalized text, null passthrough, and SQL
  * callability.
  */
class NfcNormalizeSpec extends SparkTestBase {

  test("composes decomposed sequences, passes normalized text through, " +
      "keeps nulls, callable from SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "éclat"), // decomposed é
      (3L, "éclat"), // already composed
      (4L, "Å"), // A + ring → Å
      (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = rows.selectExpr("id", "nfc_normalize(t) AS n",
        "length(t) AS l1", "length(nfc_normalize(t)) AS l2")
      .orderBy("id").collect()
    assert(got(0).getString(1) == "plain ascii" && got(0).getInt(2) == 11
      && got(0).getInt(3) == 11)
    assert(got(1).getString(1) == "éclat" && got(1).getInt(2) == 6
      && got(1).getInt(3) == 5)
    assert(got(2).getString(1) == "éclat")
    assert(got(3).getString(1) == "\u00C5")
    assert(got(4).isNullAt(1))
    // matches java.text.Normalizer on a messy mixed string
    val messy = "ñö é 😀 ascii"
    val g = Seq(Tuple1(messy)).toDF("t")
      .selectExpr("nfc_normalize(t)").collect()(0).getString(0)
    assert(g == java.text.Normalizer.normalize(messy,
      java.text.Normalizer.Form.NFC))
  }
}
