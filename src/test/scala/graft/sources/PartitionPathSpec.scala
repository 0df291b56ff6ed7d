package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The transform-partition tuple round-trips through the WRITER's own
  * path escaping: partition values recorded in `__gp_<key>=<value>`
  * directory names are decoded by [[CommitLog.partitionsFromPath]], and
  * the encoder is Spark's `ExternalCatalogUtils.escapePathName` (what the
  * parquet partition writer actually uses). A decoder that drifts from
  * the real escaper silently mis-keys OPTIMIZE's partition grouping and
  * the bucket/truncate pruning probes — so the inverse property is
  * machine-checked over adversarial strings, not just eyeballed.
  */
class PartitionPathSpec extends AnyFunSuite {

  private def esc(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  private def parse(rel: String): Map[String, String] =
    CommitLog.partitionsFromPath(rel)

  test("decode inverts the writer's escaping for printable values") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '%', '=', '/', ':', '#', '+', '.',
        '-', '_', '\'', '"', '(', ')', 'ñ', 'é', '中'))).map(_.mkString)
    check(Prop.forAllNoShrink(gen) { v =>
      v.isEmpty || { // empty goes to the default partition, not a value
        val rel = s"data/u1/__gp_days_ts=${esc(v)}/part-0.parquet"
        parse(rel) == Map("days_ts" -> v)
      }
    })
  }

  test("multiple segments parse in order with distinct keys") {
    val rel = "data/u1/__gp_days_ts=2026-08-14/__gp_bucket_8_id=3/part-0.parquet"
    assert(parse(rel) == Map("days_ts" -> "2026-08-14", "bucket_8_id" -> "3"))
  }

  test("special directory shapes never crash the parser") {
    for (rel <- Seq(
      "data/u1/part-0.parquet", // unpartitioned
      "data/u1/__gp_k=__HIVE_DEFAULT_PARTITION__/part-0.parquet",
      "data/u1/__gp_k=%ZZ/part-0.parquet", // broken escape: pass through
      "data/u1/__gp_k=/part-0.parquet", // empty value
      "__gp_k=v" // degenerate relative path
    )) parse(rel) // must not throw
    assert(parse("data/u1/__gp_k=%ZZ/part-0.parquet")("k") == "%ZZ")
    assert(parse("data/u1/__gp_k=a%20b/part-0.parquet")("k") == "a b")
  }
}
