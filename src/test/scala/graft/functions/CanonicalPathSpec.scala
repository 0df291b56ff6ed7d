package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** canonical_path must be byte-identical to the SQL chain it replaced
  * (`url_decode(regexp_replace(regexp_replace(p, "^file:/+", "/"),
  * "\\+", "%2B"))`) — the deletion-vector tag join compares its output
  * against driver-side java.nio path strings.
  */
class CanonicalPathSpec extends SparkTestBase {

  test("matches the url_decode/regexp chain on representative paths") {
    import spark.implicits._
    val paths = Seq(
      "file:/root/t/data/x.parquet",
      "file:///root/t/data/x.parquet",
      "file:/root/t/__gp_etype=big%20sale/part-0.parquet",
      "file:/root/t/a%2Bb/part-0.parquet", // literal '+' in the dir name
      "file:/root/t/plus+name/part-0.parquet", // raw '+' passes through
      "file:/root/t/uni%C3%A9/part-0.parquet", // UTF-8 multi-byte escape
      "/already/raw/path.parquet",
      "s3://bucket/key%20x.parquet")
    val df = paths.toDF("p")
    val out = df.select(
      org.apache.spark.sql.GraftBridge.column(
        CanonicalPath(org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute(Seq("p")))).as("native"),
      url_decode(regexp_replace(
        regexp_replace(col("p"), "^file:/+", "/"), "\\+", "%2B")).as("sql"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("last-value cache returns stable results across repeated rows") {
    import spark.implicits._
    // many rows per distinct path exercises the cache-hit path
    val df = (1 to 1000).map(i =>
      s"file:/root/t/__gp_k=v%20${i % 3}/part.parquet").toDF("p")
    val outs = df.select(org.apache.spark.sql.GraftBridge.column(
        CanonicalPath(org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute(Seq("p")))).as("c"))
      .collect().map(_.getString(0)).distinct.sorted
    assert(outs.toSeq == Seq(
      "/root/t/__gp_k=v 0/part.parquet",
      "/root/t/__gp_k=v 1/part.parquet",
      "/root/t/__gp_k=v 2/part.parquet"))
  }
}
