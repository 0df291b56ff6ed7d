package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: derive an N×-scale dataset from an existing sf directory for
  * scale sweeps (`ScaleUp <srcDir> <dstDir> <factor>`), since the driver
  * generates testdata only up to sf0.1. NOT part of the library surface and
  * never an oracle input — correctness stays pinned to the driver's data;
  * this exists purely to surface skew/memory cliffs that sub-second
  * sf0.1 queries hide (VERDICT r4 next-round #9).
  *
  * Scaling rules (TPC-H convention: facts scale, region/nation don't):
  *  - every scaled table gets `factor` replicas; primary/foreign keys are
  *    offset per replica by the entity's own key range so join
  *    cardinalities per key match the source exactly (an order still has
  *    the same lineitems, a user the same events);
  *  - `documents.text` is re-tokenized per replica (`word_r{i}`) so
  *    near-dup/shingle workloads scale LINEARLY: replicas are textually
  *    unrelated, duplicate clusters keep their source-scale size instead
  *    of becoming factor-sized cliques with quadratic pair growth;
  *  - `embeddings.embedding` is dimension-rotated per replica — norms and
  *    coordinate distributions are preserved but cross-replica cosine is
  *    decorrelated, for the same linear-scaling reason.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the 2026-08 testdata regen switched events.ts from TIMESTAMP(NANOS)
      // to TIMESTAMP(MICROS, isAdjustedToUTC=false); without this, Spark
      // infers TIMESTAMP_NTZ and unix_micros()-based operators stop
      // resolving. Reading it as LTZ epoch-micros matches the DuckDB
      // oracle's naive-micros view under the UTC session tz.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factor)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def load(t: String): DataFrame = graft.Tables.load(spark, src, t)
    // Scaled tables repartition before write: the source sf files are a
    // couple of input splits, and writing replicas straight through would
    // produce 1-2 giant part files — every downstream scan then runs on
    // 1-2 cores and the sweep measures file layout, not the queries (the
    // first sf1 run burned 7 min single-threaded on exactly this).
    val outParts = math.max(32, factor * 4)
    def save(t: String)(df: DataFrame): Unit =
      df.repartition(outParts).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def saveSmall(t: String)(df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // Key offset = source key range per replica — replica r's key k maps to
    // k + r*span, so replicas never collide and FK targets stay aligned.
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect()(0).getLong(0) + 1L

    val cust = load("customer"); val custSpan = span(cust, "c_custkey")
    val supp = load("supplier"); val suppSpan = span(supp, "s_suppkey")
    val part = load("part"); val partSpan = span(part, "p_partkey")
    val ord = load("orders"); val ordSpan = span(ord, "o_orderkey")
    val ev = load("events"); val evSpan = span(ev, "event_id")
    val userSpan = span(ev, "user_id")
    val doc = load("documents"); val docSpan = span(doc, "doc_id")
    val emb = load("embeddings"); val vecSpan = span(emb, "vec_id")

    // One narrow pass per table: explode a replica index, then shift keys.
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("__r", explode(sequence(lit(0), lit(factor - 1))))
    def shifted(c: String, s: Long) = (col(c) + col("__r") * s).as(c)

    saveSmall("region")(load("region"))
    saveSmall("nation")(load("nation"))

    save("customer")(replicate(cust).select(
      shifted("c_custkey", custSpan), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")))

    save("supplier")(replicate(supp).select(
      shifted("s_suppkey", suppSpan), col("s_name"), col("s_nationkey"),
      col("s_acctbal")))

    save("part")(replicate(part).select(
      shifted("p_partkey", partSpan), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))

    save("orders")(replicate(ord).select(
      shifted("o_orderkey", ordSpan), shifted("o_custkey", custSpan),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))

    save("lineitem")(replicate(load("lineitem")).select(
      shifted("l_orderkey", ordSpan), shifted("l_partkey", partSpan),
      shifted("l_suppkey", suppSpan), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))

    save("events")(replicate(ev).select(
      shifted("event_id", evSpan), col("ts"), shifted("user_id", userSpan),
      col("event_type"), col("value"), col("props")))

    // Replica r ≠ 0 rewrites every token so shingle sets across replicas
    // are disjoint — duplicate clusters stay source-sized.
    val scaledText = when(col("__r") === 0, col("text")).otherwise(
      array_join(
        transform(split(col("text"), " "),
          w => concat(w, lit("_r"), col("__r"))), " "))
    save("documents")(replicate(doc).select(
      shifted("doc_id", docSpan), scaledText.as("text"), col("lang"),
      col("source"), length(scaledText).cast("long").as("n_chars")))

    // Rotate dimensions by 7*r (mod d): norm-preserving, distribution-
    // preserving, cosine-decorrelating across replicas.
    val d = emb.select(size(col("embedding"))).first().getInt(0)
    val rotated = when(col("__r") === 0, col("embedding")).otherwise(
      transform(sequence(lit(0), lit(d - 1)),
        i => element_at(col("embedding"), ((i + col("__r") * 7) % d) + 1)))
    save("embeddings")(replicate(emb).select(
      shifted("vec_id", vecSpan), rotated.as("embedding"), col("label")))
  }
}
