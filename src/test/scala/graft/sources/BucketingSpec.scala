package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class BucketingSpec extends SparkTestBase {

  test("co-bucketed tables join without a shuffle exchange") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val ord = Tables.load(spark, sf0001, "orders")
    Bucketing.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), buckets = 4)
    Bucketing.writeBucketed(ord, "b_orders", Seq("o_orderkey"), buckets = 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      // the join itself is shuffle-free: the only exchange allowed is the
      // post-join groupBy on a different key
      val plan = joined.queryExecution.executedPlan.toString
      val joinSide = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinSide.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      // and it computes the same result as the unbucketed join
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)

      // pure per-bucket aggregation on the bucket key is fully shuffle-free
      val perKey = spark.table("b_lineitem").groupBy("l_orderkey").count()
      assert(Bucketing.isShuffleFree(perKey),
        perKey.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE b_lineitem")
      spark.sql("DROP TABLE b_orders")
    }
  }
}
