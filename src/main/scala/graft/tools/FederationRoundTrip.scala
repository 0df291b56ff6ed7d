package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child-JVM federation round trip (the TlsEndpointRoundTrip pattern:
  * HiveThriftServer2 binds once per JVM, and the plaintext
  * SqlEndpointSpec owns the test JVM's server — so the federated-read
  * battery runs here and [[graft.sources.interop.JdbcFederationSpec]]
  * asserts the printed markers). Proves, against a REAL socket:
  * dialect-correct schema resolution, predicate + projection pushdown
  * into the remote scan, the partitioned parallel fetch, and a
  * remote⋈local join equal to the all-local answer.
  */
object FederationRoundTrip {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("federation-roundtrip")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("fed-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // a failure must still EXIT: pooled HiveServer2 sessions pin
    // non-daemon handler threads, so an exception that escapes main would
    // otherwise leave the JVM alive forever (DestroyJavaVM waits) and the
    // parent spec blocked on our stdout
    try runBattery(spark)
    catch {
      case t: Throwable =>
        t.printStackTrace()
        sys.exit(1)
    }
    sys.exit(0) // HiveServer2 leaves non-daemon threads behind
  }

  private def runBattery(spark: SparkSession): Unit = {
    import graft.sources.{CatalogOps, CommitLog}
    val root = java.nio.file.Files.createTempDirectory("graft-fed").toString
    val local = spark.range(100).selectExpr("id AS k",
      "CAST(id % 7 AS BIGINT) AS g", "CAST(id AS STRING) AS s")
    CommitLog.append(local, root)
    CatalogOps.createCommitLogTable(spark, "feddb", "t", root)
    val (port, server) = SqlEndpoint.start(spark)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      var conn: java.sql.Connection = null
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (conn == null && System.nanoTime() < deadline) {
        try conn = java.sql.DriverManager.getConnection(url, "anonymous", "")
        catch { case _: Exception => Thread.sleep(300) }
      }
      require(conn != null, "thrift endpoint never came up")
      conn.close()

      val remote = graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.t")
      require(remote.schema.fieldNames.toSeq == Seq("k", "g", "s"),
        remote.schema.treeString)
      require(remote.count() == 100)
      println("FED_SCHEMA=OK")

      val filtered = remote.filter(col("g") === 3).select("k")
      val plan = filtered.queryExecution.executedPlan.toString
      require(plan.contains("PushedFilters") && plan.contains("EqualTo(g,3)"),
        plan)
      require(plan.contains("ReadSchema: struct<k:bigint>"), plan)
      require(filtered.count() == local.filter(col("g") === 3).count())
      println("FED_PUSHDOWN=OK")

      val part = graft.sources.interop.JdbcFederation.readTable(spark, url,
        "feddb.t", partitionColumn = Some("k"), lowerBound = 0,
        upperBound = 100, numPartitions = 3)
      require(part.queryExecution.executedPlan.toString
        .contains("numPartitions=3"))
      require(part.count() == 100)
      println("FED_PARTITIONED=OK")

      val dim = spark.range(7).selectExpr("id AS g",
        "CAST(id * 11 AS BIGINT) AS w")
      val fed = remote.join(dim, "g").agg(sum(expr("k * w"))).collect()
      val all = local.join(dim, "g").agg(sum(expr("k * w"))).collect()
      require(fed.map(_.getLong(0)).toSeq == all.map(_.getLong(0)).toSeq)
      println("FED_JOIN=OK")

      // ---- federated WRITE: CREATE + batched literal INSERTs through
      // the wire, then read back remote ≡ local (mixed types incl. a
      // string with quote/backslash, a null, a decimal, a timestamp)
      val wsrc = spark.range(50).selectExpr("id AS k",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('v''\\\\', id) END AS s",
        "CAST(id AS DOUBLE) / 7 AS d",
        "CAST(id AS DECIMAL(12,3)) / 3 AS m",
        "timestamp'2026-01-02 03:04:05' + make_interval(0,0,0,0,0,0,id) AS ts",
        "id % 2 = 0 AS b")
      graft.sources.interop.JdbcFederation.writeTable(
        wsrc, url, "feddb.w", overwrite = true, batchRows = 16)
      val wBack = graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.w")
      require(wBack.count() == 50)
      val lo = wsrc.orderBy("k").collect().toSeq
      val re = wBack.orderBy("k").collect().toSeq
      require(lo == re, s"write round trip diverged:\n${lo.take(3)}\nvs\n${re.take(3)}")
      // idempotent re-create + append persona: a second write without
      // overwrite APPENDS (per-statement semantics, like the Trino
      // connector)
      graft.sources.interop.JdbcFederation.writeTable(
        wsrc.limit(5), url, "feddb.w")
      require(graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.w").count() == 55)
      println("FED_WRITE=OK")

      // ---- ATOMIC write: a mid-stream failure must leave the target
      // either untouched or complete (staging-table pattern); the stage
      // itself must not leak
      def stageCount(): Int = {
        val c = java.sql.DriverManager.getConnection(url, "anonymous", "")
        try {
          val rs = c.createStatement()
            .executeQuery("SHOW TABLES IN feddb LIKE '*graft_stage*'")
          var n = 0
          while (rs.next()) n += 1
          n
        } finally c.close()
      }
      val poison = udf((id: Long) =>
        if (id == 49L) throw new RuntimeException("mid-stream failure")
        else id)
      val failing = wsrc.withColumn("k", poison(col("k")))
      val beforeRows = graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.w").orderBy("k").collect().toSeq
      val failed =
        try {
          graft.sources.interop.JdbcFederation.writeTable(failing, url,
            "feddb.w", overwrite = true, batchRows = 16, atomic = true)
          false
        } catch { case _: Exception => true }
      require(failed, "poisoned atomic write was expected to fail")
      val afterFail = graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.w").orderBy("k").collect().toSeq
      require(afterFail == beforeRows,
        "failed atomic overwrite must leave the target byte-identical")
      require(stageCount() == 0, "failed atomic write leaked a stage table")
      // successful atomic overwrite swaps the complete stage in
      graft.sources.interop.JdbcFederation.writeTable(wsrc, url, "feddb.w",
        overwrite = true, batchRows = 16, atomic = true)
      require(graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.w").orderBy("k").collect().toSeq ==
        wsrc.orderBy("k").collect().toSeq,
        "atomic overwrite round trip diverged")
      // atomic append: one remote INSERT…SELECT from the complete stage
      graft.sources.interop.JdbcFederation.writeTable(wsrc.limit(5), url,
        "feddb.w", atomic = true)
      require(graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.w").count() == 55)
      // failed atomic append: target keeps exactly its pre-write rows
      val failedAppend =
        try {
          graft.sources.interop.JdbcFederation.writeTable(failing, url,
            "feddb.w", batchRows = 16, atomic = true)
          false
        } catch { case _: Exception => true }
      require(failedAppend)
      require(graft.sources.interop.JdbcFederation
        .readTable(spark, url, "feddb.w").count() == 55,
        "failed atomic append must not leave a prefix")
      require(stageCount() == 0, "failed atomic append leaked a stage table")
      println("FED_ATOMIC=OK")

      // ---- DSv2 JDBC catalog: aggregates PUSH DOWN to the remote side
      graft.sources.interop.JdbcFederation.registerCatalog(
        spark, "fedcat", url)
      val agg = spark.sql(
        "SELECT g, count(*) AS n, sum(k) AS sk, max(k) AS mk " +
          "FROM fedcat.feddb.t GROUP BY g")
      // AQE prints a placeholder until execution — the formatted explain
      // shows the V2 scan's pushdown info either way
      val aplan = agg.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      require(aplan.contains("PushedAggregates"), aplan)
      require(aplan.contains("COUNT") && aplan.contains("SUM"), aplan)
      val aLocal = local.groupBy("g").agg(count(lit(1)).as("n"),
        sum("k").as("sk"), max("k").as("mk"))
      require(agg.orderBy("g").collect().toSeq ==
        aLocal.orderBy("g").collect().toSeq)
      println("FED_AGG_PUSHDOWN=OK")
    } finally server.stop()
    spark.stop()
  }
}
