package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table access for the graft engine.
  *
  * Design targets a multi-executor cluster (the reference stack is a
  * single-node Trino/Postgres compose, see /root/reference
  * trino/conf/trino/config.properties:1-2); every knob here is chosen so the
  * same code runs unchanged on local[32] and on a 1000-executor cluster:
  * AQE owns runtime partition coalescing / skew splitting, shuffle
  * partitions are a starting hint only, and broadcast joins are left to
  * Catalyst with an explicit threshold.
  */
object Graft {

  /** Build a tuned SparkSession. `master` is only set if the caller asks —
    * under spark-submit the cluster manager decides.
    *
    * `warehouse` switches on a PERSISTENT catalog (Hive metastore on Derby,
    * colocated with the warehouse dir): table metadata then survives process
    * restarts, matching the reference where Postgres holds both data and
    * catalog (assets.py:393-425). Without it the default in-memory catalog
    * applies — fine for read-only analytics over parquet paths.
    */
  def session(
      master: Option[String] = None,
      appName: String = "graft",
      warehouse: Option[String] = None): SparkSession = {
    val b = SparkSession
      .builder()
      .appName(appName)
    warehouse.foreach { w =>
      // keep Derby's log beside the metastore, not in the process CWD
      if (System.getProperty("derby.stream.error.file") == null)
        System.setProperty("derby.stream.error.file", s"$w/../derby.log")
      b.config("spark.sql.warehouse.dir", w)
        .config("spark.sql.catalogImplementation", "hive")
        .config("javax.jdo.option.ConnectionURL",
          s"jdbc:derby:;databaseName=$w/../graft_metastore_db;create=true")
        .enableHiveSupport()
    }
    b
      // Full extension surface: custom expressions/aggregates, the SQL DML
      // rewrite for commitlog tables, and time-travel syntax.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // AQE: runtime coalescing, skew-join splitting, runtime join demotion.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Starting hint; AQE coalesces down, scales up with cluster size.
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // The synthetic events table carries TIMESTAMP(NANOS) parquet, which
      // Spark rejects by default; read as long and normalize in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the 2026-08 testdata regen switched events.ts from TIMESTAMP(NANOS)
      // to TIMESTAMP(MICROS, isAdjustedToUTC=false); without this, Spark
      // infers TIMESTAMP_NTZ and unix_micros()-based operators stop
      // resolving. Reading it as LTZ epoch-micros matches the DuckDB
      // oracle's naive-micros view under the UTC session tz.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    master.foreach(b.master)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Local test/bench session. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    session(Some(s"local[$cores]"))
}

/** Readers over the driver-generated synthetic corpus (TESTDATA.md): one
  * parquet file per table under a scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) (sub-microsecond parts are zero
    // in the corpus); with nanosAsLong it arrives as LongType nanos.
    // Integer `div` (not `/`) — double division loses precision above 2^53.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Scale-gated fan-out for compute-heavy derivations (r15, guide §2.5):
    * a small corpus arrives as ONE parquet split (and an AQE-coalescible
    * keyed repartition folds back to one partition — AQE sizes by BYTES
    * and is blind to per-row compute like shingling or O(n·k) distance
    * loops), so the heavy stage runs on a single task. Repartition to an
    * EXPLICIT core-count partition count — which AQE respects — but only
    * when the frame has fewer partitions than that: at cluster scale a
    * big scan already carries more splits than cores and this is a no-op,
    * so the shuffle is only ever paid on KB/MB-scale inputs. Values are
    * partitioning-independent everywhere this is used (deterministic
    * aggregates / explicitly ordered output), so results are unchanged.
    */
  def fanOut(spark: SparkSession, df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val want = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df
    else df.repartition(want, key)
  }
}
