package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — contents change per investigation, never library
  * surface. Current probe: per-phase cost of the q94 IVFADC chain at
  * sf0.1 (r14 optimization round — where do its seconds actually go?).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scratch")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SCRATCH_AQE","true"))
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("scratch-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // job-level timing: expose where wall-clock goes (executor jobs vs
    // driver-side gaps between them)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, System.nanoTime())
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(je.jobId)
          val _ = t0
        }
      })

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.DataFrame
    // q94 variant: persist() (lazy) on shared frames instead of eager localCheckpoint
    def q94persist(e: DataFrame): DataFrame = {
      val vq = e
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("vq", floor(col("x").cast("double") * 1000000.0).cast("long"))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("vq"))
        .repartition(col("vec_id"))
        .persist()
      val cseeds = vq.filter(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("pos"), col("vq").as("cq"))
      def cdist(cents: DataFrame): DataFrame =
        vq.join(broadcast(cents), Seq("pos"))
          .withColumn("d2", (col("vq") - col("cq")) * (col("vq") - col("cq")))
          .groupBy(col("vec_id"), col("cid")).agg(sum(col("d2")).as("dist"))
      def cargmin(d: DataFrame): DataFrame = d
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
      val cc1 = vq.join(cargmin(cdist(cseeds)), Seq("vec_id"))
        .groupBy(col("cid"), col("pos"))
        .agg(expr("sum(vq) div count(1)").as("cq"))
        .persist()
      val cd2 = cdist(cc1).persist()
      val cassign = cargmin(cd2).persist()
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      val probes = cd2.filter(col("vec_id") < 10)
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("vec_id").as("q_id"), col("cid"))
      val rvq = vq.join(cassign, Seq("vec_id"))
        .join(broadcast(cc1), Seq("cid", "pos"))
        .select(col("vec_id"), expr("pos div 8").as("sub"), col("pos"),
          (col("vq") - col("cq")).as("rq"))
        .persist()
      val pseeds = rvq.filter(col("vec_id") < 16)
        .select(col("sub"), col("vec_id").as("pcid"), col("pos"), col("rq").as("pcq"))
      def pdist(cents: DataFrame): DataFrame =
        rvq.join(broadcast(cents), Seq("sub", "pos"))
          .withColumn("d2", (col("rq") - col("pcq")) * (col("rq") - col("pcq")))
          .groupBy(col("vec_id"), col("sub"), col("pcid"))
          .agg(sum(col("d2")).as("dist"))
      def pargmin(d: DataFrame): DataFrame = d
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("dist"), col("pcid"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.pcid").as("pcid"))
      val pc1 = rvq.join(pargmin(pdist(pseeds)), Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("pcid"), col("pos"))
        .agg(expr("sum(rq) div count(1)").as("pcq"))
        .persist()
      val codes = pargmin(pdist(pc1))
      val qrv = vq.filter(col("vec_id") < 10)
        .withColumnRenamed("vec_id", "q_id")
        .join(probes, Seq("q_id"))
        .join(broadcast(cc1), Seq("cid", "pos"))
        .select(col("q_id"), col("cid"), expr("pos div 8").as("sub"), col("pos"),
          (col("vq") - col("cq")).as("qr"))
      val dtab = qrv.join(broadcast(pc1), Seq("sub", "pos"))
        .withColumn("d2", (col("qr") - col("pcq")) * (col("qr") - col("pcq")))
        .groupBy(col("q_id"), col("cid"), col("sub"), col("pcid"))
        .agg(sum(col("d2")).as("dist"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("adist_q"), col("c_id"))
      codes.join(cassign, Seq("vec_id"))
        .join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(dtab), Seq("q_id", "cid", "sub", "pcid"))
        .groupBy(col("q_id"), col("vec_id"), col("cid"))
        .agg(sum(col("dist")).as("adist_q"))
        .select(col("q_id"), col("vec_id").as("c_id"), col("cid"), col("adist_q"))
        .withColumn("rnk", row_number().over(wTop).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    }
    def q94hybrid(e: DataFrame): DataFrame = {
      val vq = e
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("vq", floor(col("x").cast("double") * 1000000.0).cast("long"))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("vq"))
        .repartition(col("vec_id"))
        .localCheckpoint()
      val cseeds = vq.filter(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("pos"), col("vq").as("cq"))
      def cdist(cents: DataFrame): DataFrame =
        vq.join(broadcast(cents), Seq("pos"))
          .withColumn("d2", (col("vq") - col("cq")) * (col("vq") - col("cq")))
          .groupBy(col("vec_id"), col("cid")).agg(sum(col("d2")).as("dist"))
      def cargmin(d: DataFrame): DataFrame = d
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
      val cc1 = vq.join(cargmin(cdist(cseeds)), Seq("vec_id"))
        .groupBy(col("cid"), col("pos"))
        .agg(expr("sum(vq) div count(1)").as("cq"))
        .persist()
      val cd2 = cdist(cc1).persist()
      val cassign = cargmin(cd2).persist()
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      val probes = cd2.filter(col("vec_id") < 10)
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("vec_id").as("q_id"), col("cid"))
      val rvq = vq.join(cassign, Seq("vec_id"))
        .join(broadcast(cc1), Seq("cid", "pos"))
        .select(col("vec_id"), expr("pos div 8").as("sub"), col("pos"),
          (col("vq") - col("cq")).as("rq"))
        .persist()
      val pseeds = rvq.filter(col("vec_id") < 16)
        .select(col("sub"), col("vec_id").as("pcid"), col("pos"), col("rq").as("pcq"))
      def pdist(cents: DataFrame): DataFrame =
        rvq.join(broadcast(cents), Seq("sub", "pos"))
          .withColumn("d2", (col("rq") - col("pcq")) * (col("rq") - col("pcq")))
          .groupBy(col("vec_id"), col("sub"), col("pcid"))
          .agg(sum(col("d2")).as("dist"))
      def pargmin(d: DataFrame): DataFrame = d
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("dist"), col("pcid"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.pcid").as("pcid"))
      val pc1 = rvq.join(pargmin(pdist(pseeds)), Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("pcid"), col("pos"))
        .agg(expr("sum(rq) div count(1)").as("pcq"))
        .persist()
      val codes = pargmin(pdist(pc1))
      val qrv = vq.filter(col("vec_id") < 10)
        .withColumnRenamed("vec_id", "q_id")
        .join(probes, Seq("q_id"))
        .join(broadcast(cc1), Seq("cid", "pos"))
        .select(col("q_id"), col("cid"), expr("pos div 8").as("sub"), col("pos"),
          (col("vq") - col("cq")).as("qr"))
      val dtab = qrv.join(broadcast(pc1), Seq("sub", "pos"))
        .withColumn("d2", (col("qr") - col("pcq")) * (col("qr") - col("pcq")))
        .groupBy(col("q_id"), col("cid"), col("sub"), col("pcid"))
        .agg(sum(col("d2")).as("dist"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("adist_q"), col("c_id"))
      codes.join(cassign, Seq("vec_id"))
        .join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(dtab), Seq("q_id", "cid", "sub", "pcid"))
        .groupBy(col("q_id"), col("vec_id"), col("cid"))
        .agg(sum(col("dist")).as("adist_q"))
        .select(col("q_id"), col("vec_id").as("c_id"), col("cid"), col("adist_q"))
        .withColumn("rnk", row_number().over(wTop).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    }
    def q94lazy(e: DataFrame): DataFrame = {
      val vq = e
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("vq", floor(col("x").cast("double") * 1000000.0).cast("long"))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("vq"))
        .repartition(col("vec_id"))
        
      val cseeds = vq.filter(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("pos"), col("vq").as("cq"))
      def cdist(cents: DataFrame): DataFrame =
        vq.join(broadcast(cents), Seq("pos"))
          .withColumn("d2", (col("vq") - col("cq")) * (col("vq") - col("cq")))
          .groupBy(col("vec_id"), col("cid")).agg(sum(col("d2")).as("dist"))
      def cargmin(d: DataFrame): DataFrame = d
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
      val cc1 = vq.join(cargmin(cdist(cseeds)), Seq("vec_id"))
        .groupBy(col("cid"), col("pos"))
        .agg(expr("sum(vq) div count(1)").as("cq"))
        
      val cd2 = cdist(cc1)
      val cassign = cargmin(cd2)
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      val probes = cd2.filter(col("vec_id") < 10)
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("vec_id").as("q_id"), col("cid"))
      val rvq = vq.join(cassign, Seq("vec_id"))
        .join(broadcast(cc1), Seq("cid", "pos"))
        .select(col("vec_id"), expr("pos div 8").as("sub"), col("pos"),
          (col("vq") - col("cq")).as("rq"))
        
      val pseeds = rvq.filter(col("vec_id") < 16)
        .select(col("sub"), col("vec_id").as("pcid"), col("pos"), col("rq").as("pcq"))
      def pdist(cents: DataFrame): DataFrame =
        rvq.join(broadcast(cents), Seq("sub", "pos"))
          .withColumn("d2", (col("rq") - col("pcq")) * (col("rq") - col("pcq")))
          .groupBy(col("vec_id"), col("sub"), col("pcid"))
          .agg(sum(col("d2")).as("dist"))
      def pargmin(d: DataFrame): DataFrame = d
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("dist"), col("pcid"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.pcid").as("pcid"))
      val pc1 = rvq.join(pargmin(pdist(pseeds)), Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("pcid"), col("pos"))
        .agg(expr("sum(rq) div count(1)").as("pcq"))
        
      val codes = pargmin(pdist(pc1))
      val qrv = vq.filter(col("vec_id") < 10)
        .withColumnRenamed("vec_id", "q_id")
        .join(probes, Seq("q_id"))
        .join(broadcast(cc1), Seq("cid", "pos"))
        .select(col("q_id"), col("cid"), expr("pos div 8").as("sub"), col("pos"),
          (col("vq") - col("cq")).as("qr"))
      val dtab = qrv.join(broadcast(pc1), Seq("sub", "pos"))
        .withColumn("d2", (col("qr") - col("pcq")) * (col("qr") - col("pcq")))
        .groupBy(col("q_id"), col("cid"), col("sub"), col("pcid"))
        .agg(sum(col("d2")).as("dist"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("adist_q"), col("c_id"))
      codes.join(cassign, Seq("vec_id"))
        .join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(dtab), Seq("q_id", "cid", "sub", "pcid"))
        .groupBy(col("q_id"), col("vec_id"), col("cid"))
        .agg(sum(col("dist")).as("adist_q"))
        .select(col("q_id"), col("vec_id").as("c_id"), col("cid"), col("adist_q"))
        .withColumn("rnk", row_number().over(wTop).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    }
    // warmup both
    q94persist(graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")).count()
    spark.catalog.clearCache()
    q94lazy(graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")).count()
    q94hybrid(graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    graft.SparkEntry.queries("q94_ann_ivfadc")(spark, "/root/testdata/sf0.001").count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    val e = graft.Tables.load(spark, dir, "embeddings")
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      t("q94 persist-variant") { q94persist(e).count(); spark.catalog.clearCache() }
      t("q94 lazy-variant") { q94lazy(e).count() }
      t("q94 hybrid-variant") { q94hybrid(e).count(); spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false)) }
      t("q94 checkpoint-variant") {
        graft.SparkEntry.queries("q94_ann_ivfadc")(spark, dir).count()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false)) }
    }
    spark.stop()
    sys.exit(0)
  }
}
