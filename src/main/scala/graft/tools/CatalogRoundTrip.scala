package graft.tools

import graft.Graft

/** Catalog-durability demonstrator ≡ the reference's restart-surviving
  * catalog (Postgres holds `info.files` + schemas across container
  * restarts, reference assets.py:393-425): phase `create` writes a managed
  * table through a persistent Hive-on-Derby metastore
  * (`Graft.session(warehouse=…)`), phase `read` starts a FRESH process and
  * reads it back by name — metadata must come from the metastore, not from
  * anything in-memory.
  *
  * Run as two separate JVMs (CatalogPersistenceSpec does exactly that via
  * dev/run.sh): `CatalogRoundTrip create <warehouseDir>` then
  * `CatalogRoundTrip read <warehouseDir>`.
  */
object CatalogRoundTrip {
  val Table = "info.catalog_roundtrip"

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CatalogRoundTrip <create|read> <warehouseDir>")
    val Array(phase, wh) = args
    val spark = Graft.session(
      master = Some("local[2]"), appName = s"catalog-$phase", warehouse = Some(wh))
    try phase match {
      case "create" =>
        spark.sql("CREATE DATABASE IF NOT EXISTS info")
        spark.range(5).selectExpr("id", "id * 2 AS v")
          .write.mode("overwrite").saveAsTable(Table)
        println(s"CATALOG_ROUNDTRIP_CREATED=$Table")
      case "read" =>
        val n = spark.table(Table).count()
        val sum = spark.table(Table).selectExpr("sum(v)").collect()(0).getLong(0)
        println(s"CATALOG_ROUNDTRIP_COUNT=$n")
        println(s"CATALOG_ROUNDTRIP_SUM=$sum")
      case other => sys.error(s"unknown phase: $other")
    } finally spark.stop()
  }
}
