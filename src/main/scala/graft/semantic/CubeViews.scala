package graft.semantic

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface exposure of the semantic layer ≡ the reference's cube.dev
  * SQL port persona (conf/cube/.env:9-11 exposed the cube schemas over a
  * pg-wire SQL port next to the REST API; the service was removed from the
  * reference's compose file but the schemas remain its semantic contract).
  * Each cube registers as a session view named after itself, rendering
  * [all measures] × [string dims, time dims at `grain`] — so any client of
  * the existing thrift/JDBC endpoint ([[graft.tools.SqlEndpoint]]) can
  * `SELECT ... FROM events_cube` with no new protocol work, and further
  * roll up in SQL (count/sum/min/max measures stay composable; avg does
  * not — standard rollup semantics).
  *
  * Views are DataFrame-backed GLOBAL temp views over the SAME rendered
  * plan the Scala API produces ([[CubeDef.query]]): a JDBC dashboard query
  * gets identical Catalyst treatment (pre-aggregation routing, broadcasts,
  * AQE) to the in-process caller. Global (not session) scope matters
  * because the thrift server forks a NEW session per JDBC connection —
  * session temp views would be invisible to every client; global temp
  * views live in the JVM-wide `global_temp` database every forked session
  * resolves, without writing view SQL into a metastore that may not exist.
  *
  * Scale note: registration is metadata-only (no job runs until a client
  * SELECTs); each view's plan is the cube rendering itself, so serving
  * cost equals the hand-written aggregate — one scan (or the rollup table
  * scan when a [[PreAggregation]] serves it).
  */
object CubeViews {

  /** The reference's three first-party cubes. */
  val all: Seq[CubeDef] = Seq(
    ReferenceCubes.eventsCube,
    ReferenceCubes.eventsMonthly,
    ReferenceCubes.eventsPrediction)

  /** Register `cubes` as global temp views — reachable from ANY session
    * in the JVM (JDBC clients included) as `global_temp.<cube name>`.
    * Returns the qualified names actually registered. A cube whose base
    * tables don't resolve in this session (e.g. `events_monthly` before
    * its rollup materializes) is skipped, not failed — session init
    * shouldn't die because one optional rollup is absent yet.
    *
    * @param resolve table name → DataFrame; defaults to the session
    *                catalog (`spark.table`), so catalog-registered tables
    *                — managed, commitlog, or temp views — all work.
    * @param grain   granularity for time dimensions in the view rendering.
    */
  def register(
      spark: SparkSession,
      cubes: Seq[CubeDef] = all,
      resolve: Option[String => DataFrame] = None,
      grain: String = "day"): Seq[String] = {
    val r = resolve.getOrElse((n: String) => spark.table(n))
    cubes.flatMap { c =>
      val dims = c.dimensions.map(d =>
        d.name -> (if (d.typ == "time") Some(grain) else None))
      scala.util.Try {
        c.query(r, c.measures.map(_.name), dims)
          .createOrReplaceGlobalTempView(c.name)
        s"global_temp.${c.name}"
      }.toOption
    }
  }
}
