package graft.sources

import scala.collection.concurrent.TrieMap

/** Session registry of incremental materialized views (see
  * [[IncrementalView]]) keyed by the view root — what lets the
  * [[graft.plans.MvRewrite]] optimizer rule reroute an aggregate over the
  * BASE table to the (group-cardinality-sized) view.
  *
  * Each view's identity — source root, grouping columns, measure column,
  * and the source version the view reflects — is also persisted in the
  * view table's own properties (`mv.src` / `mv.group` / `mv.value` /
  * `mv.srcVersion`) by every refresh, so a fresh session can [[attach]] a
  * view built elsewhere and the freshness check keeps working across
  * processes. The recorded `mv.srcVersion` is the exactness gate: a
  * rewrite fires only when the version the query will read (pinned, else
  * current) IS the version the view reflects — one driver-side metadata
  * read, never a guess.
  */
object MvRegistry {

  final case class Mv(
      srcRoot: String,
      viewRoot: String,
      groupCols: Seq[String],
      valueCol: String,
      reflectedV: Long)

  private def norm(root: String): String = root.stripSuffix("/")

  private val byView = TrieMap.empty[String, Mv]

  def register(mv: Mv): Unit =
    byView.put(norm(mv.viewRoot),
      mv.copy(srcRoot = norm(mv.srcRoot), viewRoot = norm(mv.viewRoot)))

  def deregister(viewRoot: String): Unit = byView.remove(norm(viewRoot))

  def clear(): Unit = byView.clear()

  /** Re-attach a view persisted by another session from its table
    * properties; returns None when the table carries no MV identity.
    */
  def attach(viewRoot: String): Option[Mv] = {
    val p = CommitLog.tablePropertiesOf(viewRoot)
    for {
      src <- p.get("mv.src")
      g <- p.get("mv.group")
      value <- p.get("mv.value")
      rv <- p.get("mv.srcVersion").flatMap(_.toLongOption)
    } yield {
      val mv = Mv(src, viewRoot, g.split(",").toSeq, value, rv)
      register(mv)
      mv
    }
  }

  /** Views of `srcRoot` whose recorded source version equals the version
    * the query will read — pinned (time travel) if given, else the
    * table's current version. Deterministic order for a stable pick when
    * several views qualify.
    */
  def fresh(srcRoot: String, pinned: Option[Long]): Seq[Mv] = {
    val target = pinned.orElse(CommitLog.currentVersion(norm(srcRoot)))
    byView.values
      .filter(mv => mv.srcRoot == norm(srcRoot) &&
        target.contains(mv.reflectedV))
      .toSeq.sortBy(_.viewRoot)
  }
}
