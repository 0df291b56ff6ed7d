package graft.sources.interop

import java.sql.{Connection, Driver}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.jdbc.JdbcConnectionProvider

/** Connection POOL for `jdbc:hive2` federation — the missing half of
  * interactive federated reads against a HiveServer2-protocol endpoint.
  *
  * Why it exists: Spark's JDBC source opens a fresh connection for the
  * schema probe and one per scan task, and CLOSES each when done. On
  * HiveServer2 a connection IS a server-side session, and session
  * open/teardown against an embedded metastore constructs a whole new
  * DataNucleus PersistenceManagerFactory (plugin-registry XML parse +
  * Derby connect) — measured 2–6 s PER CONNECTION on this stack, which
  * made every federated query cost ~13–18 s regardless of data size.
  * Pooling reuses live server sessions exactly the way Trino's
  * connector connection pools do; the per-query floor drops to the
  * actual probe + scan work.
  *
  * Shape: a [[JdbcConnectionProvider]] (Spark's documented SPI,
  * registered via META-INF/services) named `hive2-pooled`, selected per
  * read with the `connectionProvider` JDBC option. Borrowed connections
  * are handed out as dynamic proxies whose `close()` RETURNS the
  * underlying connection to the pool instead of closing the server
  * session; concurrent borrowers always get distinct connections, so
  * parallel partitioned fetches still fan out over parallel sessions.
  * The idle pool is capped per (url, user) — extras close for real —
  * and a borrowed connection is liveness-checked (`isClosed`) before
  * reuse. Session-scoped SQL state (USE, SET) does not leak risk onto
  * Spark's generated queries: they are fully qualified by construction.
  *
  * Scale: the pool is per JVM — on a cluster that means per executor,
  * which is precisely the fan-out a federated scan wants (N executors ×
  * a few live sessions each, reused across queries instead of churned
  * per task).
  */
object Hive2Pool {

  private val MaxIdlePerKey = 8

  /** Idle sessions close for real after this long (`graft.hive2.pool
    * .idleMs`). A live HiveServer2 connection pins a NON-DAEMON handler
    * thread server-side, so a JVM whose main returned would otherwise
    * never exit while the pool holds sessions — the reaper (a daemon)
    * guarantees the pool empties shortly after the last federated use.
    */
  private def idleMs: Long =
    sys.props.get("graft.hive2.pool.idleMs").flatMap(_.toLongOption)
      .getOrElse(30000L)

  private final case class Idle(conn: Connection, since: Long)

  /** Pool key: url + user + password — the password MUST key the pool
    * too, or a caller presenting wrong credentials would be handed a
    * session someone else authenticated (review finding r13).
    */
  private type Key = (String, String, String)

  private val pools =
    new ConcurrentHashMap[Key,
      java.util.concurrent.ConcurrentLinkedQueue[Idle]]()

  private def queue(key: Key) =
    pools.computeIfAbsent(key,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Idle]())

  private val reaper = {
    val t = new Thread(() => {
      while (true) {
        Thread.sleep(5000)
        import scala.jdk.CollectionConverters._
        val cutoff = System.nanoTime() - idleMs * 1000000L
        pools.values().asScala.foreach { q =>
          // drain-and-refill keeps it simple and race-safe: an entry
          // polled here is owned here
          var e = q.poll()
          val keep = Seq.newBuilder[Idle]
          while (e != null) {
            if (e.since < cutoff)
              try e.conn.close() catch { case _: Exception => () }
            else keep += e
            e = q.poll()
          }
          keep.result().foreach(q.add)
        }
      }
    }, "hive2-pool-reaper")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Borrow a live connection (reuse an idle one or open fresh), wrapped
    * so close() returns it to the pool.
    */
  def borrow(url: String, user: String, password: String,
      open: () => Connection): Connection = {
    val _ = reaper // force init
    val key = (url, user, password)
    val q = queue(key)
    var conn: Connection = null
    var candidate = q.poll()
    while (conn == null && candidate != null) {
      val live =
        try !candidate.conn.isClosed catch { case _: Exception => false }
      if (live) conn = candidate.conn
      else candidate = q.poll()
    }
    if (conn == null) conn = open()
    proxy(conn, key)
  }

  private def proxy(underlying: Connection, key: Key): Connection = {
    // close() must be IDEMPOTENT (the JDBC contract — wrappers and
    // defensive finally blocks double-close): after the first close the
    // proxy is dead, reports isClosed, and refuses delegation — a second
    // close must never re-enqueue the same session for two borrowers
    val returned = new java.util.concurrent.atomic.AtomicBoolean(false)
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[Connection]),
      (_, method, args) =>
        method.getName match {
          case "close" =>
            if (returned.compareAndSet(false, true)) {
              val q = queue(key)
              val closed =
                try underlying.isClosed catch { case _: Exception => true }
              if (!closed) {
                if (q.size < MaxIdlePerKey)
                  q.add(Idle(underlying, System.nanoTime()))
                else underlying.close() // pool full — tear the session down
              }
            }
            null
          case "isClosed" if returned.get() => java.lang.Boolean.TRUE
          case _ if returned.get() =>
            throw new java.sql.SQLException(
              "connection already returned to the hive2 pool")
          case _ =>
            try method.invoke(underlying,
              (if (args == null) Array.empty[AnyRef] else args): _*)
            catch {
              case e: java.lang.reflect.InvocationTargetException =>
                throw e.getCause
            }
        }
    ).asInstanceOf[Connection]
  }

  /** Close every pooled session for real (tests / shutdown hygiene). */
  def drain(): Unit = {
    import scala.jdk.CollectionConverters._
    pools.values().asScala.foreach { q =>
      var e = q.poll()
      while (e != null) {
        try e.conn.close() catch { case _: Exception => () }
        e = q.poll()
      }
    }
  }
}

/** The SPI face (META-INF/services/org.apache.spark.sql.jdbc
  * .JdbcConnectionProvider): handles `jdbc:hive2` URLs when a read
  * selects it with `.option("connectionProvider", "hive2-pooled")` —
  * explicit selection because Spark's basic provider also matches these
  * URLs and ambiguity is an error by design.
  */
class Hive2PooledProvider extends JdbcConnectionProvider {

  override val name: String = "hive2-pooled"

  override def canHandle(driver: Driver,
      options: Map[String, String]): Boolean =
    options.get("url").exists(_.startsWith("jdbc:hive2"))

  override def getConnection(driver: Driver,
      options: Map[String, String]): Connection = {
    val url = options("url")
    val user = options.getOrElse("user", "anonymous")
    val password = options.getOrElse("password", "")
    Hive2Pool.borrow(url, user, password, () => {
      val props = new java.util.Properties()
      props.setProperty("user", user)
      props.setProperty("password", password)
      driver.connect(url, props)
    })
  }

  override def modifiesSecurityContext(driver: Driver,
      options: Map[String, String]): Boolean = false
}
