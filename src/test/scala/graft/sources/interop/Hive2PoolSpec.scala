package graft.sources.interop

import java.sql.{Connection, SQLException}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Pool-discipline proofs for [[Hive2Pool]], against fake connections —
  * the behaviors under test (cap atomicity, server-side-death handling,
  * poisoned-session discard) are exactly the ones a live HiveServer2
  * cannot exercise deterministically.
  */
class Hive2PoolSpec extends AnyFunSuite {

  /** A controllable Connection: `valid` models SERVER-side liveness
    * (isValid), independent of the client-side `closed` flag — the
    * HiveConnection split the pool has to survive.
    */
  private final class Fake {
    @volatile var closed = false
    @volatile var valid = true
    @volatile var failConnCalls = false
    val conn: Connection = java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[Connection]),
      (_, method, _) =>
        method.getName match {
          case "close"    => closed = true; null
          case "isClosed" => java.lang.Boolean.valueOf(closed)
          case "isValid"  => java.lang.Boolean.valueOf(!closed && valid)
          case "createStatement" =>
            if (failConnCalls) throw new SQLException("session is closed")
            else null
          case "toString" => "fake"
          case "hashCode" => Integer.valueOf(System.identityHashCode(this))
          case "equals"   => java.lang.Boolean.FALSE
          case _          => null
        }
    ).asInstanceOf[Connection]
  }

  private def key(tag: String) = s"jdbc:hive2://fake-$tag:1/db"

  test("idle cap is exact under concurrent returns") {
    val url = key("cap")
    val opened = new AtomicInteger(0)
    val fakes = new java.util.concurrent.ConcurrentLinkedQueue[Fake]()
    def open(): Connection = {
      opened.incrementAndGet()
      val f = new Fake; fakes.add(f); f.conn
    }
    val threads = 24
    // borrow 24 concurrently so every thread must open fresh
    val borrowed = new java.util.concurrent.ConcurrentLinkedQueue[Connection]()
    val barrier = new java.util.concurrent.CyclicBarrier(threads)
    val ts = (1 to threads).map { _ =>
      new Thread(() => {
        barrier.await()
        borrowed.add(Hive2Pool.borrow(url, "u", "p", () => open()))
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(opened.get() == threads)
    // return all 24 concurrently — the cap must hold exactly
    val barrier2 = new java.util.concurrent.CyclicBarrier(threads)
    import scala.jdk.CollectionConverters._
    val rs = borrowed.asScala.toSeq.map { c =>
      new Thread(() => { barrier2.await(); c.close() })
    }
    rs.foreach(_.start()); rs.foreach(_.join())
    assert(Hive2Pool.idleCount(url, "u", "p") <= 8)
    assert(Hive2Pool.idleCount(url, "u", "p") > 0)
    // the 16 over-cap sessions closed for real
    assert(fakes.asScala.count(_.closed) == threads - 8)
  }

  test("server-side-dead sessions are skipped on borrow and the key purges after a fresh open") {
    val url = key("stale")
    val stale = Seq.fill(3)(new Fake)
    // hold all three before returning, so three distinct sessions pool
    val held = stale.map(f => Hive2Pool.borrow(url, "u", "p", () => f.conn))
    held.foreach(_.close())
    assert(Hive2Pool.idleCount(url, "u", "p") == 3)
    // endpoint bounce: all pooled sessions die SERVER-side; client flag
    // still says open
    stale.foreach(_.valid = false)
    val fresh = new Fake
    val c = Hive2Pool.borrow(url, "u", "p", () => fresh.conn)
    // got the fresh one, every stale candidate was closed for real, and
    // the key's queue was purged (nothing left to poison later borrows)
    assert(stale.forall(_.closed))
    assert(Hive2Pool.idleCount(url, "u", "p") == 0)
    c.close()
    assert(Hive2Pool.idleCount(url, "u", "p") == 1)
    assert(!fresh.closed)
    Hive2Pool.drain()
  }

  test("a connection that threw SQLException is torn down, not re-pooled") {
    val url = key("poison")
    val f = new Fake
    val c = Hive2Pool.borrow(url, "u", "p", () => f.conn)
    f.failConnCalls = true
    intercept[SQLException] { c.createStatement() }
    c.close()
    assert(f.closed, "poisoned session must close for real")
    assert(Hive2Pool.idleCount(url, "u", "p") == 0)
  }

  test("close is idempotent and a returned proxy refuses delegation") {
    val url = key("idem")
    val f = new Fake
    val c = Hive2Pool.borrow(url, "u", "p", () => f.conn)
    c.close(); c.close() // second close must not double-enqueue
    assert(Hive2Pool.idleCount(url, "u", "p") == 1)
    assert(c.isClosed)
    intercept[SQLException] { c.createStatement() }
    Hive2Pool.drain()
  }

  test("invalidate retires idle AND borrowed sessions (stale relation caches)") {
    val url = key("gen")
    val idleF = new Fake
    val outF = new Fake
    // hold both so two distinct sessions exist, then pool one
    val first = Hive2Pool.borrow(url, "u", "p", () => idleF.conn)
    val out = Hive2Pool.borrow(url, "u", "p", () => outF.conn)
    first.close()
    assert(Hive2Pool.idleCount(url, "u", "p") == 1)
    // a writer bumps the generation mid-borrow
    Hive2Pool.invalidate(url, "u", "p")
    assert(idleF.closed, "idle sessions close at invalidate")
    assert(Hive2Pool.idleCount(url, "u", "p") == 0)
    out.close()
    assert(outF.closed,
      "a session borrowed before invalidate must not re-pool its stale cache")
    assert(Hive2Pool.idleCount(url, "u", "p") == 0)
  }

  test("healthy sessions are reused across borrows") {
    val url = key("reuse")
    val opened = new AtomicInteger(0)
    val f = new Fake
    def open(): Connection = { opened.incrementAndGet(); f.conn }
    (1 to 5).foreach { _ =>
      Hive2Pool.borrow(url, "u", "p", () => open()).close()
    }
    assert(opened.get() == 1, "serial borrows must reuse one session")
    Hive2Pool.drain()
  }
}
