package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record's host-phase verdict (r13 verdict #5): two rounds
  * running, the OFFICIAL BENCH_rN.json was taken in a degraded host
  * phase — dozens of flags whose isolated re-measures were themselves
  * elevated. [[Bench.hostDegraded]] makes that machine-readable: >20%
  * of flags re-measuring isolated above prior stamps the record.
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("a degraded phase trips the flag: most isolated re-measures stay above prior") {
    // the r13 official-record shape: isolated ~1.2-2.3x prior across many flags
    val flags = Seq(
      (0.25, 0.11), (1.21, 0.61), (0.24, 0.13), (2.1, 1.2), (0.9, 0.5))
    assert(Bench.hostDegraded(flags))
  }

  test("in-sweep contention does NOT trip it: isolated values land at/below prior") {
    // the r13 builder-snapshot shape: every isolated <= prior
    val flags = Seq(
      (2.62, 3.09), (4.76, 6.38), (2.44, 2.56), (2.58, 3.29), (0.61, 0.61))
    assert(!Bench.hostDegraded(flags))
  }

  test("a minority of elevated isolateds stays under the 20% bar") {
    // 1 of 6 above prior (16.7%) — one genuinely regressed query must not
    // relabel the whole record as a host artifact
    val flags = Seq(
      (3.0, 1.0), (1.0, 1.1), (0.5, 0.52), (2.0, 2.2), (0.9, 1.0), (1.2, 1.3))
    assert(!Bench.hostDegraded(flags))
  }

  test("jitter tolerance: isolated within 1.1x of prior does not count as above") {
    val flags = Seq((1.05, 1.0), (1.09, 1.0), (0.99, 1.0))
    assert(!Bench.hostDegraded(flags))
  }

  test("zero flags is healthy by definition") {
    assert(!Bench.hostDegraded(Nil))
  }
}
