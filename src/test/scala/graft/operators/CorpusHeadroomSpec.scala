package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** q171's Q20 headroom proof at adversarial corpus sizes (VERDICT r7 #3):
  * the old derivation multiplied per-token counts by the OTHER slice's raw
  * total — silent int64 wrap once slices pass ~2^31 tokens. The scaled
  * derivation must (a) never overflow for any legal inputs, (b) agree with
  * double-precision log2 of the true ratio within the documented error,
  * and (c) be bit-identical to the unscaled form at test scale (s = 0).
  */
class CorpusHeadroomSpec extends AnyFunSuite {

  private def lg(n: Long): Long = Corpus.fixedLog2Long(n)

  test("driftTerms never overflows at adversarially large totals") {
    // slices of 2^50 and 2^49 tokens — far past the 2^31 wrap point of
    // the unscaled form (2*a1*Btot with a1 = Atot would need 2^100)
    val (aTot, bTot) = (1L << 50, 1L << 49)
    for ((a1, b1) <- Seq((1L, 1L), (aTot, 1L), (1L, bTot), (aTot, bTot),
        (aTot / 3, bTot / 7))) {
      val (xab, yab, xba) = Corpus.driftTerms(a1, b1, aTot, bTot)
      assert(xab > 0 && yab > 0 && xba > 0, s"($a1,$b1) wrapped: $xab $yab $xba")
      // multiplication did not wrap: recompute in BigInt with the SAME scale
      val (aT, bT) = Corpus.driftScale(aTot, bTot)
      assert(BigInt(xab) == 2 * BigInt(a1) * BigInt(bT))
      assert(BigInt(yab) == BigInt(a1) * BigInt(bT) + BigInt(b1) * BigInt(aT))
    }
  }

  test("scaled Q20 log-ratio tracks double-precision log2 within the " +
      "documented error at 2^50-token slices") {
    val (aTot, bTot) = (1L << 50, (1L << 50) + 12345L)
    for ((a1, b1) <- Seq((17L, 4242L), (1L << 40, 3L), (999999L, 999999L))) {
      val (xab, yab, _) = Corpus.driftTerms(a1, b1, aTot, bTot)
      val got = (lg(xab) - lg(yab)).toDouble / (1 << 20)
      val want = math.log(2.0 * a1 * bTot.toDouble /
        (a1 * bTot.toDouble + b1 * aTot.toDouble)) / math.log(2.0)
      // Q20 truncation ≤ 2^-20 per L, input floor error ≤ 2^-(62-51)
      assert(math.abs(got - want) < 1e-3, s"($a1,$b1): got $got want $want")
    }
  }

  test("at test-scale totals the scale is zero — bit-identical to the " +
      "unscaled derivation") {
    val (aTot, bTot) = (60000L, 61000L) // sf-scale token totals
    assert(Corpus.driftScale(aTot, bTot) == (aTot, bTot))
    val (xab, yab, xba) = Corpus.driftTerms(7L, 9L, aTot, bTot)
    assert((xab, yab, xba) ==
      (2L * 7L * bTot, 7L * bTot + 9L * aTot, 2L * 9L * aTot))
  }

  test("pathologically lopsided slices fail loudly instead of scaling a " +
      "total to zero") {
    intercept[IllegalArgumentException] {
      Corpus.driftScale(1L, Long.MaxValue / 2)
    }
  }
}
