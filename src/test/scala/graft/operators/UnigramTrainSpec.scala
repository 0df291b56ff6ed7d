package graft.operators

import graft.SparkTestBase

/** [[Unigram]] trainer: the Viterbi E-step is proven against an
  * INDEPENDENT brute-force enumeration of every segmentation (the
  * BpeSpec discipline — two implementations, one answer), and the
  * trainer's invariants (coverage floor, pruning schedule, determinism,
  * score identity) are pinned. Cross-engine bit-identity of the full
  * training loop is q185's oracle gate.
  */
class UnigramTrainSpec extends SparkTestBase {

  private val maxLen = 4

  /** All segmentations of `w` into vocab pieces (≤ maxLen), brute force. */
  private def segment(w: String, vocab: Set[String]): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      val head = w.substring(0, l)
      if (vocab(head)) segment(w.substring(l), vocab).map(head :: _)
      else Nil
    }

  test("viterbi equals the brute-force optimum (score, then fewer pieces)") {
    val scores = Map(
      "a" -> -40L, "b" -> -45L, "c" -> -50L, "d" -> -52L,
      "ab" -> -70L, "bc" -> -80L, "abc" -> -95L, "cd" -> -85L,
      "abcd" -> -160L, "aa" -> -81L)
    val vocab = scores.keySet
    val words = Seq("a", "ab", "abc", "abcd", "abcabc", "aabb", "dcba",
      "aaaa", "abcd" * 2, "bcd", "cdab", "dddd")
    words.foreach { w =>
      val got = Unigram.viterbi(w, scores, maxLen)
      assert(got.mkString("") == w, s"'$w': segmentation must cover")
      assert(got.forall(vocab), s"'$w': only vocab pieces")
      val all = segment(w, vocab)
      assert(all.nonEmpty)
      val bestVal = all.map(seg =>
        (seg.map(scores).sum, -seg.size.toLong)).max
      val gotVal = (got.map(scores).sum, -got.size.toLong)
      assert(gotVal == bestVal,
        s"'$w': viterbi $got = $gotVal, brute-force optimum $bestVal")
    }
    // the documented tie rule: equal (score, pieces) prefers the longer
    // FINAL piece — "aa" (one -81 piece) vs "a a" (two -40s): two singles
    // win on score; craft a true tie to pin the lastLen rule
    val tie = Map("x" -> -10L, "xx" -> -20L)
    assert(Unigram.viterbi("xx", tie, maxLen) == Seq("xx"))
  }

  test("viterbi refuses a coverage hole loudly") {
    val e = intercept[IllegalArgumentException] {
      Unigram.viterbi("az", Map("a" -> -1L), maxLen)
    }
    assert(e.getMessage.contains("coverage"))
  }

  test("trainLocal: coverage floor, pruning schedule, determinism, " +
      "Q20 score identity") {
    import spark.implicits._
    val docs = Seq(
      "the cat sat on the mat", "the rat ate the oat", "that hat is flat",
      "a cat and a rat", "the the the that", "mat hat rat cat")
      .toDF("text")
    val pieces = Unigram.trainLocal(docs, rounds = 2, maxPieceLen = 4,
      seedMulti = 10, keepSchedule = Seq(8, 6))
    // determinism
    val again = Unigram.trainLocal(docs, rounds = 2, maxPieceLen = 4,
      seedMulti = 10, keepSchedule = Seq(8, 6))
    assert(pieces == again)
    // coverage: every corpus character survives as a single-char piece
    val chars = "thecatsonmrledifhp".toSet.map((c: Char) => c.toString)
    val corpusChars = docs.as[String].collect()
      .flatMap(_.replace(" ", "")).map(_.toString).toSet
    assert(corpusChars.subsetOf(pieces.map(_.p).toSet))
    val _ = chars // (sanity anchor only)
    // pruning: at most keepSchedule.last multi-char pieces remain
    assert(pieces.count(_.p.length >= 2) <= 6)
    // score identity: score(p) = L(cnt) - L(total) over the FINAL counts
    val total = pieces.map(_.cnt).sum
    pieces.foreach { pc =>
      assert(pc.score ==
        Corpus.fixedLog2Long(pc.cnt) - Corpus.fixedLog2Long(total))
    }
    // counts are plausible: 'the' occurs often enough to survive rounds
    assert(pieces.exists(p => p.p == "the" && p.cnt >= 5),
      pieces.mkString(", "))
    // output ordering contract: (score DESC, piece ASC)
    assert(pieces == pieces.sortBy(pc => (-pc.score, pc.p)))
  }
}
