package graft.functions

import graft.SparkTestBase

/** The native unigram-Viterbi expression: hand-computed cases, the
  * tie→fewest-pieces rule, code-point symbols, null passthrough, SQL
  * callability, and exhaustive-enumeration equivalence (every one of the
  * 2^(n−1) segmentations checked) on a word battery.
  */
class UnigramScoreSpec extends SparkTestBase {

  import spark.implicits._

  private val vocab = Seq("the" -> -70L, "th" -> -55L, "he" -> -50L,
    "e" -> -35L, "a" -> -38L, "t" -> -40L, "ab" -> -73L, "b" -> -35L)
  private val unk = -100L
  private val spec =
    vocab.map { case (p, s) => s"$p:$s" }.mkString(",") + s"|unk:$unk"

  private def score(w: String): (Long, Long) = {
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(w)).toDF("w")
      .selectExpr(s"unigram_score(w, '$spec')").collect()(0).getSeq[Long](0)
    (r(0), r(1))
  }

  /** Independent reference: enumerate ALL segmentations, take the max
    * (score, −count) — the value the DP must reproduce.
    */
  private def brute(w: String): (Long, Long) = {
    val cps = w.codePoints().toArray.map(Character.toChars(_).mkString)
    val vm = vocab.toMap
    def go(i: Int): Seq[(Long, Long)] =
      if (i == cps.length) Seq((0L, 0L))
      else (1 to (cps.length - i)).flatMap { len =>
        val piece = cps.slice(i, i + len).mkString
        val sc = vm.get(piece).orElse(if (len == 1) Some(unk) else None)
        sc.toSeq.flatMap(v => go(i + len).map(t => (v + t._1, 1L + t._2)))
      }
    go(0).maxBy(t => (t._1, -t._2))
  }

  test("hand cases: best segmentation value, ties to fewest pieces, " +
      "code points, empty and null") {
    // 'the' whole piece (-70) beats th+e (-90) and t+he (-90)
    assert(score("the") == (-70L, 1L))
    // tie: 'ab' (-73) vs a+b (-73) → fewest pieces wins the count
    assert(score("ab") == (-73L, 1L))
    // unknown supplementary char is ONE code point at the floor
    assert(score("😀e") == (unk - 35L, 2L))
    assert(score("") == (0L, 0L))
    GraftFunctions.register(spark)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("w")
      .selectExpr(s"unigram_score(w, '$spec')").collect()(0)
    assert(n.isNullAt(0))
  }

  test("DP ≡ exhaustive enumeration over a word battery") {
    val words = Seq("theater", "ababab", "thethe", "xyz", "heat", "bathe",
      "tab", "abba", "eat", "teeth", "hattab", "zzzz", "b", "质量")
    for (w <- words) assert(score(w) == brute(w), s"word '$w'")
  }

  test("spec pieces may contain separators when escaped (ADVICE r7: the " +
      "old parser silently mis-split ','/'|'/':' inside pieces)") {
    // pieces: "a,b" (comma), "x:y" (colon), "p|q" (pipe), plus plain "a"
    val (ps, unkF) = UnigramScore.parseSpec(
      """a\,b:-10,x\:y:-20,p\|q:-30,a:-5|unk:-99""")
    assert(ps == Seq("a,b" -> -10L, "x:y" -> -20L, "p|q" -> -30L, "a" -> -5L))
    assert(unkF == -99L)
    // unescaped ambiguity still fails loudly
    intercept[IllegalArgumentException] {
      UnigramScore.parseSpec("ab:-10|extra|unk:-99")
    }
  }
}
