package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Distributed BPE training vs an independent single-machine reference
  * implementation: identical merges (order, pairs, counts) and identical
  * encodings, plus the deterministic tie rule and the early-stop floor.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- reference implementation (plain Scala, no Spark) ----
  private def refWords(texts: Seq[String]): Map[Vector[String], Long] =
    texts.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong
      }

  private def refApply(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String])((acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
      else acc :+ s)

  private def refTrain(texts: Seq[String], rounds: Int,
      minCount: Long = 2L): Seq[(String, String, Long)] = {
    var vocab = refWords(texts)
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + f
      // winner: max count, ties by (a, b) ascending — the q117/Bpe rule
      val best = pairs.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= minCount =>
          out += ((a, b, n))
          vocab = vocab.toSeq.map { case (syms, f) => refApply(syms, a, b) -> f }
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        case _ => done = true
      }
      r += 1
    }
    out.result()
  }

  private val corpus = Seq(
    "the theory of the thesis is the theme",
    "other theories rethink the thesis theme",
    "low lower lowest newer newest wide wider widest",
    "the low theme of newer theories")

  private def docsDf = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("distributed merges equal the reference, in order, with counts") {
    val want = refTrain(corpus, 15)
    val got = Bpe.train(docsDf, 15).map(m => (m.a, m.b, m.count))
    assert(want.nonEmpty && got == want)
  }

  test("encode matches the reference greedy encode per word") {
    val merges = Bpe.train(docsDf, 12)
    val ref = refTrain(corpus, 12)
    assert(merges.map(m => (m.a, m.b, m.count)) == ref)
    val got = Bpe.encode(docsDf, merges).orderBy("doc_id")
      .select("bpe_toks").as[Seq[String]].collect()
    val want = corpus.map(_.toLowerCase.trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
      .flatMap { w =>
        ref.foldLeft(w.toVector.map(_.toString)) { case (syms, (a, b, _)) =>
          refApply(syms, a, b)
        }
      })
    assert(got.map(_.toSeq).toSeq == want)
  }

  test("native encode expression ≡ the SQL fold, incl. supplementary " +
      "code points, runs, odd whitespace, and null text") {
    val tricky = Seq(
      (1L, "  the aaa 😀😀😀 ab abab  "),
      (2L, "tabs\tand\nnewlines   spaced"),
      (3L, ""),
      (4L, "ñañá 日本語 aaaa THE The"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val merges = Seq(
      ("a", "a"), ("aa", "a"), ("t", "h"), ("th", "e"),
      ("😀", "😀"), ("日", "本"), ("ñ", "a"))
      .map { case (a, b) => Bpe.Merge(a, b, 0L) }
    val fast = Bpe.encode(tricky, merges).orderBy("doc_id")
      .select("bpe_toks").as[Seq[String]].collect().toSeq
    val slow = Bpe.encodeFold(tricky, merges).orderBy("doc_id")
      .select("bpe_toks").as[Seq[String]].collect().toSeq
    assert(fast == slow)
    // spot-check the per-round non-overlap rule on a run: aaa under (a,a)
    // then (aa,a) → [aaa]; 😀😀😀 under (😀,😀) → [😀😀, 😀]
    assert(fast(0).contains("aaa") && fast(0).count(_ == "😀") == 1)
  }

  test("trainLocal ≡ train round-for-round; vocab cap keeps the " +
      "deterministic frequent head") {
    val wantFull = Bpe.train(docsDf, 15).map(m => (m.a, m.b, m.count))
    val gotFull = Bpe.trainLocal(docsDf, 15).map(m => (m.a, m.b, m.count))
    assert(gotFull == wantFull && gotFull.nonEmpty)
    // supplementary code points split identically (no UTF-16 shearing),
    // and the UTF-8 tie ordering matches Spark's orderBy on the pair
    val emoji = Seq((1L, "😀😀 😀😀 ab ab")).toDF("doc_id", "text")
    assert(Bpe.trainLocal(emoji, 2).map(m => (m.a, m.b, m.count)) ==
      Bpe.train(emoji, 2).map(m => (m.a, m.b, m.count)))
    // a cap below the vocabulary size trains on the (freq DESC, word ASC)
    // head — deterministic, and identical to training on a corpus holding
    // exactly those words at their true frequencies
    val capped = Bpe.trainLocal(docsDf, 5, maxVocab = 3)
    val head = docsDf
      .selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS w")
      .where("length(w) >= 1").groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val headDocs = Seq((1L, head.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w) }.mkString(" "))).toDF("doc_id", "text")
    assert(capped.nonEmpty &&
      capped.map(m => (m.a, m.b, m.count)) ==
        Bpe.trainLocal(headDocs, 5).map(m => (m.a, m.b, m.count)))
    // the DEFAULT collect is bounded (r8: an uncapped default was a
    // driver-OOM foot-gun at web scale) yet far above any test vocabulary,
    // so default-arg callers still train on the full histogram here
    assert(Bpe.DefaultMaxVocab < Int.MaxValue && Bpe.DefaultMaxVocab >= 1000000)
  }

  test("tie rule is lexicographic on the pair; floor stops early") {
    // (a,b) and (c,d) both weight 2 → lexicographically first pair wins
    val tied = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val m = Bpe.train(tied, 1)
    assert(m.map(x => (x.a, x.b, x.count)) == Seq(("a", "b", 2L)))
    // a floor above every pair count learns nothing
    assert(Bpe.train(tied, 5, minPairCount = 100L).isEmpty)
    // merged symbols keep merging across rounds: "aaaa"x3 → (a,a) then (aa,aa)
    val runs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val rm = Bpe.train(runs, 2)
    assert(rm.map(x => (x.a, x.b)) == Seq(("a", "a"), ("aa", "aa")))
  }

  test("bpe_encode is SQL-callable with a literal merge spec") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT bpe_encode('The theme of things', 't h,th e') AS toks")
      .as[Seq[String]].collect()(0)
    assert(got == Seq("the", "the", "m", "e", "o", "f", "th", "i", "n", "g", "s"))
    intercept[Exception] {
      spark.sql("SELECT bpe_encode('x', 'badspec')").collect()
    }
  }

  test("bpe_encode spec symbols may contain ','/' ' when escaped — a " +
      "learned merge over comma symbols round-trips (ADVICE r7)") {
    graft.functions.GraftFunctions.register(spark)
    // word "a,b" chars: 'a' ',' 'b'; merges: ('a', ',') then ('a,', 'b')
    val got = spark.sql(
      """SELECT bpe_encode('a,b', 'a \\,,a\\, b') AS toks""")
      .as[Seq[String]].collect()(0)
    assert(got == Seq("a,b"), got.toString)
    // the same merges through the Scala API (no spec, no escaping) agree
    val viaScala = Seq(Tuple1("a,b")).toDF("t")
      .select(org.apache.spark.sql.GraftBridge.column(
        graft.functions.BpeEncode(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("t")),
          Seq(("a", ","), ("a,", "b")))).as("toks"))
      .as[Seq[String]].collect()(0)
    assert(viaScala == got)
  }

  test("plan shape: training rounds work the vocab table, never the corpus") {
    // wordTable is the ONLY corpus-sized stage; pairCounts over it is a
    // join-free Generate + two-phase aggregate
    val p = Bpe.pairCounts(Bpe.wordTable(docsDf))
      .queryExecution.sparkPlan.toString
    assert(p.contains("Generate") && p.contains("HashAggregate"))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
  }
}
