package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING (the SentencePiece family: Kudo,
  * ACL'18) — the missing half of q138, which SCORES with a given piece
  * table, the way q129 completed q117/q118's BPE pair.
  *
  * The published algorithm is EM over segmentations with vocabulary
  * pruning; this is its deterministic hard-EM variant, integer-exact so
  * two engines can re-derive the same vocabulary bit-for-bit:
  *
  *   1. **Seed**: every substring of length 1..`maxPieceLen` of the
  *      corpus's distinct words, counted with word frequency weights
  *      (overlapping occurrences count). The seed vocabulary keeps ALL
  *      single characters (the coverage floor Kudo's trainer also
  *      enforces — any word stays segmentable) plus the top
  *      `seedMulti` multi-character pieces by (count DESC, piece ASC).
  *   2. **Scores** are Q20 fixed-point log-probabilities:
  *      `score(p) = L(cnt(p)) − L(Σ cnt)` with `L` the square-and-shift
  *      integer log2 ([[Corpus.fixedLog2Long]]) — no libm anywhere, so
  *      DuckDB's recursive-CTE twin agrees bit-for-bit.
  *   3. **E-step** (per round): Viterbi-segment every distinct word
  *      under the current scores, maximizing (Σ score, then FEWER
  *      pieces, then longer final piece) — the lexicographic tie rule
  *      both engines implement as a plain tuple max.
  *   4. **M-step**: recount pieces from the Viterbi segmentations
  *      (frequency-weighted); single characters floor at count 1
  *      (coverage), multi-character pieces PRUNE to the round's
  *      `keepSchedule` size by (count DESC, piece ASC) — the count-based
  *      pruning simplification of Kudo's likelihood-loss rule,
  *      deterministic by construction. Rescore, repeat.
  *
  * Scale factoring = [[Bpe.trainLocal]]'s: ONE corpus-sized shuffle
  * collapses the corpus to its distinct-word frequency histogram
  * (capped at `maxVocab` by (freq DESC, word ASC) — the same Heaps'-law
  * driver-memory bound), then every round is driver-side work over the
  * bounded histogram: the E-step is O(words × len × maxPieceLen)
  * integer ops with zero allocation pressure, embarrassingly
  * parallelizable over histogram shards if a 10⁷-word vocabulary ever
  * makes the driver loop the bottleneck. The corpus is never rescanned.
  */
object Unigram {

  /** One trained piece: surface form, final hard-EM count, Q20 score. */
  final case class Piece(p: String, cnt: Long, score: Long)

  /** Lexicographic (score, -pieces, lastLen) Viterbi over one word.
    * Returns the piece sequence, last-to-first order reversed to
    * left-to-right. Requires single-character coverage (every char of
    * `w` scored) — the trainer maintains that invariant.
    */
  private[operators] def viterbi(w: String, scores: Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    val n = w.length
    // best(i) = (totalScore, -pieceCount, lastPieceLen) for prefix w[0,i)
    val bs = new Array[Long](n + 1)
    val bn = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var hs = Long.MinValue; var hn = 0L; var hl = 0
      var L = 1
      val maxL = math.min(i, maxPieceLen)
      while (L <= maxL) {
        scores.get(w.substring(i - L, i)) match {
          case Some(sc) =>
            val cs = bs(i - L) + sc
            val cn = bn(i - L) - 1
            if (cs > hs || (cs == hs && (cn > hn || (cn == hn && L > hl)))) {
              hs = cs; hn = cn; hl = L
            }
          case None =>
        }
        L += 1
      }
      require(hl > 0, s"word '$w' not segmentable at position $i — " +
        "single-character coverage broken")
      bs(i) = hs; bn(i) = hn; bl(i) = hl
      i += 1
    }
    val out = List.newBuilder[String]
    var pos = n
    var rev = List.empty[String]
    while (pos > 0) {
      val L = bl(pos)
      rev = w.substring(pos - L, pos) :: rev
      pos -= L
    }
    out ++= rev
    out.result()
  }

  private def rescore(vocab: Map[String, Long]): Map[String, Long] = {
    val t = vocab.values.sum
    val lt = Corpus.fixedLog2Long(t)
    vocab.map { case (p, c) => p -> (Corpus.fixedLog2Long(c) - lt) }
  }

  /** Train a unigram vocabulary from the corpus `text` column. Returns
    * pieces ordered (score DESC, piece ASC) — the piece table a
    * tokenizer ships (q138's scoring input shape).
    */
  def trainLocal(docs: DataFrame, rounds: Int = 2, maxPieceLen: Int = 4,
      seedMulti: Int = 48, keepSchedule: Seq[Int] = Seq(32, 24),
      maxVocab: Int = Bpe.DefaultMaxVocab): Seq[Piece] = {
    require(rounds >= 0 && keepSchedule.size >= rounds,
      "keepSchedule needs one multi-piece budget per round")
    require(maxPieceLen >= 1 && seedMulti >= 0 && maxVocab >= 1)
    // the ONLY corpus-sized pass: distinct-word frequency histogram
    // (same collapse + deterministic cap as Bpe.trainLocal)
    val hist0 = docs
      .select(explode(Text.toksCol).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
    val histRows =
      if (maxVocab == Int.MaxValue) hist0.collect()
      else hist0.orderBy(col("freq").desc, col("w")).limit(maxVocab).collect()
    val hist: Array[(String, Long)] =
      histRows.map(r => (r.getString(0), r.getLong(1)))

    // seed: all substrings ≤ maxPieceLen, frequency-weighted, overlapping
    val cand = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, f) =>
      var L = 1
      while (L <= maxPieceLen) {
        var i = 0
        while (i + L <= w.length) {
          val p = w.substring(i, i + L)
          cand.update(p, cand.getOrElse(p, 0L) + f)
          i += 1
        }
        L += 1
      }
    }
    val singles = cand.iterator.filter(_._1.length == 1).toMap
    val seedM = cand.iterator.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    var vocab: Map[String, Long] = singles ++ seedM
    var scores = rescore(vocab)

    var r = 0
    while (r < rounds) {
      // E-step: Viterbi counts over the histogram (driver, vocab-sized)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      hist.foreach { case (w, f) =>
        viterbi(w, scores, maxPieceLen).foreach(p =>
          counts.update(p, counts.getOrElse(p, 0L) + f))
      }
      // M-step: coverage-floored singles + count-pruned multis
      val sgl = singles.keysIterator
        .map(c => c -> math.max(counts.getOrElse(c, 0L), 1L)).toMap
      val mult = counts.iterator
        .filter { case (p, c) => p.length >= 2 && c >= 1L }.toSeq
        .sortBy { case (p, c) => (-c, p) }.take(keepSchedule(r))
      vocab = sgl ++ mult
      scores = rescore(vocab)
      r += 1
    }
    vocab.toSeq
      .map { case (p, c) => Piece(p, c, scores(p)) }
      .sortBy(pc => (-pc.score, pc.p))
  }
}
