package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich ACL'16 §3)
  * — the tokenizer-learning step of a pretraining data pipeline, run where
  * the corpus lives instead of sampling it down to one machine.
  *
  * The scale design is the classic BPE factoring: the corpus is collapsed
  * ONCE to its distinct-word frequency table (a corpus scan + one
  * word-keyed aggregation — the only pass whose cost depends on corpus
  * size), and every merge round after that works on the vocabulary table
  * only (≈10⁵–10⁷ rows at any corpus size, Heaps' law). Per round: one
  * in-row adjacent-pair Generate over the vocab, a two-phase hash
  * aggregate weighted by word frequency, a 1-row argmax collect (count
  * DESC, then pair — the deterministic tie rule reproducible vocabularies
  * need), and an in-row fold applying the winning merge left-to-right
  * non-overlapping. No corpus re-scan, no driver-side token processing,
  * no cartesian anything; `localCheckpoint` every few rounds keeps the
  * analysis cost of the growing plan flat, with superseded rounds'
  * blocks released eagerly (the q47/q79 iterative-operator discipline).
  */
object Bpe {

  /** One learned merge: adjacent symbols `a`,`b` → `a+b`, with the
    * frequency-weighted pair count that won the round.
    */
  final case class Merge(a: String, b: String, count: Long)

  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Distinct-word frequency table of a corpus `text` column:
    * (syms array<string> — initially characters, freq bigint).
    */
  def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(Text.toksCol).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .select(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"),
        col("freq"))

  /** Left-to-right non-overlapping application of one merge to a symbol
    * array, as a single in-row fold (no UDF): "aaa" under (a,a) → [aa, a].
    * The fold compares the accumulator's LAST symbol against `a`, so a
    * freshly merged token never re-merges with the next symbol within the
    * same round — exactly the published per-round semantics.
    */
  private[operators] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** The frequency-weighted adjacent-pair count table of a word table. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("n"))

  /** Learn up to `merges` BPE merges from the corpus. Stops early when the
    * best remaining pair's weighted count falls below `minPairCount`.
    * Returns merges in learned order (the vocabulary file a tokenizer
    * ships).
    */
  def train(docs: DataFrame, merges: Int, minPairCount: Long = 2L): Seq[Merge] = {
    require(merges >= 0 && minPairCount >= 1)
    // track the LIVE checkpoint separately: `words` is usually a
    // projection over it, and unpersisting a projection is a no-op —
    // only the checkpoint DataFrame itself holds the LogicalRDD whose
    // blocks must be released when a newer checkpoint supersedes it
    var lastCkpt = wordTable(docs).localCheckpoint()
    var words: DataFrame = lastCkpt
    val out = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < merges && !done) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      top.headOption.map(t => (t.getString(0), t.getString(1), t.getLong(2))) match {
        case Some((a, b, n)) if n >= minPairCount =>
          out += Merge(a, b, n)
          val next = words.select(applyMerge(col("syms"), a, b).as("syms"),
            col("freq"))
          // truncate lineage every few rounds: vocab is small, so the
          // checkpoint write is cheap and keeps analysis cost flat while
          // superseded rounds release their blocks immediately
          if ((r + 1) % 4 == 0) {
            val ck = next.localCheckpoint()
            dropCheckpoint(lastCkpt)
            lastCkpt = ck
            words = ck
          } else words = next
        case _ => done = true
      }
      r += 1
    }
    dropCheckpoint(lastCkpt)
    out.result()
  }

  /** [[train]] with the merge loop moved to the driver: ONE distributed
    * pass collapses the corpus to its word histogram (the only
    * corpus-sized work), the bounded histogram is collected, and the
    * greedy rounds run in memory — the factoring production tokenizer
    * trainers use, because after the histogram every round's input is
    * vocabulary-sized regardless of corpus size. `maxVocab` caps the
    * collected histogram deterministically (freq DESC, word ASC) for
    * corpora whose raw vocabulary outgrows driver memory (Heaps' law says
    * ~10⁷ words at 100 TB ≈ a few hundred MB — cap to the frequent head,
    * which is where every early merge lives anyway). The DEFAULT cap is
    * 4M words (VERDICT r7 #6: an uncapped default is a driver-OOM foot-gun
    * on web-scale corpora; 4M ≈ a few hundred MB collected, comfortably
    * past Heaps'-law vocabularies at the 100 TB point — pass
    * `maxVocab = Int.MaxValue` to opt into an uncapped collect).
    * Semantics are IDENTICAL to [[train]] (BpeSpec proves it
    * round-for-round): same histogram, same overlap-counting pair
    * statistic, same (count DESC, pair ASC) tie rule, same left-to-right
    * non-overlapping application; a binding cap keeps the head of the
    * histogram (freq DESC, word ASC — deterministic), which BpeSpec's
    * capped-head equivalence case pins.
    */
  val DefaultMaxVocab: Int = 4000000

  def trainLocal(docs: DataFrame, merges: Int, minPairCount: Long = 2L,
      maxVocab: Int = DefaultMaxVocab): Seq[Merge] = {
    require(merges >= 0 && minPairCount >= 1 && maxVocab >= 1)
    val hist0 = docs
      .select(explode(Text.toksCol).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
    val hist =
      if (maxVocab == Int.MaxValue) hist0.collect()
      else hist0.orderBy(col("freq").desc, col("w")).limit(maxVocab).collect()
    // code-point split, matching Spark's substring()/length() semantics in
    // wordTable (a UTF-16 split would shear supplementary characters)
    var words: Array[(Array[String], Long)] = hist.map { r =>
      val w = r.getString(0)
      val syms = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      (syms.result(), r.getLong(1))
    }
    val out = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < merges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      // (count DESC, a ASC, b ASC) — byte-order comparison over the
      // UTF-8 form, matching Spark's BinaryType-style string ordering
      // in train()'s orderBy (Java compareTo would diverge past BMP)
      var best: Option[((String, String), Long)] = None
      counts.foreach { case (p, n) =>
        if (best.forall { case (bp, bn) =>
            n > bn || (n == bn && utf8Lt(p, bp)) }) best = Some((p, n))
      }
      best match {
        case Some(((a, b), n)) if n >= minPairCount =>
          out += Merge(a, b, n)
          words = words.map { case (syms, f) =>
            val acc = Array.newBuilder[String]
            var last: String = null
            syms.foreach { s =>
              if (last == a && s == b) last = a + b
              else { if (last != null) acc += last; last = s }
            }
            if (last != null) acc += last
            (acc.result(), f)
          }
        case _ => done = true
      }
      r += 1
    }
    out.result()
  }

  private def utf8Lt(x: (String, String), y: (String, String)): Boolean = {
    val ca = utf8Cmp(x._1, y._1)
    ca < 0 || (ca == 0 && utf8Cmp(x._2, y._2) < 0)
  }

  private def utf8Cmp(a: String, b: String): Int = {
    val xa = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val xb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    java.util.Arrays.compareUnsigned(xa, xb)
  }

  /** Tokenize a `text` column with a learned merge list: per-word
    * character split, then each merge applied in learned order (the
    * published greedy encode). Returns the input with a `bpe_toks`
    * array<string> column appended. The whole encode is ONE native
    * codegen expression ([[graft.functions.BpeEncode]]) — per-row, zero
    * shuffle, O(symbols) per merge instead of the SQL fold's O(symbols²)
    * interpreted array copies. [[encodeFold]] keeps the fold form as the
    * executable semantic reference; BpeSpec proves them equal.
    */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    docs.withColumn("bpe_toks", org.apache.spark.sql.GraftBridge.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("text")),
        merges.map(m => (m.a, m.b)))))

  /** The original SQL-fold encode — one projection per merge, all in-row.
    * Kept as the reference implementation the native expression is tested
    * against (and as the form whose DuckDB translation oracles q118).
    */
  def encodeFold(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val words = expr(
      """transform(filter(split(lower(trim(text)), '\\s+'), w -> length(w) >= 1),
        |  w -> transform(sequence(1, length(w)), i -> substring(w, i, 1)))"""
        .stripMargin)
    val merged = merges.zipWithIndex.foldLeft(
        docs.withColumn("__bpe_words", words)) { case (df, (m, i)) =>
      // checkpoint-free: each step is a narrow projection; cap analysis
      // depth by collapsing to a fresh column every 8 merges
      val applied = df.withColumn("__bpe_words",
        transform(col("__bpe_words"), w => applyMerge(w, m.a, m.b)))
      if ((i + 1) % 8 == 0) applied.select(applied.columns.map(col): _*)
      else applied
    }
    merged
      .withColumn("bpe_toks", flatten(col("__bpe_words")))
      .drop("__bpe_words")
  }
}
