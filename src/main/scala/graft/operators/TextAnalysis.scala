package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators over `documents`: stopword-profile language ID,
  * quality scoring, token counting (whitespace + BPE-ish regex), and a
  * position-weighted rolling-hash fingerprint.
  *
  * Everything is per-row columnar expression work (whole-stage codegen, no
  * UDFs, no shuffle except the final aggregations), so it scales linearly
  * with the corpus and pushes the `text` column read down to the parquet
  * scan.
  */
object TextAnalysis {

  // r15 OPT (guide §2.5): fan out the single-split corpus scan — the text
  // analytics' tokenize/score passes otherwise run as ONE task at bench
  // SFs (no-op at scale where the scan carries many splits; column
  // pruning pushes below the exchange, so narrow consumers shuffle only
  // the columns they read). This file writes no tables, so layouts are
  // unaffected; every query orders its output explicitly.
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.fanOut(s, Tables.load(s, dir, "documents"), col("doc_id"))

  /** Tiny per-language stopword profiles — a deterministic n-gram-free
    * language-ID heuristic (count profile hits over the token bag, pick the
    * max with a fixed tie order).
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a", "to"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "ist", "das", "ein"),
    "fr" -> Seq("le", "la", "et", "est", "les", "des"))

  private def toksCol: Column = Text.toksCol

  /** q138's fixed unigram vocabulary: integer piece scores (quantized
    * log-probs, the shape a SentencePiece trainer emits), common English
    * fragments + single letters; anything else pays the per-code-point
    * unknown floor. ONE definition feeds both the Spark spec literal and
    * the oracle's struct-list literal, so the engines can never drift.
    */
  private val unigramVocab: Seq[(String, Long)] = Seq(
    "the" -> -70L, "ing" -> -80L, "ion" -> -85L,
    "th" -> -55L, "he" -> -50L, "in" -> -52L, "er" -> -54L, "an" -> -53L,
    "re" -> -56L, "on" -> -55L, "at" -> -57L, "es" -> -55L, "te" -> -57L,
    "ti" -> -58L,
    "a" -> -38L, "e" -> -35L, "i" -> -40L, "o" -> -40L, "u" -> -45L,
    "s" -> -42L, "t" -> -40L, "n" -> -41L, "r" -> -43L, "l" -> -44L,
    "d" -> -45L, "c" -> -46L, "h" -> -44L, "m" -> -46L, "p" -> -47L,
    "b" -> -48L, "g" -> -48L, "f" -> -49L, "w" -> -49L, "y" -> -48L,
    "v" -> -50L, "k" -> -51L, "x" -> -55L, "z" -> -56L, "j" -> -55L,
    "q" -> -56L)
  private val unigramUnk = -100L

  /** q140/q141's deterministic PAGE construction (the q45/q134 planted-
    * artifact idiom): the corpus text carries no newlines, bullets, or
    * punctuation at all, so the line-level quality rules would be
    * degenerate on it — instead every doc deterministically becomes a
    * multi-line "page": tokens chunk into 7-word lines, each line gets a
    * doc_id-arithmetic terminal ('.', nothing, or '...'), every 5th
    * (doc_id+i) line a '- ' bullet, and docs at doc_id % 11/13/17 gain a
    * planted boilerplate/code/lorem line. ONE definition rendered into
    * both engines' expression languages, so the page the rules see is
    * bit-identical.
    */
  private val pageLinesExpr: String =
    """concat(
      |  transform(sequence(0, (size(toks) + 6) div 7 - 1), i ->
      |    concat(
      |      CASE WHEN pmod(doc_id + i, 5) = 0 THEN '- ' ELSE '' END,
      |      concat_ws(' ', slice(toks, i * 7 + 1, 7)),
      |      CASE pmod(doc_id + i, 3) WHEN 0 THEN '.' WHEN 1 THEN ''
      |        ELSE '...' END)),
      |  IF(doc_id % 11 = 0,
      |    array('enable javascript and cookies to continue'),
      |    cast(array() as array<string>)),
      |  IF(doc_id % 13 = 0, array('function() { return; }'),
      |    cast(array() as array<string>)),
      |  IF(doc_id % 17 = 0, array('lorem ipsum dolor sit amet'),
      |    cast(array() as array<string>)))""".stripMargin

  /** DuckDB mirror of [[pageLinesExpr]]: CTE body `pg` supplying
    * (doc_id, lang, toks, lines) over `documents`.
    */
  private val pageLinesSql: String =
    """pg AS (
      |  SELECT doc_id, lang, toks,
      |    list_concat(list_concat(list_concat(
      |      list_transform(range(0, (len(toks) + 6) // 7), i ->
      |        concat(
      |          CASE WHEN (doc_id + i) % 5 = 0 THEN '- ' ELSE '' END,
      |          array_to_string(toks[i * 7 + 1 : i * 7 + 7], ' '),
      |          CASE WHEN (doc_id + i) % 3 = 0 THEN '.'
      |            WHEN (doc_id + i) % 3 = 1 THEN '' ELSE '...' END)),
      |      CASE WHEN doc_id % 11 = 0
      |        THEN ['enable javascript and cookies to continue']
      |        ELSE [] END),
      |      CASE WHEN doc_id % 13 = 0 THEN ['function() { return; }']
      |        ELSE [] END),
      |      CASE WHEN doc_id % 17 = 0 THEN ['lorem ipsum dolor sit amet']
      |        ELSE [] END) AS lines
      |  FROM (SELECT doc_id, lang,
      |          regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents))""".stripMargin
  private val unigramMaxLen =
    unigramVocab.map(p => p._1.codePointCount(0, p._1.length)).max
  private val unigramSpec =
    unigramVocab.map { case (p, sc) => s"$p:$sc" }.mkString(",") +
      s"|unk:$unigramUnk"

  /** Character-trigram profiles (high-frequency trigrams per language,
    * space-padded word boundaries included) for the n-gram language-ID
    * variant — same argmax cascade as the stopword profiles.
    */
  private val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", "ing", " an", "and"),
    "es" -> Seq(" de", "de ", " la", "la ", " el", "que"),
    "de" -> Seq("sch", "ich", "der", "ein", "und", "die"),
    "fr" -> Seq(" le", "les", "ent", " et", "est", "une"))

  // ---- q121 classifier surface (shared with the streaming twin) ----

  /** FROZEN centering statistics of a training release: the feature
    * means' exact numerators/denominator (n, Σn_chars, Σr₂..Σr₅).
    * Incremental/streaming training keeps centering with the RELEASE
    * stats (the q109 frozen-cells discipline) so every update round and
    * every engine computes identical integer features.
    */
  final case class PerceptronCenter(n: Long, schars: Long,
      s2: Long, s3: Long, s4: Long, s5: Long)

  private val perceptronWords = Seq("join", "hash", "row", "batch", "scan",
    "customer", "column", "filter")

  /** Raw integer surface counts per document (input needs `text` +
    * `n_chars`): common-word hits, distinct tokens, long tokens, tokens.
    * A `doc_id` column, when present, passes through (the ranking
    * queries need it; the feature math never reads it) — ONE definition
    * of the feature set, so the streaming twin and the batch queries
    * cannot silently diverge.
    */
  def perceptronRaw(d: DataFrame): DataFrame = {
    val common = perceptronWords.map(w => s"'$w'").mkString(", ")
    val id = if (d.columns.contains("doc_id")) Seq(col("doc_id")) else Nil
    d.withColumn("toks", toksCol).select(id ++ Seq(col("n_chars"),
      expr(s"CAST(size(filter(toks, t -> t IN ($common))) AS BIGINT)").as("r2"),
      expr("CAST(size(array_distinct(toks)) AS BIGINT)").as("r3"),
      expr("CAST(size(filter(toks, t -> length(t) >= 6)) AS BIGINT)").as("r4"),
      size(col("toks")).cast("long").as("r5")): _*)
  }

  /** Release centering stats: one map-side-combined aggregate, 6 numbers. */
  def perceptronCenter(d: DataFrame): PerceptronCenter = {
    val r = perceptronRaw(d).agg(count(lit(1)), sum("n_chars"),
      sum("r2"), sum("r3"), sum("r4"), sum("r5")).collect()(0)
    PerceptronCenter(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
  }

  /** Exactly-centered integer features under frozen stats: label
    * y = sign(n·n_charsᵢ − Σn_chars), features xⱼ = n·rⱼ − Σrⱼ.
    */
  def perceptronFeatures(d: DataFrame, c: PerceptronCenter): DataFrame =
    perceptronRaw(d).select(
      when(col("n_chars") * c.n > c.schars, 1L).otherwise(-1L).as("y"),
      (col("r2") * c.n - c.s2).as("x2"),
      (col("r3") * c.n - c.s3).as("x3"),
      (col("r4") * c.n - c.s4).as("x4"),
      (col("r5") * c.n - c.s5).as("x5"))

  /** One full-batch perceptron round over `w`: returns the cumulative
    * weights after adding Σ_{y·⟨w,x⟩ ≤ 0} y·x. Margins compute in
    * DECIMAL(38,0) so nothing wraps; the update itself is a 4-number
    * aggregate (an empty frame is a no-op round).
    */
  def perceptronUpdate(feats: DataFrame, w: Seq[Long]): Seq[Long] = {
    require(w.length == 4)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val xs = Seq("x2", "x3", "x4", "x5")
    val margin = xs.zip(w).map { case (x, wi) => dec(col(x)) * dec(lit(wi)) }
      .reduce(_ + _)
    val mis = dec(col("y")) * margin <= 0
    val r = feats.agg(
      sum(when(mis, col("y") * col("x2")).otherwise(0L)),
      sum(when(mis, col("y") * col("x3")).otherwise(0L)),
      sum(when(mis, col("y") * col("x4")).otherwise(0L)),
      sum(when(mis, col("y") * col("x5")).otherwise(0L))).collect()(0)
    w.zipWithIndex.map { case (wi, i) =>
      wi + (if (r.isNullAt(i)) 0L else r.getLong(i))
    }
  }

  /** The q121 training chain: per-doc frame (doc_id, y, x2..x5) joined
    * with the 3-round cumulative weights (w2..w5) via broadcast, plus the
    * final-weight margin column expression — shared by the accuracy
    * report (q121) and the active-learning sample (q122).
    */
  private def trainedFrame(s: SparkSession, dir: String): (DataFrame, Column) = {
    // r14 OPT (guide §3.3): the three unrolled training steps nest
    // `feats` (and through it `raw`, whose lambda token features are the
    // expensive part) ~2× per level — the w3 tree re-derived the feature
    // scan eight times. Pin raw (one feature pass) and feats (doc-count
    // rows); each Lloyd-style step is then one small aggregation job.
    val raw = perceptronRaw(docs(s, dir)).localCheckpoint()
    val g = raw.agg(count(lit(1)).as("n"), sum(col("n_chars")).as("schars"),
      sum(col("r2")).as("s2"), sum(col("r3")).as("s3"),
      sum(col("r4")).as("s4"), sum(col("r5")).as("s5"))
    val feats = raw.crossJoin(broadcast(g))
      .select(
        col("doc_id"),
        when(col("n_chars") * col("n") > col("schars"), 1L)
          .otherwise(-1L).as("y"),
        (col("n") * col("r2") - col("s2")).as("x2"),
        (col("n") * col("r3") - col("s3")).as("x3"),
        (col("n") * col("r4") - col("s4")).as("x4"),
        (col("n") * col("r5") - col("s5")).as("x5"))
      .localCheckpoint()
    val xs = Seq("x2", "x3", "x4", "x5")
    val ws = Seq("w2", "w3", "w4", "w5")
    def dec(c: Column) = c.cast("decimal(38,0)")
    def margin(wCols: Seq[String]) = xs.zip(wCols)
      .map { case (x, w) => dec(col(x)) * dec(col(w)) }.reduce(_ + _)
    // one unrolled iteration: cumulative weights in, cumulative out
    def step(d: DataFrame, wCols: Seq[String]): DataFrame = {
      val mis = dec(col("y")) * margin(wCols) <= 0
      val upd = xs.zipWithIndex.map { case (x, i) =>
        (col(wCols(i)) + sum(when(mis, col("y") * col(x)).otherwise(0L)))
          .as(s"u${i + 2}") // avoid shadowing the grouping keys
      }
      d.groupBy(wCols.map(col): _*).agg(upd.head, upd.tail: _*)
        .select(xs.indices.map(i => col(s"u${i + 2}").as(s"w${i + 2}")): _*)
    }
    val w0 = feats.crossJoin(broadcast(
      s.range(1).select(xs.indices.map(i => lit(0L).as(s"w${i + 2}")): _*)))
    val w1 = feats.crossJoin(broadcast(step(w0, ws)))
    val w2 = feats.crossJoin(broadcast(step(w1, ws)))
    val w3 = feats.crossJoin(broadcast(step(w2, ws)))
    (w3, margin(ws))
  }

  private def hitCount(words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"size(filter(toks, t -> t IN ($set)))"
  }

  private def hitCountSql(words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> t IN ($set)))"
  }

  val queries: Map[String, QueryDef] = Map(

    // Unicode NFC hygiene audit — the normalization pass an LLM corpus
    // runs before tokenization/dedup (decomposed accents and legacy
    // combining forms hash and shingle differently, so un-normalized
    // corpora under-dedup and fragment token statistics). Every 50th doc
    // gets a PLANTED decomposed suffix (" e" + U+0301 + "clat", the
    // q45 planted-duplicate idiom), and the audit reports per-language
    // how many documents NFC actually changes and how many code points
    // composition saves. graft normalizes through the native
    // [[graft.functions.NfcNormalize]] codegen expression (isNormalized
    // fast path: ASCII rows return the input with zero allocation);
    // DuckDB re-normalizes with its own utf8proc `nfc_normalize`, so a
    // green hash value-proves the two engines' Unicode normalizers agree
    // on this corpus. Per-row, zero shuffles before the tiny per-lang
    // aggregate — the plan shape survives any corpus size.
    "q134_nfc_audit" -> QueryDef(
      fn = { (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        docs(s, dir)
          .withColumn("t",
            when(col("doc_id") % 50 === 0,
              concat(col("text"), lit(" e\u0301clat")))
              .otherwise(col("text")))
          .withColumn("norm", expr("nfc_normalize(t)"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("norm") =!= col("t"), 1L).otherwise(0L))
              .as("n_changed"),
            sum(length(col("t")) - length(col("norm"))).as("chars_saved"))
          .orderBy(col("lang"))
      },
      oracle = Some(
        """WITH w AS (
          |  SELECT lang,
          |    CASE WHEN doc_id % 50 = 0
          |      THEN text || ' e' || chr(769) || 'clat' ELSE text END AS t
          |  FROM documents)
          |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_changed,
          |  CAST(sum(length(t) - length(nfc_normalize(t))) AS BIGINT)
          |    AS chars_saved
          |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Unigram-LM tokenizer segmentation (SentencePiece's inference step,
    // Kudo ACL'18) under the oracle gate: every DISTINCT word is Viterbi-
    // segmented against a fixed integer-scored piece vocabulary by the
    // native [[graft.functions.UnigramScore]] codegen expression, and
    // DuckDB RE-RUNS the same DP as a recursive CTE carrying the best-
    // score vector as a list — pure integer arithmetic, so the per-word
    // (max score, min piece count) pair must match bit-for-bit. Emitting
    // the optimal VALUE rather than the piece sequence makes the contract
    // tie-proof: the max is unique even when segmentations tie, so no
    // tie-break rule needs replicating cross-engine. Scale shape: the
    // O(len × maxPiece) DP runs once per VOCABULARY entry (distinct
    // words), never per token — the q70 collapse discipline — then joins
    // back to occurrence counts; with BPE (q117/q118/q129) this closes
    // the second major subword-tokenizer family.
    "q138_unigram_segment" -> QueryDef(
      fn = { (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        val d = docs(s, dir)
        val occ = d.withColumn("toks", toksCol)
          .select(col("lang"), explode(col("toks")).as("w"))
          .groupBy("lang", "w").agg(count(lit(1)).as("occ"))
        val scored = occ.select("w").distinct()
          .withColumn("sc", expr(s"unigram_score(w, '$unigramSpec')"))
          .select(col("w"), col("sc")(0).as("score"),
            col("sc")(1).as("pieces"))
        occ.join(scored, Seq("w"))
          .groupBy("lang")
          .agg(sum(col("occ")).as("n_words"),
            sum(col("occ") * col("pieces")).as("n_pieces"),
            sum(col("occ") * col("score")).as("total_score"))
          .orderBy("lang")
      },
      oracle = Some {
        val vl = unigramVocab.map { case (p, sc) =>
          s"{'p':'$p','sc':$sc}"
        }.mkString(", ")
        s"""WITH RECURSIVE
           |occ AS (
           |  SELECT lang,
           |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
           |  FROM documents),
           |oc AS (SELECT lang, w, count(*) AS occ FROM occ GROUP BY 1, 2),
           |wd AS (SELECT DISTINCT w FROM oc),
           |vv AS (SELECT [$vl] AS vl),
           |r AS (
           |  SELECT wd.w AS w, 0 AS i,
           |    [{'s': CAST(0 AS BIGINT), 'nc': CAST(0 AS BIGINT)}] AS best
           |  FROM wd
           |  UNION ALL
           |  SELECT w, i + 1,
           |    list_append(best,
           |      list_aggregate(
           |        list_filter(
           |          list_transform(range(1, least(i + 1, $unigramMaxLen) + 1), L ->
           |            {'s': best[i + 2 - L].s + coalesce(
           |                    list_filter(vl, z -> z.p = substr(w, i + 2 - L, L))[1].sc,
           |                    CASE WHEN L = 1 THEN $unigramUnk ELSE NULL END),
           |             'nc': best[i + 2 - L].nc - 1}),
           |          x -> x.s IS NOT NULL),
           |        'max'))
           |  FROM r, vv WHERE i < len(w)),
           |sc AS (
           |  SELECT w, best[len(w) + 1].s AS score, -best[len(w) + 1].nc AS pieces
           |  FROM r WHERE i = len(w))
           |SELECT lang, CAST(sum(occ) AS BIGINT) AS n_words,
           |  CAST(sum(occ * pieces) AS BIGINT) AS n_pieces,
           |  CAST(sum(occ * score) AS BIGINT) AS total_score
           |FROM oc JOIN sc USING (w)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // The full Gopher quality-rule panel (Rae et al. 2021, Appendix A) as
    // one per-language audit: word-count bounds, mean-word-length bounds
    // (integer cross-multiplied — no division), ellipsis-symbol ratio,
    // bullet-line and ellipsis-line ratios, alphabetic-word ratio, and
    // stopword presence, each as an integer-exact pass flag summed per
    // lang plus the all-rules keep count. Runs against the deterministic
    // constructed page (see [[pageLinesExpr]]) so the line rules actually
    // discriminate. Pure per-row expression work into one bounded-key
    // aggregate — zero shuffles before the 5-row rollup at any corpus
    // size.
    "q140_gopher_rules" -> QueryDef(
      fn = { (s, dir) =>
        val flags = Tables.load(s, dir, "documents")
          .withColumn("toks", toksCol)
          .withColumn("lines", expr(pageLinesExpr))
          .withColumn("wc", size(col("toks")).cast("long"))
          .withColumn("totlen", expr(
            "aggregate(toks, cast(0 as bigint), (a, x) -> a + length(x))"))
          .withColumn("page", expr("array_join(lines, '\n')"))
          .withColumn("ell",
            ((length(col("page")) -
              length(regexp_replace(col("page"), lit("\\.\\.\\."), lit("")))) / 3)
              .cast("long"))
          .withColumn("nlines", size(col("lines")).cast("long"))
          .withColumn("bullets", expr(
            "cast(size(filter(lines, l -> left(l, 2) = '- ')) as bigint)"))
          .withColumn("ellend", expr(
            "cast(size(filter(lines, l -> right(l, 3) = '...')) as bigint)"))
          .withColumn("alpha", expr(
            "cast(size(filter(toks, x -> x rlike '[a-z]')) as bigint)"))
          .withColumn("stop", Seq("the", "be", "to", "of", "and", "that",
            "have", "with").map(w =>
              when(array_contains(col("toks"), w), 1L).otherwise(0L))
            .reduce(_ + _))
          .select(col("lang"),
            (col("wc") >= 50 && col("wc") <= 100000).cast("long").as("f_wc"),
            (lit(3) * col("wc") <= col("totlen") &&
              col("totlen") <= lit(10) * col("wc")).cast("long").as("f_mwl"),
            (lit(10) * col("ell") <= col("wc")).cast("long").as("f_sym"),
            (lit(10) * col("bullets") <= col("nlines")).cast("long")
              .as("f_bullet"),
            (lit(10) * col("ellend") <= lit(3) * col("nlines")).cast("long")
              .as("f_ellipsis"),
            (lit(5) * col("alpha") >= lit(4) * col("wc")).cast("long")
              .as("f_alpha"),
            (col("stop") >= 2).cast("long").as("f_stop"))
        flags
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("f_wc").as("pass_wordcount"),
            sum("f_mwl").as("pass_meanlen"),
            sum("f_sym").as("pass_symbol"),
            sum("f_bullet").as("pass_bullet"),
            sum("f_ellipsis").as("pass_ellipsis"),
            sum("f_alpha").as("pass_alpha"),
            sum("f_stop").as("pass_stopword"),
            sum(col("f_wc") * col("f_mwl") * col("f_sym") * col("f_bullet") *
              col("f_ellipsis") * col("f_alpha") * col("f_stop"))
              .as("keep"))
          .orderBy("lang")
      },
      oracle = Some(
        s"""WITH $pageLinesSql,
           |fl AS (
           |  SELECT lang,
           |    CASE WHEN len(toks) BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS f_wc,
           |    CASE WHEN 3 * len(toks) <= list_sum(list_transform(toks, x -> len(x)))
           |          AND list_sum(list_transform(toks, x -> len(x))) <= 10 * len(toks)
           |         THEN 1 ELSE 0 END AS f_mwl,
           |    CASE WHEN 10 * ((len(page) - len(replace(page, '...', ''))) // 3)
           |          <= len(toks) THEN 1 ELSE 0 END AS f_sym,
           |    CASE WHEN 10 * len(list_filter(lines, l -> left(l, 2) = '- '))
           |          <= len(lines) THEN 1 ELSE 0 END AS f_bullet,
           |    CASE WHEN 10 * len(list_filter(lines, l -> right(l, 3) = '...'))
           |          <= 3 * len(lines) THEN 1 ELSE 0 END AS f_ellipsis,
           |    CASE WHEN 5 * len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
           |          >= 4 * len(toks) THEN 1 ELSE 0 END AS f_alpha,
           |    CASE WHEN (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
           |             + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
           |             + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
           |             + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
           |             + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
           |             + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
           |             + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
           |             + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)
           |          >= 2 THEN 1 ELSE 0 END AS f_stop
           |  FROM (SELECT lang, toks, lines,
           |          array_to_string(lines, chr(10)) AS page FROM pg))
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(f_wc) AS BIGINT) AS pass_wordcount,
           |  CAST(sum(f_mwl) AS BIGINT) AS pass_meanlen,
           |  CAST(sum(f_sym) AS BIGINT) AS pass_symbol,
           |  CAST(sum(f_bullet) AS BIGINT) AS pass_bullet,
           |  CAST(sum(f_ellipsis) AS BIGINT) AS pass_ellipsis,
           |  CAST(sum(f_alpha) AS BIGINT) AS pass_alpha,
           |  CAST(sum(f_stop) AS BIGINT) AS pass_stopword,
           |  CAST(sum(f_wc * f_mwl * f_sym * f_bullet * f_ellipsis
           |    * f_alpha * f_stop) AS BIGINT) AS keep
           |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // C4's line-level cleaning (Raffel et al. 2020 §2.2) under the oracle
    // gate: keep lines ending in terminal punctuation with ≥ 3 words,
    // drop boilerplate lines ('javascript', 'lorem ipsum'), and flag
    // whole pages containing '{' (the code-leak page rule). Emits the
    // per-doc cleaning manifest — line counts before/after, cleaned char
    // count, page-drop flag. Pure in-row array work, ZERO shuffles before
    // the presentation sort; at 100 TB cleaning is one map pass.
    "q141_c4_clean" -> QueryDef(
      fn = { (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("toks", toksCol)
          .withColumn("lines", expr(pageLinesExpr))
          .withColumn("kept", expr(
            """filter(lines, l ->
              |  right(l, 1) IN ('.', '!', '?', '"') AND
              |  size(split(trim(l), '\\s+')) >= 3 AND
              |  NOT contains(l, 'javascript') AND
              |  NOT contains(l, 'lorem ipsum'))""".stripMargin))
          .select(col("doc_id"),
            size(col("lines")).cast("long").as("n_lines"),
            size(col("kept")).cast("long").as("n_kept"),
            expr("cast(length(array_join(kept, '\n')) as bigint)")
              .as("clean_chars"),
            expr("cast(exists(lines, l -> contains(l, '{')) as bigint)")
              .as("dropped"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH $pageLinesSql,
           |cl AS (
           |  SELECT doc_id, lines,
           |    list_filter(lines, l ->
           |      right(l, 1) IN ('.', '!', '?', '"')
           |      AND len(regexp_split_to_array(trim(l), '\\s+')) >= 3
           |      AND NOT contains(l, 'javascript')
           |      AND NOT contains(l, 'lorem ipsum')) AS kept
           |  FROM pg)
           |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
           |  CAST(len(kept) AS BIGINT) AS n_kept,
           |  CAST(len(array_to_string(kept, chr(10))) AS BIGINT) AS clean_chars,
           |  CAST(len(list_filter(lines, l -> contains(l, '{'))) > 0 AS BIGINT)
           |    AS dropped
           |FROM cl ORDER BY doc_id""".stripMargin)),

    // HTML boilerplate extraction (the trafilatura/jusText step of a web
    // crawl pipeline, as pure regex algebra): each document is wrapped in
    // a deterministic page shell — head/script/style, nav, aside, footer —
    // and the GENERIC extractor recovers the main content: script/style
    // blocks die first, then boilerplate containers (nav/aside/footer),
    // then remaining tags, then HTML entities unescape, then whitespace
    // squeezes. n_exact counts documents whose extraction round-trips to
    // the whitespace-normalized original — the extractor's recall metric.
    // All six regex passes run inside ONE whole-stage-codegen projection;
    // the only shuffle is the per-language rollup. At 100 TB (the actual
    // Common-Crawl shape) this is one map pass over the corpus — no join,
    // no state, embarrassingly parallel.
    "q153_html_extract" -> QueryDef(
      fn = { (s, dir) =>
        val page = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><script type=\"text/javascript\">var id="),
          col("doc_id").cast("string"),
          lit(";</script><style>.m{color:red}</style></head><body>" +
            "<nav>Home | Docs | About</nav><article><p>"),
          col("text"),
          lit("</p></article><aside>Related: doc-"),
          col("doc_id").cast("string"),
          lit("</aside><footer>&copy; 2020 Example Corp</footer>" +
            "</body></html>"))
        val stripped = regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(page,
            "(?s)<script[^>]*>.*?</script>", " "),
            "(?s)<style[^>]*>.*?</style>", " "),
            "(?s)<(nav|aside|footer)[^>]*>.*?</(nav|aside|footer)>", " "),
            "<[^>]+>", " ")
        val unescaped = expr(
          """replace(replace(replace(replace(replace(__str,
            |  '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
            |  '&quot;', '"'), '&#39;', '''')""".stripMargin
            .replace("__str", "__stripped"))
        val d = Tables.load(s, dir, "documents")
          .withColumn("__stripped", stripped)
          .withColumn("extracted",
            trim(regexp_replace(unescaped, "\\s+", " ")))
          .withColumn("norm_orig",
            trim(regexp_replace(col("text"), "\\s+", " ")))
        d.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("extracted")).cast("long")).as("sum_chars"),
            sum(when(col("extracted") === col("norm_orig"), 1L)
              .otherwise(0L)).as("n_exact"))
          .orderBy("lang")
      },
      oracle = Some(
        """WITH pages AS (
          |  SELECT lang, text,
          |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
          |    '</title><script type="text/javascript">var id=' ||
          |    CAST(doc_id AS VARCHAR) ||
          |    ';</script><style>.m{color:red}</style></head><body>' ||
          |    '<nav>Home | Docs | About</nav><article><p>' || text ||
          |    '</p></article><aside>Related: doc-' ||
          |    CAST(doc_id AS VARCHAR) ||
          |    '</aside><footer>&copy; 2020 Example Corp</footer>' ||
          |    '</body></html>' AS page
          |  FROM documents),
          |ext AS (
          |  SELECT lang, text,
          |    trim(regexp_replace(
          |      replace(replace(replace(replace(replace(
          |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |          page,
          |          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
          |          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
          |          '(?s)<(nav|aside|footer)[^>]*>.*?</(nav|aside|footer)>',
          |            ' ', 'g'),
          |          '<[^>]+>', ' ', 'g'),
          |        '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
          |        '&quot;', '"'), '&#39;', ''''),
          |      '\s+', ' ', 'g')) AS extracted,
          |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm_orig
          |  FROM pages)
          |SELECT lang, count(*) AS n_docs,
          |  CAST(sum(len(extracted)) AS BIGINT) AS sum_chars,
          |  CAST(sum(CASE WHEN extracted = norm_orig THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_exact
          |FROM ext GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Language ID: stopword-profile scores, argmax with fixed tie order
    // (profile order above, then 'und' = undetermined when all scores 0);
    // rolled up to counts per predicted language.
    "q19_langid" -> QueryDef(
      fn = { (s, dir) =>
        val scored = docs(s, dir)
          .withColumn("toks", toksCol)
        val withScores = profiles.foldLeft(scored) { case (d, (lang, words)) =>
          d.withColumn(s"sc_$lang", expr(hitCount(words)).cast("long"))
        }
        // Cascading argmax, first-profile-wins-ties: lang_i is predicted iff
        // sc_i > 0 and sc_i >= every LATER profile (earlier branches having
        // already failed implies no earlier profile strictly beats it).
        val langs = profiles.map(_._1)
        val best = langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), els) =>
          val c = col(s"sc_$lang")
          val beatsLater = langs.drop(i + 1).map(o => c >= col(s"sc_$o"))
          when(((c > 0) +: beatsLater).reduce(_ && _), lit(lang)).otherwise(els)
        }
        withScores.withColumn("predicted", best)
          .groupBy("predicted").agg(count(lit(1)).as("n"))
          .orderBy("predicted")
      },
      oracle = Some {
        val scoreCols = profiles
          .map { case (l, ws) => s"${hitCountSql(ws)} AS sc_$l" }.mkString(",\n    ")
        // argmax with first-profile-wins-ties, matching the Spark cascade
        val caseExpr = profiles.map(_._1).zipWithIndex.map { case (l, i) =>
          val geLater = profiles.map(_._1).drop(i + 1).map(o => s"sc_$l >= sc_$o")
          val conds = Seq(s"sc_$l > 0") ++ geLater
          s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
        }.mkString("\n    ")
        s"""WITH scored AS (
           |  SELECT doc_id,
           |    $scoreCols
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |        FROM documents))
           |SELECT predicted, count(*) AS n FROM (
           |  SELECT CASE
           |    $caseExpr
           |    ELSE 'und' END AS predicted
           |  FROM scored)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Quality scoring: length, token count, mean token length, punctuation
    // ratio, stopword ratio — composed into a 0-1 score. All ratios are
    // int/int divisions (exact operands → deterministic doubles).
    "q20_quality_score" -> QueryDef(
      fn = { (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("toks", toksCol)
          .withColumn("n_chars_c", length(col("text")).cast("long"))
          .withColumn("n_toks", size(col("toks")).cast("long"))
          .withColumn("n_punct",
            size(expr("regexp_extract_all(text, '[^a-zA-Z0-9\\\\s]', 0)")).cast("long"))
          .withColumn("n_stop", expr(hitCount(profiles.head._2)).cast("long"))
          .withColumn("punct_ratio", col("n_punct").cast("double") / col("n_chars_c"))
          .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_toks"))
          .withColumn("mean_tok_len",
            expr("aggregate(toks, CAST(0 AS BIGINT), (a, t) -> a + length(t))")
              .cast("double") / col("n_toks"))
          .withColumn("quality",
            when(col("n_toks") >= 10 && col("punct_ratio") < 0.1 &&
              col("mean_tok_len") >= 3 && col("mean_tok_len") <= 12, 1.0)
              .otherwise(0.0))
          .select("doc_id", "n_chars_c", "n_toks", "punct_ratio", "stop_ratio",
            "mean_tok_len", "quality")
          .orderBy("doc_id")
      },
      oracle = Some {
        val stop = profiles.head._2.map(w => s"'$w'").mkString(", ")
        s"""SELECT doc_id, n_chars_c, n_toks,
           |  CAST(n_punct AS DOUBLE) / n_chars_c AS punct_ratio,
           |  CAST(n_stop AS DOUBLE) / n_toks AS stop_ratio,
           |  CAST(sum_tok_len AS DOUBLE) / n_toks AS mean_tok_len,
           |  CASE WHEN n_toks >= 10 AND CAST(n_punct AS DOUBLE) / n_chars_c < 0.1
           |        AND CAST(sum_tok_len AS DOUBLE) / n_toks >= 3
           |        AND CAST(sum_tok_len AS DOUBLE) / n_toks <= 12
           |       THEN 1.0 ELSE 0.0 END AS quality
           |FROM (
           |  SELECT doc_id,
           |    CAST(length(text) AS BIGINT) AS n_chars_c,
           |    CAST(len(toks) AS BIGINT) AS n_toks,
           |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
           |    CAST(${hitCountSql(profiles.head._2)} AS BIGINT) AS n_stop,
           |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_tok_len
           |  FROM (SELECT doc_id, text,
           |          regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |        FROM documents))
           |ORDER BY doc_id""".stripMargin
      }),

    // Token counting: whitespace tokens and a BPE-ish regex segmentation
    // (letter runs | digit runs | single non-alnum), per source.
    "q21_token_count" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir)
          .withColumn("ws_toks", size(toksCol).cast("long"))
          .withColumn("bpe_toks",
            size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
              .cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ws_toks")).as("ws_total"),
            sum(col("bpe_toks")).as("bpe_total"),
            max(col("bpe_toks")).as("bpe_max"))
          .orderBy("source")
      },
      oracle = Some(
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(ws_toks) AS BIGINT) AS ws_total,
          |  CAST(sum(bpe_toks) AS BIGINT) AS bpe_total,
          |  max(bpe_toks) AS bpe_max
          |FROM (SELECT source,
          |        CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS ws_toks,
          |        CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_toks
          |      FROM documents)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Language ID, character-n-gram variant: score = distinct character
    // trigrams of the document that appear in each language's trigram
    // profile; argmax with the same first-profile-wins cascade as q19.
    // Trigram extraction is an in-row transform over the char sequence —
    // zero shuffle before the final rollup, same 100 TB shape as q19.
    "q34_langid_ngram" -> QueryDef(
      fn = { (s, dir) =>
        // r15 OPT (guide §4.1 prefer built-ins over interpreted lambdas):
        // |distinct-trigrams(doc) ∩ profile| ≡ the number of PROFILE grams
        // occurring anywhere in the text — every occurrence of a 3-char
        // string IS a trigram window — so the per-doc gram-array
        // materialization (one interpreted substring lambda per character,
        // then array_distinct + one interpreted filter per language)
        // collapses to 6 codegen'd `contains` probes per language.
        // Identical values (oracle q34 re-proven), zero interpreted nodes.
        val scored = docs(s, dir)
          .withColumn("lt", lower(trim(col("text"))))
        val withScores = trigramProfiles.foldLeft(scored) { case (d, (lang, gs)) =>
          d.withColumn(s"sc_$lang",
            gs.map(g => when(col("lt").contains(g), 1L).otherwise(0L))
              .reduce(_ + _))
        }
        val langs = trigramProfiles.map(_._1)
        val best = langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), els) =>
          val c = col(s"sc_$lang")
          val beatsLater = langs.drop(i + 1).map(o => c >= col(s"sc_$o"))
          when(((c > 0) +: beatsLater).reduce(_ && _), lit(lang)).otherwise(els)
        }
        withScores.withColumn("predicted", best)
          .groupBy("predicted").agg(count(lit(1)).as("n"))
          .orderBy("predicted")
      },
      oracle = Some {
        val scoreCols = trigramProfiles.map { case (l, gs) =>
          val set = gs.map(g => s"'$g'").mkString(", ")
          s"len(list_filter(gs, g -> g IN ($set))) AS sc_$l"
        }.mkString(",\n    ")
        val caseExpr = trigramProfiles.map(_._1).zipWithIndex.map { case (l, i) =>
          val geLater = trigramProfiles.map(_._1).drop(i + 1).map(o => s"sc_$l >= sc_$o")
          val conds = Seq(s"sc_$l > 0") ++ geLater
          s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
        }.mkString("\n    ")
        s"""WITH scored AS (
           |  SELECT doc_id,
           |    $scoreCols
           |  FROM (SELECT doc_id, list_distinct(list_transform(
           |          range(1, greatest(length(lower(trim(text))) - 1, 1)),
           |          i -> substr(lower(trim(text)), i, 3))) AS gs
           |        FROM documents))
           |SELECT predicted, count(*) AS n FROM (
           |  SELECT CASE
           |    $caseExpr
           |    ELSE 'und' END AS predicted
           |  FROM scored)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Document fingerprint: position-weighted modular hash over the token
    // stream (order-sensitive, unlike a bag hash) — md5-derived per-token
    // integers, exact BIGINT arithmetic in both engines.
    "q22_fingerprint" -> QueryDef(
      fn = { (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("toks", toksCol)
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
          .withColumn("h",
            (conv(substring(md5(col("tok")), 1, 14), 16, 10).cast("long") % 1000003L) *
              ((col("pos") % 97) + 1))
          .groupBy("doc_id")
          .agg((sum(col("h")) % 1000000007L).as("fingerprint"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id,
          |  CAST(sum(h) % 1000000007 AS BIGINT) AS fingerprint
          |FROM (
          |  SELECT doc_id,
          |    (CAST(concat('0x', substr(md5(toks[i]), 1, 14)) AS BIGINT) % 1000003)
          |      * (((i - 1) % 97) + 1) AS h
          |  FROM (SELECT doc_id, toks, generate_subscripts(toks, 1) AS i
          |        FROM (SELECT doc_id,
          |                regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |              FROM documents)))
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // BM25-structured relevance for a fixed query-term set. One corpus pass
    // computes the global stats (N, Σdl, per-term df) as a single broadcast
    // row; scoring is then per-row expression work — the textbook "scalar
    // aggregate + map" shape that runs unchanged at 100 TB. Determinism:
    // the classic ln() idf is replaced by its rational core
    // (N − df + 0.5)/(df + 0.5) so every operation is IEEE +,−,×,÷ over
    // values derived from exact int64s — bit-identical in Spark and DuckDB
    // (ln implementations are not; this is the documented divergence).
    "q49_bm25" -> QueryDef(
      fn = { (s, dir) =>
        val terms = Seq("spark", "table", "query")
        val d = docs(s, dir).select(col("doc_id"), toksCol.as("toks"))
        val dfAggs = terms.map(t =>
          sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$t"))
        val stats = d.agg(
          count(lit(1)).as("n_docs"),
          (Seq(sum(size(col("toks")).cast("long")).as("sum_dl")) ++ dfAggs): _*)
        val withTf = terms.foldLeft(
          d.crossJoin(broadcast(stats))
            .withColumn("dl", size(col("toks")).cast("long"))
            .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))) {
          case (acc, t) => acc.withColumn(s"tf_$t",
            expr(s"CAST(size(filter(toks, x -> x = '$t')) AS DOUBLE)"))
        }
        val score = terms.map { t =>
          val tf = col(s"tf_$t")
          val idf = (col("n_docs") - col(s"df_$t") + lit(0.5)) /
            (col(s"df_$t") + lit(0.5))
          idf * (tf * lit(2.2)) /
            (tf + lit(1.2) * (lit(0.25) +
              lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
        }.reduce(_ + _)
        withTf.select(col("doc_id"), col("dl"), score.as("bm25"))
          .orderBy("doc_id")
      },
      oracle = Some {
        val terms = Seq("spark", "table", "query")
        val dfCols = terms.map(t =>
          s"CAST(sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
          .mkString(",\n    ")
        val termExprs = terms.map { t =>
          s"""((n_docs - df_$t + 0.5) / (df_$t + 0.5))
             | * (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) * 2.2)
             | / (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)
             |    + 1.2 * (0.25 + 0.75 * (CAST(len(toks) AS DOUBLE)
             |                            / (CAST(sum_dl AS DOUBLE) / n_docs))))"""
            .stripMargin.replace("\n", " ")
        }.mkString("\n  + ")
        s"""WITH d AS (
           |  SELECT doc_id,
           |    regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents),
           |st AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(len(toks)) AS BIGINT) AS sum_dl,
           |    $dfCols
           |  FROM d)
           |SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
           |  $termExprs AS bm25
           |FROM d CROSS JOIN st
           |ORDER BY doc_id""".stripMargin
      }),

    // Deterministic stratified sampling: per-language keep rates applied by
    // hashing the row key (first 8 md5 hex chars → uniform 32-bit integer,
    // keep iff u < rate·2³²). No RNG state, no sampleBy: the SAME rows are
    // kept on any cluster, any partitioning, any run — the property a
    // reproducible training-data pipeline needs. Pure per-row expression
    // work; the per-stratum thresholds are literals (en 10%, es/de 50%,
    // fr 30%, zh 15%).
    "q50_stratified_sample" -> QueryDef(
      fn = { (s, dir) =>
        val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long")
        val threshold = when(col("lang") === "en", 429496729L) // 0.10·2^32
          .when(col("lang") === "es", 2147483648L) // 0.50·2^32
          .when(col("lang") === "de", 2147483648L) // 0.50·2^32
          .when(col("lang") === "fr", 1288490188L) // 0.30·2^32
          .otherwise(644245094L) // zh 0.15·2^32
        // map-only pipeline: plain load (the fanned loader's exchange
        // would be pure tax — PlanShapeSpec asserts the no-shuffle shape)
        Tables.load(s, dir, "documents")
          .filter(u < threshold)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, lang
          |FROM documents
          |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          |  < CASE lang WHEN 'en' THEN 429496729
          |              WHEN 'es' THEN 2147483648
          |              WHEN 'de' THEN 2147483648
          |              WHEN 'fr' THEN 1288490188
          |              ELSE 644245094 END
          |ORDER BY doc_id""".stripMargin)),

    // Token-budget shard packing: within each (lang, source) series, docs
    // fill shards of 2000 whitespace tokens in doc_id order — shard id =
    // exclusive running token total div budget (the streaming shard-writer
    // semantics). The window is partitioned by (lang, source), so at 100 TB
    // no single task sorts the corpus — each series sorts independently
    // (the q40 lesson applied from the start; a date bucket would join the
    // partition key if series grew unbounded).
    "q51_token_pack" -> QueryDef(
      fn = { (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.load(s, dir, "documents")
          .withColumn("toks", size(toksCol).cast("long"))
          .withColumn("cum", coalesce(sum(col("toks")).over(w), lit(0L)))
          .withColumn("shard", expr("cum div 2000"))
          .select("doc_id", "lang", "source", "toks", "shard")
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, lang, source, toks, cum // 2000 AS shard
          |FROM (
          |  SELECT doc_id, lang, source,
          |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS toks,
          |    CAST(coalesce(sum(CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT))
          |      OVER (PARTITION BY lang, source ORDER BY doc_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
          |  FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    // PII redaction: regex scrub of emails and IPv4s with per-doc match
    // counts and an md5 over the redacted text as the value witness. The
    // corpus is synthetic and PII-free, so deterministic PII is appended
    // per row first (an email always; an IP only when doc_id % 3 != 0 —
    // the % 3 = 0 branch plants a malformed 3-octet decoy the regex must
    // NOT match). Patterns stay in the Java∩RE2 common subset so Spark and
    // DuckDB agree. Per-row codegen expression work, no shuffle.
    "q52_pii_redact" -> QueryDef(
      fn = { (s, dir) =>
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
        val aug = concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com host "),
          when(col("doc_id") % 3 === 0, lit("10.0.256"))
            .otherwise(concat(lit("10.0."),
              (col("doc_id") % 256).cast("string"), lit(".7"))))
        Tables.load(s, dir, "documents")
          .withColumn("aug", aug)
          .withColumn("n_emails",
            size(regexp_extract_all(col("aug"), lit(email), lit(0))).cast("long"))
          .withColumn("n_ips",
            size(regexp_extract_all(col("aug"), lit(ip), lit(0))).cast("long"))
          .withColumn("redacted",
            regexp_replace(regexp_replace(col("aug"), email, "<EMAIL>"),
              ip, "<IP>"))
          .select(col("doc_id"), col("n_emails"), col("n_ips"),
            md5(col("redacted")).as("red_hash"),
            length(col("redacted")).cast("long").as("red_len"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id,
          |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          |  CAST(len(regexp_extract_all(aug, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
          |  md5(regexp_replace(regexp_replace(aug,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')) AS red_hash,
          |  CAST(length(regexp_replace(regexp_replace(aug,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')) AS BIGINT) AS red_len
          |FROM (
          |  SELECT doc_id,
          |    concat(text, ' contact user', CAST(doc_id AS VARCHAR),
          |      '@example.com host ',
          |      CASE WHEN doc_id % 3 = 0 THEN '10.0.256'
          |           ELSE concat('10.0.', CAST(doc_id % 256 AS VARCHAR), '.7')
          |      END) AS aug
          |  FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    // Blocked fuzzy join (entity resolution): corrupted part names (2nd
    // character deleted — a deterministic "typo") matched back to the
    // catalog by Levenshtein ≤ 2, best match = (min distance, min name).
    // The join is an EQUI-join on a blocking key (first character, which
    // the corruption preserves) — never all-pairs: at 100 TB each probe
    // meets only its block, and the edit-distance filter runs inside the
    // block. Real pipelines widen the key (length band, phonetic code);
    // the shape is the point.
    // Blocking = (first char, length): edit distance ≤ 2 BOUNDS the length
    // difference at 2, so restricting candidates to a ±2 length window is
    // LOSSLESS for the declared block-join semantics — the probe side
    // explodes into its 5 admissible catalog lengths (equi-join keys; the
    // oracle states the same window as abs(len diff) ≤ 2). The r5 sf1
    // sweep caught the first-char-only revision: ~26 blocks means block
    // size grows WITH the corpus (N²/26 Levenshtein calls — 10× data,
    // 100× work); length blocking multiplies selectivity by the length
    // spread, and at 100 TB the block key is the unit of shuffle
    // parallelism, so finer keys are also better-distributed work.
    "q57_fuzzy_join" -> QueryDef(
      fn = { (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val names = Tables.load(s, dir, "part").select(col("p_name")).distinct()
        val probes = names.select(
          concat(substring(col("p_name"), 1, 1), substring(col("p_name"), 3, 1000))
            .as("probe"))
          .distinct()
          .withColumn("bk", substring(col("probe"), 1, 1))
          .withColumn("blen",
            explode(sequence(length(col("probe")) - 2, length(col("probe")) + 2)))
        val catalog = names
          .withColumn("bk", substring(col("p_name"), 1, 1))
          .withColumn("blen", length(col("p_name")))
        val w = Window.partitionBy(col("probe"))
          .orderBy(col("dist"), col("p_name"))
        probes.join(catalog, Seq("bk", "blen"))
          .withColumn("dist", levenshtein(col("probe"), col("p_name")).cast("long"))
          .filter(col("dist") <= 2)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("probe"), col("p_name").as("matched"), col("dist"))
          .orderBy("probe")
      },
      oracle = Some(
        """WITH names AS (SELECT DISTINCT p_name FROM part),
          |probes AS (
          |  SELECT DISTINCT concat(substr(p_name, 1, 1), substr(p_name, 3)) AS probe
          |  FROM names),
          |cand AS (
          |  SELECT p.probe, n.p_name,
          |    CAST(levenshtein(p.probe, n.p_name) AS BIGINT) AS dist
          |  FROM probes p JOIN names n
          |    ON substr(p.probe, 1, 1) = substr(n.p_name, 1, 1)
          |   AND abs(len(p.probe) - len(n.p_name)) <= 2
          |  WHERE levenshtein(p.probe, n.p_name) <= 2)
          |SELECT probe, p_name AS matched, dist FROM (
          |  SELECT *, row_number() OVER (PARTITION BY probe
          |             ORDER BY dist, p_name) AS rn
          |  FROM cand) WHERE rn = 1
          |ORDER BY probe""".stripMargin)),

    // Fixed-size per-stratum sample (eval-set construction): exactly
    // min(k, |stratum|) docs per language, selected by md5-hash rank —
    // deterministic under any partitioning, no RNG, and the hash order is
    // uncorrelated with doc content. The window partitions by language
    // (bounded cardinality); at 100 TB a rank-k-of-stratum would instead
    // use an approximate threshold + exact top-k refinement, but the
    // per-stratum window IS the correct exact shape.
    "q62_fixed_k_sample" -> QueryDef(
      fn = { (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs(s, dir)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select("doc_id", "lang", "rk")
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, lang, rk FROM (
          |  SELECT doc_id, lang,
          |    CAST(row_number() OVER (PARTITION BY lang
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
          |  FROM documents)
          |WHERE rk <= 10
          |ORDER BY doc_id""".stripMargin)),

    // Stride-overlap context-window chunking — the retrieval/embedding
    // prep step (max-length windows with 50 % overlap so no span is cut
    // at a boundary in every chunk): 30-token windows at stride 15; docs
    // shorter than one window ship whole as chunk 0. Emits the chunk
    // MANIFEST (offsets, lengths, content md5) rather than chunk text —
    // what an embedding job actually keys its work and dedup on.
    //
    // 100 TB shape: pure per-row expression work (one in-row transform +
    // explode), ZERO shuffles before the presentation sort — chunking
    // rides the ingest scan. All chunk fields are BIGINT/md5 — bit-exact
    // cross-engine.
    "q99_chunk_windows" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), Text.toksCol.as("toks"))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(toks) < 30 THEN
              |  array(struct(CAST(0 AS BIGINT) AS chunk_id,
              |               CAST(0 AS BIGINT) AS start_tok,
              |               CAST(size(toks) AS BIGINT) AS n_toks,
              |               md5(concat_ws(' ', toks)) AS chunk_md5))
              |ELSE
              |  transform(sequence(CAST(0 AS BIGINT), (size(toks) - 30) div 15),
              |    i -> struct(i AS chunk_id, i * 15 AS start_tok,
              |      CAST(30 AS BIGINT) AS n_toks,
              |      md5(concat_ws(' ',
              |        slice(toks, CAST(i * 15 + 1 AS INT), 30))) AS chunk_md5))
              |END""".stripMargin)).as("c"))
          .select(col("doc_id"), col("c.chunk_id"), col("c.start_tok"),
            col("c.n_toks"), col("c.chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT doc_id,
          |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, unnest(CASE WHEN len(toks) < 30 THEN
          |      [struct_pack(chunk_id := CAST(0 AS BIGINT),
          |                   start_tok := CAST(0 AS BIGINT),
          |                   n_toks := CAST(len(toks) AS BIGINT),
          |                   chunk_md5 := md5(array_to_string(toks, ' ')))]
          |    ELSE list_transform(range(0, (len(toks) - 30) // 15 + 1),
          |      i -> struct_pack(chunk_id := i, start_tok := i * 15,
          |             n_toks := CAST(30 AS BIGINT),
          |             chunk_md5 := md5(array_to_string(
          |               toks[i*15+1 : i*15+30], ' '))))
          |    END) AS c
          |  FROM d)
          |SELECT doc_id, c.chunk_id AS chunk_id, c.start_tok AS start_tok,
          |  c.n_toks AS n_toks, c.chunk_md5 AS chunk_md5
          |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // Reproducible stratified train/val/test split — the dataset-freeze
    // step: every doc lands in exactly one split by a pure content-free
    // hash rule (md5(doc_id) head mod 100 → 80/10/10), so the assignment
    // is identical on any cluster, any partitioning, any engine — the
    // q50 hash-threshold idiom promoted from sampling to partitioning.
    // Output is the split MANIFEST per (lang, source, split): doc and
    // char counts — what a data card publishes and a re-run must
    // reproduce byte-for-byte. Disjoint and exhaustive by construction
    // (the three CASE arms partition 0..99).
    //
    // 100 TB shape: one scan, per-row hash + CASE, one map-side-combined
    // aggregate on (lang, source, split) — ~|strata|×3 rows out, zero
    // joins.
    // Curriculum shard packing: order the corpus easy→hard (ascending
    // token length — the published sequence-length curriculum heuristic),
    // then pack the ORDERED stream into 4000-token shards, so shard k is
    // strictly easier than shard k+1 and a trainer consumes shards in
    // id order. The global cumulative sum is computed WITHOUT a
    // single-partition window — the distributed prefix-sum shape:
    // range-partition on the curriculum key, per-range window cumsum
    // (the window re-keys on pid: one extra 16-way shuffle of the
    // 16-byte (doc_id, toks) projection — the price of never sorting
    // the corpus on one task), then one |partitions|-row offset table
    // (bounded collect) broadcast back. Range boundaries come from
    // sampling and are NOT deterministic, but cum(doc) = Σ toks of docs
    // ordered before it is boundary-INVARIANT, so the output is
    // engine-exact anyway — that invariance is what makes the pattern
    // safe at 1000 executors.
    "q111_curriculum_pack" -> QueryDef(
      fn = { (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir)
          .withColumn("toks", size(toksCol).cast("long"))
          .select("doc_id", "toks")
        val parts = d.repartitionByRange(16, col("toks"), col("doc_id"))
          .withColumn("pid", spark_partition_id())
          // materialize ONCE (r10): the totals collect and the final join
          // are separate jobs, and each re-execution of a
          // repartitionByRange RE-SAMPLES its boundaries (the sample seed
          // rides the new RDD id) — at sf0.1 the two runs disagreed by a
          // few docs near boundaries, skewing the offset table against
          // the final run's pids. Pinning the partitioning makes the
          // boundary-invariance argument hold the way the plan note
          // claims: ONE consistent pid assignment, corpus-projection-
          // sized blocks (16 bytes/doc), freed by the sweep's unpersist.
          .localCheckpoint()
        val wIn = Window.partitionBy(col("pid"))
          .orderBy(col("toks"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = parts.withColumn("lcum",
          coalesce(sum(col("toks")).over(wIn), lit(0L)))
        // per-partition totals: |partitions| rows — the bounded collect
        val totals = local.groupBy(col("pid"))
          .agg(sum(col("toks")).as("ptot"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
          (pid, acc + t)
        }.sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }
          .toSeq
        val offDf = s.createDataFrame(
          if (offsets.isEmpty) Seq((0, 0L)) else offsets).toDF("pid", "off")
        local.join(broadcast(offDf), Seq("pid"), "left")
          .withColumn("cum", col("lcum") + coalesce(col("off"), lit(0L)))
          .withColumn("shard", expr("cum div 4000"))
          .select("doc_id", "toks", "shard")
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, toks, cum // 4000 AS shard
          |FROM (
          |  SELECT doc_id, toks,
          |    CAST(coalesce(sum(toks) OVER (ORDER BY toks, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS cum
          |  FROM (SELECT doc_id,
          |          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
          |            AS BIGINT) AS toks
          |        FROM documents))
          |ORDER BY doc_id""".stripMargin)),

    "q100_split_assign" -> QueryDef(
      fn = { (s, dir) =>
        val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long")
        docs(s, dir)
          .withColumn("split",
            when(u % 100 < 80, "train").when(u % 100 < 90, "val")
              .otherwise("test"))
          .groupBy(col("lang"), col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang", "source", "split")
      },
      oracle = Some(
        """WITH a AS (
          |  SELECT lang, source, n_chars,
          |    CASE WHEN u % 100 < 80 THEN 'train'
          |         WHEN u % 100 < 90 THEN 'val'
          |         ELSE 'test' END AS split
          |  FROM (
          |    SELECT lang, source, n_chars,
          |      CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
          |        AS BIGINT) AS u
          |    FROM documents))
          |SELECT lang, source, split, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM a GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Length-trend outlier screen via EXACT closed-form OLS: regress
    // n_chars on token count across the whole corpus and surface the 20
    // docs whose residual magnitude is largest — the "weird length ratio"
    // quality screen (punctuation soup, single-token walls, boilerplate).
    // ALL arithmetic is integer-exact: with centered moments
    // Sxx' = n·Σx² − (Σx)² and Sxy' = n·Σxy − Σx·Σy, the residual scales
    // to scaled_i = (n·yᵢ − Σy)·Sxx' − Sxy'·(n·xᵢ − Σx) = eᵢ·n·Sxx' — a
    // DECIMAL(38,0)/HUGEINT quantity both engines rank identically (no
    // division, no doubles, no rounding drift at the top-k boundary).
    // The reported resid_milli = ⌊|scaled|·1000 / (n·Sxx')⌋ ≈ eᵢ·1000 is
    // derived AFTER ranking, truncation-exact in both engines on the
    // non-negative numerator. At 100 TB: one map-side-combined 5-sum
    // aggregate to a single broadcast row, then a second corpus scan into
    // TakeOrderedAndProject(20) — the corpus never shuffles.
    // One-pass Poisson bootstrap (Chamandy/Muralidharan/Najmi/Naidu,
    // "Estimating Uncertainty for Massive Data Streams", Google 2012): a
    // corpus-level metric (mean chars/doc) gets a CONFIDENCE INTERVAL in
    // one pass — each of 32 replicas reweights every doc by an
    // independent Poisson(1) draw (≈ resampling with replacement without
    // materializing resamples), and the replica means' 2nd/31st order
    // statistics bound the 94% CI. Determinism: the draw inverts the
    // Poisson(1) CDF at a 60-bit md5 hash of (doc_id, replica) — the CDF
    // thresholds are computed ONCE driver-side and inlined as BIGINT
    // literals in BOTH engines (the q164 weight pattern), the weight is a
    // sum of 8 comparisons, and every mean is integer-quantized — the CI
    // itself is value-proven cross-engine. Plan at 100 TB: the ×32
    // expansion is an IN-ROW explode (q115's join-free shape), replica
    // sums are ONE map-side-combined aggregate over 32 groups, and the
    // order statistics rank 32 rows — uncertainty costs one extra scan
    // constant, not a resample of the corpus.
    "q165_bootstrap_ci" -> QueryDef(
      fn = { (s, dir) =>
        val thresholds = {
          var fact = 1.0; var cum = 0.0
          (0 to 7).map { k =>
            if (k > 0) fact *= k
            cum += math.exp(-1.0) / fact
            math.floor(cum * (1L << 60).toDouble).toLong
          }
        }
        val wExpr = thresholds.map(t => s"(CASE WHEN u >= ${t}L THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
        val reps = d.select(col("doc_id"), col("n_chars"),
          explode(expr("sequence(0, 31)")).as("b"))
          .withColumn("u", conv(substring(md5(
            concat(col("doc_id").cast("string"), lit(":"),
              col("b").cast("string"))), 1, 15), 16, 10).cast("long"))
          .withColumn("w", expr(wExpr).cast("long"))
        val means = reps.groupBy(col("b"))
          .agg(sum(col("w") * col("n_chars")).as("swx"), sum(col("w")).as("sw"))
          .filter(col("sw") > 0)
          .withColumn("mean_micro", expr("(1000000 * swx) div sw"))
        val r = Window.orderBy(col("mean_micro"), col("b"))
        val ci = means.withColumn("r", row_number().over(r))
          .agg(
            max(when(col("r") === 2, col("mean_micro"))).as("ci_lo_micro"),
            max(when(col("r") === 31, col("mean_micro"))).as("ci_hi_micro"),
            count(lit(1)).as("n_replicas"))
        val point = d.agg(count(lit(1)).as("n_docs"),
          expr("(1000000 * sum(n_chars)) div count(1)").as("mean_micro"))
        point.crossJoin(ci)
          .select("n_docs", "mean_micro", "ci_lo_micro", "ci_hi_micro",
            "n_replicas")
      },
      oracle = Some {
        val thresholds = {
          var fact = 1.0; var cum = 0.0
          (0 to 7).map { k =>
            if (k > 0) fact *= k
            cum += math.exp(-1.0) / fact
            math.floor(cum * (1L << 60).toDouble).toLong
          }
        }
        val wExpr = thresholds.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH reps AS (
           |  SELECT doc_id, n_chars, unnest(range(32)) AS b FROM documents),
           |hashed AS (
           |  SELECT n_chars,  b,
           |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
           |      ':', CAST(b AS VARCHAR))), 1, 15)) AS BIGINT) AS u
           |  FROM reps),
           |weighted AS (SELECT b, n_chars, CAST($wExpr AS BIGINT) AS w FROM hashed),
           |means AS (
           |  SELECT b, (1000000 * CAST(sum(w * n_chars) AS BIGINT))
           |      // CAST(sum(w) AS BIGINT) AS mean_micro
           |  FROM weighted GROUP BY b HAVING sum(w) > 0),
           |ranked AS (SELECT mean_micro,
           |    row_number() OVER (ORDER BY mean_micro, b) AS r FROM means),
           |ci AS (SELECT
           |    max(CASE WHEN r = 2 THEN mean_micro END) AS ci_lo_micro,
           |    max(CASE WHEN r = 31 THEN mean_micro END) AS ci_hi_micro,
           |    CAST(count(*) AS BIGINT) AS n_replicas FROM ranked),
           |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |    (1000000 * CAST(sum(n_chars) AS BIGINT))
           |      // CAST(count(*) AS BIGINT) AS mean_micro FROM documents)
           |SELECT n_docs, mean_micro, ci_lo_micro, ci_hi_micro, n_replicas
           |FROM pt, ci""".stripMargin
      }),

    "q114_residual_outliers" -> QueryDef(
      fn = { (s, dir) =>
        def dec(c: Column) = c.cast("decimal(38,0)")
        val d = docs(s, dir).select(col("doc_id"),
          size(toksCol).cast("long").as("toks"), col("n_chars"))
        val g = d.agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(dec(col("toks"))).as("sx"),
          sum(dec(col("n_chars"))).as("sy"),
          sum(dec(col("toks")) * dec(col("toks"))).as("sxx"),
          sum(dec(col("toks")) * dec(col("n_chars"))).as("sxy"))
        d.crossJoin(broadcast(g))
          .withColumn("sxxc", col("n") * col("sxx") - col("sx") * col("sx"))
          .withColumn("sxyc", col("n") * col("sxy") - col("sx") * col("sy"))
          .withColumn("scaled",
            (col("n") * dec(col("n_chars")) - col("sy")) * col("sxxc") -
              col("sxyc") * (col("n") * dec(col("toks")) - col("sx")))
          .withColumn("resid_milli", expr(
            """CAST(CASE WHEN scaled < 0
              |  THEN -((abs(scaled) * 1000) div (n * sxxc))
              |  ELSE (abs(scaled) * 1000) div (n * sxxc) END AS BIGINT)"""
              .stripMargin))
          .orderBy(abs(col("scaled")).desc, col("doc_id"))
          .limit(20)
          .select("doc_id", "toks", "n_chars", "resid_milli")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT doc_id,
          |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
          |      AS HUGEINT) AS toks,
          |    CAST(n_chars AS HUGEINT) AS n_chars
          |  FROM documents),
          |g AS (
          |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(toks) AS sx,
          |    sum(n_chars) AS sy, sum(toks * toks) AS sxx,
          |    sum(toks * n_chars) AS sxy
          |  FROM d),
          |r AS (
          |  SELECT doc_id, toks, n_chars,
          |    (n * n_chars - sy) * (n * sxx - sx * sx)
          |      - (n * sxy - sx * sy) * (n * toks - sx) AS scaled,
          |    n * (n * sxx - sx * sx) AS denom
          |  FROM d CROSS JOIN g)
          |SELECT CAST(doc_id AS BIGINT) AS doc_id,
          |  CAST(toks AS BIGINT) AS toks,
          |  CAST(n_chars AS BIGINT) AS n_chars,
          |  CAST(CASE WHEN scaled < 0 THEN -((abs(scaled) * 1000) // denom)
          |       ELSE (abs(scaled) * 1000) // denom END AS BIGINT)
          |    AS resid_milli
          |FROM r ORDER BY abs(scaled) DESC, doc_id LIMIT 20""".stripMargin)),

    // Deterministic epoch-wise global reshuffle — the training-loader
    // contract that every epoch visits the corpus in a DIFFERENT but
    // REPRODUCIBLE order with balanced shards: epoch e's key for a doc is
    // the md5 of "doc_id:e" (cross-engine-stable, uniform), the shard is
    // key mod 16, and the within-shard order is (key, doc_id). No global
    // sort and no corpus shuffle ever happens: shard assignment is a
    // per-row hash expression, epochs explode IN-ROW (3 rows per doc from
    // one scan), and only the 48-group rollup aggregates — at 100 TB the
    // plan is scan → generate → two-phase hash aggregate, and a writer
    // would emit shard files with sortWithinPartitions(key), still with
    // zero wide shuffles. min/max of the hash per shard prove the
    // assignment deterministic across engines, not just the counts.
    "q115_epoch_shuffle" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), size(toksCol).cast("long").as("toks"))
          .withColumn("epoch", explode(sequence(lit(0), lit(2))))
          .withColumn("u",
            conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
              col("epoch").cast("string"))), 1, 8), 16, 10).cast("long"))
          .withColumn("shard", (col("u") % 16).cast("int"))
          .groupBy(col("epoch"), col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_toks"),
            min(col("u")).as("min_key"), max(col("u")).as("max_key"))
          .orderBy("epoch", "shard")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT doc_id,
          |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
          |      AS BIGINT) AS toks
          |  FROM documents),
          |e AS (
          |  SELECT doc_id, toks, CAST(epoch AS INT) AS epoch,
          |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
          |      ':', CAST(epoch AS VARCHAR))), 1, 8)) AS BIGINT) AS u
          |  FROM d, range(3) t(epoch))
          |SELECT epoch, CAST(u % 16 AS INT) AS shard, count(*) AS n_docs,
          |  CAST(sum(toks) AS BIGINT) AS sum_toks,
          |  min(u) AS min_key, max(u) AS max_key
          |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // DISTRIBUTED CLASSIFIER TRAINING under the oracle gate: a batch
    // perceptron (Rosenblatt's rule, full-batch variant) learns to
    // predict "above-mean-length document" from surface counts — common-
    // word hits, distinct-token count, long-token count, token count —
    // in THREE unrolled iterations of
    //   w ← w + Σ_{yᵢ·⟨w,xᵢ⟩ ≤ 0} yᵢ·xᵢ
    // over EXACTLY-CENTERED features xⱼ = n·rⱼ − Σrⱼ (the integer-exact
    // centering that makes a bias term unnecessary and full-batch
    // updates convergent — the uncentered variant provably oscillates on
    // this data). Every quantity is an integer: features are scaled
    // counts, the label is the exact comparison n·n_charsᵢ > Σ n_chars,
    // updates are integer sums, and the only wide values — the margins —
    // are computed in DECIMAL(38,0)/HUGEINT so no engine ever wraps.
    // No transcendental appears anywhere (unlike sigmoid gradients whose
    // last ulp is libm-dependent), so the learned weights and training
    // accuracy hash identically across engines. This is the trained
    // quality/domain-filter shape (the fastText-classifier role in
    // published pretraining pipelines) reduced to its distributable
    // core: each iteration is ONE map-side-combined aggregate producing
    // a 4-number update broadcast back — the corpus never shuffles, and
    // 100 iterations at 100 TB still move only 4 numbers per round.
    "q121_perceptron_quality" -> QueryDef(
      fn = { (s, dir) =>
        val (w3, margin) = trainedFrame(s, dir)
        val ws = Seq("w2", "w3", "w4", "w5")
        w3.groupBy(ws.map(col): _*)
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("y").cast("decimal(38,0)") * margin > 0, 1L)
              .otherwise(0L)).as("n_correct"))
          .select((ws.map(col) :+ col("n_docs") :+ col("n_correct")): _*)
      },
      oracle = Some {
        val common = Seq("join", "hash", "row", "batch", "scan", "customer",
          "column", "filter").map(w => s"'$w'").mkString(", ")
        def marginSql(pre: String): String =
          (2 to 5).map(i =>
            s"CAST($pre.w$i AS HUGEINT) * CAST(x$i AS HUGEINT)")
            .mkString(" + ")
        def stepSql(name: String, prev: String): String =
          s"""$name AS (
             |  SELECT ${(2 to 5).map(i =>
            s"CAST($prev.w$i + sum(CASE WHEN y * (${marginSql(prev)}) <= 0 " +
              s"THEN y * x$i ELSE 0 END) AS BIGINT) AS w$i").mkString(", ")}
             |  FROM f CROSS JOIN $prev
             |  GROUP BY ${(2 to 5).map(i => s"$prev.w$i").mkString(", ")})"""
            .stripMargin
        s"""WITH raw AS (
           |  SELECT n_chars,
           |    CAST(len(list_filter(toks, t -> t IN ($common))) AS BIGINT) AS r2,
           |    CAST(len(list_distinct(toks)) AS BIGINT) AS r3,
           |    CAST(len(list_filter(toks, t -> length(t) >= 6)) AS BIGINT) AS r4,
           |    CAST(len(toks) AS BIGINT) AS r5
           |  FROM (SELECT n_chars,
           |          regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |        FROM documents)),
           |g AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(n_chars) AS BIGINT) AS schars,
           |    CAST(sum(r2) AS BIGINT) AS s2, CAST(sum(r3) AS BIGINT) AS s3,
           |    CAST(sum(r4) AS BIGINT) AS s4, CAST(sum(r5) AS BIGINT) AS s5
           |  FROM raw),
           |f AS (
           |  SELECT CASE WHEN n_chars * n > schars THEN 1 ELSE -1 END AS y,
           |    n * r2 - s2 AS x2, n * r3 - s3 AS x3,
           |    n * r4 - s4 AS x4, n * r5 - s5 AS x5
           |  FROM raw CROSS JOIN g),
           |w0 AS (SELECT ${(2 to 5).map(i => s"CAST(0 AS BIGINT) AS w$i")
            .mkString(", ")}),
           |${stepSql("s1", "w0")},
           |${stepSql("s2x", "s1")},
           |${stepSql("s3x", "s2x")}
           |SELECT s3x.w2, s3x.w3, s3x.w4, s3x.w5,
           |  count(*) AS n_docs,
           |  CAST(sum(CASE WHEN y * (${marginSql("s3x")}) > 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_correct
           |FROM f CROSS JOIN s3x
           |GROUP BY 1, 2, 3, 4""".stripMargin
      }),

    // ACTIVE-LEARNING SAMPLE from the trained model: the 20 documents the
    // q121 classifier is MOST CONFIDENTLY WRONG about (largest |margin|
    // among misclassified, ties by doc_id) — the label-noise/hard-example
    // audit batch a data curation loop sends for review. Ranking compares
    // the exact DECIMAL(38,0)/HUGEINT margins (never a rounded score), so
    // the sample boundary is engine-exact; the output carries doc_id, the
    // gold label, and the model's (wrong) prediction. Plan shape: the
    // q121 training chain (broadcast-only) plus one
    // TakeOrderedAndProject(20) — still zero corpus shuffles.
    "q122_active_learning" -> QueryDef(
      fn = { (s, dir) =>
        val (w3, margin) = trainedFrame(s, dir)
        def dec(c: Column) = c.cast("decimal(38,0)")
        w3.withColumn("m", margin)
          .filter(dec(col("y")) * col("m") <= 0)
          .withColumn("predicted", when(col("m") > 0, 1L).otherwise(-1L))
          .orderBy(abs(col("m")).desc, col("doc_id"))
          .limit(20)
          .select("doc_id", "y", "predicted")
      },
      oracle = Some {
        val common = perceptronWords.map(w => s"'$w'").mkString(", ")
        def marginSql(pre: String): String =
          (2 to 5).map(i =>
            s"CAST($pre.w$i AS HUGEINT) * CAST(x$i AS HUGEINT)")
            .mkString(" + ")
        def stepSql(name: String, prev: String): String =
          s"""$name AS (
             |  SELECT ${(2 to 5).map(i =>
            s"CAST($prev.w$i + sum(CASE WHEN y * (${marginSql(prev)}) <= 0 " +
              s"THEN y * x$i ELSE 0 END) AS BIGINT) AS w$i").mkString(", ")}
             |  FROM f CROSS JOIN $prev
             |  GROUP BY ${(2 to 5).map(i => s"$prev.w$i").mkString(", ")})"""
            .stripMargin
        s"""WITH raw AS (
           |  SELECT doc_id, n_chars,
           |    CAST(len(list_filter(toks, t -> t IN ($common))) AS BIGINT) AS r2,
           |    CAST(len(list_distinct(toks)) AS BIGINT) AS r3,
           |    CAST(len(list_filter(toks, t -> length(t) >= 6)) AS BIGINT) AS r4,
           |    CAST(len(toks) AS BIGINT) AS r5
           |  FROM (SELECT doc_id, n_chars,
           |          regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |        FROM documents)),
           |g AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(n_chars) AS BIGINT) AS schars,
           |    CAST(sum(r2) AS BIGINT) AS s2, CAST(sum(r3) AS BIGINT) AS s3,
           |    CAST(sum(r4) AS BIGINT) AS s4, CAST(sum(r5) AS BIGINT) AS s5
           |  FROM raw),
           |f AS (
           |  SELECT doc_id,
           |    CASE WHEN n_chars * n > schars THEN 1 ELSE -1 END AS y,
           |    n * r2 - s2 AS x2, n * r3 - s3 AS x3,
           |    n * r4 - s4 AS x4, n * r5 - s5 AS x5
           |  FROM raw CROSS JOIN g),
           |w0 AS (SELECT ${(2 to 5).map(i => s"CAST(0 AS BIGINT) AS w$i")
            .mkString(", ")}),
           |${stepSql("s1", "w0")},
           |${stepSql("s2x", "s1")},
           |${stepSql("s3x", "s2x")},
           |scored AS (
           |  SELECT doc_id, y, ${marginSql("s3x")} AS m
           |  FROM f CROSS JOIN s3x)
           |SELECT doc_id, CAST(y AS BIGINT) AS y,
           |  CAST(CASE WHEN m > 0 THEN 1 ELSE -1 END AS BIGINT) AS predicted
           |FROM scored WHERE y * m <= 0
           |ORDER BY abs(m) DESC, doc_id LIMIT 20""".stripMargin
      }),

    // k-anonymity generalization-ladder audit (Sweeney IJUFKS'02; the
    // governance twin of q52's PII redaction): treat (nation, market
    // segment, account-balance bucket) as the quasi-identifier and report,
    // for EVERY generalization level of the ladder at once, how many
    // equivalence classes exist, how many violate k=5, and how many rows
    // sit in violating classes — the table a privacy review needs to pick
    // the minimal generalization that satisfies k. One ROLLUP aggregate
    // computes all four levels in a single corpus pass (Spark expands the
    // grouping sets INSIDE the two-phase hash aggregate — no per-level
    // re-scan), and the per-level summary is a second aggregate over the
    // class table (vocab-sized). At 100 TB: one shuffle on the QI key,
    // map-side combined; nothing else moves.
    "q124_kanon_ladder" -> QueryDef(
      fn = { (s, dir) =>
        val k = 5L
        val classes = Tables.load(s, dir, "customer")
          .select(col("c_nationkey").cast("long").as("nation"),
            col("c_mktsegment").as("segment"),
            (floor(col("c_acctbal") / 1000.0) * 1000).cast("long")
              .as("bal_bucket"))
          .rollup(col("nation"), col("segment"), col("bal_bucket"))
          .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        classes.groupBy(col("gid").cast("long").as("gid"))
          .agg(count(lit(1)).as("n_classes"),
            sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating"),
            sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"))
          .orderBy("gid")
      },
      oracle = Some(
        """WITH cls AS (
          |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
          |    CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS bal_bucket,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(GROUPING(c_nationkey, c_mktsegment,
          |      CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT)) AS BIGINT)
          |      AS gid
          |  FROM customer
          |  GROUP BY ROLLUP(1, 2, 3))
          |SELECT gid, CAST(count(*) AS BIGINT) AS n_classes,
          |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_violating,
          |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
          |    AS rows_at_risk
          |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DSIR-style importance weighting (Xie NeurIPS'23 "Data Selection via
    // Importance Resampling"): hashed-bigram features, a target feature
    // distribution estimated from the in-domain slice (lang = 'en' here),
    // a raw distribution from the whole corpus, and a per-document
    // importance score that up-weights documents whose features look like
    // the target. Deviation from the paper, for cross-engine exactness:
    // the per-feature statistic is the QUANTIZED probability ratio
    // floor(1e9 · p_target(f)/p_raw(f)) summed per document (an exact-
    // BIGINT, logs-free surrogate for the paper's log-ratio sum — same
    // add-one smoothing, same hashed feature space). The top-50 most
    // target-like documents surface, mean-normalized so length doesn't
    // dominate. Plan at 100 TB: features generate in-row (one md5 + conv
    // per bigram); BOTH distributions are two-phase aggregates collapsing
    // to the 4096-bucket space; the model (4096 rows) broadcasts into the
    // feature stream, so the corpus shuffles exactly once — into the
    // per-document aggregate — and the top-50 is a TakeOrderedAndProject.
    "q126_dsir_weights" -> QueryDef(
      fn = { (s, dir) =>
        val b = 4096L
        val d = docs(s, dir)
          .select(col("doc_id"), col("lang"), Text.toksCol.as("toks"))
        val fx = d.filter(size(col("toks")) >= 2)
          .select(col("doc_id"), col("lang"), explode(expr(
            """transform(sequence(1, size(toks) - 1),
              |  i -> concat(element_at(toks, i), ' ',
              |              element_at(toks, i + 1)))""".stripMargin)).as("f"))
          .withColumn("h",
            conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long") % b)
        // r14 OPT (guide §1.2/§3.3): raw, target and total counts were
        // three separate corpus passes over the md5-bigram stream, plus a
        // fourth for the scoring join. One per-bucket aggregate carries
        // both counts (t sums conditionally — identical values: tgt ⊆ raw
        // bucket-wise, so the old LEFT JOIN + fill(0) equals the
        // conditional sum), totals fold from the 4096-row bucket frame,
        // and the stream itself is pinned so it generates once per action.
        val fxP = fx.localCheckpoint()
        val byH = fxP.groupBy(col("h")).agg(count(lit(1)).as("r"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"))
        val tot = byH.agg(sum(col("r")).as("rt"), sum(col("t")).as("tt"))
        val model = byH
          .crossJoin(broadcast(tot))
          .select(col("h"), floor(lit(1e9) *
            ((col("t") + lit(1)).cast("double") /
              (col("tt") + lit(b)).cast("double")) /
            ((col("r") + lit(1)).cast("double") /
              (col("rt") + lit(b)).cast("double"))).cast("long").as("w_q"))
        fxP.join(broadcast(model), Seq("h"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_feats"), sum(col("w_q")).as("w_sum_q"))
          .withColumn("avg_w_q", expr("w_sum_q div n_feats"))
          .orderBy(col("avg_w_q").desc, col("doc_id"))
          .limit(50)
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT doc_id, lang,
          |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |  FROM documents),
          |fx AS (
          |  SELECT doc_id, lang,
          |    CAST(concat('0x', substr(md5(f), 1, 8)) AS BIGINT) % 4096 AS h
          |  FROM (SELECT doc_id, lang, unnest(list_transform(
          |      range(1, len(toks)),
          |      i -> concat(toks[CAST(i AS INT)], ' ',
          |                  toks[CAST(i AS INT) + 1]))) AS f
          |    FROM d WHERE len(toks) >= 2)),
          |raw AS (SELECT h, CAST(count(*) AS BIGINT) AS r FROM fx GROUP BY 1),
          |tgt AS (SELECT h, CAST(count(*) AS BIGINT) AS t
          |  FROM fx WHERE lang = 'en' GROUP BY 1),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS rt,
          |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
          |  FROM fx),
          |model AS (
          |  SELECT raw.h, CAST(floor(1e9 *
          |    (CAST(COALESCE(t, 0) + 1 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE)) /
          |    (CAST(r + 1 AS DOUBLE) / CAST(rt + 4096 AS DOUBLE)))
          |    AS BIGINT) AS w_q
          |  FROM raw LEFT JOIN tgt ON raw.h = tgt.h CROSS JOIN tot),
          |sc AS (
          |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
          |    CAST(sum(w_q) AS BIGINT) AS w_sum_q
          |  FROM fx JOIN model USING (h) GROUP BY 1, 2)
          |SELECT doc_id, lang, n_feats, w_sum_q,
          |  w_sum_q // n_feats AS avg_w_q
          |FROM sc ORDER BY avg_w_q DESC, doc_id LIMIT 50""".stripMargin)),
  )
}
