package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Exact._

/** Corpus-level analytics a training-data pipeline runs between ingestion
  * and shipping: TF-IDF term salience, repetition-based quality filtering,
  * behavioral transition matrices, statistical anomaly screens, sliding
  * (hopping) time windows, and per-label embedding centroids.
  *
  * Determinism contract (matches the rest of the repo): every aggregate
  * rides exact INT64/DECIMAL renditions; the only floating-point ops are
  * single IEEE +,−,×,÷,sqrt over values derived from exact integers, so
  * Spark and the DuckDB oracle produce bit-identical doubles and the
  * driver's value hash matches. No UDFs — all per-row work is codegen
  * expression work.
  */
object Corpus {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private def toksCol: Column = Text.toksCol

  /** (doc_id, a, b): the in-row adjacent-bigram stream of a `text` column
    * (shared by q123's batch scoring and the streaming twin).
    */
  private def lmBigrams(docsDf: DataFrame): DataFrame =
    docsDf.select(col("doc_id"), toksCol.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS a,
          |              element_at(toks, i + 1) AS b))""".stripMargin))
        .as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

  /** Train the add-one-smoothed bigram model on a (doc_id, text) corpus:
    * returns the probability table (a, b, p_q) — p_q = floor(1e12 ·
    * (c_ab+1)/(c_a+V)), exact BIGINT — and the vocabulary size V (the
    * smoothing constant a scorer needs for bigrams the model never saw).
    * Model-table cardinality is the corpus's distinct-bigram count
    * (vocab-sized, never corpus-sized); persist it as a CommitLog table
    * to freeze a model release for streaming scoring.
    */
  def lmModel(docsDf: DataFrame): (DataFrame, Long) = {
    val bg = lmBigrams(docsDf)
    val cab = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val ca = bg.groupBy(col("a")).agg(count(lit(1)).as("c_a"))
    val v = docsDf.select(explode(toksCol).as("tok"))
      .agg(countDistinct(col("tok"))).collect()(0).getLong(0)
    // model assembled vocab-side (c_ab ⋈ c_a on `a`, both ≪ corpus), so
    // the corpus-sized scoring stream meets ONE probability table
    val model = cab.join(ca, Seq("a"))
      .select(col("a"), col("b"),
        floor(lit(1e12) * ((col("c_ab") + lit(1)).cast("double") /
          (col("c_a") + lit(v)).cast("double"))).cast("long").as("p_q"))
    (model, v)
  }

  /** Score (doc_id, text) documents against a trained bigram model: mean
    * quantized token probability per document. Bigrams the model never
    * saw score at the Laplace floor 1/V (c_ab = 0 over an unseen
    * context) — for documents FROM the training corpus the fallback
    * never fires, so batch scoring is exactly q123; for NEW documents
    * (the streaming path) it is the standard smoothed assignment.
    */
  def lmScore(docsDf: DataFrame, model: DataFrame, v: Long): DataFrame =
    lmBigrams(docsDf)
      .join(model, Seq("a", "b"), "left")
      .withColumn("pw", coalesce(col("p_q"),
        floor(lit(1e12) * (lit(1.0) / lit(v.toDouble))).cast("long")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("pw")).as("p_sum_q"))
      .withColumn("avg_p_q", expr("p_sum_q div n_bigrams"))

  /** DuckDB program that re-learns `k` BPE merges from `documents`,
    * mirroring [[Bpe.train]] exactly (q129's oracle). Stage tables carry
    * each word as a SPACED STRING — ` a  b  c ` (every token wrapped in
    * its own single spaces, so adjacent tokens meet as a double space) —
    * because that framing makes one SQL `replace(s, ' a  b ', ' ab ')`
    * exactly the left-to-right non-overlapping merge fold: a consumed
    * occurrence eats its neighbours' inner delimiters, so overlapping
    * occurrences can't double-merge (` a  a  a ` → ` aa  a `, the fold's
    * answer), while disjoint occurrences each keep a full frame and all
    * merge in one pass. Pair STATISTICS still count every adjacent index
    * (overlap included), matching pairCounts — enumeration goes through
    * the token list, not string search. Every CTE is MATERIALIZED: each
    * stage is referenced twice (next stage + its pair table), so inlining
    * would double the expression tree per stage — 2^k by the last one.
    */
  private def bpeTrainOracle(k: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT ' ' || replace(rtrim(regexp_replace(w, '(.)', '\1,', 'g'), ','), ',', '  ') || ' ' AS s,
        |    CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(
        |      trim(regexp_replace(lower(trim(text)), '[^a-z\s]', ' ', 'g')), '\s+'),
        |      t -> length(t) >= 1)) AS w FROM documents)
        |  GROUP BY 1)""".stripMargin
    val stages = (1 to k).flatMap { i =>
      Seq(
        s"""p$i AS MATERIALIZED (
           |  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS n FROM (
           |    SELECT freq, unnest(list_transform(range(1, len(toks)),
           |      j -> struct_pack(l := toks[CAST(j AS INT)], r := toks[CAST(j AS INT) + 1]))) AS p
           |    FROM (SELECT freq, string_split(trim(s, ' '), '  ') AS toks FROM w${i - 1})
           |    WHERE len(toks) >= 2)
           |  GROUP BY 1, 2)""".stripMargin,
        s"b$i AS MATERIALIZED (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1)",
        s"""w$i AS MATERIALIZED (
           |  SELECT replace(s,
           |    ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
           |    ' ' || (SELECT l FROM b$i) || (SELECT r FROM b$i) || ' ') AS s, freq
           |  FROM w${i - 1})""".stripMargin)
    }
    val finals = (1 to k)
      .map(i => s"SELECT $i AS rank, l AS a, r AS b, n FROM b$i")
      .mkString("\nUNION ALL\n")
    (Seq(w0) ++ stages).mkString("WITH ", ",\n", "") +
      s"\nSELECT * FROM (\n$finals\n) ORDER BY rank"
  }

  /** DuckDB re-derivation of [[Unigram.trainLocal]] — the q129
    * discipline applied to the unigram family: the oracle re-learns the
    * vocabulary FROM SCRATCH with chained CTEs, one block per hard-EM
    * round (recursive Viterbi DP forward pass with the (score, -pieces,
    * lastLen) struct-max tie rule, a recursive backtrack emitting the
    * chosen pieces, frequency-weighted recount, coverage-floored
    * singles + count-pruned multis, Q20 square-and-shift log2 rescore).
    * Every quantity is BIGINT, so a hash match means the TRAINED piece
    * table — surfaces, counts, and scores — is bit-identical.
    */
  private def unigramTrainOracle(rounds: Int, maxPieceLen: Int,
      seedMulti: Int, keep: Seq[Int]): String = {
    def lgBlock(tag: String): String =
      s"""lg${tag}it AS (
         |  SELECT n, CAST(length(bin(n)) - 1 AS BIGINT) AS m,
         |    CASE WHEN length(bin(n)) - 1 <= 30
         |      THEN n << (30 - (length(bin(n)) - 1))
         |      ELSE n >> ((length(bin(n)) - 1) - 30) END AS x,
         |    CAST(0 AS BIGINT) AS acc, 0 AS i
         |  FROM lg${tag}vals
         |  UNION ALL
         |  SELECT n, m,
         |    CASE WHEN ((x * x) >> 30) >= 2147483648
         |      THEN ((x * x) >> 30) >> 1 ELSE (x * x) >> 30 END,
         |    acc * 2 + CASE WHEN ((x * x) >> 30) >= 2147483648 THEN 1 ELSE 0 END,
         |    i + 1
         |  FROM lg${tag}it WHERE i < 20),
         |lg$tag AS (SELECT n, (m << 20) + acc AS lg FROM lg${tag}it WHERE i = 20)"""
        .stripMargin
    // v$r (p, cnt) → sc$r (p, cnt, s) + the vocab-as-list vv$r the next
    // round's DP lambda scans (q138's broadcast idiom)
    def scoreBlock(r: Int): String =
      s"""t$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM v$r),
         |lg${r}vals AS (SELECT DISTINCT cnt AS n FROM v$r
         |  UNION SELECT t AS n FROM t$r),
         |${lgBlock(r.toString)},
         |sc$r AS (SELECT v$r.p, v$r.cnt,
         |  lg$r.lg - (SELECT lg FROM lg$r, t$r WHERE lg$r.n = t$r.t) AS s
         |  FROM v$r JOIN lg$r ON lg$r.n = v$r.cnt),
         |vv$r AS (SELECT list({'p': p, 'sc': s}) AS vl FROM sc$r)"""
        .stripMargin
    def roundBlock(r: Int): String = {
      val pr = r - 1
      s"""dp$r AS (
         |  SELECT wrd.w AS w, 0 AS i,
         |    [{'s': CAST(0 AS BIGINT), 'nc': CAST(0 AS BIGINT),
         |      'pl': CAST(0 AS BIGINT)}] AS best
         |  FROM wrd
         |  UNION ALL
         |  SELECT w, i + 1,
         |    list_append(best,
         |      list_aggregate(
         |        list_filter(
         |          list_transform(range(1, least(i + 1, $maxPieceLen) + 1), L ->
         |            {'s': best[i + 2 - L].s +
         |               list_filter(vl, z -> z.p = substr(w, i + 2 - L, L))[1].sc,
         |             'nc': best[i + 2 - L].nc - 1,
         |             'pl': CAST(L AS BIGINT)}),
         |          x -> x.s IS NOT NULL),
         |        'max'))
         |  FROM dp$r, vv$pr WHERE i < length(w)),
         |bt$r AS (
         |  SELECT w, CAST(length(w) AS BIGINT) AS i, best
         |  FROM dp$r WHERE i = length(w)
         |  UNION ALL
         |  SELECT w, i - best[i + 1].pl, best FROM bt$r WHERE i > 0),
         |pieces$r AS (
         |  SELECT w, substr(w, i - best[i + 1].pl + 1, best[i + 1].pl) AS p
         |  FROM bt$r WHERE i > 0),
         |cnt$r AS (
         |  SELECT pieces$r.p AS p, CAST(sum(wrd.freq) AS BIGINT) AS cnt
         |  FROM pieces$r JOIN wrd ON wrd.w = pieces$r.w GROUP BY 1),
         |v$r AS (
         |  SELECT s.p, greatest(coalesce(c.cnt, 0), 1) AS cnt
         |  FROM singles s LEFT JOIN cnt$r c ON c.p = s.p
         |  UNION ALL
         |  SELECT p, cnt FROM (
         |    SELECT p, cnt FROM cnt$r WHERE length(p) >= 2 AND cnt >= 1
         |    ORDER BY cnt DESC, p LIMIT ${keep(r - 1)})),
         |${scoreBlock(r)}""".stripMargin
    }
    val seed =
      s"""wrd AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(list_filter(regexp_split_to_array(
         |      trim(regexp_replace(lower(trim(text)), '[^a-z\\s]', ' ', 'g')), '\\s+'),
         |      t -> length(t) >= 1)) AS w FROM documents)
         |  GROUP BY 1),
         |cand AS MATERIALIZED (
         |  SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(flatten(list_transform(
         |      range(1, $maxPieceLen + 1), L ->
         |        list_transform(range(1, length(w) - L + 2), i ->
         |          substr(w, i, L))))) AS p
         |    FROM wrd)
         |  GROUP BY 1),
         |singles AS MATERIALIZED (SELECT p, cnt FROM cand WHERE length(p) = 1),
         |v0 AS (
         |  SELECT p, cnt FROM singles
         |  UNION ALL
         |  SELECT p, cnt FROM (
         |    SELECT p, cnt FROM cand WHERE length(p) >= 2
         |    ORDER BY cnt DESC, p LIMIT $seedMulti)),
         |${scoreBlock(0)}""".stripMargin
    val body = (Seq(seed) ++ (1 to rounds).map(roundBlock)).mkString(",\n")
    s"""WITH RECURSIVE
       |$body
       |SELECT p AS piece, cnt, s AS score_q20
       |FROM sc$rounds
       |ORDER BY score_q20 DESC, piece""".stripMargin
  }

  val queries: Map[String, QueryDef] = Map(

    // TF-IDF top terms per document. One explode → (doc, term) tf counts;
    // document frequency is a second aggregate OVER THE POSTING LIST (one
    // row per doc-term, never per occurrence — the heavy-token skew is
    // absorbed by the map-side-combined tf aggregation before any join);
    // idf uses the rational BM25 core (N − df + 0.5)/(df + 0.5) instead of
    // ln() so the score is a product/quotient of exact int64-derived
    // doubles — bit-identical cross-engine (same divergence note as q49).
    // Top-3 per doc via a row_number window keyed (score DESC, term ASC):
    // ties are impossible to mis-order because terms are distinct per doc.
    // At 100 TB: tf agg shuffles on (doc_id, term), df agg on term, the
    // df join is a broadcast (vocabulary ≪ corpus after tf collapse).
    "q70_tfidf_topterms" -> QueryDef(
      fn = { (s, dir) =>
        val tf = docs(s, dir)
          .select(col("doc_id"), explode(toksCol).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
        val score = col("tf").cast("double") *
          ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(score.desc, col("tok"))
        tf.join(broadcast(df), Seq("tok"))
          .crossJoin(broadcast(n))
          .withColumn("score", score)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("doc_id", "tok", "score", "rk")
          .orderBy("doc_id", "rk")
      },
      oracle = Some(
        """WITH toks AS (
          |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |  FROM documents),
          |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
          |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
          |SELECT doc_id, tok, score, rk FROM (
          |  SELECT tf.doc_id, tf.tok,
          |    CAST(tf.tf AS DOUBLE) * ((n.n_docs - df.df + 0.5) / (df.df + 0.5)) AS score,
          |    CAST(row_number() OVER (PARTITION BY tf.doc_id
          |      ORDER BY CAST(tf.tf AS DOUBLE) * ((n.n_docs - df.df + 0.5) / (df.df + 0.5)) DESC,
          |               tf.tok) AS BIGINT) AS rk
          |  FROM tf JOIN df USING (tok) CROSS JOIN n)
          |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // Repetition-based quality filter (the Gopher/C4 duplicate-fraction
    // signals): per-doc duplicate-token and duplicate-bigram ratios, plus
    // the keep/drop verdict. Pure per-row array expression work — zero
    // shuffle, text column pruned straight off the scan; the bigram list is
    // built in-row over a hoisted token array (`sequence(1, n)` descends
    // for n < 1, hence the explicit short-doc branch — the q34 lesson).
    "q71_repetition_filter" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir)
          .withColumn("toks", toksCol)
          .withColumn("bgs", expr(
            "CASE WHEN size(toks) >= 2 THEN " +
              "transform(sequence(1, size(toks) - 1), " +
              "  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) " +
              "ELSE array() END"))
          .withColumn("n_toks", size(col("toks")).cast("long"))
          .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
          .withColumn("n_bigrams", size(col("bgs")).cast("long"))
          .withColumn("n_distinct_bigrams", size(array_distinct(col("bgs"))).cast("long"))
          .withColumn("dup_tok_ratio",
            lit(1.0) - col("n_distinct").cast("double") / col("n_toks"))
          .withColumn("dup_bigram_ratio",
            when(col("n_bigrams") > 0,
              lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
              .otherwise(lit(0.0)))
          .withColumn("keep",
            when(col("dup_tok_ratio") <= 0.5 &&
              (col("n_bigrams") === 0 || col("dup_bigram_ratio") <= 0.2), 1L)
              .otherwise(0L))
          .select("doc_id", "n_toks", "n_distinct", "dup_tok_ratio",
            "n_bigrams", "n_distinct_bigrams", "dup_bigram_ratio", "keep")
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, n_toks, n_distinct,
          |  1.0 - CAST(n_distinct AS DOUBLE) / n_toks AS dup_tok_ratio,
          |  n_bigrams, n_distinct_bigrams,
          |  CASE WHEN n_bigrams > 0
          |       THEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
          |       ELSE 0.0 END AS dup_bigram_ratio,
          |  CAST(CASE WHEN 1.0 - CAST(n_distinct AS DOUBLE) / n_toks <= 0.5
          |        AND (n_bigrams = 0 OR 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams <= 0.2)
          |       THEN 1 ELSE 0 END AS BIGINT) AS keep
          |FROM (
          |  SELECT doc_id,
          |    CAST(len(toks) AS BIGINT) AS n_toks,
          |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
          |    CAST(len(bgs) AS BIGINT) AS n_bigrams,
          |    CAST(len(list_distinct(bgs)) AS BIGINT) AS n_distinct_bigrams
          |  FROM (
          |    SELECT doc_id, toks,
          |      list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1])) AS bgs
          |    FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |          FROM documents)))
          |ORDER BY doc_id""".stripMargin)),

    // Behavioral transition matrix: next-event prediction counts from
    // per-user event sequences — lead() over a window partitioned by
    // user_id, ordered (ts, event_id) so timestamp ties are broken by the
    // unique key (determinism on ANY partitioning). At 100 TB the window
    // state is one user's events per task — bounded — and the final rollup
    // is a tiny (|types|²) aggregate.
    "q72_transitions" -> QueryDef(
      fn = { (s, dir) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, dir)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "next_type")
      },
      oracle = Some(
        """SELECT event_type, next_type, count(*) AS n FROM (
          |  SELECT event_type,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          |  FROM events)
          |WHERE next_type IS NOT NULL
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Statistical anomaly screen: per-type z-scores with mean/std derived
    // from exact decimal sums (s1 = Σv, s2 = Σv² — each v² is one IEEE
    // multiply, then an exact decimal truncation, so both engines sum
    // identical values in any order); variance = s2/n − mean², std = sqrt
    // (IEEE correctly-rounded) → every z is bit-identical cross-engine and
    // the |z| > 2.5 cut is deterministic. Plan shape: one tiny stats
    // aggregate broadcast back onto the fact scan — the q49 "scalar agg +
    // map" shape that runs unchanged at 100 TB.
    "q73_anomaly_zscore" -> QueryDef(
      fn = { (s, dir) =>
        val st = events(s, dir).groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("s1"),
          dsum(col("value") * col("value")).as("s2"))
        val mean = col("s1") / col("n")
        val variance = col("s2") / col("n") - mean * mean
        val std = sqrt(variance)
        // variance > 0 guard: a constant-valued type has std = 0, where the
        // engines' x/0 semantics DIVERGE (Spark IEEE ±Inf/NaN, DuckDB NULL).
        // The guard is computed identically on both sides, so the cut is
        // deterministic; zero-variance groups by definition have no outliers.
        events(s, dir)
          .join(broadcast(st), Seq("event_type"))
          .filter(variance > 0 && abs((col("value") - mean) / std) > 2.5)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_anomalies"),
            min(col("value")).as("min_val"),
            max(col("value")).as("max_val"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH st AS (
           |  SELECT event_type,
           |    CAST(count(*) AS BIGINT) AS n,
           |    ${sqlSum("value")} AS s1,
           |    ${sqlSum("value * value")} AS s2
           |  FROM events GROUP BY 1)
           |SELECT e.event_type,
           |  count(*) AS n_anomalies,
           |  min(e.value) AS min_val, max(e.value) AS max_val
           |FROM events e JOIN st ON e.event_type = st.event_type
           |WHERE s2 / n - (s1 / n) * (s1 / n) > 0
           |  AND abs((e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 2.5
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sliding (hopping) window aggregation: 10-minute windows every 5
    // minutes — Spark's native sliding `window()` generator (each event
    // lands in exactly windowDuration/slide = 2 windows; both engines
    // align bucket origins on epoch-multiple boundaries so the window
    // starts agree). The batch twin of the streaming hop-window shape;
    // grouped on (window start, type) — an ordinary shuffled agg whose
    // cardinality is time-bounded, not corpus-bounded.
    "q74_sliding_window" -> QueryDef(
      fn = { (s, dir) =>
        events(s, dir)
          .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("wstart"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy("wstart", "event_type")
      },
      oracle = Some(
        s"""SELECT wstart, event_type, count(*) AS n,
           |  ${sqlSum("value")} AS sum_value
           |FROM (
           |  SELECT unnest([
           |      time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
           |      time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '5 minutes'
           |    ]) AS wstart,
           |    event_type, value
           |  FROM events)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // GROUPING SETS — the explicit multi-grouping SQL surface (ROLLUP/CUBE
    // are q08/q25's special cases; arbitrary set lists are the general
    // form). NULL group keys are sentinel'd to 'ALL' in both engines (the
    // grouped columns are non-null in this corpus, so the sentinel is
    // unambiguous). One pass, Spark expands to an internal Expand node —
    // rows × |sets|, each aggregated map-side.
    "q76_grouping_sets" -> QueryDef(
      fn = { (s, dir) =>
        Tables.load(s, dir, "orders").createOrReplaceTempView("q76_orders")
        s.sql(
          s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n,
             |  ${sqlSum("o_totalprice")} AS sum_price
             |FROM q76_orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
             |                        (o_orderstatus), (o_orderpriority), ())
             |ORDER BY 1, 2""".stripMargin)
      },
      oracle = Some(
        s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
           |  coalesce(o_orderpriority, 'ALL') AS priority,
           |  count(*) AS n,
           |  ${sqlSum("o_totalprice")} AS sum_price
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
           |                        (o_orderstatus), (o_orderpriority), ())
           |ORDER BY 1, 2""".stripMargin)),

    // Winsorized statistics: per-type p05/p95 exact percentiles (linear
    // interpolation — identical definition in Spark `percentile` and DuckDB
    // `quantile_cont`, the q30 equivalence), values clamped into the band,
    // then the exact-decimal mean of the clamped series + clamp counts.
    // The outlier-robust mean every metrics pipeline ships. Same broadcast
    // stats-join shape as q73; the percentile agg is the only sort-bearing
    // step and it is per-group.
    "q77_winsorized" -> QueryDef(
      fn = { (s, dir) =>
        val st = events(s, dir).groupBy(col("event_type")).agg(
          expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
        events(s, dir)
          .join(broadcast(st), Seq("event_type"))
          .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            dsum(col("w")).as("sum_w"),
            davg(col("w")).as("winsorized_mean"),
            sum(when(col("value") < col("p05"), 1L).otherwise(0L)).as("n_low"),
            sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_high"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH st AS (
           |  SELECT event_type,
           |    quantile_cont(value, 0.05) AS p05,
           |    quantile_cont(value, 0.95) AS p95
           |  FROM events GROUP BY 1)
           |SELECT e.event_type, count(*) AS n,
           |  ${sqlSum("least(greatest(e.value, p05), p95)")} AS sum_w,
           |  ${sqlAvg("least(greatest(e.value, p05), p95)")} AS winsorized_mean,
           |  CAST(sum(CASE WHEN e.value < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           |  CAST(sum(CASE WHEN e.value > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
           |FROM events e JOIN st ON e.event_type = st.event_type
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Heavy hitters with a count-min-sketch ACCURACY CONTRACT (the q32/q58
    // pattern applied to frequency sketches): exact top-10 tokens by count
    // (the ground truth) + the CMS estimate's guarantee — est ≥ exact
    // always, est ≤ exact + ε·N with confidence 1−δ (ε=1e-4, δ=1e-3,
    // fixed seed ⇒ the realized estimate is deterministic). The oracle
    // emits exact counts + literal TRUE, so the green row certifies the
    // sketch honored its bound. Plan: the sketch is ONE mergeable scalar
    // aggregate (map-side combine — the 100 TB path an exact global
    // count-by-key can't always take); the driver reads back one sketch
    // blob + 10 candidate tokens (bounded, metadata-sized — same budget
    // as the manifest-stats collects).
    "q78_heavy_hitters" -> QueryDef(
      fn = { (s, dir) =>
        // NOTE: fn runs the sketch + candidate jobs eagerly (driver
        // readback before the returned plan exists) — same contract as the
        // TableOps DML queries, which also do their work at fn time.
        val eps = 1e-4
        val toks = docs(s, dir).select(explode(toksCol).as("tok"))
        val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("tok")).limit(10)
        val skRow = toks.agg(
          expr(s"count_min_sketch(tok, CAST($eps AS DOUBLE), CAST(0.999 AS DOUBLE), 42)").as("sk"),
          count(lit(1)).as("n_total")).head()
        val cms = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(skRow.getAs[Array[Byte]]("sk"))
        val nTotal = skRow.getAs[Long]("n_total")
        val cands = exact.collect().map(_.getAs[String]("tok"))
        val est = cands.map(t => (t, cms.estimateCount(t)))
        val estDf = s.createDataFrame(est.toSeq).toDF("tok", "est")
        exact.join(broadcast(estDf), Seq("tok"))
          .select(col("tok"), col("exact_n"),
            (col("est") >= col("exact_n") &&
              col("est").cast("double") <= col("exact_n") + lit(eps) * nTotal)
              .as("within_bound"))
          .orderBy(col("exact_n").desc, col("tok"))
      },
      oracle = Some(
        """SELECT tok, CAST(count(*) AS BIGINT) AS exact_n, TRUE AS within_bound
          |FROM (
          |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |  FROM documents)
          |GROUP BY tok
          |ORDER BY exact_n DESC, tok LIMIT 10""".stripMargin)),

    // Per-label embedding centroids: posexplode over the vector column,
    // elementwise 1e6-quantized exact BIGINT sums per (label, dim) — the
    // FloatDotQ quantization discipline applied to centroid computation,
    // so the mean vector is order-independent (reproducible on a cluster)
    // and bit-identical to the oracle. Output cardinality = |labels| ×
    // dims, independent of corpus size; the explode shuffles (label, pos)
    // keys with map-side combine. This is the k-means/update step and the
    // class-prototype builder of an embedding-curation pipeline.
    "q75_label_centroids" -> QueryDef(
      fn = { (s, dir) =>
        Tables.load(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
          .withColumn("q", floor(col("e").cast("double") * 1000000.0).cast("long"))
          .groupBy(col("label"), col("pos").cast("long").as("pos"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
          .withColumn("centroid",
            col("sum_q").cast("double") / col("n") / lit(1000000.0))
          .select("label", "pos", "n", "sum_q", "centroid")
          .orderBy("label", "pos")
      },
      oracle = Some(
        """SELECT label, CAST(i - 1 AS BIGINT) AS pos,
          |  count(*) AS n,
          |  CAST(sum(CAST(floor(CAST(e[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_q,
          |  CAST(sum(CAST(floor(CAST(e[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
          |    / count(*) / 1000000.0 AS centroid
          |FROM (SELECT label, embedding AS e, generate_subscripts(embedding, 1) AS i
          |      FROM embeddings)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Corpus data card: the per-(lang, source) datasheet a shipped dataset
    // publishes — doc counts, exact-dedup uniqueness, token volume, and
    // quality-pass rate in one grouped pass (content hash and token count
    // are per-row expression work; the rollup is one shuffle on the
    // bounded (lang, source) key space).
    "q82_data_card" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir)
          .withColumn("content_key", Text.contentKey)
          .withColumn("n_toks", size(toksCol).cast("long"))
          .withColumn("q_pass",
            when(col("n_toks") >= 10 && col("n_chars") >= 50, 1L).otherwise(0L))
          .groupBy(col("lang"), col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("content_key")).as("n_unique"),
            sum(col("n_toks")).as("total_tokens"),
            sum(col("q_pass")).as("n_quality"),
            (sum(col("q_pass")).cast("double") / count(lit(1))).as("quality_rate"))
          .orderBy("lang", "source")
      },
      oracle = Some(
        """SELECT lang, source, count(*) AS n_docs,
          |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_unique,
          |  CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) AS total_tokens,
          |  CAST(sum(CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 10
          |                 AND n_chars >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
          |  CAST(sum(CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 10
          |                 AND n_chars >= 50 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS quality_rate
          |FROM documents
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Conversion latency: per user, first 'view' → first subsequent
    // 'purchase', rolled up per first-view day as converter counts +
    // median/p90 latency (exact interpolated percentiles over exact
    // epoch-micro BIGINT diffs — the q30 cross-engine equivalence).
    // Two equi-joins/aggs on user_id (shuffle by user, no windows, no
    // sort); the funnel-latency metric every growth dashboard ships.
    "q81_conversion_latency" -> QueryDef(
      fn = { (s, dir) =>
        val e = events(s, dir)
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val p = e.filter(col("event_type") === "purchase")
          .join(v, Seq("user_id"))
          .filter(col("ts") >= col("t_view"))
          .groupBy(col("user_id"))
          .agg(min(col("t_view")).as("t_view"), min(col("ts")).as("t_purchase"))
        val lat = unix_micros(col("t_purchase")) - unix_micros(col("t_view"))
        p.withColumn("lat_us", lat)
          .groupBy(to_date(col("t_view")).as("cohort_day"))
          .agg(count(lit(1)).as("n_converters"),
            expr("percentile(lat_us, 0.5)").as("median_latency_us"),
            expr("percentile(lat_us, 0.9)").as("p90_latency_us"))
          .orderBy("cohort_day")
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT user_id, min(ts) AS t_view FROM events
          |  WHERE event_type = 'view' GROUP BY 1),
          |p AS (
          |  SELECT e.user_id, min(v.t_view) AS t_view, min(e.ts) AS t_purchase
          |  FROM events e JOIN v ON e.user_id = v.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts >= v.t_view
          |  GROUP BY 1)
          |SELECT CAST(t_view AS DATE) AS cohort_day,
          |  count(*) AS n_converters,
          |  quantile_cont(epoch_us(t_purchase) - epoch_us(t_view), 0.5) AS median_latency_us,
          |  quantile_cont(epoch_us(t_purchase) - epoch_us(t_view), 0.9) AS p90_latency_us
          |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Multi-touch (position-based) marketing attribution with EXACT integer
    // credit: each purchase distributes 10,000 basis points across the
    // touches (click/view/signup) in its lookback window — 40/20/40
    // first/middle/last (U-shaped), with the middle share split by integer
    // division and the remainder going to the EARLIEST middles, so every
    // conversion's credit sums to exactly 10,000 and the per-channel totals
    // are order-independent BIGINTs (no float credit drift cross-engine).
    // Touch→conversion assignment is one descending running-min window per
    // user (next purchase at-or-after the touch), then positions come from
    // one (user, conversion) window — two keyed window passes, no joins, no
    // self-join on the event stream. Scale: both windows partition by
    // user/(user, conversion) — at 100 TB this is two shuffles of the touch
    // slice keyed by user, each partition a single sorted pass; credit
    // arithmetic is per-row expression work inside whole-stage codegen.
    "q148_attribution" -> QueryDef(
      fn = { (s, dir) =>
        val wNext = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withConv = events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
          .withColumn("conv_us",
            min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
              .over(wNext))
        val touch = withConv
          .filter(col("event_type").isin("click", "view", "signup") &&
            col("conv_us").isNotNull &&
            unix_micros(col("ts")) <= col("conv_us") &&
            col("conv_us") - unix_micros(col("ts")) <= lit(2592000000000L))
        val wPos = Window.partitionBy(col("user_id"), col("conv_us"))
          .orderBy(col("ts"), col("event_id"))
        val wCnt = Window.partitionBy(col("user_id"), col("conv_us"))
        val pos = touch
          .withColumn("rn", row_number().over(wPos))
          .withColumn("n", count(lit(1)).over(wCnt))
        val credit = when(col("n") === 1, lit(10000L))
          .when(col("n") === 2, lit(5000L))
          .when(col("rn") === 1 || col("rn") === col("n"), lit(4000L))
          .otherwise(expr("CAST(2000 DIV (n - 2) AS BIGINT)") +
            when(col("rn") - 1 <= expr("2000 % (n - 2)"), lit(1L))
              .otherwise(lit(0L)))
        pos.withColumn("credit", credit)
          .groupBy(col("event_type"))
          .agg(sum(col("credit")).as("credit_bp"),
            count(lit(1)).as("touches"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH conv AS (
          |  SELECT event_id, ts, user_id, event_type,
          |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
          |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS conv_us
          |  FROM events),
          |touch AS (
          |  SELECT user_id, conv_us, ts, event_id, event_type
          |  FROM conv
          |  WHERE event_type IN ('click', 'view', 'signup')
          |    AND conv_us IS NOT NULL
          |    AND epoch_us(ts) <= conv_us
          |    AND conv_us - epoch_us(ts) <= 2592000000000),
          |pos AS (
          |  SELECT event_type,
          |    row_number() OVER (PARTITION BY user_id, conv_us
          |                       ORDER BY ts, event_id) AS rn,
          |    count(*) OVER (PARTITION BY user_id, conv_us) AS n
          |  FROM touch)
          |SELECT event_type,
          |  CAST(SUM(CASE WHEN n = 1 THEN 10000
          |                WHEN n = 2 THEN 5000
          |                WHEN rn = 1 OR rn = n THEN 4000
          |                ELSE 2000 // (n - 2) +
          |                  (CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END)
          |           END) AS BIGINT) AS credit_bp,
          |  count(*) AS touches
          |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Quality-WEIGHTED deterministic sampling: keep probability is a
    // per-row function of the data (here length-derived, w = min(1,
    // n_chars/2000)) instead of q50's per-stratum literals — the "sample
    // good documents more" primitive of curriculum/quality-weighted corpus
    // construction. Same reproducibility contract as q50: keep iff the
    // md5-derived uniform u < w·2³², no RNG state, identical rows kept on
    // any cluster, any partitioning, any run. The weight arithmetic is
    // int-derived doubles and one IEEE multiply — bit-identical
    // cross-engine. Pure per-row expression work, zero shuffle.
    "q84_weighted_sample" -> QueryDef(
      fn = { (s, dir) =>
        val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").cast("double")
        val w = least(lit(1.0), col("n_chars").cast("double") / lit(2000.0))
        docs(s, dir)
          .withColumn("w", w)
          .filter(u < col("w") * lit(4294967296.0))
          .select("doc_id", "lang", "n_chars", "w")
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, lang, n_chars,
          |  least(1.0, CAST(n_chars AS DOUBLE) / 2000.0) AS w
          |FROM documents
          |WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
          |  < least(1.0, CAST(n_chars AS DOUBLE) / 2000.0) * 4294967296.0
          |ORDER BY doc_id""".stripMargin)),

    // K-means (Lloyd) clustering, two deterministic iterations, EXACT: the
    // IVF coarse-quantizer builder (q18 consumes such centroids) and the
    // embedding-curation clusterer, with every step in integer arithmetic —
    // vectors quantized to the 1e6 grid (q75's discipline), assignment =
    // argmin of exact BIGINT squared distances with (dist, cid) tie-break,
    // centroid update = truncating integer mean (Spark `div` ≡ DuckDB `//`,
    // both toward zero) — so cluster sizes AND the SSE are bit-identical
    // cross-engine, run-to-run, any partitioning. Two iterations keep the
    // oracle SQL-expressible (CTE unroll); the production loop iterates
    // the same two joins under localCheckpoint like q47. Scale shape: the
    // centroid side is k×dims (broadcast — never shuffles the corpus),
    // assignment aggregates (vec, cid) partials map-side, the update is a
    // (cid, pos) agg with map-side combine. Overflow audit: |vq| ≤ 2²⁰,
    // diff² ≤ 2⁴², ×64 dims ≤ 2⁴⁸, summed over 10⁶-vector clusters ≤ 2⁶⁸…
    // so SSE uses per-pair dists (≤2⁴⁸) summed into one BIGINT per cluster
    // — exact to ~10¹⁸ corpus vectors per cluster.
    "q79_kmeans" -> QueryDef(
      fn = { (s, dir) =>
        val vq = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .withColumn("vq", floor(col("x").cast("double") * 1000000.0).cast("long"))
          .select(col("vec_id"), col("pos").cast("long").as("pos"), col("vq"))
        val seeds = vq.filter(col("vec_id") < 10)
          .select(col("vec_id").as("cid"), col("pos"), col("vq").as("cq"))
        def assign(cents: DataFrame): DataFrame =
          vq.join(broadcast(cents), Seq("pos"))
            .withColumn("d2", (col("vq") - col("cq")) * (col("vq") - col("cq")))
            .groupBy(col("vec_id"), col("cid"))
            .agg(sum(col("d2")).as("dist"))
            .groupBy(col("vec_id"))
            .agg(min(struct(col("dist"), col("cid"))).as("m"))
            .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))
        def recompute(assigned: DataFrame): DataFrame =
          vq.join(assigned.select("vec_id", "cid"), Seq("vec_id"))
            .groupBy(col("cid"), col("pos"))
            // count(1), not count(vq): the oracle divides by count(*)
            .agg(expr("sum(vq) div count(1)").as("cq"))
        val a2 = assign(recompute(assign(seeds)))
        a2.groupBy(col("cid"))
          .agg(count(lit(1)).as("cluster_size"), sum(col("dist")).as("sse_q"))
          .orderBy("cid")
      },
      oracle = Some(
        """WITH vq AS (
          |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
          |    CAST(floor(CAST(e[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
          |  FROM (SELECT vec_id, embedding AS e, generate_subscripts(embedding, 1) AS i
          |        FROM embeddings)),
          |seeds AS (SELECT vec_id AS cid, pos, vq AS cq FROM vq WHERE vec_id < 10),
          |d1 AS (
          |  SELECT v.vec_id, s.cid,
          |    CAST(sum((v.vq - s.cq) * (v.vq - s.cq)) AS BIGINT) AS dist
          |  FROM vq v JOIN seeds s USING (pos) GROUP BY 1, 2),
          |a1 AS (
          |  SELECT vec_id, cid FROM (
          |    SELECT vec_id, cid,
          |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
          |    FROM d1) WHERE rn = 1),
          |c1 AS (
          |  SELECT a1.cid, v.pos, CAST(sum(v.vq) AS BIGINT) // count(*) AS cq
          |  FROM vq v JOIN a1 USING (vec_id) GROUP BY 1, 2),
          |d2 AS (
          |  SELECT v.vec_id, c.cid,
          |    CAST(sum((v.vq - c.cq) * (v.vq - c.cq)) AS BIGINT) AS dist
          |  FROM vq v JOIN c1 c USING (pos) GROUP BY 1, 2),
          |a2 AS (
          |  SELECT vec_id, cid, dist FROM (
          |    SELECT vec_id, cid, dist,
          |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
          |    FROM d2) WHERE rn = 1)
          |SELECT cid, count(*) AS cluster_size, CAST(sum(dist) AS BIGINT) AS sse_q
          |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Temperature-weighted domain mixture sampling — the pretraining
    // data-mixing step (the published Pile/LLaMA recipe shape): domain
    // (lang, source) token masses t_d are re-weighted by τ=2 temperature
    // (w_d ∝ √t_d, flattening head domains, lifting tail ones), a global
    // token budget B = T/4 allocates per-domain keep budgets B·w_d, and
    // docs are kept by the q50 hash-threshold rule at rate B·w_d/t_d —
    // reproducible under any partitioning. ALL boundary arithmetic is
    // integer: √t_d is quantized to BIGINT (IEEE sqrt of an exact int is
    // correctly rounded, so the quantization is cross-engine-exact) and
    // the keep test u·S·t_d < B·s_d·2²⁰ is a DECIMAL(38,0)/HUGEINT
    // product comparison — no division, no rounding, no boundary drift.
    // At 100 TB: one map-side-combined domain agg, then a second corpus
    // scan against ~|domains| broadcast rows — the corpus never shuffles.
    "q89_mixture_sample" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
          size(toksCol).cast("long").as("toks"))
        val dom = d.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("docs_total"), sum(col("toks")).as("t_d"))
          .withColumn("s_d",
            floor(sqrt(col("t_d").cast("double")) * lit(1000000.0)).cast("long"))
        val g = dom.agg(sum(col("s_d")).as("s_all"),
          expr("sum(t_d) div 4").as("budget"))
        def dec(c: Column) = c.cast("decimal(38,0)")
        val kept = d
          .join(broadcast(dom.select("lang", "source", "t_d", "s_d")),
            Seq("lang", "source"))
          .crossJoin(broadcast(g))
          .withColumn("u",
            conv(substring(md5(col("doc_id").cast("string")), 1, 5), 16, 10)
              .cast("long"))
          .filter(dec(col("u")) * dec(col("s_all")) * dec(col("t_d"))
            < dec(col("budget")) * dec(col("s_d")) * dec(lit(1048576L)))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("kept_docs"), sum(col("toks")).as("kept_toks"))
        dom.crossJoin(broadcast(g))
          .join(kept, Seq("lang", "source"), "left")
          .select(col("lang"), col("source"), col("docs_total"),
            col("t_d").as("toks_total"),
            least(lit(1000000L), expr(
              "(CAST(budget AS DECIMAL(38,0)) * CAST(s_d AS DECIMAL(38,0)) * " +
                "CAST(1000000 AS DECIMAL(38,0))) div " +
                "(CAST(s_all AS DECIMAL(38,0)) * CAST(t_d AS DECIMAL(38,0)))"))
              .as("rate_ppm"),
            coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
            coalesce(col("kept_toks"), lit(0L)).as("kept_toks"))
          .orderBy("lang", "source")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT doc_id, lang, source,
          |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS toks
          |  FROM documents),
          |dom AS (
          |  SELECT lang, source, count(*) AS docs_total,
          |    CAST(sum(toks) AS BIGINT) AS t_d
          |  FROM d GROUP BY 1, 2),
          |dom2 AS (
          |  SELECT *, CAST(floor(sqrt(CAST(t_d AS DOUBLE)) * 1000000.0) AS BIGINT) AS s_d
          |  FROM dom),
          |g AS (
          |  SELECT CAST(sum(s_d) AS BIGINT) AS s_all,
          |    CAST(sum(t_d) AS BIGINT) // 4 AS budget
          |  FROM dom2),
          |kept AS (
          |  SELECT d.lang, d.source, count(*) AS kept_docs,
          |    CAST(sum(d.toks) AS BIGINT) AS kept_toks
          |  FROM d JOIN dom2 USING (lang, source) CROSS JOIN g
          |  WHERE CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)) AS BIGINT) AS HUGEINT)
          |      * CAST(g.s_all AS HUGEINT) * CAST(dom2.t_d AS HUGEINT)
          |    < CAST(g.budget AS HUGEINT) * CAST(dom2.s_d AS HUGEINT) * CAST(1048576 AS HUGEINT)
          |  GROUP BY 1, 2)
          |SELECT dom2.lang, dom2.source, dom2.docs_total, dom2.t_d AS toks_total,
          |  least(1000000, CAST(CAST(g.budget AS HUGEINT) * CAST(dom2.s_d AS HUGEINT) * CAST(1000000 AS HUGEINT)
          |    // (CAST(g.s_all AS HUGEINT) * CAST(dom2.t_d AS HUGEINT)) AS BIGINT)) AS rate_ppm,
          |  coalesce(kept.kept_docs, 0) AS kept_docs,
          |  coalesce(kept.kept_toks, 0) AS kept_toks
          |FROM dom2 CROSS JOIN g LEFT JOIN kept USING (lang, source)
          |ORDER BY lang, source""".stripMargin)),

    // Rare-token quality screen — the LM-free perplexity proxy (CCNet
    // filters on LM perplexity; without a model, a document whose tokens
    // are mostly corpus-rare is the same signal): per doc, over its
    // DISTINCT tokens, count how many have corpus document-frequency ≤ 2
    // and keep docs whose rare fraction stays under 30%. All integer
    // arithmetic (counts and an integer cross-multiplied fraction test) —
    // no logs, no doubles, bit-exact cross-engine. Plan shape = q70's:
    // the posting list is collapsed to (doc, token) BEFORE the df join,
    // so occurrence skew is absorbed map-side; the df side is
    // vocabulary-sized (≪ corpus after collapse) and broadcast.
    "q90_rare_token_screen" -> QueryDef(
      fn = { (s, dir) =>
        val posting = docs(s, dir)
          .select(col("doc_id"), explode(array_distinct(toksCol)).as("tok"))
        val dfreq = posting.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        posting.join(broadcast(dfreq), "tok")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_distinct"),
            sum(when(col("df") <= 2, 1L).otherwise(0L)).as("rare_n"),
            sum(col("df")).as("sum_df"))
          .withColumn("keep", col("rare_n") * 10 <= col("n_distinct") * 3)
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH p AS (
          |  SELECT DISTINCT doc_id, tok FROM (
          |    SELECT doc_id,
          |      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |    FROM documents)),
          |df AS (SELECT tok, count(*) AS df FROM p GROUP BY 1),
          |sc AS (
          |  SELECT p.doc_id, count(*) AS n_distinct,
          |    CAST(sum(CASE WHEN df.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rare_n,
          |    CAST(sum(df.df) AS BIGINT) AS sum_df
          |  FROM p JOIN df USING (tok) GROUP BY 1)
          |SELECT doc_id, n_distinct, rare_n, sum_df,
          |  rare_n * 10 <= n_distinct * 3 AS keep
          |FROM sc ORDER BY doc_id""".stripMargin)),

    // Zipf rank-frequency head per language — the lexical-distribution
    // panel of a corpus data card (is this text natural-language-shaped,
    // or template spam?). Token frequencies per (lang, token); rank by
    // frequency with a total deterministic tie-break (freq DESC, token
    // ASC — distinct tokens, so the order is unique); emit the top-20
    // rows per language with rank × freq, the product Zipf's law predicts
    // near-constant. All-integer output — bit-exact cross-engine.
    //
    // 100 TB shape: the ONLY pass over the corpus is the token-count
    // aggregate (map-side combined, shuffled on (lang, token)); the
    // window ranks the AGGREGATED frequency table, which is
    // vocabulary-sized (≪ corpus), partitioned by lang — never the token
    // stream. The same two-phase discipline as q70/q90: collapse before
    // anything per-key.
    "q97_zipf_head" -> QueryDef(
      fn = { (s, dir) =>
        val freq = docs(s, dir)
          .select(col("lang"), explode(toksCol).as("tok"))
          .groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("freq"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("freq").desc, col("tok"))
        freq.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 20)
          .withColumn("rank_x_freq", col("rank") * col("freq"))
          .select("lang", "rank", "tok", "freq", "rank_x_freq")
          .orderBy("lang", "rank")
      },
      oracle = Some(
        """WITH f AS (
          |  SELECT lang, tok, count(*) AS freq FROM (
          |    SELECT lang,
          |      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |    FROM documents)
          |  GROUP BY 1, 2),
          |r AS (
          |  SELECT lang, tok, freq,
          |    CAST(row_number() OVER (PARTITION BY lang
          |      ORDER BY freq DESC, tok) AS INT) AS rank
          |  FROM f)
          |SELECT lang, rank, tok, freq, rank * freq AS rank_x_freq
          |FROM r WHERE rank <= 20 ORDER BY lang, rank""".stripMargin)),

    // First BPE merge round, distributed (Sennrich ACL'16 §3): count every
    // ADJACENT symbol pair inside tokens across the corpus and rank the
    // top 30 — the statistic a byte-pair-encoding trainer computes each
    // round before greedily merging the winner (at round 0 the symbols are
    // characters, so pairs are character bigrams within words; the
    // deterministic (count DESC, pair) order is the tie rule a trainer
    // needs for reproducible vocabularies). Plan shape at 100 TB: the pair
    // generation is IN-ROW (filter + nested transform + flatten, one
    // Generate — no join, no UDF), and the only shuffle is the two-phase
    // hash aggregate on the pair key whose distinct cardinality is
    // alphabet², ending in TakeOrderedAndProject(30). A full BPE trainer
    // loops this query, merging the winner into the token list between
    // rounds — each round stays this same shape.
    "q117_bpe_pairs" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir)
          .select(explode(expr(
            """flatten(transform(
              |  filter(split(lower(trim(text)), '\\s+'), w -> length(w) >= 2),
              |  w -> transform(sequence(1, length(w) - 1),
              |         i -> substring(w, i, 2))))""".stripMargin)).as("pair"))
          .groupBy(col("pair"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(30)
      },
      oracle = Some(
        """WITH w AS (
          |  SELECT unnest(list_filter(
          |    regexp_split_to_array(lower(trim(text)), '\s+'),
          |    t -> length(t) >= 2)) AS w
          |  FROM documents),
          |p AS (
          |  SELECT unnest(list_transform(range(1, length(w)),
          |    i -> substr(w, CAST(i AS INT), 2))) AS pair
          |  FROM w)
          |SELECT pair, count(*) AS n FROM p
          |GROUP BY 1 ORDER BY n DESC, pair LIMIT 30""".stripMargin)),

    // BPE ENCODING under the oracle gate: a fixed 4-merge vocabulary
    // (th, the, in, an — classic first English merges) applied to the
    // whole corpus by graft's fold ([[Bpe.applyMerge]]), mirrored in
    // DuckDB by the same left-to-right non-overlapping fold written as
    // nested list_reduce calls — so the ENCODER's semantics (greedy
    // in-order merge application, merged tokens eligible for later
    // merges) are value-proven engine-against-engine, not just against
    // the in-repo reference implementation. Output: per-language token
    // mass + distinct-token count after encoding — the fertility numbers
    // a tokenizer report publishes. Plan: merge application is per-row
    // projections (zero shuffle); only the final per-lang aggregate
    // (with its distinct expansion) exchanges.
    "q118_bpe_encode" -> QueryDef(
      fn = { (s, dir) =>
        val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"))
          .map { case (a, b) => Bpe.Merge(a, b, 0L) }
        Bpe.encode(docs(s, dir).select(col("lang"), col("text")), merges)
          .select(col("lang"), explode(col("bpe_toks")).as("tok"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("n_distinct"))
          .orderBy("lang")
      },
      oracle = Some {
        val chars = "list_transform(range(1, length(w) + 1), " +
          "i -> substr(w, CAST(i AS INT), 1))"
        val folded = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"))
          .foldLeft(chars) { case (inner, (a, b)) =>
            s"""list_reduce(list_transform($inner, s -> [s]),
               |  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '$a'
               |      AND x[1] = '$b'
               |    THEN list_concat(acc[1:len(acc)-1], ['${a + b}'])
               |    ELSE list_concat(acc, x) END)""".stripMargin
          }
        s"""WITH w AS (
           |  SELECT lang, unnest(list_filter(
           |    regexp_split_to_array(lower(trim(text)), '\\s+'),
           |    t -> length(t) >= 1)) AS w
           |  FROM documents),
           |enc AS (
           |  SELECT lang, unnest($folded) AS tok FROM w)
           |SELECT lang, count(*) AS n_tokens,
           |  count(DISTINCT tok) AS n_distinct
           |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // FULL BPE TRAINING under the oracle gate — the whole greedy loop,
    // engine-against-engine: graft learns 12 merges from the corpus
    // ([[Bpe.trainLocal]] — ONE corpus-sized histogram shuffle, then
    // driver rounds over the bounded vocabulary, the production-trainer
    // factoring; BpeSpec proves it round-identical to the distributed
    // [[Bpe.train]]), and DuckDB re-learns the same 12 merges from
    // scratch via a generated 12-stage chained-CTE program (pair counts →
    // deterministic argmax → left-to-right non-overlapping application as
    // a spaced-string replace — the double-space framing makes SQL
    // replace() ≡ the per-round merge fold, validated against q118's
    // list_reduce form). A hash match here means the LEARNED VOCABULARY
    // — order, pairs, and weighted counts — is bit-identical across
    // engines, not merely the pair statistic of one round (q117) or the
    // application of a fixed vocabulary (q118). Text is pre-restricted to
    // [a-z ] so tokenization and tie-break collation are engine-neutral.
    "q129_bpe_train" -> QueryDef(
      fn = { (s, dir) =>
        val cleaned = docs(s, dir).select(
          regexp_replace(lower(trim(col("text"))), "[^a-z\\s]", " ")
            .as("text"))
        val ms = Bpe.trainLocal(cleaned, merges = 12)
        import s.implicits._
        ms.zipWithIndex
          .map { case (m, i) => (i + 1, m.a, m.b, m.count) }
          .toDF("rank", "a", "b", "n")
      },
      oracle = Some(bpeTrainOracle(12))),

    // FULL UNIGRAM-LM TOKENIZER TRAINING under the oracle gate — the
    // SentencePiece half q138 left open (q138 scores with a GIVEN piece
    // table; this learns one). Engine side: [[Unigram.trainLocal]] — one
    // corpus-sized histogram shuffle, then deterministic hard-EM rounds
    // (Viterbi E-step, coverage-floored count M-step, count-based
    // pruning, Q20 fixed-point log2 scores) driver-side over the bounded
    // vocabulary, the [[Bpe.trainLocal]] factoring. Oracle side: DuckDB
    // re-learns the SAME vocabulary from scratch (recursive-CTE Viterbi
    // with the identical struct-max tie rule, recursive backtrack,
    // integer recount/rescore — see [[unigramTrainOracle]]). A hash
    // match means the trained piece table — surfaces, hard-EM counts,
    // and Q20 scores — is bit-identical across engines. Text restricted
    // to [a-z ] so tokenization and tie-break collation are
    // engine-neutral (q129's discipline).
    "q185_unigram_train" -> QueryDef(
      fn = { (s, dir) =>
        val cleaned = docs(s, dir).select(
          regexp_replace(lower(trim(col("text"))), "[^a-z\\s]", " ")
            .as("text"))
        val pieces = Unigram.trainLocal(cleaned, rounds = 2,
          maxPieceLen = 4, seedMulti = 48, keepSchedule = Seq(32, 24))
        import s.implicits._
        pieces.map(p => (p.p, p.cnt, p.score))
          .toDF("piece", "cnt", "score_q20")
          .orderBy(col("score_q20").desc, col("piece"))
      },
      oracle = Some(unigramTrainOracle(rounds = 2, maxPieceLen = 4,
        seedMulti = 48, keep = Seq(32, 24)))),

    // Bigram-LM document scoring — the CCNet-style quality screen (Wenzek
    // LREC'20 trains a KenLM and buckets documents by perplexity; the
    // statistic here is the same "how expected is this text under a corpus
    // LM" signal): train an add-one-smoothed bigram model ON the corpus,
    // score every document by its mean token probability, and surface the
    // 20 most surprising documents — the gibberish/boilerplate audit batch.
    // Cross-engine exactness: no ln() anywhere (libm drift) — each token's
    // p(b|a) = (c_ab+1)/(c_a+V) is one division of int64-derived doubles
    // (bit-identical in IEEE), quantized with floor(1e12·p) to an exact
    // BIGINT so the per-doc sum is order-independent, and the mean is
    // BIGINT division (the q49/q70 rational discipline + the FloatDotQ
    // quantization trick). Plan at 100 TB: bigrams generate IN-ROW; the
    // model tables are two two-phase hash aggregates (vocab-sized after
    // map-side combine); the model join happens VOCAB-side first (c_ab ⋈
    // c_a on `a`, both ≪ corpus), so the corpus-sized bigram stream
    // shuffles exactly twice — once into the single probability join on
    // (a,b), once into the per-doc aggregate — and the final top-20 is a
    // TakeOrderedAndProject, never a global sort.
    "q123_lm_score" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val (model, v) = lmModel(d)
        lmScore(d, model, v)
          .orderBy(col("avg_p_q").asc, col("doc_id"))
          .limit(20)
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT doc_id,
          |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |  FROM documents),
          |bg AS (
          |  SELECT doc_id, p['a'] AS a, p['b'] AS b
          |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
          |      i -> {'a': toks[CAST(i AS INT)],
          |            'b': toks[CAST(i AS INT) + 1]})) AS p
          |    FROM d WHERE len(toks) >= 2)),
          |cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
          |  FROM bg GROUP BY 1, 2),
          |ca AS (SELECT a, CAST(count(*) AS BIGINT) AS c_a
          |  FROM bg GROUP BY 1),
          |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
          |  FROM (SELECT unnest(toks) AS tok FROM d)),
          |sc AS (
          |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |    CAST(sum(CAST(floor(1e12 * (CAST(c_ab + 1 AS DOUBLE)
          |      / CAST(c_a + v AS DOUBLE))) AS BIGINT)) AS BIGINT) AS p_sum_q
          |  FROM bg JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v
          |  GROUP BY 1)
          |SELECT doc_id, n_bigrams, p_sum_q,
          |  p_sum_q // n_bigrams AS avg_p_q
          |FROM sc ORDER BY avg_p_q ASC, doc_id LIMIT 20""".stripMargin)),

    // Corpus drift report — Jensen-Shannon divergence between two corpus
    // slices' unigram distributions (Lin '91; THE dataset-iteration
    // question: "did the new crawl shift the token distribution, and how
    // much?"). JSD = (KL(P‖M) + KL(Q‖M))/2 with M the mixture — symmetric
    // and bounded [0,1] bit, unlike raw KL. Exact WITH the logs: every
    // log2 term is Q20 fixed point over integer products of add-one-
    // smoothed counts — log2(p_i/m_i) = L(2aB′) − L(aB′ + bA′). Headroom
    // is corpus-size-PROOFED, not assumed (VERDICT r7 #3): the totals are
    // pre-scaled by a shared power of two s = max(0, bits(A)+bits(B)−61)
    // so every product provably fits int64 at ANY corpus size (scaling a
    // log-RATIO's numerator and denominator by the same 2^s cancels in
    // the L difference, up to the totals' floor error ≤ 2^-(62−bits(max))
    // relative — below the Q20 resolution until a slice passes ~2^42
    // tokens, then graceful precision loss instead of a silent wrap; at
    // any test scale s = 0, bit-identical to the unscaled form). KLs are
    // carried as Σ a·bits in DECIMAL(38,0) (a slice total times 2^20
    // outgrows int64 near 2^43 tokens) and normalized by one division at
    // the end. Same fixedLog2 engine
    // pair as q158 (unrolled codegen Spark-side, recursive CTE oracle-
    // side). Plan at 100 TB: token streams collapse to per-slice vocab
    // counts FIRST (map-side combine); the log iteration and the KL sums
    // run on the JOINED VOCABULARY (≪ corpus); one full-outer equi-join
    // on the token key is the only vocab-sized shuffle.
    "q171_corpus_drift" -> QueryDef(
      fn = { (s, dir) =>
        val toks = docs(s, dir).select(col("doc_id"), explode(toksCol).as("tok"))
        def side(m: Int) = toks.filter(col("doc_id") % 2 === m)
          .groupBy(col("tok")).agg(count(lit(1)).as(if (m == 0) "a" else "b"))
        driftReportFromCounts(side(0).join(side(1), Seq("tok"), "full_outer"))
      },
      oracle = Some(driftOracleSql)),

    // Incremental corpus-drift monitor — the STREAMING-SHAPED twin of
    // q171 (the ops need: "is tonight's crawl shifting the distribution"
    // answered per ingest batch, not per full recompute). The per-slice
    // vocab counts persist as an incremental view (tok → row count +
    // exact sum of the slice-A indicator, so a = sum, b = cnt − sum);
    // each batch folds through [[graft.sources.IncrementalView.foldBatch]]
    // — exactly-once via the view's own txn watermark, vocab-sized
    // rewrites, the corpus never rescans. The report is THE SAME
    // driftReportFromCounts the batch query runs, over the persisted
    // counts — so q174 reuses q171's oracle VERBATIM: three folded
    // batches must reproduce the full-corpus JSD bit-for-bit. At 100 TB:
    // per-batch cost = tokenize the batch + one vocab-sized merge; the
    // report is vocab-sized arithmetic on demand.
    "q174_drift_incremental" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q174").toString
        val n = d.agg(max(col("doc_id"))).collect()(0).getLong(0)
        Seq(0L to n / 3, (n / 3 + 1) to 2 * n / 3, (2 * n / 3 + 1) to n)
          .zipWithIndex.foreach { case (r, i) =>
            driftFoldBatch(
              d.filter(col("doc_id").between(r.head, r.last)),
              root, appId = "q174", batchId = i.toLong)
          }
        driftReport(s, root)
      },
      oracle = Some(driftOracleSql)),

    // CCNet head/middle/tail corpus partitioning (Wenzek LREC'20 §4.3:
    // train an LM on a reference slice, bucket every document into
    // perplexity terciles — head trains the model, tail gets dropped or
    // down-weighted). The LM is add-one unigram over the even-doc_id
    // training slice; a document's cost is its mean BITS PER TOKEN —
    // a true log-space perplexity, unlike q123's probability-space mean.
    // Cross-engine exactness WITH a logarithm and still no libm: log2 is
    // computed in Q20 FIXED POINT by the classic square-and-shift
    // algorithm (20 rounds of Q30 integer squaring, truncation shifts
    // only), identical BIGINT ops on both engines — bits(tok) =
    // L(T+V) − L(c+1) where L = fixedLog2, so sums/means are exact
    // integers. Plan at 100 TB: counts and the log iteration are
    // VOCABULARY-sized (the 20-step unrolled loop runs once per distinct
    // token, all whole-stage codegen); the corpus-sized token stream
    // meets one broadcast bits table and collapses map-side into per-doc
    // sums; the tercile ntile sorts DOC-level rows (corpus/1000s), not
    // tokens.
    "q158_ccnet_buckets" -> QueryDef(
      fn = { (s, dir) =>
        val toks = docs(s, dir).select(col("doc_id"), explode(toksCol).as("tok"))
        val train = toks.filter(col("doc_id") % 2 === 0)
        val counts = train.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val Array(t, v) = train.agg(count(lit(1)), countDistinct(col("tok")))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        val lgDen = fixedLog2Long(t + v)
        val bits = fixedLog2(counts.withColumn("n", col("c") + lit(1)), "n", "lg")
          .select(col("tok"), (lit(lgDen) - col("lg")).as("bits"))
        val perDoc = toks.join(broadcast(bits), Seq("tok"), "left")
          .withColumn("bw", coalesce(col("bits"), lit(lgDen)))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"), sum(col("bw")).as("bits_sum"))
          .withColumn("ppl_q20", expr("bits_sum div n_toks"))
        val bucketed = perDoc.withColumn("b",
          ntile(3).over(Window.orderBy(col("ppl_q20"), col("doc_id"))))
        bucketed.groupBy(col("b"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("ppl_q20")).as("min_ppl_q20"),
            max(col("ppl_q20")).as("max_ppl_q20"),
            sum(col("n_toks")).as("sum_toks"))
          .select(
            expr("CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END")
              .as("bucket"),
            col("n_docs"), col("min_ppl_q20"), col("max_ppl_q20"),
            col("sum_toks"))
          .orderBy(col("min_ppl_q20"))
      },
      oracle = Some(
        """WITH RECURSIVE
          |toks AS (
          |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |  FROM documents),
          |train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
          |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM train GROUP BY 1),
          |tv AS (SELECT CAST(count(*) AS BIGINT)
          |  + CAST(count(DISTINCT tok) AS BIGINT) AS den FROM train),
          |vals AS (SELECT DISTINCT c + 1 AS n FROM cnt
          |  UNION SELECT den AS n FROM tv),
          |it AS (
          |  SELECT n, CAST(length(bin(n)) - 1 AS BIGINT) AS m,
          |    CASE WHEN length(bin(n)) - 1 <= 30
          |      THEN n << (30 - (length(bin(n)) - 1))
          |      ELSE n >> ((length(bin(n)) - 1) - 30) END AS x,
          |    CAST(0 AS BIGINT) AS acc, 0 AS i
          |  FROM vals
          |  UNION ALL
          |  SELECT n, m,
          |    CASE WHEN ((x * x) >> 30) >= 2147483648
          |      THEN ((x * x) >> 30) >> 1 ELSE (x * x) >> 30 END,
          |    acc * 2 + CASE WHEN ((x * x) >> 30) >= 2147483648 THEN 1 ELSE 0 END,
          |    i + 1
          |  FROM it WHERE i < 20),
          |logs AS (SELECT n, (m << 20) + acc AS lg FROM it WHERE i = 20),
          |ld AS (SELECT lg FROM logs JOIN tv ON logs.n = tv.den),
          |bits AS (SELECT cnt.tok, ld.lg - logs.lg AS bits
          |  FROM cnt JOIN logs ON logs.n = cnt.c + 1 CROSS JOIN ld),
          |perdoc AS (
          |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
          |    CAST(sum(COALESCE(b.bits, ld.lg)) AS BIGINT) AS bits_sum
          |  FROM toks t LEFT JOIN bits b USING (tok) CROSS JOIN ld
          |  GROUP BY 1),
          |ppl AS (SELECT doc_id, n_toks, bits_sum // n_toks AS ppl_q20 FROM perdoc),
          |bucketed AS (SELECT doc_id, n_toks, ppl_q20,
          |  ntile(3) OVER (ORDER BY ppl_q20, doc_id) AS b FROM ppl)
          |SELECT CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  min(ppl_q20) AS min_ppl_q20, max(ppl_q20) AS max_ppl_q20,
          |  CAST(sum(n_toks) AS BIGINT) AS sum_toks
          |FROM bucketed GROUP BY b ORDER BY min_ppl_q20""".stripMargin)),
  )

  /** Shared q171/q174 drift computation from per-token slice counts
    * (`tok`, `a`, `b`; nulls = absent in that slice). Everything after
    * the counts is vocabulary-sized.
    */
  private[graft] def driftReportFromCounts(counts: DataFrame): DataFrame = {
        val joined = counts
          .na.fill(0L, Seq("a", "b"))
          .withColumn("a1", col("a") + lit(1)).withColumn("b1", col("b") + lit(1))
        val Array(aTot, bTot, v) = joined
          .agg(sum(col("a1")), sum(col("b1")), count(lit(1)))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        // shared power-of-two pre-scale of the totals (headroom proof in
        // the block comment and in driftScale's unit tests; s = 0 at any
        // test scale)
        val (aT, bT) = driftScale(aTot, bTot)
        // bits(P vs M) per token: L(2·a1·B′) − L(a1·B′ + b1·A′); mirror for Q
        val terms = joined
          .withColumn("xab", expr(s"2 * a1 * ${bT}L"))
          .withColumn("yab", expr(s"a1 * ${bT}L + b1 * ${aT}L"))
          .withColumn("xba", expr(s"2 * b1 * ${aT}L"))
        val withLogs = Seq(("xab", "lx_a"), ("yab", "ly"), ("xba", "lx_b"))
          .foldLeft(terms) { case (d, (in, out)) => fixedLog2(d, in, out) }
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        withLogs
          .agg(
            sum(col("a1").cast(dec38) * (col("lx_a") - col("ly")))
              .as("kla_sum"),
            sum(col("b1").cast(dec38) * (col("lx_b") - col("ly")))
              .as("klb_sum"))
          .select(lit(aTot).as("a_tokens"), lit(bTot).as("b_tokens"),
            lit(v).as("vocab"),
            expr(s"CAST(kla_sum div ${aTot}L AS BIGINT)").as("kl_p_q20"),
            expr(s"CAST(klb_sum div ${bTot}L AS BIGINT)").as("kl_q_q20"),
            expr(s"CAST((kla_sum div ${aTot}L + klb_sum div ${bTot}L) div 2" +
              " AS BIGINT)").as("jsd_q20"))
  }

  /** Fold one batch of documents into the persisted drift-counts view at
    * `root` — exactly-once via the view's txn watermark (a replayed
    * batchId is a no-op), vocab-sized rewrite per fold, corpus never
    * rescans. The view rows are (tok, cnt, sum_val) where sum_val counts
    * slice-A occurrences: one indicator column carries BOTH slices, since
    * every token row is in exactly one (a = sum, b = cnt − sum).
    */
  def driftFoldBatch(batchDocs: DataFrame, root: String,
      appId: String, batchId: Long): Long = {
    val tokRows = batchDocs
      .select(col("doc_id"), explode(toksCol).as("tok"))
      .select(col("tok"),
        when(col("doc_id") % 2 === 0, 1L).otherwise(0L).as("in_a"))
    graft.sources.IncrementalView.foldBatch(
      tokRows, root, Seq("tok"), "in_a", appId, batchId)
  }

  /** The q171 drift report computed from the PERSISTED counts view — the
    * on-demand half of the incremental monitor (vocab-sized arithmetic,
    * zero corpus work).
    */
  def driftReport(spark: SparkSession, root: String): DataFrame =
    driftReportFromCounts(
      graft.sources.CommitLog.read(spark, root)
        .select(col("tok"),
          col("sum_val").cast("long").as("a"),
          (col("cnt") - col("sum_val").cast("long")).as("b")))

  /** q171's oracle — reused VERBATIM by q174: the incrementally-folded
    * counts must reproduce the full-corpus JSD bit-for-bit. (`def`, not
    * `val`: the queries map above captures it during ITS initialization,
    * which runs before any later val in this object would assign.)
    */
  private def driftOracleSql: String =

        """WITH RECURSIVE
          |toks AS (
          |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |  FROM documents),
          |sa AS (SELECT tok, CAST(count(*) AS BIGINT) AS a FROM toks
          |  WHERE doc_id % 2 = 0 GROUP BY 1),
          |sb AS (SELECT tok, CAST(count(*) AS BIGINT) AS b FROM toks
          |  WHERE doc_id % 2 = 1 GROUP BY 1),
          |j AS (SELECT COALESCE(a, 0) + 1 AS a1, COALESCE(b, 0) + 1 AS b1
          |  FROM sa FULL OUTER JOIN sb USING (tok)),
          |tot AS (SELECT CAST(sum(a1) AS BIGINT) AS at,
          |    CAST(sum(b1) AS BIGINT) AS bt,
          |    CAST(count(*) AS BIGINT) AS v,
          |    GREATEST(0, length(bin(CAST(sum(a1) AS BIGINT)))
          |      + length(bin(CAST(sum(b1) AS BIGINT))) - 61) AS s FROM j),
          |terms AS (SELECT a1, b1,
          |    2 * a1 * (bt >> s) AS xab,
          |    a1 * (bt >> s) + b1 * (at >> s) AS yab,
          |    2 * b1 * (at >> s) AS xba
          |  FROM j, tot),
          |vals AS (SELECT DISTINCT n FROM (
          |  SELECT xab AS n FROM terms UNION
          |  SELECT yab FROM terms UNION SELECT xba FROM terms)),
          |it AS (
          |  SELECT n, CAST(length(bin(n)) - 1 AS BIGINT) AS m,
          |    CASE WHEN length(bin(n)) - 1 <= 30
          |      THEN n << (30 - (length(bin(n)) - 1))
          |      ELSE n >> ((length(bin(n)) - 1) - 30) END AS x,
          |    CAST(0 AS BIGINT) AS acc, 0 AS i
          |  FROM vals
          |  UNION ALL
          |  SELECT n, m,
          |    CASE WHEN ((x * x) >> 30) >= 2147483648
          |      THEN ((x * x) >> 30) >> 1 ELSE (x * x) >> 30 END,
          |    acc * 2 + CASE WHEN ((x * x) >> 30) >= 2147483648 THEN 1 ELSE 0 END,
          |    i + 1
          |  FROM it WHERE i < 20),
          |logs AS (SELECT n, (m << 20) + acc AS lg FROM it WHERE i = 20),
          |sums AS (
          |  SELECT sum(CAST(t.a1 AS HUGEINT) * (la.lg - ly.lg)) AS kla_sum,
          |    sum(CAST(t.b1 AS HUGEINT) * (lb.lg - ly.lg)) AS klb_sum
          |  FROM terms t
          |  JOIN logs la ON la.n = t.xab
          |  JOIN logs ly ON ly.n = t.yab
          |  JOIN logs lb ON lb.n = t.xba)
          |SELECT tot.at AS a_tokens, tot.bt AS b_tokens, tot.v AS vocab,
          |  CAST(kla_sum // tot.at AS BIGINT) AS kl_p_q20,
          |  CAST(klb_sum // tot.bt AS BIGINT) AS kl_q_q20,
          |  CAST((kla_sum // tot.at + klb_sum // tot.bt) // 2 AS BIGINT) AS jsd_q20
          |FROM sums, tot""".stripMargin

  /** Q20 fixed-point log2 of a positive BIGINT column `in` → BIGINT column
    * `out` = floor(2^20 · log2(n)): integer part from the bit length,
    * fraction by 20 rounds of the classic square-and-shift iteration over
    * a Q30 mantissa (x² < 2^62 — never overflows a signed 64-bit). Every
    * op is BIGINT multiply/shift/compare — no libm, so Spark and DuckDB
    * (same algorithm as a recursive CTE) agree bit-for-bit; all 20 rounds
    * unroll into one whole-stage-codegen projection. Run it on
    * VOCABULARY-sized tables only; corpus-sized streams join the result.
    */
  private def fixedLog2(df: DataFrame, in: String, out: String): DataFrame = {
    var d = df
      .withColumn("_m", (length(expr(s"bin($in)")) - lit(1)).cast("long"))
      .withColumn("_x", expr(
        s"CASE WHEN _m <= 30 THEN shiftleft($in, CAST(30 - _m AS INT)) " +
          s"ELSE shiftright($in, CAST(_m - 30 AS INT)) END"))
      .withColumn("_a", lit(0L))
    for (_ <- 1 to 20) {
      d = d.withColumn("_xs", expr("shiftright(_x * _x, 30)"))
        .withColumn("_a", expr(
          "_a * 2 + CASE WHEN _xs >= 2147483648 THEN 1 ELSE 0 END"))
        .withColumn("_x", expr(
          "CASE WHEN _xs >= 2147483648 THEN shiftright(_xs, 1) ELSE _xs END"))
        .drop("_xs")
    }
    d.withColumn(out, expr("shiftleft(_m, 20) + _a")).drop("_m", "_x", "_a")
  }

  /** q171's scaled log-ratio arguments for one vocabulary row — extracted
    * so the headroom proof is unit-testable at adversarial totals: with
    * s = max(0, bits(A)+bits(B)−61), every returned value is positive and
    * provably < 2^63 for ANY 0 < a1 ≤ A, 0 < b1 ≤ B (the r7 verdict's
    * overflow scenario), and L(xab)−L(yab) ≈ log2(2·a1·B/(a1·B+b1·A))
    * with relative input error ≤ 2^-(62−bits(max(A,B))).
    */
  private[graft] def driftScale(aTot: Long, bTot: Long): (Long, Long) = {
    def bitsOf(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val s = math.max(0, bitsOf(aTot) + bitsOf(bTot) - 61)
    val (aT, bT) = (aTot >> s, bTot >> s)
    require(aT > 0 && bT > 0,
      s"corpus-drift slices too lopsided for the Q20 derivation " +
        s"(totals $aTot vs $bTot): the smaller slice scales to zero")
    (aT, bT)
  }

  private[graft] def driftTerms(a1: Long, b1: Long, aTot: Long, bTot: Long)
      : (Long, Long, Long) = {
    val (aT, bT) = driftScale(aTot, bTot)
    (2L * a1 * bT, a1 * bT + b1 * aT, 2L * b1 * aT)
  }

  /** Driver-side twin of [[fixedLog2]] for the scalar smoothing
    * denominator — same integer algorithm, same result by construction.
    * Shared with q164's nDCG weights (Similarity).
    */
  private[operators] def fixedLog2Long(n: Long): Long = {
    val m = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = if (m <= 30) n << (30 - m) else n >> (m - 30)
    var acc = 0L
    var i = 0
    while (i < 20) {
      val xs = (x * x) >> 30
      if (xs >= 2147483648L) { acc = acc * 2 + 1; x = xs >> 1 }
      else { acc = acc * 2; x = xs }
      i += 1
    }
    (m.toLong << 20) + acc
  }
}
