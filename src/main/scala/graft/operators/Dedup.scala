package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators over the `documents` table — the training-data
  * pipeline surface: exact content-hash dedup, MinHash+LSH near-dup,
  * SimHash hamming near-dup, and DF-capped n-gram Jaccard similarity.
  *
  * Cross-engine determinism strategy: every hash is MD5 (identical bytes in
  * Spark and DuckDB); minhash order statistics run over exact BIGINTs
  * derived from md5 hex slices (Carter–Wegman family), so no
  * engine-specific integer hashing is involved anywhere.
  *
  * Scale design (100 TB):
  *  - tokenize + shingle + dedupe INSIDE the row (`array_distinct` before
  *    `explode`) — per-doc set semantics with zero extra shuffle;
  *  - MinHash signatures reduce each doc to k strings in ONE partial+final
  *    aggregate; LSH banding turns all-pairs O(n²) into an equi-join on
  *    band keys (shuffle on key, broadcast-free, skew-safe since a band
  *    bucket is at most a near-dup cluster);
  *  - SimHash 15-bit banding is lossless for hamming ≤ 3 by pigeonhole
  *    (4 bands, ≤3 differing bits ⇒ ≥1 intact band) — the equi-join
  *    provably returns the same pairs as the O(n²) cross join;
  *  - n-gram Jaccard caps shingle document-frequency (stop-shingle removal)
  *    so the inverted-index self-join is bounded per key.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Connected components of the simhash near-dup graph by min-label
    * propagation (the q47 machinery): one (doc_id, component) row per doc,
    * component = the cluster's minimum doc_id. Each round is one equi-join
    * + min-aggregate with localCheckpoint lineage truncation; rounds =
    * component diameter — the all-pairs transitive closure is never
    * materialized.
    */
  /** Release a `localCheckpoint`'s materialized blocks. The checkpoint
    * persists its RDD in the block manager OUTSIDE the cache manager, so
    * `Dataset.unpersist` never reclaims it — without this, every
    * propagation round leaks a labels-sized block for the life of the JVM
    * (found by the r5 sf1 sweep: queries running after the iterative
    * family degraded up to 9× from accumulated storage pressure; the same
    * leak starves executor storage memory on a long-lived cluster app).
    */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** q143/q145's overlapping 15-token windows over (doc_id, toks) rows:
    * (doc_id, pos, w) built entirely in-row — one transform + posexplode,
    * no shuffle to construct.
    */
  private val SubstrW = 15
  private def substrWindows(base: DataFrame): DataFrame =
    base.filter(size(col("toks")) >= SubstrW)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(toks) - $SubstrW),
           |  i -> concat_ws(' ', slice(toks, i + 1, $SubstrW)))""".stripMargin)))
      .withColumnRenamed("col", "w")

  /** One BIGINT encodes the (doc_id, pos) total order — min() picks the
    * globally-first window occurrence without a struct comparator. The
    * encoding is injective and order-correct ONLY inside its headroom
    * (pos < 10⁶ window positions per document, |doc_id| < 2⁶³/10⁶ ≈
    * 9.2·10¹²), and the DuckDB oracle uses the identical formula — so a
    * silent wrap could never be caught by the correctness gate. Out-of-
    * contract rows therefore FAIL LOUDLY at run time (ADVICE r7): a
    * million-window document (~10⁶ tokens) should be chunked upstream
    * (q51/q99 are the chunkers), and hash-derived doc ids must stay under
    * the bound.
    */
  private val SubstrMaxDocId = Long.MaxValue / 1000000L // 9 223 372 036 854
  private def substrKey: Column =
    when(col("pos") >= 1000000L || abs(col("doc_id")) >= SubstrMaxDocId,
      raise_error(concat(
        lit("ExactSubstr occurrence key out of contract: (doc_id, pos) = ("),
        col("doc_id"), lit(", "), col("pos"),
        lit(") exceeds doc_id*1e6+pos headroom — chunk documents past 1e6 " +
          "windows (q51/q99) or re-shard doc ids below 9.2e12")))
        .cast("long"))
      .otherwise(col("doc_id") * lit(1000000L) + col("pos"))

  /** q145's per-batch incremental-ExactSubstr fold, shared with the
    * streaming sink: merge the batch's windows into the persisted index at
    * `root` (ONE MERGE commit — source rows pre-resolve
    * canon = least(index, batch-min), so the full-row upsert is exact under
    * any id interleaving), then cut the batch's duplicated spans against
    * the UPDATED index and return the per-doc cleaning output
    * (doc_id, n_toks, n_cut, clean_text). With doc_ids monotone across
    * batches (the q80 contract), folding batch-by-batch produces the same
    * output as folding their concatenation once — the associativity the
    * streaming spec asserts.
    */
  def substrFold(s: SparkSession, batchDocs: DataFrame, root: String): DataFrame = {
    import graft.sources.CommitLog
    val batch = batchDocs.select(col("doc_id"), Text.toksCol.as("toks"))
    val batchCanon = substrWindows(batch)
      .groupBy("w").agg(min(substrKey).as("canon"))
    val upsert = batchCanon.join(
      CommitLog.read(s, root).withColumnRenamed("canon", "old_canon"),
      Seq("w"), "left")
      .select(col("w"),
        least(col("canon"), coalesce(col("old_canon"), col("canon")))
          .as("canon"))
    CommitLog.mergeRows(s, root, upsert, Seq("w"),
      deleteFlag = None, insertUnmatched = true)
    val index = CommitLog.read(s, root)
    val cut = substrWindows(batch).join(index, Seq("w"))
      .filter(substrKey =!= col("canon"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(SubstrW - 1)))
          .as("tokpos"))
      .distinct()
    val perDoc = cut.groupBy("doc_id")
      .agg(count(lit(1)).as("n_cut"),
        array_sort(collect_list(col("tokpos"))).as("cuts"))
    batch.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        when(col("cuts").isNull, concat_ws(" ", col("toks")))
          .otherwise(expr(
            "concat_ws(' ', filter(toks, (t, i) -> NOT array_contains(cuts, i)))"))
          .as("clean_text"))
  }

  /** Seed an empty ExactSubstr window index table for [[substrFold]]. */
  def substrIndexInit(s: SparkSession, corpus: DataFrame, root: String): Long = {
    val base = corpus.select(col("doc_id"), Text.toksCol.as("toks"))
    graft.sources.CommitLog.append(
      substrWindows(base).groupBy("w").agg(min(substrKey).as("canon")), root)
  }

  private def components(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = simhashPairs(d).select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = d.select(col("doc_id").as("id"), col("doc_id").as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < 25) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbl"))
      // r14 OPT (guide §1.2 fewer passes): the changed-flag rides the
      // update row itself, so convergence is a filter over the freshly
      // checkpointed blocks instead of a second labels⋈next join job
      // per round (label strictly decreases, so "changed" ≡ nbl < label).
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbl"), col("label"))).as("label"),
          (coalesce(col("nbl"), col("label")) < col("label")).as("chg"))
        .localCheckpoint()
      converged = next.filter(col("chg")).isEmpty
      dropCheckpoint(labels) // superseded round — release its blocks now
      // keep the RAW checkpointed frame (dropCheckpoint pattern-matches
      // LogicalRDD); the stray chg column is ignored by the next round's
      // joins and dropped by the final select
      labels = next
      iter += 1
    }
    require(converged, s"component propagation did not converge in $iter rounds")
    // The final labels checkpoint is materialized, so the edge list is no
    // longer needed by the returned plan — release it too.
    dropCheckpoint(edges)
    labels.select(col("id").as("doc_id"), col("label").as("component"))
  }

  /** Distinct 3-word shingles, one row per (doc_id, sh). Unigram tokens are
    * useless on a small shared vocabulary (every doc carries nearly the full
    * token set ⇒ all-pairs explosion); 3-shingles discriminate. The shingle
    * set is built and deduplicated INSIDE the row — no shuffle.
    */
  private[operators] def shingles(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        when(size(col("toks")) >= 3,
          expr("transform(sequence(0, size(toks)-3)," +
            " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .otherwise(expr("array()")))).as("sh"))

  /** DuckDB mirror of [[shingles]] as a CTE body named `sh0`. */
  private[operators] val shinglesSql: String =
    """sh0 AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(toks) - 1, 1)),
      |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh
      |  FROM (SELECT doc_id,
      |          regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents))""".stripMargin

  /** Distinct shingles of an eval/benchmark document set — the static
    * side the contamination screens (q67, q95, and the streaming twin)
    * verify against.
    */
  def evalShingles(d: DataFrame): DataFrame =
    shingles(d).select(col("sh")).distinct()

  /** Build the eval-side bloom sketch: one mergeable BloomFilterAggregate
    * over the distinct eval shingles, read back as a single bounded row
    * (bits/8 bytes — the runtime-filter broadcast every batch/stream
    * prescreen re-uses as a plan literal).
    */
  def contaminationBloom(s: SparkSession, evalSh: DataFrame,
      items: Int, bits: Int): Array[Byte] = {
    graft.functions.GraftFunctions.register(s)
    evalSh.agg(call_function("bloom_agg", expr("xxhash64(sh)"),
      lit(items), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Bloom-prescreened exact contamination screen over (doc_id, text)
    * rows: q67's semantics (flag docs sharing ≥ 3 distinct shingles with
    * the eval set), with the sketch probe pruning the shingle stream
    * BELOW the exchange and the exact semi-join removing the bloom's
    * false positives. Shared by batch q95 and the streaming sink.
    */
  def bloomScreen(s: SparkSession, d: DataFrame, evalSh: DataFrame,
      bloom: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // r15 OPT (guide §3.2's broadcast pattern): the sketch ships as a
    // BROADCAST instead of a plan literal — a 128 KiB literal was
    // rendered into every plan string (explain, SQL-event descriptions)
    // and serialized into every stage's task binary. Same engine sketch
    // class, same mightContainLong probe — identical survivors, and the
    // exact semi-join still removes false positives either way.
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom))
    val bc = s.sparkContext.broadcast(bf)
    val probe = udf((h: Long) => bc.value.mightContainLong(h))
    shingles(Tables.fanOut(s, d, col("doc_id")))
      .filter(probe(expr("xxhash64(sh)")))
      .join(evalSh, Seq("sh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
  }

  /** Shared by q67 and q95: the exact contamination screen. q95's green
    * row against this SAME SQL is the proof its bloom prescreen is
    * lossless.
    */
  private val contaminationOracle: String =
    s"""WITH $shinglesSql,
       |ev AS (SELECT DISTINCT sh FROM sh0 WHERE doc_id % 11 = 0),
       |tr AS (SELECT doc_id, sh FROM sh0 WHERE doc_id % 11 <> 0)
       |SELECT doc_id, count(*) AS n_shared
       |FROM tr WHERE sh IN (SELECT sh FROM ev)
       |GROUP BY 1 HAVING count(*) >= 3
       |ORDER BY 1""".stripMargin

  private val K = 12 // minhash signature length
  private val BANDS = 4 // rows-per-band r = 3 → LSH threshold ≈ (1/4)^(1/3) ≈ 0.63

  /** Carter–Wegman minhash family: ONE md5 per shingle yields two 56-bit
    * integers (h1, h2); permutation i is `(h1 + i·h2) mod p` (p prime
    * > 2^56, universal-hash family). One hash + integer math replaces K
    * independent md5s per row (the K-md5 form was the q13 bench hotspot);
    * exact BIGINT arithmetic keeps Spark ≡ DuckDB bit-for-bit.
    * i·h2 ≤ 11·2^56 < 2^60 and h1 + i·h2 < 2^61 — no int64 overflow.
    */
  private val MINHASH_P = 2305843009213693951L // 2^61 - 1 (Mersenne prime)

  private def minhashAggs: Seq[Column] = {
    val h1 = conv(substring(col("h"), 1, 14), 16, 10).cast("long")
    val h2 = conv(substring(col("h"), 15, 14), 16, 10).cast("long")
    (0 until K).map(i => min((h1 + lit(i.toLong) * h2) % MINHASH_P).as(s"m$i"))
  }

  /** md5-hoisting projection feeding [[minhashAggs]]. */
  private def withShingleHash(d: DataFrame): DataFrame =
    d.select(col("doc_id"), md5(col("sh")).as("h"))

  /** SimHash hamming ≤ 3 candidate pairs (doc_a < doc_b) with the lossless
    * 15-bit-band equi-join — shared by q14 (pair list) and q47 (clusters).
    * md5 is hoisted into ONE projected column, and the 60 per-bit vote
    * sums + bit fold collapse into the native [[graft.functions.SimHash60]]
    * aggregate: one int[60] buffer and one byte pass per row instead of 60
    * bit-test expressions and 60 sum buffers (same semantics, proven by
    * SimHash60Spec and the q14/q47 oracles).
    */
  /** (doc_id, fp): 60-bit simhash fingerprints — the maintained index an
    * incremental pipeline keeps alongside the corpus (q80 probes it).
    * Width is the scale knob (see [[graft.functions.SimHash60]]): the
    * band join's candidate volume is 4·n²/2^15 — the r4 32-bit/8-bit-band
    * form was 4·n²/2^8 and went quadratic at the sf1 sweep.
    */
  private def simhashFps(d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    // r15 OPT (guide §2.5): fan out the single-split corpus scan — the
    // shingle+md5+vote pass is the simhash family's dominant compute and
    // ran as one task at bench SFs (no-op at scale; the downstream
    // groupBy re-shuffles, so consumers' write layouts are unchanged)
    shingles(Tables.fanOut(d.sparkSession, d, col("doc_id")))
      .select(col("doc_id"), md5(col("sh")).as("h"))
      .groupBy(col("doc_id"))
      .agg(call_function("simhash60", col("h")).as("fp"))
  }

  /** (doc_id, band, nib): the 4 lossless 15-bit bands per fingerprint
    * (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 bands intact).
    */
  private def simhashBands(fp: DataFrame): DataFrame = {
    val nibbles = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), 15 * b).bitwiseAND(lit(0x7fffL)).as("nib"))
    }
    fp.select(col("doc_id"), explode(array(nibbles: _*)).as("bn"))
      .select(col("doc_id"), col("bn.band").as("band"), col("bn.nib").as("nib"))
  }

  /** Public fingerprint/index/probe API — the maintained-index near-dup
    * pipeline as reusable pieces: `fingerprints` + `bandIndex` build the
    * persistent side once; `probeIndex` dedups any newly arrived
    * fingerprint set against it WITHOUT an index self-join (asymmetric —
    * at 100 TB the batch side broadcasts into the index). q80 composes
    * exactly these on its CDC slice; the streaming twin
    * ([[graft.streaming.StreamingAnalytics.neardupProbeSink]]) runs the
    * same probe per micro-batch.
    */
  def fingerprints(d: DataFrame): DataFrame = simhashFps(d)

  /** (doc_id, band, nib) rows for a fingerprint set — the band index. */
  def bandIndex(fp: DataFrame): DataFrame = simhashBands(fp)

  /** Best duplicate per new doc: (new_id, dup_of, hamming ≤ 3), ties to
    * the smallest id. `newFp` rows also present in the index never match
    * themselves (the id-inequality guard).
    */
  def probeIndex(newFp: DataFrame, indexFp: DataFrame, indexBands: DataFrame): DataFrame = {
    val cand = simhashBands(newFp).as("a").join(indexBands.as("b"),
        col("a.band") === col("b.band") && col("a.nib") === col("b.nib") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("other_id"))
      .distinct()
    cand.join(newFp.toDF("new_id", "fp_a"), Seq("new_id"))
      .join(indexFp.toDF("other_id", "fp_b"), Seq("other_id"))
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= 3)
      .groupBy(col("new_id"))
      .agg(min(struct(col("hamming"), col("other_id"))).as("m"))
      .select(col("new_id"), col("m.other_id").as("dup_of"),
        col("m.hamming").as("hamming"))
  }

  private def simhashPairs(d: DataFrame): DataFrame = {
    // r14 OPT (guide §3.3): fp feeds three branches (bands + both join
    // sides); without pinning, the shingle-hash-vote aggregation runs
    // three times per action. One doc_id-sized checkpoint runs it once.
    val fp = simhashFps(d).localCheckpoint()
    val bands = simhashBands(fp)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.nib") === col("b.nib") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val fa = fp.toDF("doc_id", "fp_a")
    val fb = fp.toDF("doc_id", "fp_b")
    cand
      .join(fa, cand("doc_a") === fa("doc_id")).drop("doc_id")
      .join(fb, cand("doc_b") === fb("doc_id")).drop("doc_id")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
  }

  /** DuckDB mirror of [[simhashPairs]]: CTE chain ending in `pairs`.
    * H = the first 15 hex digits of md5 as a 60-bit integer; vote i is
    * the sign vote of bit i of H — exactly [[graft.functions.SimHash60]].
    */
  private val simhashPairsSql: String = {
    val voteCols = (0 until 60)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(",\n    ")
    val fpExpr = (0 until 60)
      .map(i => s"(CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""$shinglesSql,
       |hashed AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS h
       |  FROM sh0),
       |sums AS (
       |  SELECT doc_id,
       |    $voteCols
       |  FROM hashed GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($fpExpr AS BIGINT) AS fp FROM sums),
       |bands AS (
       |  SELECT doc_id, b AS band, (fp >> (15*b)) & 32767 AS nib
       |  FROM fp CROSS JOIN (VALUES (0),(1),(2),(3)) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(bit_count(xor(fa.fp, fb.fp)) AS INT) AS hamming
       |  FROM cand c
       |  JOIN fp fa ON fa.doc_id = c.doc_a
       |  JOIN fp fb ON fb.doc_id = c.doc_b
       |  WHERE bit_count(xor(fa.fp, fb.fp)) <= 3)""".stripMargin
  }

  val queries: Map[String, QueryDef] = Map(

    // Cross-corpus novelty score: per document, how many of its distinct
    // 3-shingles appear in NO other document (global shingle document-
    // frequency 1), as counts plus an integer-division ppm ratio — the
    // boilerplate/templating signal (C4/RefinedWeb-style): near-zero
    // novelty means the doc is assembled from shingles the rest of the
    // corpus already carries. Complements q71 (repetition WITHIN a doc)
    // and q96 (passage dedup at chunk grain). 100 TB shape: two shuffles
    // on the shingle key, both with map-side partial aggregation; the
    // ratio is integer arithmetic (no float drift between engines).
    "q108_novelty" -> QueryDef(
      fn = { (s, dir) =>
        val sh = shingles(Tables.fanOut(s, docs(s, dir), col("doc_id")))
        val dfRel = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        sh.join(dfRel, Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sh"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
          .withColumn("novelty_ppm", expr("n_unique * 1000000 div n_sh"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH $shinglesSql,
           |sdf AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY 1),
           |per AS (
           |  SELECT doc_id, count(*) AS n_sh,
           |    sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique
           |  FROM sh0 JOIN sdf USING (sh) GROUP BY 1)
           |SELECT doc_id, CAST(n_sh AS BIGINT) AS n_sh,
           |  CAST(n_unique AS BIGINT) AS n_unique,
           |  CAST(n_unique * 1000000 // n_sh AS BIGINT) AS novelty_ppm
           |FROM per ORDER BY doc_id""".stripMargin)),

    // Decontaminated eval split — the dataset-freeze composition every
    // published benchmark pipeline runs before releasing an eval set:
    // q100's content-free hash rule partitions the corpus 80/10/10, and
    // each TEST doc is screened against the TRAIN split's distinct
    // shingle set by OVERLAP RATIO (≥ 75% of the doc's distinct
    // 3-shingles already in train = leaked — the ratio rule, unlike
    // q67's absolute floor, discriminates on a shared-vocabulary corpus
    // where every doc trivially shares a few shingles). Output is the
    // per-doc eval manifest with the contamination flag — what actually
    // ships, instead of two reports a human must join. All-integer
    // threshold arithmetic (4·shared ≥ 3·total), no float boundary.
    // 100 TB shape: the train shingle set is a semi-join + distinct
    // (map-side combined); the test stream left-joins it on the shingle
    // key and collapses to two counts per doc — one shuffle each.
    "q110_clean_eval_split" -> QueryDef(
      fn = { (s, dir) =>
        val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long")
        val d = docs(s, dir).withColumn("split",
          when(u % 100 < 80, "train").when(u % 100 < 90, "val")
            .otherwise("test"))
        val sh = shingles(Tables.fanOut(s, d, col("doc_id")))
        val trainSh = sh
          .join(d.filter(col("split") === "train").select("doc_id"),
            Seq("doc_id"), "left_semi")
          .select("sh").distinct()
        val bad = sh
          .join(d.filter(col("split") === "test").select("doc_id"),
            Seq("doc_id"), "left_semi")
          .join(trainSh.withColumn("hit_sh", lit(1L)), Seq("sh"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sh"),
            sum(coalesce(col("hit_sh"), lit(0L))).as("n_shared"))
          .filter(col("n_shared") * 4 >= col("n_sh") * 3)
          .select(col("doc_id"), lit(1L).as("hit"))
        d.filter(col("split") === "test")
          .join(bad, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"), col("source"),
            coalesce(col("hit"), lit(0L)).as("contaminated"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH $shinglesSql,
           |splits AS (
           |  SELECT doc_id, lang, source,
           |    CASE WHEN u % 100 < 80 THEN 'train'
           |         WHEN u % 100 < 90 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM (
           |    SELECT doc_id, lang, source,
           |      CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
           |        AS BIGINT) AS u
           |    FROM documents)),
           |trsh AS (
           |  SELECT DISTINCT sh FROM sh0
           |  JOIN splits USING (doc_id) WHERE split = 'train'),
           |bad AS (
           |  SELECT s.doc_id FROM sh0 s
           |  JOIN splits p ON p.doc_id = s.doc_id AND p.split = 'test'
           |  LEFT JOIN trsh t ON t.sh = s.sh
           |  GROUP BY 1
           |  HAVING 4 * sum(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END)
           |    >= 3 * count(*))
           |SELECT p.doc_id, p.lang, p.source,
           |  CAST(CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           |    AS contaminated
           |FROM splits p LEFT JOIN bad b ON b.doc_id = p.doc_id
           |WHERE p.split = 'test'
           |ORDER BY p.doc_id""".stripMargin)),

    // Exact dedup: canonical representative (min doc_id) per normalized
    // content hash. Hash-groupBy — the one shuffle is on the 128-bit key,
    // uniformly distributed by construction.
    "q12_exact_dedup" -> QueryDef(
      fn = { (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), Text.contentKey.as("content_key"))
          .groupBy(col("content_key"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select("content_key", "keep_id", "n_copies")
          .orderBy("content_key")
      },
      oracle = Some(
        """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_key,
          |  min(doc_id) AS keep_id, count(*) AS n_copies
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Dedup savings report — the decision panel that justifies (or
    // kills) a dedup run before it's scheduled: exact-duplicate clusters
    // (q12's normalized-content key) bucketed by size, with doc counts,
    // removable-duplicate counts, and the bytes a keep-one policy frees
    // (keep the SMALLEST rendition per cluster — deterministic and the
    // cheapest to store). Pure integer arithmetic; plan shape: ONE
    // map-side-combined groupBy on the 128-bit key, then the histogram
    // aggregates over the CLUSTER table (clusters ≪ docs) — the savings
    // estimate for a 100 TB corpus costs exactly one dedup-key aggregate,
    // the same first stage the dedup itself would run.
    "q169_dedup_savings" -> QueryDef(
      fn = { (s, dir) =>
        val clusters = docs(s, dir)
          .select(Text.contentKey.as("k"), col("n_chars"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("sz"), sum(col("n_chars")).as("bytes"),
            min(col("n_chars")).as("keep_bytes"))
        clusters
          .withColumn("bucket", expr(
            "CASE WHEN sz = 1 THEN '1' WHEN sz = 2 THEN '2' " +
              "WHEN sz <= 5 THEN '3-5' ELSE '6+' END"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("sz")).as("n_docs"),
            sum(col("sz") - lit(1)).as("dup_docs"),
            sum(col("bytes") - col("keep_bytes")).as("saved_bytes"))
          .orderBy("bucket")
      },
      oracle = Some(
        """WITH c AS (
          |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS k,
          |    CAST(count(*) AS BIGINT) AS sz,
          |    CAST(sum(n_chars) AS BIGINT) AS bytes,
          |    min(n_chars) AS keep_bytes
          |  FROM documents GROUP BY 1)
          |SELECT CASE WHEN sz = 1 THEN '1' WHEN sz = 2 THEN '2'
          |    WHEN sz <= 5 THEN '3-5' ELSE '6+' END AS bucket,
          |  CAST(count(*) AS BIGINT) AS n_clusters,
          |  CAST(sum(sz) AS BIGINT) AS n_docs,
          |  CAST(sum(sz - 1) AS BIGINT) AS dup_docs,
          |  CAST(sum(bytes - keep_bytes) AS BIGINT) AS saved_bytes
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // KMV sketch cross-corpus overlap (Beyer et al. SIGMOD'07 "On
    // Synopses for Distinct Value Estimation" — the k-minimum-values
    // synopsis): estimate |A∪B| and Jaccard(A,B) between two corpora by
    // exchanging only their k smallest content-key hashes. The use case
    // at 100 TB is the FIRST question of any dataset merger or
    // contamination audit — "how much do these two corpora overlap?" —
    // answered WITHOUT a cross-corpus join: each side computes a
    // KB-sized sketch in one pass, and the estimates come from comparing
    // sketches alone. Estimators (exact-integer renditions): with m =
    // k-th smallest of the combined sketch over a 2⁶⁰ hash space,
    // est |A∪B| ≈ (k−1)·(2⁶⁰ div m); Jaccard ≈ |K(A∪B) ∩ A ∩ B| / k.
    // The estimator's QUALITY is itself oracle-checked (the q46
    // discipline): the output row carries the exact union/Jaccard beside
    // the estimates, and every value is BIGINT-derived (60-bit md5 hash
    // via conv/'0x' cast, floor divisions on nonnegative operands), so
    // both engines agree bit-for-bit. Plan shape: per-side sketch =
    // map-side-combined distinct on the hash then a k-row
    // TakeOrderedAndProject — never a global sort; the exact comparison
    // (a key-distinct + one equi-join) is the audit the sketch REPLACES
    // at scale, kept here to grade the estimator.
    "q160_kmv_overlap" -> QueryDef(
      fn = { (s, dir) =>
        val k = 64
        val h = conv(substring(md5(
          regexp_replace(lower(trim(col("text"))), "\\s+", " ")), 1, 15),
          16, 10).cast("long")
        val keyed = docs(s, dir).select(col("doc_id"), h.as("h"))
        val a = keyed.filter(col("doc_id") % 3 === 0).select("h").distinct()
        val b = keyed.filter(col("doc_id") % 3 =!= 0).select("h").distinct()
        val sa = a.orderBy(col("h")).limit(k)
        val sb = b.orderBy(col("h")).limit(k)
        val uk = sa.unionByName(sb).distinct().orderBy(col("h")).limit(k)
        val mRow = uk.agg(max(col("h")).as("m"), count(lit(1)).as("kk"))
          .collect()(0)
        val m = mRow.getLong(0); val kk = mRow.getLong(1)
        val nShared = uk.join(sa, Seq("h"), "left_semi")
          .join(sb, Seq("h"), "left_semi").count()
        val exactUnion = a.unionByName(b).distinct().count()
        val exactShared = a.join(b, Seq("h"), "left_semi").count()
        import s.implicits._
        Seq((kk, (kk - 1) * ((1L << 60) / m), exactUnion,
          nShared, nShared * 1000000L / kk,
          exactShared * 1000000L / exactUnion))
          .toDF("k", "est_union_q", "exact_union", "n_shared",
            "jaccard_est_q", "jaccard_exact_q")
      },
      oracle = Some(
        """WITH ka AS (SELECT DISTINCT CAST(concat('0x', substr(md5(
          |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15))
          |    AS BIGINT) AS h
          |  FROM documents WHERE doc_id % 3 = 0),
          |kb AS (SELECT DISTINCT CAST(concat('0x', substr(md5(
          |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15))
          |    AS BIGINT) AS h
          |  FROM documents WHERE doc_id % 3 <> 0),
          |sa AS (SELECT h FROM ka ORDER BY h LIMIT 64),
          |sb AS (SELECT h FROM kb ORDER BY h LIMIT 64),
          |uk AS (SELECT DISTINCT h FROM (SELECT h FROM sa
          |    UNION ALL SELECT h FROM sb) ORDER BY h LIMIT 64),
          |m AS (SELECT max(h) AS m, CAST(count(*) AS BIGINT) AS k FROM uk),
          |shared AS (SELECT CAST(count(*) AS BIGINT) AS n_shared FROM uk
          |  WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
          |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_union
          |  FROM (SELECT h FROM ka UNION SELECT h FROM kb)),
          |exs AS (SELECT CAST(count(*) AS BIGINT) AS exact_shared FROM ka
          |  WHERE h IN (SELECT h FROM kb))
          |SELECT m.k AS k,
          |  (m.k - 1) * ((CAST(1 AS BIGINT) << 60) // m.m) AS est_union_q,
          |  ex.exact_union, shared.n_shared,
          |  (shared.n_shared * 1000000) // m.k AS jaccard_est_q,
          |  (exs.exact_shared * 1000000) // ex.exact_union AS jaccard_exact_q
          |FROM m, shared, ex, exs""".stripMargin)),

    // MinHash + LSH near-dup: K=12 Carter–Wegman minhashes over the shingle
    // set, banded 4×3; candidate pairs share ≥1 band; est_sim = matching
    // minhash fraction (the unbiased Jaccard estimator).
    "q13_minhash_lsh" -> QueryDef(
      fn = { (s, dir) =>
        val sig = withShingleHash(shingles(Tables.fanOut(s, docs(s, dir), col("doc_id")))).groupBy(col("doc_id"))
          .agg(minhashAggs.head, minhashAggs.tail: _*)
        val bandStructs = (0 until BANDS).map { b =>
          struct(lit(b).as("band"),
            concat_ws("|", (0 until 3).map(r => col(s"m${3 * b + r}")): _*).as("key"))
        }
        val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        val cand = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val sa = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == "doc_id") c else s"a_$c"): _*)
        val sb = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == "doc_id") c else s"b_$c"): _*)
        val matches = (0 until K)
          .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
          .reduce(_ + _)
        cand
          .join(sa, cand("doc_a") === sa("doc_id")).drop("doc_id")
          .join(sb, cand("doc_b") === sb("doc_id")).drop("doc_id")
          .select(col("doc_a"), col("doc_b"),
            (matches.cast("double") / lit(K.toDouble)).as("est_sim"))
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some {
        val minCols = (0 until K)
          .map(i => s"min((h1 + $i * h2) % $MINHASH_P) AS m$i").mkString(",\n    ")
        val bandSelects = (0 until BANDS).map { b =>
          val key = (0 until 3).map(r => s"m${3 * b + r}").mkString(", ")
          s"SELECT doc_id, $b AS band, concat_ws('|', $key) AS key FROM sig"
        }.mkString("\n  UNION ALL\n  ")
        val matchSum = (0 until K)
          .map(i => s"CASE WHEN fa.m$i = fb.m$i THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH $shinglesSql,
           |hashed AS (
           |  SELECT doc_id,
           |    CAST(concat('0x', substr(md5(sh), 1, 14)) AS BIGINT) AS h1,
           |    CAST(concat('0x', substr(md5(sh), 15, 14)) AS BIGINT) AS h2
           |  FROM sh0),
           |sig AS (
           |  SELECT doc_id,
           |    $minCols
           |  FROM hashed GROUP BY doc_id),
           |bands AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
           |SELECT c.doc_a, c.doc_b,
           |  CAST($matchSum AS DOUBLE) / ${K}.0 AS est_sim
           |FROM cand c
           |JOIN sig fa ON fa.doc_id = c.doc_a
           |JOIN sig fb ON fb.doc_id = c.doc_b
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    // MinHash estimator CALIBRATION (the q46/q160/q164 grading discipline
    // applied to q13): for a deterministic sample of LSH candidate pairs,
    // the K=12 signature estimate sits next to the EXACT shingle Jaccard,
    // and the report is the error panel — MAE, worst error, and signed
    // bias — that tells an operator whether est_sim thresholds can be
    // trusted before a dedup run burns cluster time. Everything is exact
    // integers on the 1e6 grid (est = 1e6·matches div 12; jac =
    // 1e6·|A∩B| div |A∪B|; Spark `div` ≡ DuckDB `//`, both truncate
    // toward zero even for the signed bias). Plan at 100 TB: candidates
    // come from the SAME band equi-join q13 uses (never all-pairs), and
    // the AUDIT ITSELF is capped (r9): when candidates exceed ~20k pairs,
    // a deterministic md5-hash modulus (the q50 sampling idiom, computed
    // identically by the oracle) keeps a fixed-size pair sample — the
    // calibration stays O(cap) at any corpus scale instead of riding the
    // (mildly superlinear) candidate-pair density. Below the cap the
    // modulus is 1 and every candidate grades, so small-SF results are
    // unchanged.
    "q168_minhash_calibration" -> QueryDef(
      fn = { (s, dir) =>
        // r10: checkpoint the two SHARED upstream sets — the audit fans
        // out five ways (bands ×2 sides, est ×2 sides, inter ×2 sides +
        // sizes), and without materialization every branch re-runs the
        // shingle explode + minhash aggregation (the actual cost VERDICT
        // r9 measured; the band join itself was never the bottleneck).
        // shs is corpus-linear (distinct 3-shingles), sig is doc-sized.
        val shs = shingles(Tables.fanOut(s, docs(s, dir), col("doc_id"))).localCheckpoint()
        val sig = withShingleHash(shs).groupBy(col("doc_id"))
          .agg(minhashAggs.head, minhashAggs.tail: _*)
          .localCheckpoint()
        val bandStructs = (0 until BANDS).map { b =>
          struct(lit(b).as("band"),
            concat_ws("|", (0 until 3).map(r => col(s"m${3 * b + r}")): _*).as("key"))
        }
        val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        val candAll = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        // sample modulus d = ceil(pair_incidences / cap), where
        // pair_incidences = Σ c·(c−1)/2 over band buckets — ONE aggregate
        // over `bands`, never a join (r10: r9 derived d by COUNTING the
        // band join, which ran it twice — VERDICT r9 #1). The incidence
        // sum upper-bounds the distinct candidate count (multi-band
        // collisions count once per band), so the sample stays ≤ ~cap,
        // and the oracle reproduces the identical d from its own bands.
        val sampleCap = 20000L
        val nInc = bands.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
          .collect()(0).getLong(0)
        val d = (nInc + sampleCap - 1) / sampleCap
        val cand =
          (if (d <= 1L) candAll
           else candAll.filter(
            conv(substring(md5(concat(col("doc_a").cast("string"), lit("|"),
              col("doc_b").cast("string"))), 1, 8), 16, 10)
              .cast("long") % lit(d) === 0L))
          // materialize the ≤cap-sized sample once: the est- and
          // inter-joins below would otherwise each re-run the band join
          .localCheckpoint()
        val sa = sig.toDF(sig.columns.toIndexedSeq
          .map(c => if (c == "doc_id") c else s"a_$c"): _*)
        val sb = sig.toDF(sig.columns.toIndexedSeq
          .map(c => if (c == "doc_id") c else s"b_$c"): _*)
        val matches = (0 until K)
          .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1L).otherwise(0L))
          .reduce(_ + _)
        val est = broadcast(cand)
          .join(sa, cand("doc_a") === sa("doc_id")).drop("doc_id")
          .join(sb, cand("doc_b") === sb("doc_id")).drop("doc_id")
          .withColumn("mt", matches)
          .select(col("doc_a"), col("doc_b"),
            expr(s"(1000000 * mt) div $K").as("est_micro"))
        // exact-Jaccard side: broadcast the cap-bounded sample into the
        // shingle joins — shs streams map-side (no corpus shuffle) and
        // collapses to sample-sized rows before the (doc_b, sh) join;
        // sizes is a map-combined doc-keyed rollup (shuffle is doc-count
        // rows, not shingle rows) — all linear scans at any corpus scale
        val inter = broadcast(cand)
          .join(shs.toDF("doc_a", "sh"), Seq("doc_a"))
          .join(shs.toDF("doc_b", "sh"), Seq("doc_b", "sh"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
        val sizes = shs.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
        est.join(inter, Seq("doc_a", "doc_b"), "left")
          .na.fill(0L, Seq("inter"))
          .join(sizes.toDF("doc_a", "nsh_a"), Seq("doc_a"))
          .join(sizes.toDF("doc_b", "nsh_b"), Seq("doc_b"))
          .withColumn("jac_micro",
            expr("(1000000 * inter) div (nsh_a + nsh_b - inter)"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(abs(col("est_micro") - col("jac_micro"))).as("abs_sum"),
            max(abs(col("est_micro") - col("jac_micro"))).as("max_err_micro"),
            sum(col("est_micro") - col("jac_micro")).as("sgn_sum"))
          .select(col("n_pairs"),
            expr("abs_sum div n_pairs").as("mae_micro"),
            col("max_err_micro"),
            expr("sgn_sum div n_pairs").as("bias_micro"))
      },
      oracle = Some {
        val minCols = (0 until K)
          .map(i => s"min((h1 + $i * h2) % $MINHASH_P) AS m$i").mkString(",\n    ")
        val bandSelects = (0 until BANDS).map { b =>
          val key = (0 until 3).map(r => s"m${3 * b + r}").mkString(", ")
          s"SELECT doc_id, $b AS band, concat_ws('|', $key) AS key FROM sig"
        }.mkString("\n  UNION ALL\n  ")
        val matchSum = (0 until K)
          .map(i => s"CASE WHEN fa.m$i = fb.m$i THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH $shinglesSql,
           |hashed AS (
           |  SELECT doc_id,
           |    CAST(concat('0x', substr(md5(sh), 1, 14)) AS BIGINT) AS h1,
           |    CAST(concat('0x', substr(md5(sh), 15, 14)) AS BIGINT) AS h2
           |  FROM sh0),
           |sig AS (
           |  SELECT doc_id,
           |    $minCols
           |  FROM hashed GROUP BY doc_id),
           |bands AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
           |samp AS (
           |  SELECT doc_a, doc_b FROM cand
           |  WHERE (CAST(concat('0x', substr(md5(concat(
           |      CAST(doc_a AS VARCHAR), '|', CAST(doc_b AS VARCHAR))),
           |      1, 8)) AS BIGINT)
           |    % (SELECT (COALESCE(sum(c * (c - 1) // 2), 0) + 19999) // 20000
           |       FROM (SELECT count(*) AS c FROM bands GROUP BY band, key))) = 0),
           |est AS (
           |  SELECT c.doc_a, c.doc_b,
           |    (1000000 * ($matchSum)) // $K AS est_micro
           |  FROM samp c
           |  JOIN sig fa ON fa.doc_id = c.doc_a
           |  JOIN sig fb ON fb.doc_id = c.doc_b),
           |inter AS (
           |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
           |  FROM samp c
           |  JOIN sh0 a ON a.doc_id = c.doc_a
           |  JOIN sh0 b ON b.doc_id = c.doc_b AND b.sh = a.sh
           |  GROUP BY 1, 2),
           |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh
           |  FROM sh0 GROUP BY 1),
           |per AS (
           |  SELECT e.est_micro,
           |    (1000000 * COALESCE(i.inter, 0))
           |      // (sa.nsh + sb.nsh - COALESCE(i.inter, 0)) AS jac_micro
           |  FROM est e
           |  LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
           |  JOIN sizes sa ON sa.doc_id = e.doc_a
           |  JOIN sizes sb ON sb.doc_id = e.doc_b)
           |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(abs(est_micro - jac_micro)) AS BIGINT)
           |    // CAST(count(*) AS BIGINT) AS mae_micro,
           |  max(abs(est_micro - jac_micro)) AS max_err_micro,
           |  CAST(sum(est_micro - jac_micro) AS BIGINT)
           |    // CAST(count(*) AS BIGINT) AS bias_micro
           |FROM per""".stripMargin
      }),

    // SimHash: 60-bit fingerprint (bit i set iff the +1/−1 vote of bit i
    // of the shingle hash's leading 60 bits, over the doc's shingle set,
    // is positive — Manku et al. WWW'07 wide-fingerprint design);
    // near-dups = hamming ≤ 3 found via the lossless 4×15-bit band join
    // (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 bands intact).
    "q14_simhash" -> QueryDef(
      fn = { (s, dir) =>
        simhashPairs(docs(s, dir)).orderBy("doc_a", "doc_b")
      },
      oracle = Some(
        s"""WITH $simhashPairsSql
           |SELECT doc_a, doc_b, hamming FROM pairs
           |ORDER BY doc_a, doc_b""".stripMargin)),

    // Near-dup CLUSTERS: connected components over the simhash pair graph —
    // the completion step every web-scale dedup pipeline needs (pairs alone
    // over-delete: a~b, b~c must collapse to ONE canonical doc, min id).
    // Min-label propagation: labels start as doc_id; each round every
    // vertex takes the min label among itself and its neighbours; converged
    // when a round changes nothing. Rounds = component diameter — near-dup
    // clusters are tiny-diameter, so a handful of shuffles; each round is
    // one equi-join + partial/final min-aggregate (never all-pairs), and
    // `localCheckpoint` truncates the plan so analysis cost stays flat
    // (on a cluster this would be a reliable checkpoint instead). Oracle:
    // DuckDB recursive transitive closure, min reachable id per doc.
    "q47_dedup_components" -> QueryDef(
      fn = { (s, dir) => components(s, dir).orderBy("doc_id") },
      oracle = Some(
        s"""WITH RECURSIVE $simhashPairsSql,
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairs
           |  UNION ALL
           |  SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
           |SELECT id AS doc_id, min(r) AS component
           |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact n-gram (3-word shingle) Jaccard over the DF-capped shingle
    // universe: shingles appearing in > 100 docs are dropped (stop-shingle
    // removal) before the inverted-index self-join, bounding work per key.
    "q15_ngram_jaccard" -> QueryDef(
      fn = { (s, dir) =>
        // Posting-list formulation with a ONE-PASS DF cap: the native
        // [[graft.functions.CappedLongSet]] aggregate collects each
        // shingle's posting list with a buffer bounded at 100 longs BY
        // CONSTRUCTION and returns NULL (drop) past 100 distinct docs — a
        // stop-shingle in 10⁹ docs costs one saturation flag, never a
        // 10⁹-element buffer, in the map-side partials too. Replaces the
        // r3 two-pass form (count+filter, semi-join, collect_set), which
        // re-expanded the shingle stream 4×: same semantics (the oracle's
        // HAVING count ≤ 100 + collect, proven by the unchanged green
        // row), one expansion, one shuffle — best-of-3 2.7s → 2.2s at
        // sf0.1, and 4× less contention surface (the re-expansions were
        // where shared-host noise multiplied). Candidate pairs are
        // generated INSIDE the row
        // (≤ C(100,2) per shingle); per-doc sizes re-derive from the
        // CAPPED postings (≤ 100 longs/row), not the raw stream. An
        // all-pairs self-join on sh was 14.5s at sf0.1.
        graft.functions.GraftFunctions.register(s)
        // r15 OPT (guide §2.5): fan out the single-split corpus scan —
        // profiled: the shingle explode + partial aggregation ran as ONE
        // 2.6 s task (documents.parquet is one split at bench SFs; no-op
        // at scale where the scan carries many splits)
        val sh = shingles(Tables.fanOut(s, docs(s, dir), col("doc_id")))
        // r14 OPT (guide §3.3): the capped-postings aggregation feeds both
        // the pair expansion and the per-doc size re-derivation — pin it
        // so the shingle shuffle runs once per action instead of twice
        // r15: the checkpoint materializes with AQE's byte-sized (tiny)
        // partitioning; fan the C(100,2)-per-row pair expansion back out
        val postings = Tables.fanOut(s, sh
          .groupBy(col("sh"))
          .agg(expr("capped_long_set(doc_id, 100)").as("ds"))
          .filter(col("ds").isNotNull)
          .localCheckpoint(), col("sh"))
        // r15 OPT (guide §4.1): the pair expansion was ONE nested
        // interpreted HOF (transform-in-transform with per-element slice
        // + struct boxing). Two chained Generates with a codegen'd slice
        // enumerate exactly the same (ds[i], ds[j]) i<j pairs — whole
        // stage stays in codegen, no lambda interpretation.
        val pairs = postings
          .filter(size(col("ds")) >= 2)
          .select(posexplode(col("ds")).as(Seq("i", "doc_a")), col("ds"))
          .select(col("doc_a"),
            explode(expr("slice(ds, i + 2, size(ds) - i - 1)")).as("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
        val sizes = postings
          .select(explode(col("ds")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("sz"))
        pairs
          .join(broadcast(sizes.toDF("doc_a", "sz_a")), Seq("doc_a"))
          .join(broadcast(sizes.toDF("doc_b", "sz_b")), Seq("doc_b"))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
          .filter(col("jaccard") >= 0.2)
          .select("doc_a", "doc_b", "inter", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some(
        s"""WITH $shinglesSql,
          |kept AS (
          |  SELECT doc_id, sh FROM sh0
          |  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100)),
          |sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b, inter,
          |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2
          |ORDER BY doc_a, doc_b""".stripMargin)),

    // Benchmark-contamination screen: flag TRAIN documents sharing ≥ 3
    // distinct 3-word shingles with any EVAL document (eval set = the
    // deterministic doc_id % 11 slice, standing in for a held-out
    // benchmark). Scale shape: the eval shingle set is distinct-deduped
    // and equi-joined (semi) against the train shingle stream — the eval
    // side is benchmark-sized (small) so AQE broadcasts it in practice,
    // and the count per train doc rides the semi-join's partitioning.
    // The decontamination step every training pipeline runs before eval.
    "q67_contamination" -> QueryDef(
      fn = { (s, dir) =>
        val sh = shingles(Tables.fanOut(s, docs(s, dir), col("doc_id")))
        val evalSh = sh.filter(col("doc_id") % 11 === 0)
          .select(col("sh")).distinct()
        val train = sh.filter(col("doc_id") % 11 =!= 0)
        // shingles() emits distinct (doc_id, sh), so the post-semi-join
        // count IS the number of distinct shared shingles
        train.join(evalSh, Seq("sh"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 3)
          .orderBy("doc_id")
      },
      oracle = Some(contaminationOracle)),

    // The q67 screen again, but with the engine's own RUNTIME-FILTER
    // machinery made explicit: the eval side's distinct shingles collapse
    // into ONE mergeable bloom sketch (Spark's BloomFilterAggregate — the
    // class AQE's InjectRuntimeFilter builds), the sketch ships to every
    // task as a plan literal (the same broadcast a runtime filter gets),
    // and the train shingle stream is prescreened by the codegen'd
    // membership probe BEFORE the exact semi-join removes the bloom's
    // false positives. Result ≡ q67 exactly — the shared oracle row is
    // the proof that prescreen + verify loses nothing.
    //
    // Why this matters at 100 TB: the exact semi-join shuffles the FULL
    // train shingle stream on `sh`; with the bloom probe pushed below the
    // exchange, only shingles that might match ever enter the shuffle —
    // for a benchmark-sized eval set that is a ~100× exchange-bytes cut
    // on the dominant stream. The one driver collect is the 1-row bloom
    // binary (1 MiB here, capped by numBits/8) — the bounded-collect
    // pattern every broadcast runtime filter is made of.
    "q95_bloom_screen" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val evalSh = evalShingles(d.filter(col("doc_id") % 11 === 0))
        // 2^17 estimated items / 2^20 bits ≈ 8 bits/key → ~2% FP rate;
        // FPs only cost verify work, never correctness
        val bloom = contaminationBloom(s, evalSh, 1 << 17, 1 << 20)
        bloomScreen(s, d.filter(col("doc_id") % 11 =!= 0), evalSh, bloom)
          .orderBy("doc_id")
      },
      oracle = Some(contaminationOracle)),

    // Chunk-grained duplicated-span detection — the scalable stand-in for
    // suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    // Training Data Makes Language Models Better"): cut each doc into
    // NON-OVERLAPPING 10-token passages (built inside the row, no
    // shuffle), find passages verbatim-shared by ≥ 2 distinct docs, and
    // report each doc's duplicated-span count plus a keep decision
    // (≤ 5 % duplicated passages, as an exact integer cross-multiply —
    // no division, no rounding boundary). Differs from q12 (whole-doc
    // exact) and q13/q15 (whole-doc near-dup): this finds COPY-PASTED
    // SPANS inside otherwise-distinct documents — boilerplate, license
    // headers, templated intros — which whole-doc methods cannot see.
    //
    // 100 TB shape: one explode → (doc, passage) rows; the dup set is a
    // groupBy on the passage key with map-side combine; the flag join is
    // an equi-join on that key. Production would join on xxhash64/md5 of
    // the passage (8–16 bytes instead of ~60-char strings in the
    // exchange); kept as the string here so the oracle mirrors exactly.
    "q96_passage_dedup" -> QueryDef(
      fn = { (s, dir) =>
        val W = 10
        val p = docs(s, dir)
          .select(col("doc_id"), Text.toksCol.as("toks"))
          .select(col("doc_id"), explode(
            when(size(col("toks")) >= W, expr(
              s"""transform(sequence(0, size(toks) div $W - 1),
                 |  i -> concat_ws(' ', slice(toks, i * $W + 1, $W)))""".stripMargin))
              .otherwise(expr("array()"))).as("passage"))
        val dup = p.groupBy(col("passage"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("passage"), lit(1).as("is_dup"))
        p.join(dup, Seq("passage"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_pass"),
            count(col("is_dup")).as("n_dup"))
          .withColumn("keep",
            when(col("n_dup") * 20 <= col("n_pass"), 1).otherwise(0))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH p AS (
          |  SELECT doc_id, unnest(list_transform(range(0, len(toks) // 10),
          |    i -> array_to_string(toks[i*10+1 : i*10+10], ' '))) AS passage
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |        FROM documents)),
          |dup AS (
          |  SELECT passage FROM p GROUP BY 1
          |  HAVING count(DISTINCT doc_id) >= 2)
          |SELECT p.doc_id, count(*) AS n_pass, count(d.passage) AS n_dup,
          |  CAST(count(d.passage) * 20 <= count(*) AS INT) AS keep
          |FROM p LEFT JOIN dup d ON d.passage = p.passage
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact duplicated-substring REMOVAL (Lee et al. 2022, "Deduplicating
    // Training Data Makes Language Models Better" — the ExactSubstr pass
    // q96 only approximates): every OVERLAPPING 15-token window occurring
    // at ≥ 2 corpus positions is a duplicated span; the globally-first
    // occurrence (min (doc_id, pos)) survives, every other occurrence's
    // tokens are cut from their document, and the cleaned text is rebuilt.
    // Token-granular where q96 is chunk-granular: a span straddling q96's
    // fixed chunk boundaries goes unseen there but is cut here. A verbatim
    // duplicate doc cleans to the empty string (all its windows lose to
    // the first copy), so ExactSubstr subsumes exact dedup as the
    // degenerate case — 13 of sf0.01's 23 affected docs cut to "".
    //
    // 100 TB shape: windows are one in-row transform + posexplode
    // (≈ |tokens| rows, no shuffle to build); the canonical occurrence is
    // ONE groupBy on the window key with map-side combine; marking is an
    // equi-join back on that key; the rebuild is per-doc in-row array work
    // against a KB-scale sorted cut list — the token stream itself never
    // shuffles. Production would exchange xxhash64(window) (8 bytes)
    // instead of the ~100-char string; the string key is kept so the
    // oracle mirrors the algebra exactly (same trade as q96).
    "q143_substr_dedup" -> QueryDef(
      fn = { (s, dir) =>
        val base = docs(s, dir).select(col("doc_id"), Text.toksCol.as("toks"))
        val win = substrWindows(base)
        val canon = win.groupBy("w").agg(min(substrKey).as("canon"))
        val key = substrKey
        val cut = win.join(canon, "w")
          .filter(key =!= col("canon"))
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + lit(SubstrW - 1)))
              .as("tokpos"))
          .distinct()
        val perDoc = cut.groupBy("doc_id")
          .agg(count(lit(1)).as("n_cut"),
            array_sort(collect_list(col("tokpos"))).as("cuts"))
        base.join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_toks"),
            coalesce(col("n_cut"), lit(0L)).as("n_cut"),
            when(col("cuts").isNull, concat_ws(" ", col("toks")))
              .otherwise(expr(
                "concat_ws(' ', filter(toks, (t, i) -> NOT array_contains(cuts, i)))"))
              .as("clean_text"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH d AS (SELECT doc_id,
          |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |  FROM documents),
          |w AS (SELECT doc_id,
          |    unnest(range(0, greatest(len(toks)-14, 0))) AS pos, toks FROM d),
          |win AS (SELECT doc_id, pos,
          |    array_to_string(toks[pos+1 : pos+15], ' ') AS w FROM w),
          |canon AS (SELECT w, min(doc_id*1000000 + pos) AS canon
          |  FROM win GROUP BY 1),
          |cut AS (SELECT DISTINCT doc_id, tokpos FROM (
          |  SELECT win.doc_id, unnest(range(win.pos, win.pos+15)) AS tokpos
          |  FROM win JOIN canon ON canon.w = win.w
          |  WHERE win.doc_id*1000000 + win.pos <> canon.canon)),
          |tokrows AS (SELECT doc_id, unnest(toks) AS tok,
          |    unnest(range(0, len(toks))) AS idx FROM d),
          |kept AS (SELECT t.doc_id, t.tok, t.idx FROM tokrows t
          |  ANTI JOIN cut c ON c.doc_id = t.doc_id AND c.tokpos = t.idx)
          |SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_toks,
          |  CAST(coalesce(c.n_cut, 0) AS BIGINT) AS n_cut,
          |  coalesce(k.clean_text, '') AS clean_text
          |FROM d
          |LEFT JOIN (SELECT doc_id, count(*) AS n_cut FROM cut GROUP BY 1) c
          |  USING (doc_id)
          |LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY idx)
          |    AS clean_text FROM kept GROUP BY 1) k USING (doc_id)
          |ORDER BY doc_id""".stripMargin)),

    // INCREMENTAL ExactSubstr: q143's semantics served from a PERSISTED
    // window index (a commit-log table of (w, canon) = each window's
    // globally-first occurrence key) instead of a corpus rescan. The
    // already-ingested corpus (doc_id % 5 ≠ 0) built the index; the new
    // batch (doc_id % 5 = 0) folds in with ONE MERGE commit — source rows
    // pre-resolve canon = least(index, batch-min), so full-row-replace
    // upsert is exact regardless of id interleaving — and the batch's
    // spans are then cut against the UPDATED index (the index read is
    // load-bearing for the output, not a side effect). The oracle knows
    // nothing of the index: it recomputes q143 from scratch over the FULL
    // corpus and restricts to batch docs, so the green row proves
    // incremental ≡ whole-corpus recompute.
    //
    // 100 TB shape: per batch, work is O(batch windows) — the index probe
    // and the MERGE's file-touch set are equi-keyed on w (the merge
    // rewrites only files holding matched window keys); the historical
    // corpus text is NEVER rescanned. This is the maintenance loop that
    // makes ExactSubstr viable as a continuous ingest gate rather than a
    // periodic whole-corpus job (same trade as q80's near-dup probe and
    // q105's IVF index update).
    "q145_substr_incremental" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q145-substr").toString
        substrIndexInit(s, d.filter(col("doc_id") % 5 =!= 0), root)
        substrFold(s, d.filter(col("doc_id") % 5 === 0), root)
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH d AS (SELECT doc_id,
          |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
          |  FROM documents),
          |w AS (SELECT doc_id,
          |    unnest(range(0, greatest(len(toks)-14, 0))) AS pos, toks FROM d),
          |win AS (SELECT doc_id, pos,
          |    array_to_string(toks[pos+1 : pos+15], ' ') AS w FROM w),
          |canon AS (SELECT w, min(doc_id*1000000 + pos) AS canon
          |  FROM win GROUP BY 1),
          |cut AS (SELECT DISTINCT doc_id, tokpos FROM (
          |  SELECT win.doc_id, unnest(range(win.pos, win.pos+15)) AS tokpos
          |  FROM win JOIN canon ON canon.w = win.w
          |  WHERE win.doc_id*1000000 + win.pos <> canon.canon)),
          |tokrows AS (SELECT doc_id, unnest(toks) AS tok,
          |    unnest(range(0, len(toks))) AS idx FROM d),
          |kept AS (SELECT t.doc_id, t.tok, t.idx FROM tokrows t
          |  ANTI JOIN cut c ON c.doc_id = t.doc_id AND c.tokpos = t.idx)
          |SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_toks,
          |  CAST(coalesce(c.n_cut, 0) AS BIGINT) AS n_cut,
          |  coalesce(k.clean_text, '') AS clean_text
          |FROM d
          |LEFT JOIN (SELECT doc_id, count(*) AS n_cut FROM cut GROUP BY 1) c
          |  USING (doc_id)
          |LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY idx)
          |    AS clean_text FROM kept GROUP BY 1) k USING (doc_id)
          |WHERE d.doc_id % 5 = 0
          |ORDER BY doc_id""".stripMargin)),

    // Keep-one-canonical dedup output: the corpus a near-dup pass actually
    // SHIPS — one surviving representative per connected component (the
    // member with the minimum doc_id, which IS the component label) plus
    // its cluster size. Composes the q47 component machinery; the oracle
    // re-derives components via a recursive transitive closure, so a
    // matching hash proves the propagate-then-keep-min pipeline selects
    // exactly the canonical set.
    "q68_dedup_canonical" -> QueryDef(
      fn = { (s, dir) =>
        components(s, dir)
          .groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
          .select(col("component").as("doc_id"), col("cluster_size"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH RECURSIVE $simhashPairsSql,
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairs
           |  UNION ALL
           |  SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
           |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
           |SELECT component AS doc_id, count(*) AS cluster_size
           |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The pipeline ATTRITION REPORT (the funnel a data card publishes):
    // seven cumulative stages — raw → language filter → Gopher-style
    // length/mean-word-length bounds → repetition cap (top word ≤ 20 %,
    // exact integer cross-multiply) → near-dup canonical (q47 components;
    // this corpus has NO byte-identical docs, so doc-hash dedup would be
    // the degenerate rule here) → decontamination (q67 semantics: eval
    // slice held out, ≥ 3 shared shingles drops the doc) → 80 % determin-
    // istic hash sample — each reported as surviving doc and token counts.
    // q69 ships the final corpus; THIS query is the per-stage accounting
    // that says where the other docs went. Every rule is integer-exact so
    // the oracle's recomputation matches bit-for-bit.
    //
    // 100 TB shape: per-doc features are in-row expressions; the stage
    // flags are three equi-joins (component label, contamination set —
    // both survivor-sized) onto the feature scan; the funnel itself is ONE
    // aggregate over that scan (14 conditional sums, map-side combined)
    // unpivoted driver-side by stack() — the report never shuffles rows,
    // only the 1-row aggregate state.
    "q144_pipeline_funnel" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val base = d.select(col("doc_id"), col("lang"), Text.toksCol.as("toks"))
          .select(col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n"),
            expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
              .as("sum_chars"),
            expr("array_max(transform(array_distinct(toks), " +
              "t -> size(filter(toks, x -> x = t))))").cast("long").as("maxf"))
        val canon = components(s, dir)
          .filter(col("doc_id") === col("component"))
          .select(col("doc_id"), lit(1).as("is_canon"))
        val sh = shingles(d)
        val evalSh = sh.filter(col("doc_id") % 11 === 0).select("sh").distinct()
        val contaminated = sh.filter(col("doc_id") % 11 =!= 0)
          .join(evalSh, Seq("sh"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
          .filter(col("ns") >= 3).select(col("doc_id"), lit(1).as("is_contam"))
        val flags = base
          .join(canon, Seq("doc_id"), "left")
          .join(contaminated, Seq("doc_id"), "left")
          .select(col("n"),
            (col("lang") === "en").as("s1"),
            (col("n").between(20L, 5000L) &&
              col("sum_chars") >= col("n") * 3 &&
              col("sum_chars") <= col("n") * 10).as("s2"),
            (col("maxf") * 5 <= col("n")).as("s3"),
            col("is_canon").isNotNull.as("s4"),
            (col("doc_id") % 11 =!= 0 && col("is_contam").isNull).as("s5"),
            (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
              .cast("long") % 10 < 8).as("s6"))
        val cum = flags.select(col("n"), col("s1").as("c1"),
          (col("s1") && col("s2")).as("c2"),
          (col("s1") && col("s2") && col("s3")).as("c3"),
          (col("s1") && col("s2") && col("s3") && col("s4")).as("c4"),
          (col("s1") && col("s2") && col("s3") && col("s4") && col("s5"))
            .as("c5"),
          (col("s1") && col("s2") && col("s3") && col("s4") && col("s5") &&
            col("s6")).as("c6"))
        val sums = Seq(sum(col("n")).as("t0")) ++ (1 to 6).flatMap(i => Seq(
          sum(when(col(s"c$i"), 1L).otherwise(0L)).as(s"d$i"),
          sum(when(col(s"c$i"), col("n")).otherwise(0L)).as(s"t$i")))
        cum.agg(count(lit(1)).as("d0"), sums: _*)
          .select(expr(
            """stack(7,
              |  0, 'raw',         d0, t0,
              |  1, 'lang',        d1, t1,
              |  2, 'length',      d2, t2,
              |  3, 'repetition',  d3, t3,
              |  4, 'neardup',     d4, t4,
              |  5, 'decontam',    d5, t5,
              |  6, 'sample',      d6, t6)
              |  AS (stage_idx, stage, n_docs, n_toks)""".stripMargin))
          .orderBy("stage_idx")
      },
      oracle = Some(
        s"""WITH RECURSIVE $simhashPairsSql,
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairs
           |  UNION ALL
           |  SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
           |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
           |ev AS (SELECT DISTINCT sh FROM sh0 WHERE doc_id % 11 = 0),
           |contam AS (SELECT doc_id FROM sh0 WHERE doc_id % 11 <> 0
           |  AND sh IN (SELECT sh FROM ev) GROUP BY 1 HAVING count(*) >= 3),
           |feat AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n,
           |    CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT)
           |      AS sum_chars,
           |    CAST(list_max(list_transform(list_distinct(toks),
           |      t -> len(list_filter(toks, x -> x = t)))) AS BIGINT) AS maxf
           |  FROM (SELECT doc_id, lang,
           |      regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |    FROM documents)),
           |flags AS (
           |  SELECT f.n,
           |    (f.lang = 'en') AS s1,
           |    (f.n BETWEEN 20 AND 5000 AND 3*f.n <= f.sum_chars
           |      AND f.sum_chars <= 10*f.n) AS s2,
           |    (f.maxf * 5 <= f.n) AS s3,
           |    (c.id = c.component) AS s4,
           |    (f.doc_id % 11 <> 0
           |      AND f.doc_id NOT IN (SELECT doc_id FROM contam)) AS s5,
           |    (CAST(concat('0x', substr(md5(CAST(f.doc_id AS VARCHAR)),1,8))
           |      AS BIGINT) % 10 < 8) AS s6
           |  FROM feat f JOIN comp c ON c.id = f.doc_id),
           |cum AS (SELECT n, s1 AS c1, s1 AND s2 AS c2,
           |    s1 AND s2 AND s3 AS c3, s1 AND s2 AND s3 AND s4 AS c4,
           |    s1 AND s2 AND s3 AND s4 AND s5 AS c5,
           |    s1 AND s2 AND s3 AND s4 AND s5 AND s6 AS c6 FROM flags)
           |SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs,
           |    CAST(sum(n) AS BIGINT) AS n_toks FROM cum
           |UNION ALL SELECT 1, 'lang', count(*) FILTER (c1),
           |  CAST(coalesce(sum(n) FILTER (c1), 0) AS BIGINT) FROM cum
           |UNION ALL SELECT 2, 'length', count(*) FILTER (c2),
           |  CAST(coalesce(sum(n) FILTER (c2), 0) AS BIGINT) FROM cum
           |UNION ALL SELECT 3, 'repetition', count(*) FILTER (c3),
           |  CAST(coalesce(sum(n) FILTER (c3), 0) AS BIGINT) FROM cum
           |UNION ALL SELECT 4, 'neardup', count(*) FILTER (c4),
           |  CAST(coalesce(sum(n) FILTER (c4), 0) AS BIGINT) FROM cum
           |UNION ALL SELECT 5, 'decontam', count(*) FILTER (c5),
           |  CAST(coalesce(sum(n) FILTER (c5), 0) AS BIGINT) FROM cum
           |UNION ALL SELECT 6, 'sample', count(*) FILTER (c6),
           |  CAST(coalesce(sum(n) FILTER (c6), 0) AS BIGINT) FROM cum
           |ORDER BY stage_idx""".stripMargin)),

    // The SHIPPED corpus, end to end: what an actual training-data run
    // publishes after the cleaning pipeline — the train split (eval slice
    // held out), keeping only each near-dup cluster's canonical
    // representative, minus benchmark-contaminated docs — summarized as
    // per-language doc and whitespace-token counts. One query composing
    // the q47 components, q67 contamination, and q21 token machinery;
    // the oracle re-derives the entire pipeline in SQL, so the green row
    // proves the composed semi/anti-join pipeline ships exactly the
    // right documents. All joins are equi-joins on doc_id/shingle keys —
    // nothing here degrades at corpus scale.
    "q69_clean_corpus" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val canon = components(s, dir)
          .filter(col("doc_id") === col("component")).select("doc_id")
        val sh = shingles(d)
        val evalSh = sh.filter(col("doc_id") % 11 === 0).select("sh").distinct()
        val contaminated = sh.filter(col("doc_id") % 11 =!= 0)
          .join(evalSh, Seq("sh"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
          .filter(col("ns") >= 3).select("doc_id")
        d.filter(col("doc_id") % 11 =!= 0)
          .join(canon, Seq("doc_id"), "left_semi")
          .join(contaminated, Seq("doc_id"), "left_anti")
          .withColumn("ws_toks",
            size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("ws_toks")).as("total_tokens"))
          .orderBy("lang")
      },
      oracle = Some(
        s"""WITH RECURSIVE $simhashPairsSql,
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairs
           |  UNION ALL
           |  SELECT doc_b, doc_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
           |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
           |canon AS (SELECT id AS doc_id FROM comp WHERE id = component),
           |ev AS (SELECT DISTINCT sh FROM sh0 WHERE doc_id % 11 = 0),
           |contaminated AS (
           |  SELECT doc_id FROM sh0
           |  WHERE doc_id % 11 <> 0 AND sh IN (SELECT sh FROM ev)
           |  GROUP BY 1 HAVING count(*) >= 3)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS BIGINT)
           |    AS total_tokens
           |FROM documents
           |WHERE doc_id % 11 <> 0
           |  AND doc_id IN (SELECT doc_id FROM canon)
           |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // INCREMENTAL near-dup: dedup an incoming batch (doc_id % 3 = 0, the
    // CDC slice an exactly-once ingest would hand over) against the WHOLE
    // corpus without re-pairing the corpus with itself — the batch's bands
    // equi-join the maintained band index (asymmetric: the probe side is
    // batch-sized, so at 100 TB this is a broadcast probe into the index,
    // never an index self-join), hamming-verified, then per new doc the
    // best (min hamming, min id) duplicate is kept. The oracle re-derives
    // from the full all-pairs graph restricted to pairs touching the
    // batch — a matching hash proves the incremental probe finds exactly
    // what a full recompute would.
    "q80_incremental_dedup" -> QueryDef(
      fn = { (s, dir) =>
        val fp = simhashFps(docs(s, dir))
        probeIndex(fp.filter(col("doc_id") % 3 === 0), fp, simhashBands(fp))
          .orderBy("new_id")
      },
      oracle = Some(
        s"""WITH $simhashPairsSql,
           |inc AS (
           |  SELECT doc_a AS new_id, doc_b AS other_id, hamming
           |  FROM pairs WHERE doc_a % 3 = 0
           |  UNION ALL
           |  SELECT doc_b, doc_a, hamming FROM pairs WHERE doc_b % 3 = 0)
           |SELECT new_id, other_id AS dup_of, hamming FROM (
           |  SELECT new_id, other_id, hamming,
           |    row_number() OVER (PARTITION BY new_id ORDER BY hamming, other_id) AS rn
           |  FROM inc) WHERE rn = 1
           |ORDER BY new_id""".stripMargin)),

    // Graph centrality: PageRank over the near-dup graph, two iterations
    // ENTIRELY in exact BIGINT arithmetic (the q79 discipline applied to
    // graph analytics): ranks start at 1e9 per node, each step is
    // r' = 0.15·1e9 + (85 · Σ_{u→v} r(u) div outdeg(u)) div 100 — every
    // operation a truncating integer op identical in both engines, so the
    // top-20 ranking is bit-deterministic. The shape is q47's propagation
    // loop (equi-join + agg per round, centroid-free); production iterates
    // to convergence under localCheckpoint, two rounds keep the oracle a
    // CTE unroll. Dangling docs (no near-dups) hold the damping base —
    // they never join the inflow. Overflow audit: total mass ≤ N·1e9,
    // ×85 ≤ 8.5e12·N — safe in int64 past 10⁵ docs per component…
    // globally ranks only shrink from 1e9, so the true bound is per-node
    // inflow ≤ N·1e9 — fine through sf1.
    "q83_pagerank" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val pairs = simhashPairs(d).select("doc_a", "doc_b")
        val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
          .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
          .localCheckpoint()
        val outdeg = edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        val nodes = d.select(col("doc_id").as("id"))
        def step(r: DataFrame): DataFrame = {
          val inflow = edges
            .join(r.withColumnRenamed("id", "a"), Seq("a"))
            .join(outdeg, Seq("a"))
            .select(col("b").as("id"), expr("r div deg").as("c"))
            .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
          nodes.join(inflow, Seq("id"), "left")
            .select(col("id"),
              (lit(150000000L) + expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100"))
                .as("r"))
        }
        val r0 = nodes.withColumn("r", lit(1000000000L))
        step(step(r0))
          .orderBy(col("r").desc, col("id"))
          .limit(20)
          .select(col("id").as("doc_id"), col("r").as("rank_q"))
      },
      oracle = Some(
        s"""WITH $simhashPairsSql,
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairs
           |  UNION ALL
           |  SELECT doc_b, doc_a FROM pairs),
           |outdeg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
           |nodes AS (SELECT doc_id AS id FROM documents),
           |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
           |in1 AS (
           |  SELECT e.b AS id, CAST(sum(r0.r // o.deg) AS BIGINT) AS inflow
           |  FROM edges e JOIN r0 ON r0.id = e.a JOIN outdeg o ON o.a = e.a
           |  GROUP BY 1),
           |r1 AS (
           |  SELECT n.id,
           |    CAST(150000000 + (85 * coalesce(in1.inflow, 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN in1 ON in1.id = n.id),
           |in2 AS (
           |  SELECT e.b AS id, CAST(sum(r1.r // o.deg) AS BIGINT) AS inflow
           |  FROM edges e JOIN r1 ON r1.id = e.a JOIN outdeg o ON o.a = e.a
           |  GROUP BY 1),
           |r2 AS (
           |  SELECT n.id,
           |    CAST(150000000 + (85 * coalesce(in2.inflow, 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN in2 ON in2.id = n.id)
           |SELECT id AS doc_id, r AS rank_q FROM r2
           |ORDER BY r DESC, id LIMIT 20""".stripMargin)),

    // Triangle counting on the near-dup graph — the node-iterator
    // algorithm as pure relational algebra (the MapReduce formulation of
    // Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of
    // the Last Reducer"): edges arrive ORIENTED (doc_a < doc_b from the
    // band join), so a wedge join e1(a,b)⋈e2(b,c) enumerates each
    // candidate path exactly once with a < b < c, and the closing-edge
    // equi-join (a,c) certifies the triangle — each triangle is counted
    // EXACTLY once, no ÷6 correction, no cartesian anywhere. Output: the
    // top-10 docs by triangle participation (how clique-ish each doc's
    // duplicate neighborhood is — near-clique members rank above chain
    // members, a signal component size alone cannot give; components
    // (q47) say WHO clusters, triangles say HOW DENSELY).
    //
    // 100 TB shape: two equi-joins + one count aggregation, all on the
    // oriented edge list. Orientation is also the published skew fix: a
    // degree-d hub fans out d² unordered wedges, but ordered wedges split
    // by id, and partial counts combine map-side. The same plan serves
    // clustering-coefficient jobs (wedges = Σ C(deg,2) needs one more
    // aggregate over the degree table).
    "q93_triangles" -> QueryDef(
      fn = { (s, dir) =>
        // materialize the edge list ONCE (q83's discipline): the three-way
        // self-join would otherwise recompute the whole fingerprint+band
        // subtree per join arm; at cluster scale this is the edges table
        // a graph job reads, not a plan fragment
        val e = simhashPairs(docs(s, dir))
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
          .localCheckpoint()
        val wedges = e.join(e.toDF("b", "c"), Seq("b"))
        val tri = wedges.join(e.toDF("a", "c"), Seq("a", "c"))
        tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tri"))
          .orderBy(col("n_tri").desc, col("doc_id"))
          .limit(10)
      },
      oracle = Some(
        s"""WITH $simhashPairsSql,
           |tri AS (
           |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
           |  FROM pairs e1
           |  JOIN pairs e2 ON e2.doc_a = e1.doc_b
           |  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
           |roles AS (SELECT unnest([a, b, c]) AS doc_id FROM tri)
           |SELECT doc_id, count(*) AS n_tri FROM roles
           |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10""".stripMargin)),

    // Lexical top-k retrieval: for each query doc (the doc_id % 97 slice
    // standing in for a lookup batch), the 3 nearest corpus docs by
    // shingle Jaccard, ranked. The RETRIEVAL counterpart of the dedup
    // family: q13/q15 answer "which pairs exceed a threshold", q80
    // answers "is this new doc a dup", this answers "what are this doc's
    // closest neighbors, in order" — near-dup forensics, attribution,
    // retrieval-augmented filtering.
    //
    // 100 TB shape: the asymmetric probe discipline (q80) — the query
    // side is batch-sized, so the shingle equi-join fans each corpus
    // shingle to at most |batch| partners, never corpus×corpus;
    // query-side sizes broadcast (|batch| rows), candidate-side sizes
    // ride a key-partitioned join on the POST-aggregation candidate set
    // (deliberately not broadcast — corpus-sized). The top-k window
    // partitions by q_id over candidates only.
    "q98_lexical_topk" -> QueryDef(
      fn = { (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        // r15 OPT (guide §3.3 + §2.5): the shingle stream feeds the size
        // aggregate, the query side and the candidate side — pin it so the
        // tokenize/shingle pass runs once, and fan out the single-split
        // scan feeding it (profiled: two serial 0.8 s single-task scans)
        val sh = shingles(Tables.fanOut(s, docs(s, dir), col("doc_id")))
          .localCheckpoint()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = sh.filter(col("doc_id") % 97 === 0).toDF("q_id", "sh")
          .join(sh.toDF("c_id", "sh"), Seq("sh"))
          .filter(col("c_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("c_id"))
          .agg(count(lit(1)).as("inter"))
        val scored = inter
          .join(broadcast(sizes.filter(col("doc_id") % 97 === 0)
            .toDF("q_id", "sz_q")), Seq("q_id"))
          .join(sizes.toDF("c_id", "sz_c"), Seq("c_id"))
          .withColumn("jaccard", col("inter").cast("double") /
            (col("sz_q") + col("sz_c") - col("inter")))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("jaccard").desc, col("c_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("q_id", "rank", "c_id", "inter", "jaccard")
          .orderBy("q_id", "rank")
      },
      oracle = Some(
        s"""WITH $shinglesSql,
           |sz AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY 1),
           |inter AS (
           |  SELECT q.doc_id AS q_id, c.doc_id AS c_id, count(*) AS inter
           |  FROM sh0 q JOIN sh0 c ON c.sh = q.sh AND c.doc_id <> q.doc_id
           |  WHERE q.doc_id % 97 = 0
           |  GROUP BY 1, 2),
           |sc AS (
           |  SELECT q_id, c_id, inter,
           |    CAST(inter AS DOUBLE) / (sq.sz + sc2.sz - inter) AS jaccard
           |  FROM inter
           |  JOIN sz sq ON sq.doc_id = q_id
           |  JOIN sz sc2 ON sc2.doc_id = c_id),
           |r AS (
           |  SELECT q_id, c_id, inter, jaccard,
           |    CAST(row_number() OVER (PARTITION BY q_id
           |      ORDER BY jaccard DESC, c_id) AS INT) AS rank
           |  FROM sc)
           |SELECT q_id, rank, c_id, inter, jaccard
           |FROM r WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    // Retrieval-quality eval with an INTEGER-EXACT metric: every 97th doc
    // issues a SNIPPET query (its first ≤10 positional 3-gram shingles)
    // against the whole corpus; candidates rank by shared-shingle count
    // (desc, then doc_id — fully deterministic), and the metric is the
    // query doc's own rank: hits@1 / hits@10 and MRR scaled by 2520
    // (= lcm(1..10), so Σ 2520/rank is exact integer arithmetic — the
    // cross-engine-safe way to ship a reciprocal-rank metric). A clean
    // corpus self-retrieves at rank 1; exact/near duplicates push the
    // self rank down via the doc_id tie rule, so the metric doubles as a
    // dup-pollution monitor for the retrieval pipeline. Scale shape: the
    // query side is 1/97th of the corpus and 3-gram document frequency
    // is near-1, so the posting join is query-sized, never corpus²; the
    // per-query window ranks candidate lists of ~df·10 rows.
    "q120_self_retrieval_mrr" -> QueryDef(
      fn = { (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir)
        val corpus = shingles(d).toDF("c_id", "sh")
        val snips = d.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("q_id"),
            split(lower(trim(col("text"))), "\\s+").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("q_id"), explode(expr(
            "transform(sequence(0, least(size(toks) - 3, 9))," +
              " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("sh"))
          .distinct()
        val scored = snips.join(corpus, Seq("sh"))
          .groupBy(col("q_id"), col("c_id"))
          .agg(count(lit(1)).as("score"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("c_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("c_id") === col("q_id"))
          .agg(
            count(lit(1)).as("n_queries"),
            sum(when(col("rank") === 1, 1L).otherwise(0L)).as("hits_at_1"),
            sum(when(col("rank") <= 10, 1L).otherwise(0L)).as("hits_at_10"),
            sum(when(col("rank") <= 10, expr("2520 div rank"))
              .otherwise(0L)).cast("long").as("mrr_x2520"))
      },
      oracle = Some(
        s"""WITH toks AS (
           |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents),
           |$shinglesSql,
           |snip AS (
           |  SELECT DISTINCT doc_id AS q_id,
           |    unnest(list_transform(range(1, least(len(toks) - 1, 11)),
           |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
           |  FROM toks WHERE doc_id % 97 = 0 AND len(toks) >= 3),
           |sc AS (
           |  SELECT q_id, sh0.doc_id AS c_id, count(*) AS score
           |  FROM snip JOIN sh0 USING (sh) GROUP BY 1, 2),
           |r AS (
           |  SELECT q_id, c_id,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY score DESC, c_id) AS rank
           |  FROM sc)
           |SELECT count(*) AS n_queries,
           |  CAST(sum(CASE WHEN rank = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
           |  CAST(sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
           |  CAST(sum(CASE WHEN rank <= 10 THEN 2520 // rank ELSE 0 END) AS BIGINT)
           |    AS mrr_x2520
           |FROM r WHERE c_id = q_id""".stripMargin)),
  )
}
