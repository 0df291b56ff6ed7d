package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float], 64-dim):
  * brute-force cosine top-k (the exact baseline), threshold near-dup, and
  * the approximate-index ladder — sign-LSH bands (q35), IVF two-probe with
  * heuristic (q18) and learned (q88) cells, product quantization with ADC
  * (q92), and IVFADC with residual codebooks (q94) — each rung trading
  * recall for scan fraction / bytes scanned, all five measured against
  * exact truth by the q46 recall report.
  *
  * Cross-engine determinism: each elementwise product is quantized with
  * `floor(x*y*1e9)` into an exact BIGINT, and sums run in integer space —
  * order-independent and bit-identical in Spark and DuckDB (double→DECIMAL
  * casts round DIFFERENTLY across the two engines, ~1e-12 per term, so
  * decimal sums are not enough; floor of a double is exact in both). The
  * final cosine divides the integer sums in double — the 1e9 scale cancels.
  * Plain double sums would additionally be order-dependent run to run on a
  * real cluster.
  *
  * Scale design (100 TB):
  *  - the dot product is `aggregate(zip_with(...))` — whole-stage-codegen
  *    array math inside the row, never an explode-shuffle;
  *  - the query set is `broadcast()` against the candidate corpus — the
  *    corpus is scanned once, never shuffled;
  *  - IVF: centroid assignment is a broadcast nested-loop against a small
  *    centroid set (|cells| grows with corpus, vec_id % 50), probing caps
  *    scanned candidates at ~2/|cells| of the corpus — the standard ANN
  *    scale path when brute force stops fitting.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings")
  }

  /** Exact order-independent 1e9-quantized dot product (BIGINT) of two
    * float-array columns — the native codegen expression
    * [[graft.functions.FloatDotQ]] (a higher-order aggregate/zip_with
    * formulation is semantically equal but interpreted, ~100× slower on
    * all-pairs workloads).
    */
  private def dotDec(a: String, b: String): Column = expr(s"float_dot_q($a, $b)")

  private def cosim(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt(n2a.cast("double") * n2b.cast("double"))

  /** (vec_id, n2): exact squared norms. */
  private def norms(e: DataFrame): DataFrame =
    e.select(col("vec_id"), dotDec("embedding", "embedding").as("n2"))

  /** IVF index BUILD (q18's heuristic cells): returns the two relations
    * that ARE the index — `(centroids(cent_id, ce), members(member_id,
    * cent_id))` — both plain DataFrames, so they persist as tables
    * (q104) or stay inline (q18) unchanged. Centroid norms are derived
    * from the centroid vectors at probe time, so nothing else needs
    * shipping.
    */
  private def ivfBuild(e: DataFrame, n: DataFrame): (DataFrame, DataFrame) = {
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    (cents, ivfAssign(e, n, cents))
  }

  /** Nearest-cell assignment of `e`'s vectors against a centroid relation
    * (inline or read back from a persisted index): per-vector independent,
    * so an index UPDATE assigns only the delta batch against the SAME
    * centroids and appends — bitwise the rows a full rebuild would emit
    * for those vectors (q105's contract).
    */
  private def ivfAssign(e: DataFrame, n: DataFrame, cents: DataFrame): DataFrame = {
    val centN = norms(cents.select(col("cent_id").as("vec_id"),
        col("ce").as("embedding")))
      .toDF("cent_id", "n2cent")
    // nearest cell per vector (broadcast the centroid set)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosim").desc, col("cent_id"))
    Tables.fanOut(e.sparkSession,
        e.select(col("vec_id"), col("embedding").as("qe")),
        col("vec_id")) // parallelize the single-split scan (no-op at scale)
      .crossJoin(broadcast(cents))
      .withColumn("dot", dotDec("qe", "ce"))
      .join(n.toDF("vec_id", "n2v"), Seq("vec_id"))
      .join(broadcast(centN), Seq("cent_id"))
      .withColumn("cosim", cosim(col("dot"), col("n2v"), col("n2cent")))
      .withColumn("rnk", row_number().over(wAssign))
      .filter(col("rnk") === 1)
      .select(col("vec_id").as("member_id"), col("cent_id"))
  }

  /** IVF PROBE against an index in relation form (inline or read back
    * from persisted tables): 2 probe cells per query vector, exact
    * quantized-cosine ranking of only the probed cells' members, top-3.
    */
  private def ivfProbe(e: DataFrame, n: DataFrame,
      cents: DataFrame, assign: DataFrame): DataFrame = {
    val centN = norms(cents.select(col("cent_id").as("vec_id"),
        col("ce").as("embedding")))
      .toDF("cent_id", "n2cent")
    // 2 probe cells per query
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("cosim").desc, col("cent_id"))
    val queryProbes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("dot", dotDec("qe", "ce"))
      .join(n.toDF("q_id", "n2q"), Seq("q_id"))
      .join(broadcast(centN), Seq("cent_id"))
      .withColumn("cosim", cosim(col("dot"), col("n2q"), col("n2cent")))
      .withColumn("rnk", row_number().over(wProbe))
      .filter(col("rnk") <= 2)
      .select(col("q_id"), col("cent_id"))
    // rank candidates inside the probed cells
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cosim").desc, col("c_id"))
    queryProbes
      .join(assign, Seq("cent_id"))
      .withColumnRenamed("member_id", "c_id")
      .filter(col("c_id") =!= col("q_id"))
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
      .join(e.select(col("vec_id").as("c_id"), col("embedding").as("ce")), Seq("c_id"))
      .withColumn("dot", dotDec("qe", "ce"))
      .join(n.toDF("q_id", "n2q"), Seq("q_id"))
      .join(n.toDF("c_id", "n2c"), Seq("c_id"))
      .withColumn("cosim", cosim(col("dot"), col("n2q"), col("n2c")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= 3)
      .select("q_id", "c_id", "cent_id", "cosim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** DuckDB: CTE `norms(vec_id, n2)` + per-pair decimal dot as a template.
    * Lists are 1-indexed; generate_subscripts unrolls the 64 dims.
    */
  private val normsSql: String =
    """norms AS (
      |  SELECT vec_id,
      |    CAST(sum(CAST(floor((CAST(e[i] AS DOUBLE) * CAST(e[i] AS DOUBLE))
      |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS n2
      |  FROM (SELECT vec_id, embedding AS e,
      |          generate_subscripts(embedding, 1) AS i FROM embeddings)
      |  GROUP BY 1)""".stripMargin

  private val dotSqlExpr =
    """CAST(sum(CAST(floor((CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))
      | * 1000000000.0) AS BIGINT)) AS BIGINT)""".stripMargin.replace("\n", "")

  /** Deterministic random-hyperplane family for sign-LSH: 16 hyperplanes ×
    * 64 dims, components = md5-derived integers in [-500000, 500000]
    * (exactly representable as float AND double, so Spark's float path and
    * DuckDB's double path compute identical products). Generated once here
    * and embedded as literals in BOTH the Spark plan and the oracle SQL.
    */
  private val LSH_R = 16
  private val DIMS = 64
  private def hplane(r: Int): Array[Float] =
    graft.functions.SignLsh.plane(r, DIMS) // shared with LshBandKeys
  /** q35 uses the first 16 planes; q45's banding draws planes on demand.
    *
    * Band GEOMETRY is DERIVED, not free, on two axes (the Indyk–Motwani
    * tradeoff): at cos ≥ θ a plane agrees with p = 1 − arccos(θ)/π, a
    * w-bit band matches with p^w, and B bands miss a true pair with
    * (1−p^w)^B. The r5 revision fixed the THRESHOLD axis (at θ = 0.4,
    * p ≈ 0.63, narrow bands ≈ no prune — all-pairs is the honest plan and
    * q17 remains that documented baseline; q45 runs the production regime
    * θ = 0.95, p ≈ 0.90). The r8 revision fixes the CORPUS-SIZE axis: a
    * FIXED band width w leaves expected candidates B·n²/2^{w+1} — a
    * constant-factor cut of all-pairs, still quadratic (the r7 sf1 sweep
    * measured exactly that: 14.2× for 10× data on 8-bit bands). So q45
    * now derives (w, B) from a cheap corpus `count()`:
    *   w = clamp(ceil(log2(4n)), 8, 24)   — key space tracks the corpus,
    *     so per-band expected collisions stay ≤ ~n/8 (linear in n);
    *   B = clamp(ceil(ln 0.05 / ln(1−p^w)), 3, 24) — enough bands to hold
    *     generic-pair recall at ≥ 95% as w widens (planted EXACT dups
    *     collide in every band regardless — identical vector, identical
    *     key — so their recall is structural, not probabilistic).
    * At n ≤ 64 this reproduces the historic 6 bands × 8 bits exactly;
    * at sf1-sweep scale (n ≈ 20k) it yields 17 bands × 17 bits — ~26k
    * expected candidates instead of the fixed-width ~4.7M. Signature cost
    * is B·w dot products per ROW (O(n·log²n) total work, embarrassingly
    * parallel); the planes are the same deterministic md5 family at every
    * index, so both engines would derive identical keys if they ever
    * needed to (the oracle stays brute force and never looks at them).
    */
  private val hplanes: IndexedSeq[Array[Float]] = (0 until LSH_R).map(hplane)

  /** (bandBits, bandCount) for threshold-θ sign-LSH over n vectors — the
    * derivation documented above. Driver-side planning arithmetic only
    * (libm here never touches row data, so cross-engine exactness is not
    * in play); deterministic in (n, θ).
    */
  private[graft] def lshBandGeometry(n: Long, theta: Double): (Int, Int) = {
    val w0 = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, 4L * n - 1L))
    val w = math.min(24, math.max(8, w0.toInt))
    val p = 1.0 - math.acos(theta) / math.Pi
    val missPerBand = 1.0 - math.pow(p, w.toDouble)
    val b = math.ceil(math.log(0.05) / math.log(missPerBand)).toInt
    (w, math.min(24, math.max(3, b)))
  }

  /** Brute-force threshold near-dup SQL over q17's capped slice (d =
    * ceil(n/2500) md5 modulus, = 1 below the cap — the q168 calibration
    * idiom, derived identically by both engines). q45's equivalence
    * proof has its own planted-duplicate oracle ([[plantedNeardupSql]]).
    */
  private def bruteNeardupSql: String =
    s"""WITH sl AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |        % (SELECT (COUNT(*) + 2499) // 2500 FROM embeddings) = 0),
       |$normsSql,
       |dots AS (
       |  SELECT a_id, b_id, $dotSqlExpr AS dot
       |  FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |          a.embedding AS qe, b.embedding AS ce,
       |          generate_subscripts(a.embedding, 1) AS i
       |        FROM sl a JOIN sl b ON a.vec_id < b.vec_id)
       |  GROUP BY 1, 2),
       |cosv AS (
       |  SELECT a_id, b_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cosim
       |  FROM dots
       |  JOIN norms na ON na.vec_id = a_id
       |  JOIN norms nb ON nb.vec_id = b_id)
       |SELECT a_id, b_id, cosim FROM cosv WHERE cosim >= 0.4
       |ORDER BY a_id, b_id""".stripMargin

  /** q45's oracle: brute-force threshold 0.95 over the SAME derived corpus
    * (embeddings + exact copies of vec_id < 50 under ids -(v+1)) — the
    * all-pairs recomputation the pruned path must match bit for bit.
    */
  private def plantedNeardupSql: String =
    s"""WITH aug AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT -(vec_id + 1) AS vec_id, embedding
       |  FROM embeddings WHERE vec_id < 50),
       |norms AS (
       |  SELECT vec_id,
       |    CAST(sum(CAST(floor((CAST(e[i] AS DOUBLE) * CAST(e[i] AS DOUBLE))
       |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS n2
       |  FROM (SELECT vec_id, embedding AS e,
       |          generate_subscripts(embedding, 1) AS i FROM aug)
       |  GROUP BY 1),
       |dots AS (
       |  SELECT a_id, b_id, $dotSqlExpr AS dot
       |  FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |          a.embedding AS qe, b.embedding AS ce,
       |          generate_subscripts(a.embedding, 1) AS i
       |        FROM aug a JOIN aug b ON a.vec_id < b.vec_id)
       |  GROUP BY 1, 2),
       |cosv AS (
       |  SELECT a_id, b_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cosim
       |  FROM dots
       |  JOIN norms na ON na.vec_id = a_id
       |  JOIN norms nb ON nb.vec_id = b_id)
       |SELECT a_id, b_id, cosim FROM cosv WHERE cosim >= 0.95
       |ORDER BY a_id, b_id""".stripMargin

  /** q16's oracle (exact brute-force top-5) — also nested by q46's recall
    * report as ground truth.
    */
  private def q16Sql: String =
    s"""WITH $normsSql,
       |dots AS (
       |  SELECT q_id, c_id, $dotSqlExpr AS dot
       |  FROM (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |          q.embedding AS qe, c.embedding AS ce,
       |          generate_subscripts(q.embedding, 1) AS i
       |        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |        WHERE q.vec_id < 10)
       |  GROUP BY 1, 2),
       |cosv AS (
       |  SELECT q_id, c_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
       |  FROM dots
       |  JOIN norms nq ON nq.vec_id = q_id
       |  JOIN norms nc ON nc.vec_id = c_id)
       |SELECT q_id, c_id, cosim, rnk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosim DESC, c_id) AS BIGINT) AS rnk FROM cosv)
       |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** q18's oracle (IVF two-probe top-3) — nested by q46. */
  private def q18Sql: String =
    s"""WITH $normsSql,
       |cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
       |          WHERE vec_id % 50 = 0),
       |assign0 AS (
       |  SELECT vec_id, cent_id, $dotSqlExpr AS dot
       |  FROM (SELECT v.vec_id, c.cent_id, v.embedding AS qe, c.ce,
       |          generate_subscripts(v.embedding, 1) AS i
       |        FROM embeddings v CROSS JOIN cents c)
       |  GROUP BY 1, 2),
       |assign1 AS (
       |  SELECT assign0.vec_id, assign0.cent_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(nv.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
       |  FROM assign0
       |  JOIN norms nv ON nv.vec_id = assign0.vec_id
       |  JOIN norms nc ON nc.vec_id = assign0.cent_id),
       |assign AS (
       |  SELECT vec_id AS member_id, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cosim DESC, cent_id) AS rnk FROM assign1)
       |  WHERE rnk = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cosim DESC, cent_id) AS rnk FROM assign1 WHERE vec_id < 10)
       |  WHERE rnk <= 2),
       |cand AS (
       |  SELECT p.q_id, a.member_id AS c_id, p.cent_id
       |  FROM probes p JOIN assign a ON a.cent_id = p.cent_id
       |  WHERE a.member_id <> p.q_id),
       |cdots AS (
       |  SELECT q_id, c_id, cent_id, $dotSqlExpr AS dot
       |  FROM (SELECT cand.q_id, cand.c_id, cand.cent_id,
       |          q.embedding AS qe, c.embedding AS ce,
       |          generate_subscripts(q.embedding, 1) AS i
       |        FROM cand
       |        JOIN embeddings q ON q.vec_id = cand.q_id
       |        JOIN embeddings c ON c.vec_id = cand.c_id)
       |  GROUP BY 1, 2, 3),
       |ccos AS (
       |  SELECT q_id, c_id, cent_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
       |  FROM cdots
       |  JOIN norms nq ON nq.vec_id = q_id
       |  JOIN norms nc ON nc.vec_id = c_id)
       |SELECT q_id, c_id, cent_id, cosim, rnk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosim DESC, c_id) AS BIGINT) AS rnk FROM ccos)
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  /** SemDeDup drop flags for a batch of cell-assigned vectors
    * (`vec_id, cid, embedding`): a vector is dropped when ANY lower-id
    * cell-mate — prior index member or same-batch — sits at cosine ≥
    * 0.95. The drop rule never consults the MATE's own flag, which is
    * what makes it incremental-exact: later batches (higher ids) can
    * never retro-drop earlier members. Returns
    * (vec_id, cid, dropped, embedding) — embeddings kept so the result
    * persists as a probe-able index. `n` must cover every id on either
    * side.
    */
  private def semDropFlags(s: SparkSession, assigned: DataFrame,
      prior: Option[DataFrame], n: DataFrame): DataFrame = {
    // r14 OPT (guide §3.3): `assigned` (the crossjoin+window cell
    // assignment) feeds the pair join twice plus the final left join, and
    // the norm frame joins both pair sides — without pinning, each branch
    // re-derives the full assignment. Both are vector-count-sized.
    val assigned0 = assigned.localCheckpoint()
    val n0 = n.localCheckpoint()
    val mates = prior.map(p => assigned0.select("vec_id", "cid", "embedding")
        .unionByName(p))
      .getOrElse(assigned0.select("vec_id", "cid", "embedding"))
    val bSide = Tables.fanOut(s, assigned0
      .select(col("vec_id").as("b_id"), col("cid"), col("embedding").as("ce")),
      col("cid")) // cell-keyed: the quadratic stays per-cell
    val aSide = mates
      .select(col("vec_id").as("a_id"), col("cid"), col("embedding").as("qe"))
    val pairs = aSide.join(bSide, Seq("cid")).filter(col("a_id") < col("b_id"))
      .withColumn("dot", dotDec("qe", "ce"))
      .join(n0.toDF("a_id", "n2a"), Seq("a_id"))
      .join(n0.toDF("b_id", "n2b"), Seq("b_id"))
      .withColumn("cosim", cosim(col("dot"), col("n2a"), col("n2b")))
      .filter(col("cosim") >= 0.95)
    val dropped = pairs.select(col("b_id").as("vec_id")).distinct()
      .withColumn("hit", lit(1L))
    assigned0.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("hit"), lit(0L)).as("dropped"), col("embedding"))
  }

  /** One incremental SemDeDup round against a persisted index — q109's
    * update step as a reusable unit, shared with the streaming sink
    * ([[graft.streaming.StreamingAnalytics.semdedupProbeSink]]): assign
    * `delta` (vec_id, embedding) against the index's cell table, flag
    * each vector dropped when a member or a lower-id delta cell-mate
    * sits at cosine ≥ 0.95, and return the rows to append to the member
    * table. CONTRACT: delta ids must exceed every member id (monotone
    * ingest ids) — that is what makes the incremental answer equal the
    * batch one.
    */
  def semdedupDelta(s: SparkSession, delta: DataFrame,
      cells: DataFrame, members: DataFrame): DataFrame = {
    val priors = members.select("vec_id", "cid", "embedding")
    val n = norms(delta.select(col("vec_id"), col("embedding"))
      .unionByName(priors.select(col("vec_id"), col("embedding"))))
    val assigned = ivfAssign(delta, norms(delta), cells)
      .toDF("vec_id", "cid").join(delta, Seq("vec_id"))
    semDropFlags(s, assigned, Some(priors), n)
  }

  /** q107's oracle: SemDeDup restated declaratively — nearest-cell
    * assignment over the planted-dup corpus, pairwise cosine WITHIN cells
    * only, drop-if-lower-id-mate-above-threshold. `centCond` narrows the
    * centroid set (q109 freezes it at the initial release).
    */
  private def semdedupSql: String = semdedupSqlWith("")

  /** q109's oracle: the SAME batch SemDeDup over the full corpus, with
    * the centroid set frozen at the initial release (vec_id < 300) — the
    * incremental index-update path must reproduce it row for row.
    */
  private def semdedupIncrementalSql: String =
    semdedupSqlWith(" AND vec_id < 300")

  private def semdedupSqlWith(centCond: String): String =
    s"""WITH aug AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT -(vec_id + 1) AS vec_id, embedding
       |  FROM embeddings WHERE vec_id < 50),
       |norms AS (
       |  SELECT vec_id,
       |    CAST(sum(CAST(floor((CAST(e[i] AS DOUBLE) * CAST(e[i] AS DOUBLE))
       |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS n2
       |  FROM (SELECT vec_id, embedding AS e,
       |          generate_subscripts(embedding, 1) AS i FROM aug)
       |  GROUP BY 1),
       |cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM aug
       |          WHERE vec_id % 50 = 0 AND vec_id >= 0$centCond),
       |assign0 AS (
       |  SELECT vec_id, cent_id, $dotSqlExpr AS dot
       |  FROM (SELECT v.vec_id, c.cent_id, v.embedding AS qe, c.ce,
       |          generate_subscripts(v.embedding, 1) AS i
       |        FROM aug v CROSS JOIN cents c)
       |  GROUP BY 1, 2),
       |assign1 AS (
       |  SELECT assign0.vec_id, assign0.cent_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(nv.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
       |  FROM assign0
       |  JOIN norms nv ON nv.vec_id = assign0.vec_id
       |  JOIN norms nc ON nc.vec_id = assign0.cent_id),
       |assign AS (
       |  SELECT vec_id, cent_id AS cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cosim DESC, cent_id) AS rnk FROM assign1)
       |  WHERE rnk = 1),
       |pdots AS (
       |  SELECT a_id, b_id, $dotSqlExpr AS dot
       |  FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |          av.embedding AS qe, bv.embedding AS ce,
       |          generate_subscripts(av.embedding, 1) AS i
       |        FROM assign a
       |        JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |        JOIN aug av ON av.vec_id = a.vec_id
       |        JOIN aug bv ON bv.vec_id = b.vec_id)
       |  GROUP BY 1, 2),
       |pcos AS (
       |  SELECT a_id, b_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cosim
       |  FROM pdots
       |  JOIN norms na ON na.vec_id = a_id
       |  JOIN norms nb ON nb.vec_id = b_id),
       |dropped AS (SELECT DISTINCT b_id AS vec_id FROM pcos WHERE cosim >= 0.95)
       |SELECT a.vec_id, a.cid,
       |  CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dropped
       |FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** q88's oracle: IVF two-probe with LEARNED centroids — q79's one-Lloyd-
    * update k-means (10 seeds, 1e6-quantized grid, exact BIGINT distances,
    * truncating integer-mean update) as the coarse quantizer, then the same
    * probe → exact-cosine re-rank tail as q18. Nested by q46.
    */
  private def q88Sql: String =
    s"""WITH $normsSql,
       |vq AS (
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
       |assign AS (
       |  SELECT vec_id AS member_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d2) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d2 WHERE vec_id < 10) WHERE rn <= 2),
       |cand AS (
       |  SELECT p.q_id, a.member_id AS c_id, p.cid
       |  FROM probes p JOIN assign a ON a.cid = p.cid
       |  WHERE a.member_id <> p.q_id),
       |cdots AS (
       |  SELECT q_id, c_id, cid, $dotSqlExpr AS dot
       |  FROM (SELECT cand.q_id, cand.c_id, cand.cid,
       |          q.embedding AS qe, c.embedding AS ce,
       |          generate_subscripts(q.embedding, 1) AS i
       |        FROM cand
       |        JOIN embeddings q ON q.vec_id = cand.q_id
       |        JOIN embeddings c ON c.vec_id = cand.c_id)
       |  GROUP BY 1, 2, 3),
       |ccos AS (
       |  SELECT q_id, c_id, cid,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
       |  FROM cdots
       |  JOIN norms nq ON nq.vec_id = q_id
       |  JOIN norms nc ON nc.vec_id = c_id)
       |SELECT q_id, c_id, cid, cosim, rnk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosim DESC, c_id) AS BIGINT) AS rnk FROM ccos)
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  /** q92's oracle: product quantization end to end — per-subspace k-means
    * (8 seeds, one exact Lloyd update on the 1e6 grid), code assignment,
    * and ADC top-3 via the per-query distance table (= d2 restricted to
    * the query rows). All BIGINT; nested by q46.
    */
  /** q159's SQ8 chain as the shared oracle block (q159 and q46 both
    * embed it).
    */
  private def q159Sql: String =
    """WITH vq AS (
      |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
      |    CAST(floor(CAST(e[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
      |  FROM (SELECT vec_id, embedding AS e,
      |        generate_subscripts(embedding, 1) AS i FROM embeddings)),
      |rng AS (SELECT pos, min(vq) AS mn, max(vq) AS mx,
      |    max(vq) - min(vq) AS span FROM vq GROUP BY 1),
      |codes AS (
      |  SELECT v.vec_id AS c_id, v.pos,
      |    r.mn + ((CASE WHEN r.span = 0 THEN 0
      |      ELSE ((v.vq - r.mn) * 255) // r.span END) * r.span) // 255 AS dec
      |  FROM vq v JOIN rng r USING (pos)),
      |qs AS (SELECT vec_id AS q_id, pos, vq AS qv FROM vq WHERE vec_id < 10),
      |ad AS (
      |  SELECT q.q_id, c.c_id,
      |    CAST(sum((q.qv - c.dec) * (q.qv - c.dec)) AS BIGINT) AS adist_q
      |  FROM codes c JOIN qs q USING (pos)
      |  WHERE c.c_id <> q.q_id GROUP BY 1, 2)
      |SELECT q_id, c_id, adist_q, rnk FROM (
      |  SELECT q_id, c_id, adist_q,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY adist_q, c_id) AS BIGINT) AS rnk
      |  FROM ad) WHERE rnk <= 3
      |ORDER BY q_id, rnk""".stripMargin

  private def q92Sql: String =
    s"""WITH vq AS (
       |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
       |    CAST(i - 1 AS BIGINT) // 8 AS sub,
       |    CAST(floor(CAST(e[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
       |  FROM (SELECT vec_id, embedding AS e, generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |seeds AS (SELECT sub, vec_id AS cid, pos, vq AS cq FROM vq WHERE vec_id < 16),
       |d1 AS (
       |  SELECT v.vec_id, v.sub, s.cid,
       |    CAST(sum((v.vq - s.cq) * (v.vq - s.cq)) AS BIGINT) AS dist
       |  FROM vq v JOIN seeds s ON s.sub = v.sub AND s.pos = v.pos
       |  GROUP BY 1, 2, 3),
       |a1 AS (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
       |    FROM d1) WHERE rn = 1),
       |c1 AS (
       |  SELECT v.sub, a.cid, v.pos, CAST(sum(v.vq) AS BIGINT) // count(*) AS cq
       |  FROM vq v JOIN a1 a ON a.vec_id = v.vec_id AND a.sub = v.sub
       |  GROUP BY 1, 2, 3),
       |d2 AS (
       |  SELECT v.vec_id, v.sub, c.cid,
       |    CAST(sum((v.vq - c.cq) * (v.vq - c.cq)) AS BIGINT) AS dist
       |  FROM vq v JOIN c1 c ON c.sub = v.sub AND c.pos = v.pos
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
       |    FROM d2) WHERE rn = 1),
       |dtab AS (
       |  SELECT vec_id AS q_id, sub, cid, dist FROM d2 WHERE vec_id < 10),
       |adist AS (
       |  SELECT t.q_id, c.vec_id AS c_id, CAST(sum(t.dist) AS BIGINT) AS adist_q
       |  FROM codes c JOIN dtab t ON t.sub = c.sub AND t.cid = c.cid
       |  WHERE c.vec_id <> t.q_id
       |  GROUP BY 1, 2)
       |SELECT q_id, c_id, adist_q, rnk FROM (
       |  SELECT q_id, c_id, adist_q,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adist_q, c_id) AS BIGINT) AS rnk
       |  FROM adist) WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin

  /** q94's oracle: the full IVFADC chain — learned coarse cells, residual
    * PQ codebooks, per-probed-cell query residual distance tables, ADC
    * ranking over probed-cell members. All BIGINT.
    */
  private def q94Sql: String =
    s"""WITH vq AS (
       |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
       |    CAST(floor(CAST(e[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
       |  FROM (SELECT vec_id, embedding AS e, generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |cseeds AS (SELECT vec_id AS cid, pos, vq AS cq FROM vq WHERE vec_id < 10),
       |cd1 AS (
       |  SELECT v.vec_id, s.cid,
       |    CAST(sum((v.vq - s.cq) * (v.vq - s.cq)) AS BIGINT) AS dist
       |  FROM vq v JOIN cseeds s USING (pos) GROUP BY 1, 2),
       |ca1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM cd1) WHERE rn = 1),
       |cc1 AS (
       |  SELECT a.cid, v.pos, CAST(sum(v.vq) AS BIGINT) // count(*) AS cq
       |  FROM vq v JOIN ca1 a USING (vec_id) GROUP BY 1, 2),
       |cd2 AS (
       |  SELECT v.vec_id, c.cid,
       |    CAST(sum((v.vq - c.cq) * (v.vq - c.cq)) AS BIGINT) AS dist
       |  FROM vq v JOIN cc1 c USING (pos) GROUP BY 1, 2),
       |cassign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM cd2) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM cd2 WHERE vec_id < 10) WHERE rn <= 2),
       |rvq AS (
       |  SELECT v.vec_id, v.pos // 8 AS sub, v.pos, v.vq - c.cq AS rq
       |  FROM vq v
       |  JOIN cassign a USING (vec_id)
       |  JOIN cc1 c ON c.cid = a.cid AND c.pos = v.pos),
       |pseeds AS (SELECT sub, vec_id AS pcid, pos, rq AS pcq FROM rvq WHERE vec_id < 16),
       |pd1 AS (
       |  SELECT r.vec_id, r.sub, s.pcid,
       |    CAST(sum((r.rq - s.pcq) * (r.rq - s.pcq)) AS BIGINT) AS dist
       |  FROM rvq r JOIN pseeds s ON s.sub = r.sub AND s.pos = r.pos
       |  GROUP BY 1, 2, 3),
       |pa1 AS (
       |  SELECT vec_id, sub, pcid FROM (
       |    SELECT vec_id, sub, pcid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, pcid) AS rn
       |    FROM pd1) WHERE rn = 1),
       |pc1 AS (
       |  SELECT r.sub, a.pcid, r.pos, CAST(sum(r.rq) AS BIGINT) // count(*) AS pcq
       |  FROM rvq r JOIN pa1 a ON a.vec_id = r.vec_id AND a.sub = r.sub
       |  GROUP BY 1, 2, 3),
       |pd2 AS (
       |  SELECT r.vec_id, r.sub, c.pcid,
       |    CAST(sum((r.rq - c.pcq) * (r.rq - c.pcq)) AS BIGINT) AS dist
       |  FROM rvq r JOIN pc1 c ON c.sub = r.sub AND c.pos = r.pos
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, sub, pcid FROM (
       |    SELECT vec_id, sub, pcid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, pcid) AS rn
       |    FROM pd2) WHERE rn = 1),
       |qrv AS (
       |  SELECT p.q_id, p.cid, v.pos // 8 AS sub, v.pos, v.vq - c.cq AS qr
       |  FROM vq v
       |  JOIN probes p ON p.q_id = v.vec_id
       |  JOIN cc1 c ON c.cid = p.cid AND c.pos = v.pos),
       |dtab AS (
       |  SELECT q.q_id, q.cid, q.sub, c.pcid,
       |    CAST(sum((q.qr - c.pcq) * (q.qr - c.pcq)) AS BIGINT) AS dist
       |  FROM qrv q JOIN pc1 c ON c.sub = q.sub AND c.pos = q.pos
       |  GROUP BY 1, 2, 3, 4),
       |adist AS (
       |  SELECT t.q_id, k.vec_id AS c_id, a.cid,
       |    CAST(sum(t.dist) AS BIGINT) AS adist_q
       |  FROM codes k
       |  JOIN cassign a ON a.vec_id = k.vec_id
       |  JOIN probes p ON p.cid = a.cid
       |  JOIN dtab t ON t.q_id = p.q_id AND t.cid = a.cid
       |    AND t.sub = k.sub AND t.pcid = k.pcid
       |  WHERE k.vec_id <> p.q_id
       |  GROUP BY 1, 2, 3)
       |SELECT q_id, c_id, cid, adist_q, rnk FROM (
       |  SELECT q_id, c_id, cid, adist_q,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adist_q, c_id) AS BIGINT) AS rnk
       |  FROM adist) WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin

  /** q35's oracle (sign-LSH banded top-3) — nested by q46. */
  private def q35Sql: String = {
    val hpValues = (for {
      r <- 0 until LSH_R
      d <- 0 until DIMS
    } yield s"($r, ${d + 1}, ${hplanes(r)(d).toLong})").mkString(", ")
    s"""WITH $normsSql,
       |hp(r, i, g) AS (VALUES $hpValues),
       |unnested AS (
       |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM (SELECT vec_id, embedding,
       |          generate_subscripts(embedding, 1) AS i FROM embeddings)),
       |bitsums AS (
       |  SELECT u.vec_id, h.r,
       |    CAST(sum(CAST(floor(u.x * CAST(h.g AS DOUBLE) * 1000000000.0)
       |      AS BIGINT)) AS BIGINT) AS s
       |  FROM unnested u JOIN hp h ON h.i = u.i
       |  GROUP BY 1, 2),
       |sig AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << r) ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM bitsums GROUP BY 1),
       |bands AS (
       |  SELECT vec_id, b AS band, (sig >> (4*b)) & 15 AS key
       |  FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) t(b)),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
       |  FROM bands q JOIN bands c ON q.band = c.band AND q.key = c.key
       |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |dots AS (
       |  SELECT q_id, c_id, $dotSqlExpr AS dot
       |  FROM (SELECT cand.q_id, cand.c_id, q.embedding AS qe, c.embedding AS ce,
       |          generate_subscripts(q.embedding, 1) AS i
       |        FROM cand
       |        JOIN embeddings q ON q.vec_id = cand.q_id
       |        JOIN embeddings c ON c.vec_id = cand.c_id)
       |  GROUP BY 1, 2),
       |cosv AS (
       |  SELECT q_id, c_id,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
       |  FROM dots
       |  JOIN norms nq ON nq.vec_id = q_id
       |  JOIN norms nc ON nc.vec_id = c_id)
       |SELECT q_id, c_id, cosim, rnk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosim DESC, c_id) AS BIGINT) AS rnk FROM cosv)
       |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin
  }

  val queries: Map[String, QueryDef] = Map(

    // HYBRID RETRIEVAL with reciprocal-rank fusion (Cormack & Clarke
    // SIGIR'09 — the standard lexical+vector fusion every RAG/retrieval
    // stack ships): each query doc retrieves its top-10 lexical
    // candidates (3-shingle Jaccard, q98's pipeline) and its top-10
    // vector candidates (exact quantized cosine, q16's pipeline), and
    // the two lists fuse by RRF score Σ 1/(60 + rank) — computed as the
    // INTEGER 1e12 div (60 + rank) so the fused ordering is exact in
    // both engines (the double 1/(60+r) would differ in the last ulp
    // across engines for summed ties). The documents and embeddings
    // tables share an id space, so the fusion join is (q_id, c_id)
    // FULL OUTER over two 10-row-per-query lists — fusion cost is
    // rank-list-sized, never corpus-sized. 100 TB shape: the lexical
    // side is q98's asymmetric posting join (corpus side never
    // broadcast), the vector side broadcasts only the query vectors;
    // the fusion itself touches ≤ 20 rows per query.
    "q132_hybrid_rrf" -> QueryDef(
      fn = { (s, dir) =>
        val d = Tables.load(s, dir, "documents")
        // lexical top-10: shared-shingle Jaccard, deterministic tie rule
        // r15 OPT (guide §3.3 + §2.5): pin the 3×-consumed shingle stream
        // and fan out the single-split scan feeding it (q98's fix)
        val sh = Dedup.shingles(Tables.fanOut(s, d, col("doc_id")))
          .localCheckpoint()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = sh.filter(col("doc_id") % 97 === 0).toDF("q_id", "sh")
          .join(sh.toDF("c_id", "sh"), Seq("sh"))
          .filter(col("c_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("c_id"))
          .agg(count(lit(1)).as("inter"))
        val wl = Window.partitionBy(col("q_id"))
          .orderBy(col("jaccard").desc, col("c_id"))
        val lexTop = inter
          .join(broadcast(sizes.filter(col("doc_id") % 97 === 0)
            .toDF("q_id", "sz_q")), Seq("q_id"))
          .join(sizes.toDF("c_id", "sz_c"), Seq("c_id"))
          .withColumn("jaccard", col("inter").cast("double") /
            (col("sz_q") + col("sz_c") - col("inter")))
          .withColumn("r_lex", row_number().over(wl))
          .filter(col("r_lex") <= 10)
          .select("q_id", "c_id", "r_lex")
        // vector top-10: exact quantized cosine, query side broadcast
        val e = emb(s, dir)
        val n = norms(e)
        val qs = e.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val cs = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
        val wv = Window.partitionBy(col("q_id"))
          .orderBy(col("cosim").desc, col("c_id"))
        val vecTop = cs.join(broadcast(qs), col("c_id") =!= col("q_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("q_id", "n2q"), Seq("q_id"))
          .join(n.toDF("c_id", "n2c"), Seq("c_id"))
          .withColumn("cosim", cosim(col("dot"), col("n2q"), col("n2c")))
          .withColumn("r_vec", row_number().over(wv))
          .filter(col("r_vec") <= 10)
          .select("q_id", "c_id", "r_vec")
        // integer-exact RRF fusion over the two rank lists
        val wf = Window.partitionBy(col("q_id"))
          .orderBy(col("rrf_q").desc, col("c_id"))
        lexTop.join(vecTop, Seq("q_id", "c_id"), "full_outer")
          .withColumn("rrf_q",
            coalesce(expr("1000000000000L div (60 + r_lex)"), lit(0L)) +
              coalesce(expr("1000000000000L div (60 + r_vec)"), lit(0L)))
          .withColumn("rank", row_number().over(wf))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("c_id"), col("rrf_q"))
          .orderBy("q_id", "rank")
      },
      oracle = Some(
        s"""WITH ${Dedup.shinglesSql},
           |$normsSql,
           |sz AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY 1),
           |inter AS (
           |  SELECT q.doc_id AS q_id, c.doc_id AS c_id, count(*) AS inter
           |  FROM sh0 q JOIN sh0 c ON c.sh = q.sh AND c.doc_id <> q.doc_id
           |  WHERE q.doc_id % 97 = 0
           |  GROUP BY 1, 2),
           |lex AS (
           |  SELECT q_id, c_id, r_lex FROM (
           |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |      ORDER BY CAST(inter AS DOUBLE) / (sq.sz + sc2.sz - inter)
           |        DESC, c_id) AS r_lex
           |    FROM inter
           |    JOIN sz sq ON sq.doc_id = q_id
           |    JOIN sz sc2 ON sc2.doc_id = c_id)
           |  WHERE r_lex <= 10),
           |dots AS (
           |  SELECT q_id, c_id, $dotSqlExpr AS dot
           |  FROM (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           |          q.embedding AS qe, c.embedding AS ce,
           |          generate_subscripts(q.embedding, 1) AS i
           |        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           |        WHERE q.vec_id % 97 = 0)
           |  GROUP BY 1, 2),
           |vec AS (
           |  SELECT q_id, c_id, r_vec FROM (
           |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |      ORDER BY CAST(dot AS DOUBLE) /
           |        sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE))
           |        DESC, c_id) AS r_vec
           |    FROM dots
           |    JOIN norms nq ON nq.vec_id = q_id
           |    JOIN norms nc ON nc.vec_id = c_id)
           |  WHERE r_vec <= 10),
           |fused AS (
           |  SELECT coalesce(l.q_id, v.q_id) AS q_id,
           |    coalesce(l.c_id, v.c_id) AS c_id,
           |    coalesce(1000000000000 // (60 + l.r_lex), 0) +
           |      coalesce(1000000000000 // (60 + v.r_vec), 0) AS rrf_q
           |  FROM lex l FULL OUTER JOIN vec v
           |    ON v.q_id = l.q_id AND v.c_id = l.c_id)
           |SELECT q_id, rank, c_id, CAST(rrf_q AS BIGINT) AS rrf_q FROM (
           |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
           |    ORDER BY rrf_q DESC, c_id) AS INT) AS rank FROM fused)
           |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Sign-LSH ANN (random hyperplane): signature bit r = [dot(v, g_r) ≥ 0];
    // 16 bits banded 4×4; candidates share ≥1 band with the query, then
    // rank by exact quantized cosine — the LSH-bucketed scale path (the
    // bucket join replaces the all-pairs cross join; recall is tuned by
    // bands × rows like any LSH). Hyperplanes are compile-time literals —
    // no randomness at run time, identical in both engines.
    "q35_ann_lsh" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        val n = norms(e)
        val bitCols = (0 until LSH_R).map { r =>
          when(call_function("float_dot_q",
              col("embedding"), typedlit(hplanes(r))) >= 0L, lit(1L << r))
            .otherwise(lit(0L))
        }
        val sig = e.select(col("vec_id"), col("embedding"),
          bitCols.reduce(_ + _).as("sig"))
        val bands = sig.select(col("vec_id"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), 4 * b).bitwiseAND(lit(15L)).as("key"))): _*)).as("bk"))
          .select(col("vec_id"), col("bk.band"), col("bk.key"))
        val qBands = bands.filter(col("vec_id") < 10)
          .toDF("q_id", "band", "key")
        val cand = bands.toDF("c_id", "band", "key")
          .join(broadcast(qBands), Seq("band", "key"))
          .filter(col("c_id") =!= col("q_id"))
          .select("q_id", "c_id").distinct()
        val w = Window.partitionBy(col("q_id")).orderBy(col("cosim").desc, col("c_id"))
        cand
          .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
          .join(e.select(col("vec_id").as("c_id"), col("embedding").as("ce")), Seq("c_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("q_id", "n2q"), Seq("q_id"))
          .join(n.toDF("c_id", "n2c"), Seq("c_id"))
          .withColumn("cosim", cosim(col("dot"), col("n2q"), col("n2c")))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("q_id", "c_id", "cosim", "rnk")
          .orderBy("q_id", "rnk")
      },
      oracle = Some(q35Sql)),

    // Exact ANN baseline: brute-force cosine top-5 for each query vector
    // (vec_id < 10). The query set broadcasts; one corpus scan.
    "q16_ann_topk" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        val n = norms(e)
        val qs = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val cs = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cosim").desc, col("c_id"))
        cs.join(broadcast(qs), col("c_id") =!= col("q_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("q_id", "n2q"), Seq("q_id"))
          .join(n.toDF("c_id", "n2c"), Seq("c_id"))
          .withColumn("cosim", cosim(col("dot"), col("n2q"), col("n2c")))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select("q_id", "c_id", "cosim", "rnk")
          .orderBy("q_id", "rnk")
      },
      oracle = Some(q16Sql)),

    // Embedding near-dup: all pairs with cosine ≥ 0.4 (this corpus is
    // near-orthogonal; real dedup corpora use ≥ 0.95 — the threshold is a
    // parameter, the plan is identical). This is the deliberate O(n²)
    // exploratory baseline that proves q45's LSH prune+verify lossless —
    // but an unbounded quadratic must not own the large-SF sweep (it was
    // 11% of the sf1 total, the one above-linear query, and at 100× it
    // is dead). r11: the all-pairs SLICE is capped at ~2500 vectors via
    // the q168 calibration idiom — a deterministic md5 modulus d =
    // ceil(n/2500) both engines compute identically from the corpus, so
    // below the cap (sf ≤ 0.1: ≤ 2000 vectors) d = 1 and results are
    // byte-identical to the uncapped form, while at sf1+ the audit stays
    // O(cap²) however big the corpus grows. The oracle derives the SAME
    // slice, so the equivalence proof is over the slice — which is the
    // point: the baseline certifies the pruned path's arithmetic, and a
    // fixed-size certificate does that at any scale.
    "q17_embed_neardup" -> QueryDef(
      fn = { (s, dir) =>
        val e0 = emb(s, dir)
        val cap = 2500L
        val d = (e0.count() + cap - 1) / cap
        val e = if (d <= 1L) e0
          else e0.filter(
            conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
              .cast("long") % lit(d) === 0L)
        val n = norms(e)
        // Repartition the streamed side: the corpus arrives as one small
        // parquet split, and a nested-loop pair join inherits that single
        // partition — all O(n²) dot products would land on ONE task. After
        // repartition every core gets a slice (same fix a 1000-executor
        // cluster needs).
        // r15 OPT (guide §2.5): EXPLICIT partition count. A keyed
        // repartition with no count is an AQE-coalescible exchange, and
        // the slice is ~0.5 MB — AQE folded it back to ONE partition
        // (bytes-blind to the O(n²) compute that follows), re-serializing
        // the join (profiled: one 2.5 s task). The slice is CAPPED at
        // ~2500 vectors, so core-count partitions is right at any scale.
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("qe"))
          .repartition(s.sparkContext.defaultParallelism, col("a_id"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("ce"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("a_id", "n2a"), Seq("a_id"))
          .join(n.toDF("b_id", "n2b"), Seq("b_id"))
          .withColumn("cosim", cosim(col("dot"), col("n2a"), col("n2b")))
          .filter(col("cosim") >= 0.4)
          .select("a_id", "b_id", "cosim")
          .orderBy("a_id", "b_id")
      },
      oracle = Some(bruteNeardupSql)),

    // Scale-safe threshold near-dup (the 100 TB dedup path): sign-LSH
    // candidate generation + exact quantized-cosine verification at the
    // PRODUCTION near-dup threshold (cos ≥ 0.95), against a corpus
    // carrying planted duplicates — the base embeddings plus exact copies
    // of the first 50 vectors under fresh ids (-(v+1): deterministic, no
    // max-id job, integer-exact in both engines). The oracle brute-forces
    // the SAME derived corpus, so a green row literally proves
    // candidate-prune + verify ≡ all-pairs. For the planted pairs the
    // recall argument is not even probabilistic: an exact copy computes
    // the identical per-band keys, so every band collides by
    // construction; the derived (1−p^w)^B ≤ 5% miss applies only to
    // generic near-dups. The plan has NO O(n²) join: candidates come from
    // an equi-join on (band, key) whose KEY SPACE SCALES WITH THE CORPUS —
    // (w, B) = lshBandGeometry(count, 0.95), so expected candidates stay
    // ~B·n²/2^{w+1} ≲ B·n/8, linear in n (the r7 sf1 sweep killed the
    // previous FIXED 8-bit revision for exactly this: 256 buckets don't
    // grow with n, leaving a constant-factor cut of all-pairs — 14.2× at
    // 10× data).
    "q45_neardup_lsh_verify" -> QueryDef(
      fn = { (s, dir) =>
        val e0 = emb(s, dir)
        val aug = e0.select(col("vec_id"), col("embedding"))
          .unionByName(e0.filter(col("vec_id") < 50)
            .select((-(col("vec_id") + 1)).cast("long").as("vec_id"),
              col("embedding")))
        val n = norms(aug)
        // one metadata-cheap count sizes the band geometry for THIS corpus
        val (w, nb) = lshBandGeometry(aug.count(), 0.95)
        // band b's key = w sign bits against planes [b·w, (b+1)·w), all
        // computed by ONE native expression per row (a composed
        // float_dot_q-per-plane form blows janino's method limit at
        // adaptive geometry — see LshBandKeys)
        val keyed = Tables.fanOut(s,
          aug.select(col("vec_id"), col("embedding")),
          col("vec_id")) // parallelize the single-split scan (no-op at scale)
        val bands = keyed.select(col("vec_id"),
          posexplode(GraftBridge.column(graft.functions.LshBandKeys(
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
              Seq("embedding")), w, nb, DIMS))))
          .select(col("vec_id"), col("pos").as("band"), col("col").as("key"))
        val cand = bands.toDF("a_id", "band", "key")
          .join(bands.toDF("b_id", "band", "key"), Seq("band", "key"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        cand
          .join(aug.select(col("vec_id").as("a_id"), col("embedding").as("qe")), Seq("a_id"))
          .join(aug.select(col("vec_id").as("b_id"), col("embedding").as("ce")), Seq("b_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("a_id", "n2a"), Seq("a_id"))
          .join(n.toDF("b_id", "n2b"), Seq("b_id"))
          .withColumn("cosim", cosim(col("dot"), col("n2a"), col("n2b")))
          .filter(col("cosim") >= 0.95)
          .select("a_id", "b_id", "cosim")
          .orderBy("a_id", "b_id")
      },
      oracle = Some(plantedNeardupSql)),

    // IVF-style ANN: coarse cells = vectors with vec_id % 50 == 0 (cell
    // count scales with the corpus); every vector is assigned to its
    // nearest cell; each query probes its 2 nearest cells and ranks only
    // those cells' members. Returns top-3 per query with the cell probed.
    "q18_ann_ivf" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        val n = norms(e)
        val (cents, assign) = ivfBuild(e, n)
        ivfProbe(e, n, cents, assign)
      },
      oracle = Some(q18Sql)),

    // The SAME IVF split as build-once / probe-many: the index (centroid
    // vectors + member assignments — exactly what ivfBuild computes) is
    // PERSISTED as two CommitLog tables and the probe runs against the
    // read-back tables, never the build plan. This is the production
    // amortization shape at 100 TB: the O(corpus × |cells|) assignment
    // runs once per index release; every query batch afterwards opens two
    // table scans (centroids broadcast-sized, assignments key-joined) and
    // pays only probe cost. Same oracle as q18 — the persistence round
    // trip (array<float> columns included) must be lossless, and index
    // updates inherit CommitLog's ACID/time-travel for free (an index
    // version ≡ a table version).
    "q104_ann_ivf_persisted" -> QueryDef(
      fn = { (s, dir) =>
        import graft.sources.CommitLog
        val e = emb(s, dir)
        val n = norms(e)
        val (cents, assign) = ivfBuild(e, n)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q104-ivf").toString
        CommitLog.append(cents, s"$root/centroids")
        CommitLog.append(assign, s"$root/members")
        ivfProbe(e, n,
          CommitLog.read(s, s"$root/centroids"),
          CommitLog.read(s, s"$root/members"))
      },
      oracle = Some(q18Sql)),

    // INCREMENTAL index maintenance on the persisted IVF (the q80 pattern
    // lifted to ANN): the corpus splits into an initial release (contains
    // every centroid id) and a later delta batch; the update assigns ONLY
    // the delta against the PERSISTED centroid table and APPENDS to the
    // members table — one commit, never a rebuild, cost O(|delta| ×
    // |cells|) instead of O(corpus × |cells|). Because assignment is
    // per-vector independent and the centroid set is identical, the
    // updated index is row-for-row the full rebuild's; the probe over it
    // must therefore reproduce q18's oracle EXACTLY — under-assignment,
    // double-assignment, or centroid drift all hash-mismatch. At 100 TB
    // this is the nightly embedding-ingest job: new vectors join a
    // broadcast centroid set, one append commit, probes see them
    // atomically (index version ≡ table version).
    "q105_ann_index_update" -> QueryDef(
      fn = { (s, dir) =>
        import graft.sources.CommitLog
        val e = emb(s, dir)
        val n = norms(e)
        // delta = a later-arriving batch; keeps centroid ids (vec_id % 50
        // == 0) in the INITIAL release so the cell set never changes
        val deltaCond = col("vec_id") % 7 === 3 && col("vec_id") % 50 =!= 0
        val initial = e.filter(!deltaCond)
        val delta = e.filter(deltaCond)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q105-ivf").toString
        val (cents, assignInit) = ivfBuild(initial, norms(initial))
        CommitLog.append(cents, s"$root/centroids")
        CommitLog.append(assignInit, s"$root/members")
        // the UPDATE: delta-only assignment against the persisted
        // centroids, one append commit
        CommitLog.append(
          ivfAssign(delta, norms(delta), CommitLog.read(s, s"$root/centroids")),
          s"$root/members")
        ivfProbe(e, n,
          CommitLog.read(s, s"$root/centroids"),
          CommitLog.read(s, s"$root/members"))
      },
      oracle = Some(q18Sql)),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup as
    // cluster-then-prune — embeddings are coarsely clustered (the q18
    // nearest-centroid cells), then pairwise cosine runs ONLY within each
    // cluster and a vector is dropped when a lower-id cluster-mate sits
    // above the dedup threshold (deterministic keep-lowest-id, the
    // paper's keep-one-representative rule made order-free). The corpus
    // carries planted exact dups (q45's -(v+1) copies), which land in
    // their original's cell by construction (identical vector ⇒ identical
    // cell ranking) — so the planted rows are provably pruned, not
    // probabilistically. 100 TB shape: the quadratic is bounded PER CELL
    // (Σ n_c² with n_c ≈ corpus/cells, vs n² all-pairs); the plan is an
    // equi-join on the cell id — no cartesian anywhere — and cell count
    // grows with the corpus, so cell size (and the per-cell quadratic)
    // stays constant as data scales.
    "q107_semdedup" -> QueryDef(
      fn = { (s, dir) =>
        val e0 = emb(s, dir)
        val aug = e0.select(col("vec_id"), col("embedding"))
          .unionByName(e0.filter(col("vec_id") < 50)
            .select((-(col("vec_id") + 1)).cast("long").as("vec_id"),
              col("embedding")))
        val n = norms(aug)
        // negative copy ids can satisfy % 50 = 0 (e.g. -50): keep the
        // centroid set identical to the base corpus's
        val cents = aug.filter(col("vec_id") % 50 === 0 && col("vec_id") >= 0)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val assign = ivfAssign(aug, n, cents).toDF("vec_id", "cid")
          .join(aug, Seq("vec_id"))
        semDropFlags(s, assign, None, n)
          .select("vec_id", "cid", "dropped")
          .orderBy("vec_id")
      },
      oracle = Some(semdedupSql)),

    // INCREMENTAL SemDeDup against a PERSISTED index (q105's pattern
    // lifted to semantic dedup): the corpus splits at vec_id 300 into an
    // initial release and a later delta batch. The initial release runs
    // q107's cluster-then-prune once and persists the index — centroids
    // plus ALL members with their drop flags and embeddings — as
    // CommitLog tables. The delta then (a) assigns ONLY against the
    // READ-BACK centroid table, (b) compares each new vector within its
    // cell against read-back members and lower-id delta cell-mates, and
    // (c) APPENDS its rows in one commit. Because the drop rule is
    // "∃ lower-id cell-mate ≥ τ" and every delta id exceeds every initial
    // id, the incremental result is IDENTICAL to batch SemDeDup over the
    // full corpus — which is exactly what the oracle states, so a green
    // row proves the incremental path loses nothing. At 100 TB this is
    // the nightly embedding-ingest dedup: O(|delta| × cell) work against
    // a static index instead of O(corpus²) recompute, with index updates
    // inheriting CommitLog's ACID (an index version ≡ a table version).
    "q109_semdedup_incremental" -> QueryDef(
      fn = { (s, dir) =>
        import graft.sources.CommitLog
        val e0 = emb(s, dir)
        val aug = e0.select(col("vec_id"), col("embedding"))
          .unionByName(e0.filter(col("vec_id") < 50)
            .select((-(col("vec_id") + 1)).cast("long").as("vec_id"),
              col("embedding")))
        val n = norms(aug)
        val init = aug.filter(col("vec_id") < 300)
        val delta = aug.filter(col("vec_id") >= 300)
        // centroid set frozen at the initial release (all < 300)
        val cents = init.filter(col("vec_id") % 50 === 0 && col("vec_id") >= 0)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val root = java.nio.file.Files
          .createTempDirectory("graft-q109-semdedup").toString
        // initial release: q107's batch prune, persisted WITH embeddings
        val assignInit = ivfAssign(init, norms(init), cents)
          .toDF("vec_id", "cid").join(init, Seq("vec_id"))
        val initFlagged = semDropFlags(s, assignInit, None, n)
        CommitLog.append(cents, s"$root/cells")
        CommitLog.append(initFlagged, s"$root/members")
        // the UPDATE: delta assigned against the PERSISTED index only
        CommitLog.append(
          semdedupDelta(s, delta,
            CommitLog.read(s, s"$root/cells"),
            CommitLog.read(s, s"$root/members")),
          s"$root/members")
        CommitLog.read(s, s"$root/members")
          .select("vec_id", "cid", "dropped")
          .orderBy("vec_id")
      },
      oracle = Some(semdedupIncrementalSql)),

    // IVF with LEARNED centroids: q18's probe shape, but the coarse
    // quantizer is q79's k-means (10 seeds, one exact Lloyd update on the
    // 1e6-quantized integer grid) instead of the vec_id % 50 heuristic.
    // Assignment and probing run in exact BIGINT squared-distance space
    // (bit-identical cross-engine); the final ranking is the exact
    // quantized cosine, so the full learned-quantizer path is
    // oracle-checkable end to end. Scale shape: centroids (k×64 longs)
    // broadcast; the per-vector assignment aggregates map-side; the corpus
    // never reshuffles for the quantizer.
    "q88_ann_ivf_learned" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        val n = norms(e)
        // r15 OPT (guide §2.3/§1.2): ARRAY formulation — the historical
        // (vec_id, pos, vq) explode carried 64× the rows through every
        // distance pass (join-on-pos + groupBy-sum per pass). Vectors stay
        // array<long> (quantize_vec, bit-identical to the exploded
        // per-element expression); each distance is ONE codegen'd sqdist_q
        // loop (order-independent BIGINT sum ⇒ identical values); the
        // Lloyd update is ONE vec_sum_q elementwise aggregate instead of a
        // 64-row-per-member groupBy. Oracle q88 re-proven bit-exact.
        val vq = e
          .select(col("vec_id"), expr("quantize_vec(embedding)").as("v"))
          .repartition(col("vec_id")) // parallelize the single-split scan
          // shared by seeds/distances/Lloyd — pin once (lazy persist)
          .persist()
        val seeds = vq.filter(col("vec_id") < 10)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        def distances(cents: DataFrame): DataFrame =
          vq.crossJoin(broadcast(cents))
            .select(col("vec_id"), col("cid"),
              expr("sqdist_q(v, cv)").as("dist"))
        def argmin(d: DataFrame): DataFrame = d
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cid"))
        // one exact Lloyd update (q79's quantizer-builder discipline):
        // per-dim sums div member count ≡ the per-(cid,pos) sum div count
        val c1 = vq.join(argmin(distances(seeds)), Seq("vec_id"))
          .groupBy(col("cid"))
          .agg(expr("vec_sum_q(v)").as("sv"), count(lit(1)).as("cnt"))
          .select(col("cid"),
            expr("transform(sv, x -> x div cnt)").as("cv"))
          .persist()
        // d2 feeds the member assignment AND the probe ranking — one pass
        val d2 = distances(c1).persist()
        val assign = argmin(d2).select(
          col("vec_id").as("member_id"), col("cid"))
        val wProbe = Window.partitionBy(col("vec_id"))
          .orderBy(col("dist"), col("cid"))
        val probes = d2.filter(col("vec_id") < 10)
          .withColumn("rn", row_number().over(wProbe))
          .filter(col("rn") <= 2)
          .select(col("vec_id").as("q_id"), col("cid"))
        val wTop = Window.partitionBy(col("q_id")).orderBy(col("cosim").desc, col("c_id"))
        probes
          .join(assign, Seq("cid"))
          .withColumnRenamed("member_id", "c_id")
          .filter(col("c_id") =!= col("q_id"))
          .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
          .join(e.select(col("vec_id").as("c_id"), col("embedding").as("ce")), Seq("c_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("q_id", "n2q"), Seq("q_id"))
          .join(n.toDF("c_id", "n2c"), Seq("c_id"))
          .withColumn("cosim", cosim(col("dot"), col("n2q"), col("n2c")))
          .withColumn("rnk", row_number().over(wTop).cast("long"))
          .filter(col("rnk") <= 3)
          .select("q_id", "c_id", "cid", "cosim", "rnk")
          .orderBy("q_id", "rnk")
      },
      oracle = Some(q88Sql)),

    // Product quantization (PQ) ANN — the memory-scale path (Jégou, Douze,
    // Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
    // 2011): the 64-dim vector splits into m=8 subspaces of 8 dims, each
    // subspace learns its own k=16-centroid codebook (per-subspace
    // k-means, 16 seeds + one exact Lloyd update on the 1e6 integer grid —
    // the q79/q88 quantizer discipline), and every corpus vector
    // compresses to 8 four-bit codes. Queries rank candidates by
    // ASYMMETRIC DISTANCE (ADC): a per-query distance table
    // d(q_sub, centroid) — m×k BIGINTs, exactly the d2 relation restricted
    // to the query rows — and approx_dist(q, v) = Σ_sub dtab(sub,
    // code_v(sub)), a table lookup per subspace instead of 64 multiplies
    // against a raw vector.
    //
    // Why this is THE 100 TB ANN answer: a 100 TB float-embedding corpus
    // (64 dims × 4 B = 256 B/vector) compresses 64× to codes that fit in
    // cluster RAM (4 B/vector + one broadcast codebook); the scan touches
    // codes only, never re-reads raw vectors. Plan shape: the codebook and
    // the distance table BROADCAST (m×k×dims and |Q|×m×k rows);
    // corpus-side work is one posexplode aggregation for codes, then a
    // map-side combined (q_id, vec_id) sum — the corpus never reshuffles
    // and no join is O(n²). Everything is exact BIGINT (overflow: per-sub
    // dist ≤ 8·2⁴² = 2⁴⁵, ×8 subs ≤ 2⁴⁸), so codes, distance tables, and
    // the final ranking are bit-identical cross-engine — the oracle proves
    // the entire train→encode→ADC pipeline, not just the output shape.
    //
    // Recall honesty: q46 measures PQ recall@3 ≈ 0.27 on THIS corpus —
    // near-orthogonal random vectors are PQ's adversarial worst case
    // (neighbor distance gaps are within quantization error; k=64 and
    // m=4/16 variants measured no better, so the knobs aren't the limit,
    // the geometry is). On clustered real embeddings the same pipeline is
    // the standard billion-scale recall/memory tradeoff; an exact
    // duplicate of a query always achieves the minimal possible table sum
    // regardless (its codes are the per-subspace argmins by definition).
    "q92_ann_pq" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        // r15 OPT (guide §2.3/§1.2): ARRAY formulation — see q88. Each
        // vector becomes 8 (vec_id, sub, 8-dim array) rows instead of 64
        // position rows; per-(vector, sub, centroid) distance is one
        // codegen'd sqdist_q instead of a join-on-pos + groupBy-sum.
        val subSlices = (0 until 8).map(sb => struct(
          lit(sb.toLong).as("sub"),
          expr(s"slice(v, ${sb * 8 + 1}, 8)").as("sv")))
        val vq = e
          .select(col("vec_id"), expr("quantize_vec(embedding)").as("v"))
          .select(col("vec_id"), explode(array(subSlices: _*)).as("t"))
          .select(col("vec_id"), col("t.sub").as("sub"), col("t.sv").as("sv"))
          .repartition(col("vec_id")) // parallelize the single-split scan
          // vq feeds seed selection, both distance passes and the Lloyd
          // update — pin once (lazy persist: bounded plan, lineage kept)
          .persist()
        val seeds = vq.filter(col("vec_id") < 16)
          .select(col("sub"), col("vec_id").as("cid"), col("sv").as("cv"))
        def distances(cents: DataFrame): DataFrame =
          vq.join(broadcast(cents), Seq("sub"))
            .select(col("vec_id"), col("sub"), col("cid"),
              expr("sqdist_q(sv, cv)").as("dist"))
        def argmin(d: DataFrame): DataFrame = d
          .groupBy(col("vec_id"), col("sub"))
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("sub"), col("m.cid").as("cid"))
        // one exact Lloyd update per subspace → the 8×16 codebook
        val c1 = vq.join(argmin(distances(seeds)), Seq("vec_id", "sub"))
          .groupBy(col("sub"), col("cid"))
          .agg(expr("vec_sum_q(sv)").as("ssum"), count(lit(1)).as("cnt"))
          .select(col("sub"), col("cid"),
            expr("transform(ssum, x -> x div cnt)").as("cv"))
          .persist()
        // d2 feeds both the code assignment and the ADC tables — one pass
        val d2 = distances(c1).persist()
        // the PQ index: 8 codes per vector
        val codes = argmin(d2)
        // ADC distance tables for the query set = d2 restricted to queries
        val dtab = d2.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("sub"), col("cid"), col("dist"))
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("adist_q"), col("c_id"))
        codes.join(broadcast(dtab), Seq("sub", "cid"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("dist")).as("adist_q"))
          .select(col("q_id"), col("vec_id").as("c_id"), col("adist_q"))
          .withColumn("rnk", row_number().over(wTop).cast("long"))
          .filter(col("rnk") <= 3)
          .orderBy("q_id", "rnk")
      },
      oracle = Some(q92Sql)),

    // SQ8 scalar quantization — the OTHER production compression point on
    // the ANN memory/recall curve (the FAISS `SQ8` flat index): each
    // dimension linearly quantizes to ONE BYTE against its corpus
    // min/max, cutting vector memory 4× versus float32 with near-exact
    // recall (unlike PQ's 64×-but-lossy codes — SQ8 is what production
    // stacks use when the index still fits at 1 B/dim). Ranking is
    // ASYMMETRIC: the query keeps its exact 1e6-grid values and scans
    // candidates' DEQUANTIZED values, so the only error is the
    // candidate-side rounding. All arithmetic is BIGINT on the 1e6 grid
    // (code = ((v−mn)·255) div span with span = mx−mn ≥ 0, dequant =
    // mn + (code·span) div 255; d² ≤ 64·2⁴² = 2⁴⁸) — codes and ranking
    // are bit-identical cross-engine, so the oracle proves the
    // train(min/max)→encode→dequant→rank chain end to end. Every operand
    // here is nonnegative, so Spark's truncating `div` and DuckDB's
    // flooring `//` agree. Plan at 100 TB: the per-dim range table is 64
    // rows (broadcast); encoding is one map pass over the corpus; queries
    // broadcast (|Q|×dims rows) onto the code scan and collapse map-side
    // into (q_id, c_id) sums — the corpus never reshuffles and nothing
    // is O(n²).
    "q159_ann_sq8" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        // r15 OPT (guide §2.3/§1.2): ARRAY formulation — see q88. The
        // trainer's per-dimension ranges are ONE vec_min_q/vec_max_q
        // aggregate (64-long buffers) instead of a 64-row-per-vector
        // explode + per-pos groupBy; encode+dequant is one codegen'd
        // sq8_dec pass (bit-equal to the per-pos CASE/div chain — all
        // operands nonnegative); each asymmetric distance is one sqdist_q
        // loop replacing the join-on-pos + groupBy-sum (order-independent
        // BIGINT sum ⇒ identical values). Oracle re-proven bit-exact.
        val vq = e
          .select(col("vec_id"), expr("quantize_vec(embedding)").as("v"))
          .repartition(col("vec_id")) // parallelize the single-split scan
          // feeds the range trainer, the code scan and the query set —
          // pin once (lazy persist: O(vectors) array rows)
          .persist()
        val rng = vq.agg(
          expr("vec_min_q(v)").as("mn"), expr("vec_max_q(v)").as("mx"))
        val codes = vq.crossJoin(broadcast(rng))
          .select(col("vec_id").as("c_id"), expr("sq8_dec(v, mn, mx)").as("dec"))
        val qs = vq.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("adist_q"), col("c_id"))
        codes.crossJoin(broadcast(qs))
          .filter(col("c_id") =!= col("q_id"))
          .select(col("q_id"), col("c_id"),
            expr("sqdist_q(qv, dec)").as("adist_q"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("q_id", "c_id", "adist_q", "rnk")
          .orderBy("q_id", "rnk")
      },
      oracle = Some(q159Sql)),

    // Hard-negative mining for contrastive training (the DPR/SimCSE
    // in-batch-negatives upgrade, Karpukhin et al. EMNLP'20 §3.2: the
    // best negatives are the CLOSEST non-relevant items): for each anchor,
    // the top-3 same-IVF-cell vectors by cosine that are NOT among its
    // exact top-3 true neighbors. Reuses the q18/q104 index relations —
    // the cell is precisely the "looks similar but isn't" candidate pool,
    // so mining cost is cell-sized, not corpus-sized. Exactness: cosine
    // on the 1e9-quantized dot grid (q16's discipline), anti-join against
    // the exact top-3, deterministic (cosim DESC, c_id) ranking. Plan at
    // 100 TB: centroids broadcast for assignment, anchors probe ONLY
    // their own cell's members (an equi-join on cent_id), the true-
    // neighbor anti-join is 3-rows-per-anchor — no stage touches the
    // corpus beyond the index build it shares with every other ANN query.
    "q170_hard_negatives" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        val n = norms(e)
        val (_, assign0) = ivfBuild(e, n)
        // r14 OPT: the assignment feeds both the anchor set and the
        // candidate pool — pin it so the crossjoin+window runs once
        val assign = assign0.localCheckpoint()
        val anchors = assign.filter(col("member_id") < 10)
          .select(col("member_id").as("q_id"), col("cent_id"))
        val cand = anchors.join(assign, Seq("cent_id"))
          .filter(col("member_id") =!= col("q_id"))
          .select(col("q_id"), col("member_id").as("c_id"))
        val scored = cand
          .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qe")),
            Seq("q_id"))
          .join(e.select(col("vec_id").as("c_id"), col("embedding").as("ce")),
            Seq("c_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("q_id", "n2q"), Seq("q_id"))
          .join(n.toDF("c_id", "n2c"), Seq("c_id"))
          .withColumn("cosim", cosim(col("dot"), col("n2q"), col("n2c")))
          .select("q_id", "c_id", "cosim")
        val positives = queries("q16_ann_topk").fn(s, dir)
          .filter(col("rnk") <= 3).select("q_id", "c_id")
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cosim").desc, col("c_id"))
        scored.join(positives, Seq("q_id", "c_id"), "left_anti")
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("q_id", "c_id", "cosim", "rnk")
          .orderBy("q_id", "rnk")
      },
      oracle = Some(
        s"""WITH $normsSql,
           |cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
           |          WHERE vec_id % 50 = 0),
           |assign0 AS (
           |  SELECT vec_id, cent_id, $dotSqlExpr AS dot
           |  FROM (SELECT v.vec_id, c.cent_id, v.embedding AS qe, c.ce,
           |          generate_subscripts(v.embedding, 1) AS i
           |        FROM embeddings v CROSS JOIN cents c)
           |  GROUP BY 1, 2),
           |assign1 AS (
           |  SELECT assign0.vec_id, assign0.cent_id,
           |    CAST(dot AS DOUBLE) / sqrt(CAST(nv.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
           |  FROM assign0
           |  JOIN norms nv ON nv.vec_id = assign0.vec_id
           |  JOIN norms nc ON nc.vec_id = assign0.cent_id),
           |assign AS (
           |  SELECT vec_id AS member_id, cent_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY cosim DESC, cent_id) AS rnk FROM assign1)
           |  WHERE rnk = 1),
           |anchors AS (SELECT member_id AS q_id, cent_id FROM assign
           |  WHERE member_id < 10),
           |cand AS (
           |  SELECT an.q_id, a.member_id AS c_id
           |  FROM anchors an JOIN assign a ON a.cent_id = an.cent_id
           |  WHERE a.member_id <> an.q_id),
           |cdots AS (
           |  SELECT q_id, c_id, $dotSqlExpr AS dot
           |  FROM (SELECT cand.q_id, cand.c_id,
           |          q.embedding AS qe, c.embedding AS ce,
           |          generate_subscripts(q.embedding, 1) AS i
           |        FROM cand
           |        JOIN embeddings q ON q.vec_id = cand.q_id
           |        JOIN embeddings c ON c.vec_id = cand.c_id)
           |  GROUP BY 1, 2),
           |ccos AS (
           |  SELECT q_id, c_id,
           |    CAST(dot AS DOUBLE) / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosim
           |  FROM cdots
           |  JOIN norms nq ON nq.vec_id = q_id
           |  JOIN norms nc ON nc.vec_id = c_id),
           |exact3 AS (SELECT q_id, c_id FROM ($q16Sql) x WHERE rnk <= 3),
           |negs AS (
           |  SELECT c.q_id, c.c_id, c.cosim
           |  FROM ccos c ANTI JOIN exact3 e USING (q_id, c_id))
           |SELECT q_id, c_id, cosim, rnk FROM (
           |  SELECT q_id, c_id, cosim,
           |    CAST(row_number() OVER (PARTITION BY q_id
           |      ORDER BY cosim DESC, c_id) AS BIGINT) AS rnk
           |  FROM negs) WHERE rnk <= 3
           |ORDER BY q_id, rnk""".stripMargin)),

    // Bitext mining — the margin-based mutual-nearest-neighbor criterion
    // (Artetxe & Schwenk ACL'19 §3, the LASER/CCMatrix parallel-corpus
    // miner): two "language" sides (even vec_ids = source batch, odd =
    // target corpus) pair up when each is the other's best match by
    // MARGIN — cosine penalized by how similar each side is to its other
    // near neighbors (absolute-margin variant: cos − (avgNN_k(a) +
    // avgNN_k(b))/2, k=4), which kills hubness false positives that raw
    // cosine mutual-NN admits. Exactness: cos quantizes to floor(1e9·cos)
    // BIGINT (the q45 verification grid), so top-4 sums are
    // order-independent integers and the ×8-scaled margin m8 = 8·cq −
    // Σtop4(a) − Σtop4(b) is exact — ranking and mutuality are
    // bit-identical cross-engine. Plan at 100 TB: the source BATCH
    // broadcasts onto one target-corpus scan (the q98 asymmetric-probe
    // shape — production mines source chunks against an IVF-routed
    // candidate set instead of the full scan; the margin/mutuality logic
    // is unchanged); both ranking windows key on (a_id)/(b_id), never a
    // single partition.
    "q163_bitext_mine" -> QueryDef(
      fn = { (s, dir) =>
        val e = emb(s, dir)
        val n = norms(e)
        val a = e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 80)
          .select(col("vec_id").as("a_id"), col("embedding").as("qe"))
        val b = e.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("b_id"), col("embedding").as("ce"))
        val cq = b.crossJoin(broadcast(a))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("a_id", "n2a"), Seq("a_id"))
          .join(n.toDF("b_id", "n2b"), Seq("b_id"))
          .withColumn("cq",
            floor(cosim(col("dot"), col("n2a"), col("n2b")) * lit(1.0e9))
              .cast("long"))
          .select("a_id", "b_id", "cq")
        val wa = Window.partitionBy(col("a_id")).orderBy(col("cq").desc, col("b_id"))
        val wb = Window.partitionBy(col("b_id")).orderBy(col("cq").desc, col("a_id"))
        val ta = cq.withColumn("r", row_number().over(wa)).filter(col("r") <= 4)
          .groupBy(col("a_id")).agg(sum(col("cq")).as("sum_a"))
        val tb = cq.withColumn("r", row_number().over(wb)).filter(col("r") <= 4)
          .groupBy(col("b_id")).agg(sum(col("cq")).as("sum_b"))
        val m = cq.join(broadcast(ta), Seq("a_id")).join(tb, Seq("b_id"))
          .withColumn("m8", lit(8) * col("cq") - col("sum_a") - col("sum_b"))
        val ra = Window.partitionBy(col("a_id")).orderBy(col("m8").desc, col("b_id"))
        val rb = Window.partitionBy(col("b_id")).orderBy(col("m8").desc, col("a_id"))
        m.withColumn("ra", row_number().over(ra))
          .withColumn("rb", row_number().over(rb))
          .filter(col("ra") === 1 && col("rb") === 1)
          .select(col("a_id"), col("b_id"), col("cq").as("cos_q"),
            col("m8").as("margin_q"))
          .orderBy("a_id")
      },
      oracle = Some(
        s"""WITH $normsSql,
           |dots AS (
           |  SELECT a_id, b_id, $dotSqlExpr AS dot
           |  FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |          a.embedding AS qe, b.embedding AS ce,
           |          generate_subscripts(a.embedding, 1) AS i
           |        FROM embeddings a JOIN embeddings b
           |          ON a.vec_id % 2 = 0 AND a.vec_id < 80 AND b.vec_id % 2 = 1)
           |  GROUP BY 1, 2),
           |cq AS (
           |  SELECT a_id, b_id,
           |    CAST(floor(1000000000.0 * (CAST(dot AS DOUBLE)
           |      / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))))
           |      AS BIGINT) AS cq
           |  FROM dots
           |  JOIN norms na ON na.vec_id = a_id
           |  JOIN norms nb ON nb.vec_id = b_id),
           |ta AS (SELECT a_id, CAST(sum(cq) AS BIGINT) AS sum_a FROM (
           |    SELECT a_id, cq, row_number() OVER (PARTITION BY a_id
           |      ORDER BY cq DESC, b_id) AS r FROM cq)
           |  WHERE r <= 4 GROUP BY 1),
           |tb AS (SELECT b_id, CAST(sum(cq) AS BIGINT) AS sum_b FROM (
           |    SELECT b_id, cq, row_number() OVER (PARTITION BY b_id
           |      ORDER BY cq DESC, a_id) AS r FROM cq)
           |  WHERE r <= 4 GROUP BY 1),
           |m AS (SELECT c.a_id, c.b_id, c.cq,
           |    8 * c.cq - ta.sum_a - tb.sum_b AS m8
           |  FROM cq c JOIN ta USING (a_id) JOIN tb USING (b_id)),
           |r AS (SELECT a_id, b_id, cq, m8,
           |    row_number() OVER (PARTITION BY a_id ORDER BY m8 DESC, b_id) AS ra,
           |    row_number() OVER (PARTITION BY b_id ORDER BY m8 DESC, a_id) AS rb
           |  FROM m)
           |SELECT a_id, b_id, cq AS cos_q, m8 AS margin_q
           |FROM r WHERE ra = 1 AND rb = 1 ORDER BY a_id""".stripMargin)),

    // nDCG@10 for the SQ8 index — the position-discounted ranking-quality
    // metric (Järvelin & Kekäläinen TOIS'02), completing the eval suite
    // next to recall@k (q46) and MRR (q120): graded gains (11 − exact
    // cosine rank, 0 outside the exact top-10) discounted by 1/log2(i+1).
    // The logarithm rides the SAME Q20 fixed-point log2 as q158
    // ([[Corpus.fixedLog2Long]]): the ten discount weights W(i) =
    // 2⁴⁰ div L(i+1) are computed ONCE driver-side and inlined as
    // literals into BOTH the Spark plan and the oracle SQL (the q35
    // hyperplane-literal pattern), so DCG sums and the final ×1e6 nDCG
    // ratio are exact BIGINTs — the eval metric itself is value-proven
    // cross-engine, not just the ranking under it. Plan at 100 TB: the
    // exact pass is the q16 broadcast-probe scan, the system pass is
    // q159's code scan; the metric itself joins two 10-row-per-query
    // sets against a 10-row broadcast weight table — free.
    "q164_ndcg_sq8" -> QueryDef(
      fn = { (s, dir) =>
        val weights = (1 to 10).map(i =>
          i.toLong -> ((1L << 40) / graft.operators.Corpus.fixedLog2Long(i + 1L)))
        val idcg = weights.map { case (i, w) => (11L - i) * w }.sum
        val e = emb(s, dir)
        val n = norms(e)
        // exact cosine top-10 (the q16 shape) → graded gains
        val qsE = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val csE = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
        val wEx = Window.partitionBy(col("q_id")).orderBy(col("cq").desc, col("c_id"))
        val gains = csE.join(broadcast(qsE), col("c_id") =!= col("q_id"))
          .withColumn("dot", dotDec("qe", "ce"))
          .join(n.toDF("q_id", "n2q"), Seq("q_id"))
          .join(n.toDF("c_id", "n2c"), Seq("c_id"))
          .withColumn("cq",
            floor(cosim(col("dot"), col("n2q"), col("n2c")) * lit(1.0e9))
              .cast("long"))
          .withColumn("er", row_number().over(wEx))
          .filter(col("er") <= 10)
          .select(col("q_id"), col("c_id"), (lit(11L) - col("er")).as("gain"))
        // the system under eval: q159's SQ8 pipeline, top-10
        // r15 OPT (guide §2.3/§1.2): ARRAY formulation — see q159.
        val vq = e
          .select(col("vec_id"), expr("quantize_vec(embedding)").as("v"))
          .repartition(col("vec_id"))
          .persist()
        val rng = vq.agg(
          expr("vec_min_q(v)").as("mn"), expr("vec_max_q(v)").as("mx"))
        val codes = vq.crossJoin(broadcast(rng))
          .select(col("vec_id").as("c_id"), expr("sq8_dec(v, mn, mx)").as("dec"))
        val qsS = vq.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val wSys = Window.partitionBy(col("q_id"))
          .orderBy(col("adist_q"), col("c_id"))
        val sys = codes.crossJoin(broadcast(qsS))
          .filter(col("c_id") =!= col("q_id"))
          .select(col("q_id"), col("c_id"),
            expr("sqdist_q(qv, dec)").as("adist_q"))
          .withColumn("rnk", row_number().over(wSys).cast("long"))
          .filter(col("rnk") <= 10)
          .select("q_id", "c_id", "rnk")
        import s.implicits._
        val wdf = weights.toDF("rnk", "wgt")
        sys.join(gains, Seq("q_id", "c_id"), "left")
          .na.fill(0L, Seq("gain"))
          .join(broadcast(wdf), Seq("rnk"))
          .groupBy(col("q_id"))
          .agg(sum(col("gain") * col("wgt")).as("dcg_q"))
          .withColumn("idcg_q", lit(idcg))
          .withColumn("ndcg_micro", expr("dcg_q * 1000000 div idcg_q"))
          .orderBy("q_id")
      },
      oracle = Some {
        val weights = (1 to 10).map(i =>
          i.toLong -> ((1L << 40) / graft.operators.Corpus.fixedLog2Long(i + 1L)))
        val idcg = weights.map { case (i, w) => (11L - i) * w }.sum
        val wVals = weights.map { case (i, w) => s"($i, $w)" }.mkString(", ")
        s"""WITH $normsSql,
           |dots AS (
           |  SELECT q_id, c_id, $dotSqlExpr AS dot
           |  FROM (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           |          q.embedding AS qe, c.embedding AS ce,
           |          generate_subscripts(q.embedding, 1) AS i
           |        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           |        WHERE q.vec_id < 10)
           |  GROUP BY 1, 2),
           |gains AS (
           |  SELECT q_id, c_id, CAST(11 - er AS BIGINT) AS gain FROM (
           |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |        ORDER BY cqx DESC, c_id) AS er FROM (
           |      SELECT q_id, c_id,
           |        CAST(floor(1000000000.0 * (CAST(dot AS DOUBLE)
           |          / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE))))
           |          AS BIGINT) AS cqx
           |      FROM dots
           |      JOIN norms nq ON nq.vec_id = q_id
           |      JOIN norms nc ON nc.vec_id = c_id))
           |  WHERE er <= 10),
           |sq AS (
           |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
           |    CAST(floor(CAST(e[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
           |  FROM (SELECT vec_id, embedding AS e,
           |        generate_subscripts(embedding, 1) AS i FROM embeddings)),
           |rng AS (SELECT pos, min(vq) AS mn, max(vq) AS mx,
           |    max(vq) - min(vq) AS span FROM sq GROUP BY 1),
           |codes AS (
           |  SELECT v.vec_id AS c_id, v.pos,
           |    r.mn + ((CASE WHEN r.span = 0 THEN 0
           |      ELSE ((v.vq - r.mn) * 255) // r.span END) * r.span) // 255 AS dec
           |  FROM sq v JOIN rng r USING (pos)),
           |qss AS (SELECT vec_id AS q_id, pos, vq AS qv FROM sq WHERE vec_id < 10),
           |sys AS (
           |  SELECT q_id, c_id, rnk FROM (
           |    SELECT q_id, c_id,
           |      CAST(row_number() OVER (PARTITION BY q_id
           |        ORDER BY adist_q, c_id) AS BIGINT) AS rnk
           |    FROM (SELECT q.q_id, c.c_id,
           |        CAST(sum((q.qv - c.dec) * (q.qv - c.dec)) AS BIGINT) AS adist_q
           |      FROM codes c JOIN qss q USING (pos)
           |      WHERE c.c_id <> q.q_id GROUP BY 1, 2))
           |  WHERE rnk <= 10),
           |w AS (SELECT * FROM (VALUES $wVals) AS t(rnk, wgt))
           |SELECT s.q_id,
           |  CAST(sum(COALESCE(g.gain, 0) * w.wgt) AS BIGINT) AS dcg_q,
           |  CAST($idcg AS BIGINT) AS idcg_q,
           |  CAST(sum(COALESCE(g.gain, 0) * w.wgt) AS BIGINT) * 1000000
           |    // $idcg AS ndcg_micro
           |FROM sys s
           |LEFT JOIN gains g USING (q_id, c_id)
           |JOIN w USING (rnk)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // IVFADC — the complete billion-scale ANN architecture (Jégou et al.
    // TPAMI'11 §IV, the FAISS `IVFPQ` index): q88's LEARNED coarse cells
    // route each vector to its inverted list; the PQ codebooks then train
    // on RESIDUALS (vector − its cell centroid), which carry far less
    // variance than raw vectors, so the same 8×16 code budget quantizes
    // much finer; queries probe 2 cells and rank ONLY those cells'
    // members by ADC — the distance table is built per probed cell from
    // the QUERY's residual against that cell's centroid (the candidate's
    // own reference frame). Multiplies the two scale levers: IVF cuts the
    // scanned fraction to ~probes/cells, PQ cuts bytes-per-scanned-vector
    // 64× — at 100 TB of embeddings the probe touches ~1/5 of a 4 B/vec
    // code index and no raw vectors at all.
    //
    // All arithmetic is BIGINT on the 1e6 grid (residuals ≤ 2²¹ per dim,
    // per-sub dist ≤ 8·2⁴² = 2⁴⁵, ×8 subs ≤ 2⁴⁸): coarse training,
    // residual codebooks, codes, distance tables and the final ranking
    // are bit-identical cross-engine, so the oracle proves the ENTIRE
    // route→residual→train→encode→probe→ADC chain. Plan shape: every
    // centroid/codebook/table side broadcasts; the corpus reshuffles only
    // for its own (vec_id)-keyed aggregations.
    //
    // Recall honesty (q46): ≈ 0.23 here, at PQ's level — on this
    // near-orthogonal corpus the learned cells carry no structure, so
    // residual quantization can't refine what raw PQ misses (see q92's
    // geometry note). On clustered real embeddings residual PQ is
    // PRECISELY where IVFADC beats flat PQ — residual variance shrinks
    // with cell tightness — which is why it's the production index.
    "q94_ann_ivfadc" -> QueryDef(
      fn = { (s, dir) =>
        // r14 OPT (guide §3.3/§7.2): pin every multiply-consumed frame —
        // the lazily-composed pipeline planned to 857 physical operators
        // with 144 scans of the embeddings parquet. All pins are LAZY
        // persist()s (r15: vq's eager localCheckpoint dropped with the
        // array rewrite — the plan is bounded without truncation, lineage
        // survives executor loss, and the sf1 A/B measured 6.6 s persist
        // vs 8.2 s checkpoint). Values are bit-identical: every frame is
        // deterministic BIGINT arithmetic; pinning changes evaluation
        // count, not results (oracle q94 re-proven).
        val e = emb(s, dir)
        // r15 OPT (guide §2.3/§1.2): ARRAY formulation — see q88/q92. The
        // corpus stays (vec_id, array<long>) end to end: coarse distances
        // are full-vector sqdist_q; residuals are one zip_with per vector;
        // the PQ stages work on 8 (vec_id, sub, 8-dim array) rows per
        // vector. Every distance/Lloyd value is the same order-independent
        // BIGINT sum the exploded form computed — oracle q94 re-proven.
        val vq = e
          .select(col("vec_id"), expr("quantize_vec(embedding)").as("v"))
          .repartition(col("vec_id")) // parallelize the single-split scan
          .persist()
        // coarse quantizer: 10 seeds, one exact Lloyd update (q88's cells)
        val cseeds = vq.filter(col("vec_id") < 10)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        def cdist(cents: DataFrame): DataFrame =
          vq.crossJoin(broadcast(cents))
            .select(col("vec_id"), col("cid"),
              expr("sqdist_q(v, cv)").as("dist"))
        def cargmin(d: DataFrame): DataFrame = d
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cid"))
        val cc1 = vq.join(cargmin(cdist(cseeds)), Seq("vec_id"))
          .groupBy(col("cid"))
          .agg(expr("vec_sum_q(v)").as("sv"), count(lit(1)).as("cnt"))
          .select(col("cid"), expr("transform(sv, x -> x div cnt)").as("cv"))
          .persist()
        val cd2 = cdist(cc1).persist()
        val cassign = cargmin(cd2).persist() // each vector's inverted list
        val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
        val probes = cd2.filter(col("vec_id") < 10)
          .withColumn("rn", row_number().over(wProbe))
          .filter(col("rn") <= 2)
          .select(col("vec_id").as("q_id"), col("cid"))
        // residuals w.r.t. each vector's own cell centroid, split into the
        // 8 PQ subspaces (8 dims each)
        val subSlices = (0 until 8).map(sb => struct(
          lit(sb.toLong).as("sub"),
          expr(s"slice(r, ${sb * 8 + 1}, 8)").as("rv")))
        val rvq = vq.join(cassign, Seq("vec_id"))
          .join(broadcast(cc1), Seq("cid"))
          .select(col("vec_id"),
            expr("zip_with(v, cv, (a, b) -> a - b)").as("r"))
          .select(col("vec_id"), explode(array(subSlices: _*)).as("t"))
          .select(col("vec_id"), col("t.sub").as("sub"), col("t.rv").as("rv"))
          .persist()
        // residual PQ codebooks: 16 seeds, one exact Lloyd update per sub
        val pseeds = rvq.filter(col("vec_id") < 16)
          .select(col("sub"), col("vec_id").as("pcid"), col("rv").as("pcv"))
        def pdist(cents: DataFrame): DataFrame =
          rvq.join(broadcast(cents), Seq("sub"))
            .select(col("vec_id"), col("sub"), col("pcid"),
              expr("sqdist_q(rv, pcv)").as("dist"))
        def pargmin(d: DataFrame): DataFrame = d
          .groupBy(col("vec_id"), col("sub"))
          .agg(min(struct(col("dist"), col("pcid"))).as("m"))
          .select(col("vec_id"), col("sub"), col("m.pcid").as("pcid"))
        val pc1 = rvq.join(pargmin(pdist(pseeds)), Seq("vec_id", "sub"))
          .groupBy(col("sub"), col("pcid"))
          .agg(expr("vec_sum_q(rv)").as("rsum"), count(lit(1)).as("cnt"))
          .select(col("sub"), col("pcid"),
            expr("transform(rsum, x -> x div cnt)").as("pcv"))
          .persist()
        val codes = pargmin(pdist(pc1)) // the inverted-list PQ index
        // per-probed-cell query residuals → ADC distance tables (the
        // query's residual against each probed cell, per subspace)
        val qrSlices = (0 until 8).map(sb => struct(
          lit(sb.toLong).as("sub"),
          expr(s"slice(qr, ${sb * 8 + 1}, 8)").as("qrv")))
        val qrv = vq.filter(col("vec_id") < 10)
          .withColumnRenamed("vec_id", "q_id")
          .join(probes, Seq("q_id"))
          .join(broadcast(cc1), Seq("cid"))
          .select(col("q_id"), col("cid"),
            expr("zip_with(v, cv, (a, b) -> a - b)").as("qr"))
          .select(col("q_id"), col("cid"), explode(array(qrSlices: _*)).as("t"))
          .select(col("q_id"), col("cid"), col("t.sub").as("sub"),
            col("t.qrv").as("qrv"))
        val dtab = qrv.join(broadcast(pc1), Seq("sub"))
          .select(col("q_id"), col("cid"), col("sub"), col("pcid"),
            expr("sqdist_q(qrv, pcv)").as("dist"))
        // ADC over probed-cell members only
        val wTop = Window.partitionBy(col("q_id")).orderBy(col("adist_q"), col("c_id"))
        codes.join(cassign, Seq("vec_id"))
          .join(broadcast(probes), Seq("cid"))
          .filter(col("vec_id") =!= col("q_id"))
          .join(broadcast(dtab), Seq("q_id", "cid", "sub", "pcid"))
          .groupBy(col("q_id"), col("vec_id"), col("cid"))
          .agg(sum(col("dist")).as("adist_q"))
          .select(col("q_id"), col("vec_id").as("c_id"), col("cid"), col("adist_q"))
          .withColumn("rnk", row_number().over(wTop).cast("long"))
          .filter(col("rnk") <= 3)
          .orderBy("q_id", "rnk")
      },
      oracle = Some(q94Sql)),

    // ANN recall report — the missing quality axis of the ANN suite: for
    // each query vector, recall@3 of the IVF path (q18), the sign-LSH
    // path (q35), and the learned-quantizer IVF (q88) against the exact
    // brute-force top-3 (q16 restricted to rnk ≤ 3). At sf0.01 the
    // learned centroids lift mean recall@3 from 0.57 (vec_id % 50
    // heuristic) to 0.93 on the same probe budget semantics — the
    // measured argument for training the coarse quantizer. Everything is deterministic (literal hyperplanes, quantized
    // dots, row_number tie-breaks), so recall itself is oracle-checkable —
    // n_hit/3 in IEEE double is identical in both engines. At 100 TB this
    // is the nightly ANN-quality job: exact truth on a sampled query set,
    // approximate paths over the full corpus, one small join + ratio.
    "q46_ann_recall" -> QueryDef(
      fn = { (s, dir) =>
        import s.implicits._
        // exact3 feeds BOTH `hits` and `universe`, so without pinning, the
        // q16 brute-force pipeline would execute twice per action. An eager
        // localCheckpoint of its ≤ 50×3-row output runs it once.
        //
        // r14 OPT (guide §2.6 overlap independent jobs): q88/q92/q94 now
        // stage their trainings through eager internal checkpoints, so
        // composing the seven pipelines inline would run those jobs
        // SERIALLY at construction time (measured 2.4 s → 6.0 s when the
        // checkpoints landed). Constructing each pipeline on its own
        // driver thread overlaps their independent jobs across the
        // executor cores again — same frames, same union, same result.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(7)
        // shutdown in finally: a timed-out Await would otherwise leak 7
        // non-daemon threads per invocation
        val (exact3, approx) = try {
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          def built(q: String): scala.concurrent.Future[DataFrame] =
            scala.concurrent.Future(queries(q).fn(s, dir))
          val fExact = built("q16_ann_topk")
          val fApprox = Seq(
            "q18_ann_ivf" -> "ivf", "q35_ann_lsh" -> "lsh",
            "q88_ann_ivf_learned" -> "ivf_kmeans", "q92_ann_pq" -> "pq",
            "q94_ann_ivfadc" -> "ivfadc", "q159_ann_sq8" -> "sq8")
            .map { case (q, m) => built(q).map(df =>
              df.select("q_id", "c_id").withColumn("method", lit(m))) }
          import scala.concurrent.duration._
          val e3 = scala.concurrent.Await
            .result(fExact, 600.seconds)
            .filter(col("rnk") <= 3).select("q_id", "c_id").localCheckpoint()
          val ap = scala.concurrent.Await
            .result(scala.concurrent.Future.sequence(fApprox), 600.seconds)
            .reduce(_ unionByName _)
          (e3, ap)
        } finally pool.shutdown()
        val hits = approx.join(exact3, Seq("q_id", "c_id"))
          .groupBy("method", "q_id").agg(count(lit(1)).as("n_hit"))
        // left join from the full (method × query) grid so a 0-hit query
        // still reports recall 0 instead of vanishing
        val universe = exact3.select("q_id").distinct()
          .crossJoin(broadcast(
            Seq("ivf", "lsh", "ivf_kmeans", "pq", "ivfadc", "sq8")
              .toDF("method")))
        universe.join(hits, Seq("method", "q_id"), "left")
          .select(col("method"), col("q_id"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)).cast("double") / 3.0).as("recall3"))
          .orderBy("method", "q_id")
      },
      oracle = Some(
        s"""WITH exact3 AS (
           |  SELECT q_id, c_id FROM ($q16Sql) x WHERE rnk <= 3),
           |ivf AS (SELECT q_id, c_id FROM ($q18Sql) x),
           |lshq AS (SELECT q_id, c_id FROM ($q35Sql) x),
           |ivfk AS (SELECT q_id, c_id FROM ($q88Sql) x),
           |pq AS (SELECT q_id, c_id FROM ($q92Sql) x),
           |ivfadc AS (SELECT q_id, c_id FROM ($q94Sql) x),
           |sq8 AS (SELECT q_id, c_id FROM ($q159Sql) x),
           |approx AS (
           |  SELECT 'ivf' AS method, q_id, c_id FROM ivf
           |  UNION ALL
           |  SELECT 'lsh' AS method, q_id, c_id FROM lshq
           |  UNION ALL
           |  SELECT 'ivf_kmeans' AS method, q_id, c_id FROM ivfk
           |  UNION ALL
           |  SELECT 'pq' AS method, q_id, c_id FROM pq
           |  UNION ALL
           |  SELECT 'ivfadc' AS method, q_id, c_id FROM ivfadc
           |  UNION ALL
           |  SELECT 'sq8' AS method, q_id, c_id FROM sq8),
           |hits AS (
           |  SELECT a.method, a.q_id, count(*) AS n_hit
           |  FROM approx a JOIN exact3 e ON e.q_id = a.q_id AND e.c_id = a.c_id
           |  GROUP BY 1, 2),
           |universe AS (
           |  SELECT m.method, q.q_id
           |  FROM (SELECT DISTINCT q_id FROM exact3) q
           |  CROSS JOIN (VALUES ('ivf'), ('lsh'), ('ivf_kmeans'), ('pq'), ('ivfadc'), ('sq8')) m(method))
           |SELECT u.method, u.q_id,
           |  coalesce(h.n_hit, 0) AS n_hit,
           |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 3.0 AS recall3
           |FROM universe u
           |LEFT JOIN hits h ON h.method = u.method AND h.q_id = u.q_id
           |ORDER BY 1, 2""".stripMargin)),
  )
}
