package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.CommitLog

/** Persisted inverted text index: the retrieval-serving layer of a corpus
  * pipeline. The corpus is scanned ONCE to build posting-list tables —
  * shingle-level `(doc_id, sh)` postings + per-doc sizes for Jaccard
  * retrieval, token-level `(doc_id, term, tf)` postings + doc lengths for
  * BM25 — persisted as CommitLog tables, so an index release inherits
  * ACID commits, time travel, and exactly-once maintenance for free
  * (an index version ≡ a table version, the q104/q105 discipline).
  *
  * Why this is the 100 TB shape: q98/q49 recompute shingles/token stats
  * from the raw corpus on EVERY query — correct, but each search pays a
  * full corpus scan + explode. Through the index, a query touches only
  * posting lists (equi-join on the shingle/term key) and KB-scale global
  * stats; the corpus text column is never read at query time. Because
  * postings are per-doc independent, maintenance is an APPEND of the
  * delta batch's postings — O(delta) work, one commit, atomically visible
  * — and the updated index is row-for-row identical to a full rebuild,
  * which is exactly what q135/q136 prove by reusing q98/q49's oracles
  * verbatim: index-served results must hash-match corpus-recomputed ones.
  *
  * Reference scope: the reference serves all retrieval through Trino SQL
  * over Postgres tables (`trino/conf/trino/catalog/my_catalog.properties:
  * 1-4`) — materialized search-side tables are the same idea made
  * incremental and ACID.
  */
object TextIndex {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ------------------------------------------------------------------
  // Index builders (one corpus pass each)
  // ------------------------------------------------------------------

  /** Shingle-level index for Jaccard retrieval: DISTINCT 3-gram postings
    * `(doc_id, sh)` + per-doc distinct-shingle counts `(doc_id, sz)`.
    * Sizes fold from the postings themselves (one two-phase agg), so the
    * two tables can never disagree.
    */
  def shingleIndex(d: DataFrame): (DataFrame, DataFrame) = {
    // r14 OPT (guide §3.3): both returned frames are consumed by separate
    // append commits — pin the postings so the shingle explode runs once
    // per release instead of once per table
    val postings = Dedup.shingles(d).localCheckpoint()
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    (postings, sizes)
  }

  /** Token-level index for BM25: per-(doc, term) term frequencies +
    * per-doc lengths. `dl` folds from the SAME token stream as the
    * postings (sum of tfs per doc ≡ token count), so length stats and
    * postings stay consistent by construction.
    */
  def tokenIndex(d: DataFrame): (DataFrame, DataFrame) = {
    // same pinning rationale as [[shingleIndex]]
    val toks = d.select(col("doc_id"), explode(Text.toksCol).as("term"))
    val postings = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val doclen = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    (postings, doclen)
  }

  // ------------------------------------------------------------------
  // Serving (index tables only — the corpus is never read here)
  // ------------------------------------------------------------------

  /** Jaccard top-k through the index: query docs' posting lists probe the
    * corpus postings on the shingle key (equi-join — candidate volume is
    * Σ df(sh) over query shingles, never corpus²), intersection counts
    * aggregate map-side, and sizes join back for the Jaccard denominator.
    * Deterministic rank order (jaccard DESC, c_id). Mirrors q98's plan
    * exactly — reading tables instead of recomputing the corpus.
    */
  def jaccardTopK(postings: DataFrame, sizes: DataFrame,
      isQueryDoc: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val inter = postings.filter(isQueryDoc).toDF("q_id", "sh")
      .join(postings.toDF("c_id", "sh"), Seq("sh"))
      .filter(col("c_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(broadcast(sizes.filter(isQueryDoc).toDF("q_id", "sz_q")),
        Seq("q_id"))
      .join(sizes.toDF("c_id", "sz_c"), Seq("c_id"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_q") + col("sz_c") - col("inter")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("jaccard").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "inter", "jaccard")
      .orderBy("q_id", "rank")
  }

  /** BM25 scoring through the index, arithmetic-identical to q49's
    * corpus recompute: global stats (N, Σdl from `doclen`; per-term df
    * from the postings — all BIGINTs) collapse to ONE broadcast row;
    * every doc left-joins its per-term tf (absent term ⇒ tf 0 ⇒ the term
    * contributes exactly +0.0, so index-served doubles are bit-identical
    * to the recompute). Rational idf core — no ln(), the q49 contract.
    * Scale shape: the only per-doc work is |terms| broadcast-joined tf
    * lookups + expression math; the heavy posting table is touched only
    * filtered to the query terms (df(term) rows).
    */
  def bm25Serve(postings: DataFrame, doclen: DataFrame,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val global = doclen.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    // one guaranteed single-row aggregate for ALL dfs (a term absent from
    // the corpus must yield df = 0, not an empty frame)
    val dfs = postings.filter(col("term").isin(terms: _*))
      .agg(count(lit(1)).as("_probe"), terms.map(t =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df_$t")): _*)
      .select(terms.map(t =>
        coalesce(col(s"df_$t"), lit(0L)).as(s"df_$t")): _*)
    val scored = terms.foldLeft(
      doclen.crossJoin(broadcast(global)).crossJoin(broadcast(dfs))
        .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))) {
      case (acc, t) =>
        acc.join(broadcast(postings.filter(col("term") === t)
          .select(col("doc_id"), col("tf").as(s"tf_$t"))), Seq("doc_id"), "left")
    }
    val score = terms.map { t =>
      val tf = coalesce(col(s"tf_$t").cast("double"), lit(0.0))
      val idf = (col("n_docs") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / col("avgdl"))))
    }.reduce(_ + _)
    scored.select(col("doc_id"), col("dl"), score.as("bm25"))
      .orderBy("doc_id")
  }

  /** `foreachBatch` body maintaining the shingle-index PAIR from a
    * document stream, exactly-once: each micro-batch's postings + sizes
    * commit as ONE multi-table transaction
    * ([[CommitLog.multiAppendTxn]]), so the watermark advances atomically
    * with both tables — a replayed batch is a no-op, and no reader ever
    * joins a batch's postings against pre-batch sizes. The streaming twin
    * of q135's nightly build: per-trigger cost is O(batch), the index
    * tables ARE the state (no state store), and index versions stay
    * time-travelable releases.
    */
  def shingleIndexSink(indexRoot: String,
      appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val (p, z) = shingleIndex(batch)
      CommitLog.multiAppendTxn(Seq(
        p -> s"$indexRoot/postings", z -> s"$indexRoot/sizes"),
        s"$indexRoot/txn", appId, batchId)
      ()
    }

  // ------------------------------------------------------------------
  // Oracle-gated exposures
  // ------------------------------------------------------------------

  val queries: Map[String, QueryDef] = Map(

    // Index-served lexical retrieval ≡ corpus recompute: the corpus
    // splits into an initial release (doc_id % 7 ≠ 3) and a later delta
    // batch; the initial release's shingle index is built + persisted,
    // the delta's postings/sizes APPEND in one commit each (maintenance
    // is O(delta): per-doc postings are independent, so the updated
    // index is row-for-row the full rebuild's), and q98's query workload
    // runs entirely against the READ-BACK tables. Same oracle as q98 —
    // a green hash proves build + incremental update + serve lose
    // nothing vs recomputing the corpus per query. At 100 TB: searches
    // stop paying corpus scans (posting equi-joins only), nightly ingest
    // pays O(batch) index appends, and index releases version/time-travel
    // like any table.
    "q135_lexical_index" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q135-lexidx").toString
        val deltaCond = col("doc_id") % 7 === 3
        val (p0, z0) = shingleIndex(d.filter(!deltaCond))
        CommitLog.append(p0, s"$root/postings")
        CommitLog.append(z0, s"$root/sizes")
        val (pd, zd) = shingleIndex(d.filter(deltaCond))
        CommitLog.append(pd, s"$root/postings")
        CommitLog.append(zd, s"$root/sizes")
        jaccardTopK(
          CommitLog.read(s, s"$root/postings"),
          CommitLog.read(s, s"$root/sizes"),
          isQueryDoc = col("doc_id") % 97 === 0, k = 3)
      },
      oracle = Dedup.queries("q98_lexical_topk").oracle),

    // Index-served BM25 ≡ corpus recompute (q49's oracle verbatim): the
    // token index (postings + doc lengths) is persisted from the initial
    // release, the delta batch appends, and scoring reads ONLY the index
    // — global stats fold from `doclen`, per-term df/tf from postings
    // filtered to the query terms, absent terms contribute exactly +0.0.
    // A green hash proves the served doubles are bit-identical to
    // recomputing tf/df/dl from text. At 100 TB the difference is the
    // whole point of an index: scoring touches |terms| posting slices +
    // a 1-row broadcast, never the text column.
    "q136_bm25_index" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q136-bm25idx").toString
        val deltaCond = col("doc_id") % 7 === 3
        val (p0, l0) = tokenIndex(d.filter(!deltaCond))
        CommitLog.append(p0, s"$root/postings")
        CommitLog.append(l0, s"$root/doclen")
        val (pd, ld) = tokenIndex(d.filter(deltaCond))
        CommitLog.append(pd, s"$root/postings")
        CommitLog.append(ld, s"$root/doclen")
        bm25Serve(
          CommitLog.read(s, s"$root/postings"),
          CommitLog.read(s, s"$root/doclen"),
          terms = Seq("spark", "table", "query"))
      },
      oracle = TextAnalysis.queries("q49_bm25").oracle),

    // The index PAIR committed atomically: q135's postings+sizes releases
    // go through CommitLog.multiAppend — each release (initial, delta) is
    // ONE cross-table transaction, so no reader can ever join new
    // postings against old sizes (the inconsistency window two
    // independent appends leave). The serving plan is unchanged and the
    // oracle is q98's verbatim: a green hash proves the transactional
    // path commits exactly what the two-append path commits — plus the
    // consistentSnapshot pin proves the cut the query reads is a
    // transaction boundary. At 100 TB the prepare phase streams index
    // shards at cluster width; the atomic visibility point stays one
    // KB-scale marker write.
    "q137_txn_index_pair" -> QueryDef(
      fn = { (s, dir) =>
        val d = docs(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft-q137-txnidx").toString
        val deltaCond = col("doc_id") % 7 === 3
        val (p0, z0) = shingleIndex(d.filter(!deltaCond))
        CommitLog.multiAppend(Seq(
          p0 -> s"$root/postings", z0 -> s"$root/sizes"), s"$root/txn")
        val (pd, zd) = shingleIndex(d.filter(deltaCond))
        CommitLog.multiAppend(Seq(
          pd -> s"$root/postings", zd -> s"$root/sizes"), s"$root/txn")
        val cut = CommitLog.consistentSnapshot(
          Seq(s"$root/postings", s"$root/sizes"))
        jaccardTopK(
          CommitLog.read(s, s"$root/postings",
            version = Some(cut(s"$root/postings"))),
          CommitLog.read(s, s"$root/sizes",
            version = Some(cut(s"$root/sizes"))),
          isQueryDoc = col("doc_id") % 97 === 0, k = 3)
      },
      oracle = Dedup.queries("q98_lexical_topk").oracle))
}
