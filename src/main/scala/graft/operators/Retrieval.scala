package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyword retrieval over a document corpus — the "find the passages that
 * match this query" primitive a training-data pipeline needs for targeted
 * decontamination sweeps, eval-set leakage audits, and corpus debugging
 * ("show me the top documents for 'hash join'").
 *
 * [[bm25TopK]] scores documents with BM25 (k1 = 1.2, b = 0.75) against a
 * SMALL literal query set and returns the top-k documents per query.
 *
 * Scale design (the queries are plan literals, the corpus is the big side):
 *   - Per-document term frequencies for the union of all query terms come
 *     from ONE `graft_marker_hits` pass (exact token-equality counts over
 *     the pinned lower/trim/split tokenizer) — no tokenize-explode of the
 *     corpus, no inverted index build, no shuffle of text.
 *   - Corpus statistics (N, total tokens, per-term document frequencies)
 *     are ONE tiny single-row aggregate, broadcast back with a
 *     broadcast-cross-join. Two linear scans total; at 100 TB both are
 *     map-side-only with a one-row exchange between them.
 *   - Scoring is a per-row scalar expression; the only real shuffle is the
 *     final per-query top-k window, which Spark's WindowGroupLimit prunes
 *     to k rows per map task before the exchange.
 *
 * Determinism (why scores are BIGINT fixed-point, not doubles): with
 * k1 = 6/5 and b = 3/4, the per-term BM25 factor
 * `tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` equals the exact rational
 * `22*T*tf / (10*T*tf + 3*T + 9*dl*N)` (avgdl = T/N cleared from the
 * denominator). The idf `ln((N-df+0.5)/(df+0.5)+1)` is quantized once per
 * term to `round(idf * 1e6)` (BIGINT); each term then contributes
 * `idfQ * 22 * T * tf * 1000 div (10*T*tf + 3*T + 9*dl*N)` — decimal
 * multiply + integral division, exact in any engine — and the per-query
 * sum of BIGINTs is associative, so scores are reproducible bit-for-bit
 * across partitionings and in the DuckDB oracle. Magnitude bound:
 * idfQ*22000*T*tf < 1e38 holds for any realistic corpus (T = 2.5e13
 * tokens at ~100 TB with tf = 1e5 gives ~7e29).
 *
 * A document qualifies for a query when at least one query term occurs in
 * it (tf > 0); ties break on ascending document id.
 */
object Retrieval {

  /**
   * Top-k BM25 retrieval: one row per (query, rank) with the document id
   * and its fixed-point score (1e-9 score units: 1e6 idf quantum × 1e3
   * ratio quantum). `queries` maps a query id to its space-separated
   * terms; terms are matched as whole lower-cased tokens.
   *
   * Output: (qid, rank, id, score_fp), rank 1..k per qid.
   */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Int, String)],
      k: Int): DataFrame = {
    require(queries.nonEmpty, "at least one query is required")
    require(k > 0, "k must be positive")
    // the union of query terms, deduplicated, in first-seen order — the
    // slot layout of the marker_hits array
    val terms: Seq[String] = queries
      .flatMap(_._2.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+"))
      .filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "queries contain no terms")
    val slotOf: Map[String, Int] = terms.zipWithIndex.toMap

    // pass 1 projection: per-doc tf array + doc length (shared by the
    // stats aggregate and the scoring scan)
    val tfd = df.select(
      col(idCol).as("id"),
      graft.functions.graft_marker_hits(col(textCol), terms).as("tfs"),
      TextOps.tokenCount(col(textCol)).cast("long").as("dl"))

    // one-row corpus stats: N, T, df per slot — broadcast back
    val dfCols = terms.indices.map(i =>
      sum(when(col("tfs")(i) > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val statCols = Seq(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_tokens")) ++ dfCols
    val stats = tfd.agg(statCols.head, statCols.tail: _*)
    val scored0 = tfd.crossJoin(broadcast(stats))

    val dec = "decimal(38,0)"
    val n = col("n_docs")
    val t = col("tot_tokens")
    // per-slot quantized idf + fixed-point numerator/denominator columns
    // (named, so the exact `div` integral division is expressible)
    val withParts = terms.indices.foldLeft(scored0) { (d, i) =>
      val tf = col("tfs")(i)
      val idfQ = round(
        log((n - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)) + lit(1.0)) *
          lit(1000000.0)).cast("long")
      d.withColumn(s"__num_$i",
          (idfQ.cast(dec) * lit(22000L).cast(dec) * t.cast(dec) * tf.cast(dec)))
        .withColumn(s"__den_$i",
          (lit(10L).cast(dec) * t.cast(dec) * tf.cast(dec) +
            lit(3L).cast(dec) * t.cast(dec) +
            lit(9L).cast(dec) * col("dl").cast(dec) * n.cast(dec)))
    }
    // per-query (matched, score) from the slot columns; inline-exploded so
    // every query scores in the same single pass over the corpus
    val perQuery = queries.map { case (qid, q) =>
      val slots = q.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
        .filter(_.nonEmpty).distinct.toSeq.map(slotOf)
      val matched = slots.map(i => col("tfs")(i)).reduce(_ + _) > 0
      val score = slots.map { i =>
        when(col("tfs")(i) > 0, expr(s"__num_$i div __den_$i")).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(qid).as("qid"), matched.as("m"), score.as("score_fp"))
    }
    val w = Window.partitionBy("qid").orderBy(col("score_fp").desc, col("id"))
    withParts
      .select(col("id"), inline(array(perQuery: _*)))
      .where(col("m"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("id"),
        col("score_fp"))
  }

  /** Rank discounts 1/log2(r+1) for r = 1..k, frozen on the DRIVER as
   *  plan literals (and shared with the oracle SQL builder): both sides
   *  then combine the SAME doubles in the same order, so nDCG needs no
   *  tolerance — it is bit-identical by construction. */
  def ndcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Left-assoc prefix sums of [[ndcgDiscounts]]: `idealDcg(k)(i-1)` is
   *  the ideal DCG when `i` relevant items exist in the top i ranks. */
  def idealDcg(k: Int): Seq[Double] =
    ndcgDiscounts(k).scanLeft(0.0)(_ + _).tail

  /**
   * Ranking-quality evaluation of nearest-neighbor retrieval against
   * label relevance: for each query vector, rank the corpus by exact
   * cosine (the [[Similarity.bruteForceKnn]] ranking), mark neighbors
   * sharing the query's label as relevant, and score the top `k` with
   * nDCG@k and recall@k — the eval loop that decides whether an
   * embedding model is good enough to mine training pairs with.
   *
   * Determinism: gains are 0/1 longs; each hit contributes a DRIVER-
   * frozen literal discount (see [[ndcgDiscounts]]) and the DCG chain
   * adds them in fixed rank order (adding literal 0.0 for misses is an
   * exact identity), the ideal DCG is a literal prefix-sum lookup, and
   * the final nDCG is one IEEE division — reproducible bit-for-bit.
   * recall@k is integer 1e4 fixed point.
   *
   * `queries` rows must exist in `corpus` (n_rel counts label peers
   * minus the query itself). Output per query:
   * (query_id, n_rel, hits, recall_fp, ndcg) — recall/ndcg NULL when
   * the query's label has no other member.
   *
   * Scale shape: the ranking inherits bruteForceKnn's broadcast-query
   * design (swap in the IVF ranking upstream at 100 TB); everything
   * after it is per-(query,rank) conditional aggregation over nq·k
   * rows plus one label-count broadcast join.
   */
  def labelNdcgAtK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val disc = ndcgDiscounts(k)
    val ideal = idealDcg(k)
    val ranked = Similarity.bruteForceKnn(corpus, queries, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("nl"))
    val qLabels = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("ql"))
    // label class sizes: n_rel = |peers| − 1 (the query itself)
    val classSizes = corpus.groupBy(col(labelCol).as("ql"))
      .agg(count(lit(1)).as("cls_n"))
    val flags = ranked
      .join(broadcast(labels), Seq("neighbor_id"))
      .join(broadcast(qLabels), Seq("query_id"))
      .withColumn("hit", when(col("nl") === col("ql"), 1L).otherwise(0L))
      .groupBy("query_id", "ql")
      .agg(
        coalesce(sum(when(col("rk") === 1, col("hit"))), lit(0L)).as("h1"),
        (2 to k).map(r =>
          coalesce(sum(when(col("rk") === r, col("hit"))), lit(0L)).as(s"h$r")): _*)
    // DCG as an explicit left-assoc chain of literal discounts: misses
    // add literal 0.0 (exact identity), so the fold order is the rank
    // order on both engines
    val dcg = (1 to k).map(r =>
      col(s"h$r").cast("double") * lit(disc(r - 1))).reduce(_ + _)
    flags
      .join(broadcast(classSizes), Seq("ql"))
      .withColumn("n_rel", col("cls_n") - lit(1L))
      .withColumn("hits", (1 to k).map(r => col(s"h$r")).reduce(_ + _))
      .select(col("query_id"), col("n_rel"), col("hits"),
        when(col("n_rel") >= 1L,
          expr("hits * 10000L DIV n_rel")).cast("long").as("recall_fp"),
        when(col("n_rel") >= 1L, dcg / element_at(
          array(ideal.map(lit): _*),
          least(lit(k), col("n_rel")).cast("int"))).as("ndcg"))
  }

  /** RBO fixed-point scale (1e12): depth weights stay exact longs. */
  val RboScale: Long = 1000000000000L

  /** RBO per-depth weight with p = 1/2, in [[RboScale]] fixed point:
   *  `w_d = (1-p)·p^(d-1)/d = RboScale DIV (2^d · d)` — truncated
   *  integer division per term, replayable verbatim in any engine. */
  def rboWeights(depth: Int): Seq[Long] = {
    require(depth >= 1 && depth <= 40,
      s"depth must be in [1, 40] (2^d stays in long), got $depth")
    (1 to depth).map(d => RboScale / ((1L << d) * d))
  }

  /**
   * Rank-biased overlap (Webber et al. 2010) between TWO rankings of
   * the same item space, per group: `RBO = Σ_d (1-p)·p^(d-1)·|A_d ∩
   * B_d|/d` over prefixes of depth 1..`depth`, with persistence
   * p = 1/2 so every weight is an EXACT long ([[rboWeights]]) — the
   * top-weighted "do my two rankers agree where it matters" score that
   * NDCG (needs labels) and Kendall tau (uniform depth weighting)
   * don't give. 1e12 fixed point; identical rankings with >= depth
   * items score Σ w_d·1 = the max attainable prefix mass.
   *
   * Input: one row per (group, item) with the item's 1-based rank
   * under ranker A and ranker B (null/absent = beyond the list). An
   * item in both prefixes from d0 = max(rA, rB) contributes the
   * SUFFIX weight Σ_{d>=d0} w_d — so the whole metric is one
   * element_at on a precomputed suffix array + one hash agg: no
   * per-depth explosion, no window, nothing grows with depth.
   *
   * Output per group: (group..., n_common, rbo_fp).
   */
  def rankBiasedOverlap(
      ranks: DataFrame,
      groupCols: Seq[String],
      rankACol: String,
      rankBCol: String,
      depth: Int): DataFrame = {
    val w = rboWeights(depth)
    // suffix(d) = Σ_{j=d..depth} w_j, 1-indexed
    val suffix = w.scanRight(0L)(_ + _).init
    val d0 = greatest(col(rankACol).cast("long"), col(rankBCol).cast("long"))
    val contrib = when(
      col(rankACol).isNotNull && col(rankBCol).isNotNull && d0 <= depth,
      element_at(array(suffix.map(lit): _*), d0.cast("int")))
    ranks
      .withColumn("__c", contrib)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("__c").isNotNull, 1L).otherwise(0L)).as("n_common"),
        coalesce(sum(col("__c")), lit(0L)).as("rbo_fp"))
  }
}
