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
}
