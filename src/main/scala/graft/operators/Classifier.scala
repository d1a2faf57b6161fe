package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * In-engine training for the hashed bag-of-words linear classifier whose
 * inference step is the native `graft_hashed_bow_score` expression — the
 * fastText/CCNet-style quality-classifier loop (label a seed corpus,
 * train, freeze the weights into a map-only scoring plan) without leaving
 * the engine.
 *
 * Token → slot hashing is EXACTLY `HashedBowScore`'s: the pinned
 * lower/trim/whitespace-split tokenizer ([[TextOps.words]]) and slot
 * `md5_32(token) mod dim` (first 4 md5 bytes, big-endian unsigned) —
 * expressed here with builtin codegen'd expressions (`md5`/`conv`), so a
 * weight vector trained by [[trainHashedBow]] scores identically when
 * frozen into `graft_hashed_bow_score`.
 *
 * Scale design: training is one map-side explode over tokens partially
 * aggregated on 4-byte slot keys — the only shuffle carries at most
 * `dim` rows per partition — then a one-row totals broadcast. The model
 * never exists as distributed state: `dim` log-odds weights collect to
 * the driver (bounded by `dim`, the model-in-plan pattern) and ship back
 * inside the scoring plan.
 */
object Classifier {

  /** `HashedBowScore`'s slot (md5_32 mod dim) via builtin expressions. */
  private def slotExpr(token: Column, dim: Int): Column =
    (conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim).cast("int")

  /**
   * Multinomial Naive-Bayes token statistics per hashed slot:
   * (slot, n_pos, n_neg, pos_total, neg_total, weight) for every slot
   * with at least one training token, where `weight` is the
   * add-`smoothing` log-likelihood ratio
   * `ln((n_pos+s)/(pos_total+s*dim)) - ln((n_neg+s)/(neg_total+s*dim))`.
   * The count columns are exact integers (the cross-engine-checkable
   * part); the weights are their deterministic transform.
   *
   * `labelCol` is cast to boolean: true rows are the positive class
   * (e.g. "looks like the reference corpus"). Null-label or null-text
   * rows are ignored.
   */
  def trainHashedBow(
      df: DataFrame,
      labelCol: String,
      textCol: String,
      dim: Int,
      smoothing: Double = 1.0): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    val counts = df
      .where(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("pos"),
        explode(TextOps.words(col(textCol))).as("w"))
      .groupBy(slotExpr(col("w"), dim).as("slot"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
    val totals = counts.agg(sum("n_pos").as("pos_total"),
      sum("n_neg").as("neg_total"))
    counts.join(broadcast(totals))
      .withColumn("weight",
        log((col("n_pos") + smoothing) / (col("pos_total") + smoothing * dim)) -
          log((col("n_neg") + smoothing) / (col("neg_total") + smoothing * dim)))
  }

  /**
   * Collect a [[trainHashedBow]] result into the dense `dim`-slot weight
   * vector `graft_hashed_bow_score` takes. Slots that saw no training
   * token get the smoothing-only baseline weight. The collect is bounded
   * by `dim` rows — the model-in-plan pattern, not a data collect.
   */
  def fitWeights(trained: DataFrame, dim: Int, smoothing: Double = 1.0): Seq[Double] = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    val rows = trained
      .select(col("slot"), col("weight"), col("pos_total"), col("neg_total"))
      .collect()
    val base =
      if (rows.isEmpty) 0.0
      else {
        val r = rows(0)
        math.log(smoothing / (r.getLong(2) + smoothing * dim)) -
          math.log(smoothing / (r.getLong(3) + smoothing * dim))
      }
    val w = Array.fill(dim)(base)
    rows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    w.toSeq
  }

  /**
   * CCNet-style perplexity quality signal: score every document under an
   * add-one-smoothed BIGRAM language model trained on the corpus itself
   * (or any reference corpus). Output per doc:
   * `(id, n_bigrams, logprob_fp)` where `logprob_fp` is the sum over the
   * document's adjacent-token bigrams of
   * `round(ln((c(w1,w2) + 1) / (c(w1) + V)) * 10^4)` — FIXED-POINT
   * integers, so the sum is exact and order-independent and the driver's
   * DuckDB oracle replays it bit-for-bit (the q47/q118 rounding
   * convention). Unusually-low average log-prob = boilerplate-ish or
   * garbled text; unusually high = templated/repetitive.
   *
   * Scale design: model training is two grouped counts over tokens and
   * bigrams (map-side partial aggregation; keys are the corpus
   * vocabulary, Zipf-bounded), and scoring joins each document bigram
   * against the model on the bigram key — the model never collects
   * anywhere, so reference corpora of any size work. Documents with
   * fewer than two tokens score (0, 0).
   */
  def bigramLmScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      reference: Option[DataFrame] = None): DataFrame = {
    val scoreDocs = df.select(col(idCol).as("id"), TextOps.words(col(textCol)).as("ws"))
    val refDocs = reference match {
      case Some(r) => r.select(TextOps.words(col(textCol)).as("ws"))
      case None => scoreDocs.select("ws")
    }
    val refTokens = refDocs.select(explode(col("ws")).as("w"))
    val unigrams = refTokens.groupBy("w").agg(count(lit(1)).as("cw"))
    val vocab = unigrams.agg(count(lit(1)).as("v"))
    val refBigrams = refDocs.select(explode(TextOps.bigramsOf(col("ws"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
    val docBigrams = scoreDocs
      .select(col("id"), explode(TextOps.bigramsOf(col("ws"))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val scored = docBigrams
      .join(refBigrams, Seq("w1", "w2"), "left")
      .join(unigrams.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab)) // one-row V, the stats-join pattern
      .withColumn("lp_fp",
        round(log((coalesce(col("cb"), lit(0L)) + lit(1.0d)) /
          (coalesce(col("cw"), lit(0L)) + col("v"))) * lit(1e4)).cast("long"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_fp")).as("logprob_fp"))
    scoreDocs.select(col("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob_fp"), lit(0L)).as("logprob_fp"))
  }

  /**
   * Calibration (reliability-diagram) bins for a scored, labeled corpus:
   * per fixed-width score bin `floor(score / binWidth)`, the row count,
   * positive count, and positive rate — the "does score X actually mean
   * quality X" check run before trusting a classifier to gate a corpus.
   *
   * Fixed-width binning (not ntile/quantile binning) on purpose: it is a
   * pure map + groupBy on at most `O(score_range/binWidth)` keys — no
   * global sort, no single-partition window — so the plan is identical
   * at 100 TB. Quantile bin EDGES, when wanted, come from
   * `approx_percentile_ex` in a separate one-row pass.
   *
   * `labelCol` is cast to boolean; null-label or null-score rows are
   * ignored. `pos_rate` is rounded to 9 dp (the suite's cross-engine
   * float convention).
   */
  def calibrationBins(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    df.where(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(floor(col(scoreCol) / lit(binWidth)).cast("long").as("bin"),
        col(labelCol).cast("boolean").as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate", round(col("n_pos").cast("double") / col("n"), 9))
  }

  /**
   * EXACT global 1-based descending rank of `valueCol` (ties broken by
   * ascending `idCol`), computed WITHOUT a single-partition window — the
   * scale trap in the naive `row_number() OVER (ORDER BY v DESC)`, which
   * funnels the whole table through one task. Two-level instead:
   * `approx_partition_bounds` sketches ~`buckets` range boundaries in
   * one pass, every row maps to its bucket with the codegen'd binary
   * search (bucketing is monotone in value, so equal values — the only
   * cross-row rank dependency — always share a bucket), per-bucket
   * counts (<= buckets+1 scalars) prefix-sum on the driver, and the
   * window ranks only WITHIN each bucket. Rank = suffix offset +
   * within-bucket row_number: exact, and every stage is
   * partition-parallel. Sketch error only skews bucket SIZES, never
   * correctness.
   *
   * Null and NaN `valueCol` rows have no defined position in a
   * descending order (the bucket binary-search and the window would
   * disagree on where they land), so they are EXCLUDED from the output
   * — same contract as SQL `rank()` over a `WHERE v IS NOT NULL` scan.
   */
  def globalRankDesc(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      rankCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = df.sparkSession
    val ranked = df.where(col(valueCol).isNotNull &&
      !isnan(col(valueCol).cast("double")))
    val boundsRow = ranked
      .agg(call_function("approx_partition_bounds",
        col(valueCol).cast("double"), lit(buckets)).as("bs"))
      .collect()(0)
    // empty input: the bounds sketch aggregates to NULL
    val bounds = if (boundsRow.isNullAt(0)) Nil else boundsRow.getSeq[Double](0)
    if (bounds.isEmpty) {
      // empty input: no bounds; emit the schema with an empty rank
      return df.withColumn(rankCol, lit(0L)).where(lit(false))
    }
    val bucketed = ranked.withColumn("__graft_rb",
      graft.functions.graft_value_bucket(col(valueCol).cast("double"), bounds))
    val counts = bucketed.groupBy("__graft_rb").agg(count(lit(1)).as("c"))
      .collect().flatMap { r =>
        // defensive: a null bucket (shouldn't occur post-filter) is dropped
        // rather than NPE'ing the driver
        Option(r.getAs[Integer]("__graft_rb")).map(_.intValue -> r.getLong(1))
      }.toMap
    // descending rank: rows in HIGHER buckets (strictly larger values)
    // rank first, so bucket b's offset is the suffix sum above b
    val offsets = counts.map { case (b, _) =>
      b -> counts.collect { case (b2, c) if b2 > b => c }.sum
    }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("__graft_rb", "__graft_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__graft_rb"))
      .orderBy(col(valueCol).cast("double").desc, col(idCol))
    bucketed.join(broadcast(offDf), Seq("__graft_rb"))
      .withColumn(rankCol, col("__graft_off") + row_number().over(w).cast("long"))
      .drop("__graft_rb", "__graft_off")
  }

  /**
   * Reciprocal-rank-fusion ensemble curation: rank the corpus by each
   * signal independently (descending, exact global ranks via
   * [[globalRankDesc]]) and fuse with the integerized RRF score
   * `sum_s round(1e9 / (rrfConst + rank_s))` — rank fusion needs no
   * signal normalization, which is what makes it the robust way to
   * combine incommensurable quality signals (token counts vs classifier
   * scores vs novelty). The fixed-point longs sum exactly in any order,
   * so the score is engine-reproducible. Returns the top `k` rows as
   * (id, rank_<signal>..., rrf_fp), best first. Rows with a null/NaN
   * value in ANY signal are excluded UP FRONT — a row that can't be
   * ranked under one signal has no fusable RRF score, and filtering
   * before any ranking keeps every signal's ranks (and the fused
   * order) invariant to the order of `signalCols`.
   */
  def rrfEnsemble(
      df: DataFrame,
      idCol: String,
      signalCols: Seq[String],
      k: Int,
      rrfConst: Int = 60): DataFrame = {
    require(signalCols.nonEmpty, "need at least one signal column")
    require(k > 0 && rrfConst >= 0, s"bad k=$k / rrfConst=$rrfConst")
    // each signal's ranking makes two passes (bounds sketch + counts) —
    // cache the signal projection once instead of recomputing it
    // 2×|signals| times (text-derived signals re-tokenize otherwise);
    // per-query working state, reclaimed by the harness's cache clear
    val rankable = signalCols
      .map(s => col(s).isNotNull && !isnan(col(s).cast("double")))
      .reduce(_ && _)
    val cached = df.select(col(idCol) +: signalCols.map(col): _*)
      .where(rankable).cache()
    val ranked = signalCols.foldLeft(cached) { (acc, s) =>
      globalRankDesc(acc, idCol, s, s"rank_$s")
    }
    val rrf = signalCols
      .map(s => round(lit(1e9) / (lit(rrfConst.toDouble) + col(s"rank_$s"))).cast("long"))
      .reduce(_ + _)
    ranked
      .select(col(idCol) +: signalCols.map(s => col(s"rank_$s")) :+ rrf.as("rrf_fp"): _*)
      .orderBy(col("rrf_fp").desc, col(idCol))
      .limit(k)
  }

  /**
   * Confident-learning label-noise matrix (Northcutt et al., "Confident
   * Learning", JAIR 2021): estimate WHICH given labels are wrong by
   * counting only CONFIDENT predictions. A row joins cell
   * (given, pred) of the joint matrix iff its predicted-class
   * confidence clears that class's threshold t_pred = mean confidence
   * over rows whose GIVEN label is pred — the calibration step that
   * keeps an over/under-confident model from flooding the off-diagonal.
   * Off-diagonal cells are the suspected label errors (given != what a
   * confident model sees), the prune list a relabeling campaign starts
   * from.
   *
   * All-integer: confidences arrive in ppm (0..1e6) longs, thresholds
   * are floor-division means, comparisons are exact — the matrix
   * replays bit-for-bit in any engine. Output one row per observed
   * (given_label, pred_label): (given_label, pred_label, n_confident,
   * n_given) with n_given the class's total row count.
   *
   * Scale shape: one per-class mean aggregate (|classes| rows,
   * broadcast back) + one hash aggregate over (given, pred) — two
   * passes, no windows, no driver state beyond |classes|.
   */
  def labelNoiseMatrix(
      df: DataFrame,
      givenCol: String,
      predCol: String,
      confPpmCol: String): DataFrame = {
    val rows = df.select(col(givenCol).cast("string").as("g"),
        col(predCol).cast("string").as("p"),
        col(confPpmCol).cast("long").as("c"))
      .where(col("g").isNotNull && col("p").isNotNull && col("c").isNotNull)
    val thresholds = rows.groupBy(col("g").as("p"))
      .agg(expr("sum(c) DIV count(1)").as("t"))
    val gTotals = rows.groupBy("g").agg(count(lit(1)).as("n_given"))
    rows
      .join(broadcast(thresholds), Seq("p"))
      .where(col("c") >= col("t"))
      .groupBy("g", "p").agg(count(lit(1)).as("n_confident"))
      .join(broadcast(gTotals), Seq("g"))
      .select(col("g").as("given_label"), col("p").as("pred_label"),
        col("n_confident"), col("n_given"))
  }
}
