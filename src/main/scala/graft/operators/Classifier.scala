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
}
