package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pre-join cardinality estimation on theta sketches — the
 * optimizer-statistics question ("how big would this equi-join be, and
 * how much do the key domains overlap?") answered WITHOUT executing the
 * join: one aggregate pass per side builds a theta sketch of each key
 * domain plus a row count, and the set algebra (intersection) runs on
 * the two serialized sketches — bytes, not data.
 *
 * Returns one row:
 *   (n_distinct_left, n_distinct_right, n_overlap,
 *    n_rows_left, n_rows_right, est_join_rows)
 * where `n_overlap` estimates |keys(L) ∩ keys(R)| and `est_join_rows`
 * is the classic uniform-frequency estimate
 * `overlap * (rows_l/distinct_l) * (rows_r/distinct_r)` — exact for
 * PK-FK joins (the FK side's matched keys carry its average
 * multiplicity), an approximation under key skew. Null keys join
 * nothing and are excluded from both counts and sketches.
 *
 * Scale design: each side is scanned ONCE into a single bounded sketch
 * row (map-side partial merge, the same agg shape every sketch function
 * uses); the estimate itself touches two one-row frames. Below the
 * theta sketch's nominal capacity (2^lgK entries) the sketches are in
 * exact mode, so every output is exact — which is what makes the
 * operator oracle-checkable; above it, errors follow theta bounds.
 */
object JoinStats {

  def keyOverlap(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String): DataFrame = {
    // one-row aggregates, cached: the final plan references each side's
    // sketch in two branches (direct estimate + intersection), and the
    // cache keeps that from re-scanning the (potentially 100 TB) input
    val a = left.agg(
      call_function("theta_accumulate", col(leftKey).cast("string")).as("ask"),
      count(col(leftKey)).as("cnt_a")).cache()
    val b = right.agg(
      call_function("theta_accumulate", col(rightKey).cast("string")).as("bsk"),
      count(col(rightKey)).as("cnt_b")).cache()
    val overlap = a.select(col("ask").as("sk"))
      .unionByName(b.select(col("bsk").as("sk")))
      .agg(call_function("theta_estimate",
        call_function("theta_intersect", col("sk"))).as("n_overlap"))
    val ndA = call_function("theta_estimate", col("ask")).cast("double")
    val ndB = call_function("theta_estimate", col("bsk")).cast("double")
    a.crossJoin(b).crossJoin(overlap)
      .select(
        call_function("theta_estimate", col("ask")).as("n_distinct_left"),
        call_function("theta_estimate", col("bsk")).as("n_distinct_right"),
        col("n_overlap"),
        col("cnt_a").as("n_rows_left"),
        col("cnt_b").as("n_rows_right"),
        // an empty/keyless side joins nothing: estimate 0 instead of an
        // ANSI divide-by-zero on the 0-distinct denominator
        when(col("n_overlap").isNull || ndA.isNull || ndB.isNull ||
            ndA === 0d || ndB === 0d, lit(0.0))
          .otherwise(round(col("n_overlap").cast("double") *
            (col("cnt_a").cast("double") / ndA) *
            (col("cnt_b").cast("double") / ndB), 9))
          .as("est_join_rows"))
  }
}
