package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic DataFrame-level sampling operators for corpus curation.
 * (The SQL-function samplers — `reservoir_sample`, `varopt_sample` — live
 * in the sketch registry; these are the whole-row, exactly-reproducible
 * variants a curation pipeline uses to build eval splits and per-stratum
 * quotas.)
 */
object Sampling {

  /**
   * Exactly `k` rows per stratum (fewer when the stratum is smaller),
   * chosen by ranking the stratum's rows on the md5 of their id — a
   * uniform permutation under the hash's random-oracle view, with zero
   * RNG: the same rows are selected on every run, every partitioning,
   * every engine (the DuckDB oracle replays the identical ranking).
   *
   * Scale design: one shuffle on the strata columns; Spark 3.5+ rewrites
   * the `row_number() <= k` filter into WindowGroupLimit, so each map
   * partition pre-prunes to its local top-k before the shuffle — the
   * shuffle carries O(partitions * k) rows per stratum, not the corpus.
   */
  def stratifiedSample(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__graft_rnk", row_number().over(w))
      .where(col("__graft_rnk") <= k)
      .drop("__graft_rnk")
  }
}
