package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * One-pass filter auditing via Spark's native `Dataset.observe`
 * (`CollectMetrics`): a curation filter that reports what it READ and
 * what it KEPT from the SAME scan — the pipeline-counter idiom that at
 * 100 TB replaces the "run the input count as a second query" pattern
 * (which doubles the I/O bill and can disagree with itself when the
 * input moved between passes).
 *
 * Scale shape: `observe` attaches accumulator-backed metrics to the
 * pre-filter point of the plan — zero extra shuffle, zero extra scan,
 * exact (accumulators for CollectMetrics are not task-retry-inflated:
 * Spark de-duplicates per-task updates on the driver). The post-filter
 * side is an ordinary partial-aggregable one-row aggregate. One job
 * total.
 */
object Observed {

  /**
   * Run `filter` over `df`, observing pre-filter row count and
   * per-column sums in the same pass. Returns one row:
   * (n_in, chars_in, n_kept, chars_kept, kept_ppm) for the text
   * corpus-curation case: `textCol` length is the audited volume.
   *
   * This EXECUTES the plan (the observation only materializes with an
   * action) — it is a reporting terminal, not a lazy transform.
   */
  def filterAudit(
      df: DataFrame,
      textCol: String,
      keep: Column): DataFrame = {
    val spark = df.sparkSession
    val obs = Observation()
    val kept = df.observe(obs,
        count(lit(1)).as("n_in"),
        coalesce(sum(length(col(textCol)).cast("long")), lit(0L))
          .as("chars_in"))
      .where(keep)
      .agg(count(lit(1)).as("n_kept"),
        coalesce(sum(length(col(textCol)).cast("long")), lit(0L))
          .as("chars_kept"))
      .collect()(0)
    val m = obs.get
    val nIn = m("n_in").asInstanceOf[Long]
    val row = Row(nIn, m("chars_in").asInstanceOf[Long],
      kept.getLong(0), kept.getLong(1),
      if (nIn == 0L) 0L else kept.getLong(0) * 1000000L / nIn)
    val schema = StructType(Seq(
      StructField("n_in", LongType, nullable = false),
      StructField("chars_in", LongType, nullable = false),
      StructField("n_kept", LongType, nullable = false),
      StructField("chars_kept", LongType, nullable = false),
      StructField("kept_ppm", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
  }
}
