package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.SummaryCatalog

/**
 * Public API for the automatic summary-table rewrite (see
 * [[org.apache.spark.sql.graft.SummaryRewriteRule]]): register a
 * materialized sketch summary for a base parquet table, flip
 * `spark.sql.graft.summaryRewrite.enabled`, and one-shot sketch aggregates
 * over the base whose grouping coarsens the summary keys are answered from
 * the summary — no rescan of raw data.
 */
object GraftSummaries {
  val ENABLED_KEY: String = SummaryCatalog.ENABLED_KEY

  /**
   * `summary` = SELECT keys..., approx_count_distinct_accumulate(valueCol)
   * AS sketchCol. Pass the summary's defining query as `definition` when a
   * key is a derived bucket (e.g. `window(ts, '1 day')`): queries grouping
   * by the same window — or any coarser tumbling window whose slide is a
   * multiple of it — then rewrite onto the summary too.
   */
  def registerDistinctSummary(
      basePath: String,
      summary: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      sketchCol: String,
      definition: Option[DataFrame] = None): Unit =
    SummaryCatalog.registerDistinctSummary(
      basePath, summary, keyCols, valueCol, sketchCol, definition)

  /** `summary` = SELECT keys..., approx_percentile_accumulate(valueCol) AS sketchCol. */
  def registerQuantileSummary(
      basePath: String,
      summary: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      sketchCol: String,
      definition: Option[DataFrame] = None): Unit =
    SummaryCatalog.registerQuantileSummary(
      basePath, summary, keyCols, valueCol, sketchCol, definition)

  /** `summary` = SELECT keys..., approx_freqitems_accumulate(valueCol) AS sketchCol. */
  def registerFreqItemsSummary(
      basePath: String,
      summary: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      sketchCol: String,
      definition: Option[DataFrame] = None): Unit =
    SummaryCatalog.registerFreqItemsSummary(
      basePath, summary, keyCols, valueCol, sketchCol, definition)

  def unregister(basePath: String): Unit = SummaryCatalog.unregister(basePath)
  def clear(): Unit = SummaryCatalog.clear()
}
