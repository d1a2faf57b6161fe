package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed point-in-interval range join — the second join flavor Spark
 * lacks a scalable plan for (see SURVEY.md §2.2 "Joins"): a plain
 * `p.join(i, p("v") >= i("lo") && p("v") <= i("hi"))` has no equi-key,
 * so Catalyst plans BroadcastNestedLoopJoin — O(|points| x |intervals|)
 * comparisons, which does not survive a 100x scale-up of either side.
 *
 * This operator derives an equi-key: both sides bucket the value domain
 * into fixed-width cells (`floor(v / width)`); every interval explodes
 * to the cells it overlaps, points map to exactly one cell, and the
 * join becomes a shuffled equi-join on the cell id followed by the
 * exact range predicate. Cost: one shuffle per side; interval fan-out =
 * `ceil(span / width) + 1` rows — pick `width` near the typical
 * interval span so the fan-out stays O(1) per interval. Skew in a hot
 * cell is AQE-splittable like any equi-join key.
 */
object RangeJoin {

  /**
   * Rows of `points` x `intervals` with
   * `points(pointCol) ∈ [intervals(loCol), intervals(hiCol)]`
   * (inclusive both ends). Column names must not collide between the
   * two inputs (rename before joining). Intervals with `hi < lo` are
   * empty and produce nothing.
   */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__graft_cell",
      floor(col(pointCol) / lit(bucketWidth)).cast("long"))
    val iv = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__graft_cell", explode(sequence(
        floor(col(loCol) / lit(bucketWidth)).cast("long"),
        floor(col(hiCol) / lit(bucketWidth)).cast("long"))))
    p.join(iv, Seq("__graft_cell"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__graft_cell")
  }

  /**
   * Interval-overlap join: rows of `left` x `right` (optionally equi-
   * keyed by `keyCols`, present on both sides) whose closed intervals
   * `[lLo, lHi]` and `[rLo, rHi]` intersect — session co-occurrence,
   * campaign/window attribution, temporal conflict detection.
   *
   * Same derived-equi-key design as [[pointInInterval]]: both sides
   * explode to the fixed-width cells they cover and equi-join on
   * (keyCols, cell). A pair overlapping across several shared cells
   * would surface once per cell, so the join keeps only the FIRST
   * shared cell — `cell == greatest(floor(lLo/w), floor(rLo/w))` — a
   * per-row predicate that deduplicates WITHOUT a distinct shuffle.
   * Fan-out per row = ceil(span/width) + 1; pick `bucketWidth` near the
   * typical interval span. Empty intervals (hi < lo) produce nothing.
   */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lLo: String,
      lHi: String,
      rLo: String,
      rHi: String,
      bucketWidth: Double,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def cells(df: DataFrame, lo: String, hi: String): DataFrame = df
      .where(col(lo) <= col(hi))
      .withColumn("__graft_cell", explode(sequence(
        floor(col(lo) / lit(bucketWidth)).cast("long"),
        floor(col(hi) / lit(bucketWidth)).cast("long"))))
    val l = cells(left, lLo, lHi)
    val r = cells(right, rLo, rHi)
    l.join(r, (Seq("__graft_cell") ++ keyCols).toSeq)
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__graft_cell") === greatest(
          floor(col(lLo) / lit(bucketWidth)).cast("long"),
          floor(col(rLo) / lit(bucketWidth)).cast("long")))
      .drop("__graft_cell")
  }
}
