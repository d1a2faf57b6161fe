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
}
