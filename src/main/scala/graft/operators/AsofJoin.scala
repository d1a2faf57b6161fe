package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — an operator Spark's join surface lacks
 * natively (see SURVEY.md §2.2 "Joins"): for every left row, the most
 * recent right row of the same key with `right.ts <= left.ts`
 * (inclusive, matching DuckDB/Trino `ASOF JOIN` semantics).
 *
 * Scale design — union + running window, NOT a range join:
 *  - A naive `l JOIN r ON l.key = r.key AND l.ts >= r.ts` + argmax
 *    explodes to O(|l_k| * |r_k|) rows per key before pruning; at 100 TB
 *    a hot key turns that quadratic. This implementation UNIONS the two
 *    sides, sorts each key's timeline once, and carries the latest right
 *    timestamp forward with `last(..., ignoreNulls)` over a running
 *    frame — O(n log n) per key, ONE shuffle on the key, no row blowup.
 *  - Spark evaluates the unbounded-preceding frame incrementally
 *    (UnboundedPrecedingWindowFunctionFrame), so the window adds a
 *    single linear pass after the sort.
 *  - Equal timestamps: right rows order before left rows (kind 0 < 1),
 *    so a right row at exactly `left.ts` matches — the inclusive bound
 *    the SQL engines' ASOF uses.
 *  - Skew: a pathologically hot key serializes through one partition's
 *    sort — the same bound as merge-join-based ASOF in native engines;
 *    pre-splitting by coarse time bucket (seeding each bucket with the
 *    previous bucket's last right row) is the standard mitigation when
 *    one key exceeds a partition.
 */
object AsofJoin {

  /**
   * For each row of `left`, attach the greatest `right.tsCol` that is
   * <= `left.tsCol` within the same `keyCol` as `outCol` (null when the
   * key has no right row at or before the left timestamp), plus any
   * `payloadCols` from that right row as `outCol + "_" + name`.
   */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      outCol: String = "asof_ts",
      payloadCols: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, keyCol, tsCol, outCol, payloadCols, backward = true)

  /**
   * Forward (look-ahead) as-of: for each row of `left`, attach the
   * SMALLEST `right.tsCol` that is >= `left.tsCol` within the same key —
   * "the next scheduled event at or after this moment" (next retraining
   * run, next price revision, SLA deadline attribution). Same
   * union + running-window design as [[asofBackward]], just ordered
   * descending (DuckDB `ASOF JOIN ... ON l.ts <= r.ts` semantics,
   * inclusive).
   */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      outCol: String = "asof_ts",
      payloadCols: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, keyCol, tsCol, outCol, payloadCols, backward = false)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      outCol: String,
      payloadCols: Seq[String],
      backward: Boolean): DataFrame = {
    // A right row with a null timestamp can never be "the most recent at
    // or before" anything, but unfiltered it would still build a non-null
    // __graft_rv struct, sort FIRST under ascending order (nulls first),
    // and be picked by last(..., ignoreNulls) for left rows that precede
    // any real match. Drop such rows before the union.
    val r = right.where(col(tsCol).isNotNull)
      .select((col(keyCol) +: col(tsCol) +: payloadCols.map(col)): _*)
      .withColumn("__graft_kind", lit(0))
      .withColumn("__graft_rv", struct((col(tsCol) +: payloadCols.map(col)): _*))
      .drop(payloadCols: _*)
    val l = left.withColumn("__graft_kind", lit(1))
    // allowMissingColumns: right rows take nulls for left's payload
    // columns (and vice versa for __graft_rv); they are filtered out after
    // the window anyway.
    val u = l.unionByName(r, allowMissingColumns = true)
    // backward walks the timeline ascending (latest right <= left);
    // forward walks it descending (earliest right >= left). Right rows
    // order before left rows at equal timestamps either way — the
    // inclusive bound.
    val tsOrder = if (backward) col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keyCol)
      .orderBy(tsOrder, col("__graft_kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("__graft_m", last(col("__graft_rv"), ignoreNulls = true).over(w))
      .where(col("__graft_kind") === 1)
    val extras = (outCol -> col("__graft_m").getField(tsCol)) +:
      payloadCols.map(p => (s"${outCol}_$p", col("__graft_m").getField(p)))
    extras.foldLeft(matched) { case (df, (name, c)) => df.withColumn(name, c) }
      .drop("__graft_kind", "__graft_rv", "__graft_m")
  }
}
