package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) data layout: interleave the bits of two integer
 * keys so that sorting by the result co-locates rows that are close in
 * BOTH dimensions — the multi-column clustering trick behind
 * Delta/Iceberg `ZORDER BY`. A range of z-values maps to a bounded
 * rectangle in (x, y) space, so a file/bucket covering a z-range can
 * be skipped by predicates on EITHER column; a single-column sort
 * gives perfect skipping on one dimension and none on the other.
 *
 * Pure integer bit arithmetic (shift/and/or with `bits` fixed at plan
 * time): deterministic in any engine, codegen-friendly, no UDF.
 */
object Layout {

  /** Morton-interleave the low `bits` bits of x (even positions) and
    * y (odd positions): a 2*bits-bit z-value. Inputs are masked to
    * `bits` bits (callers quantize/mod upstream). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftrightunsigned(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftrightunsigned(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /**
   * Layout-quality report: bucket rows by the top bits of their
   * z-value (`2^bucketBits` buckets) and report each bucket's row
   * count plus the span (max - min) of BOTH dimensions — the numbers
   * that decide how much a scan with a predicate on either column can
   * skip. Compare against a single-column sort's report to justify
   * the layout. One projection + one hash aggregate.
   *
   * NOTE: runs the one-row max aggregate EAGERLY at call time — the
   * maxes gate the overflow check and then fold into the plan as
   * literals, so the returned frame snapshots the key range as of the
   * call (re-derive it if the source table changes underneath).
   */
  def zOrderReport(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"bucketBits must be in [1, ${2 * bits}], got $bucketBits")
    // NORMALIZE each dimension to the full `bits` range first
    // (x' = x * 2^bits DIV (max+1)): raw keys usually occupy only the
    // low bits, which would leave the z high bits constant and every
    // row in bucket 0. One one-row max aggregate (collected: the maxes
    // gate the overflow check below and then fold into the plan as
    // literals — no join at all).
    val raw = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        col("x") >= 0 && col("y") >= 0)
    val mxRow = raw.agg(max(col("x")).as("xmax"), max(col("y")).as("ymax")).head()
    val xmax = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
    val ymax = if (mxRow.isNullAt(1)) 0L else mxRow.getLong(1)
    // x * 2^bits must stay under 2^63 or the normalization silently goes
    // negative and every bucket is garbage — fail loudly instead
    val lim = Long.MaxValue >> bits
    require(xmax <= lim && ymax <= lim,
      s"zOrderReport: keys too large for bits=$bits — max key must be <= " +
        s"$lim (got xmax=$xmax, ymax=$ymax); rescale keys or lower bits")
    raw
      .withColumn("xs", expr(s"(x * ${1L << bits}L) DIV ${xmax + 1L}L"))
      .withColumn("ys", expr(s"(y * ${1L << bits}L) DIV ${ymax + 1L}L"))
      .withColumn("z", zValue(col("xs"), col("ys"), bits))
      .withColumn("bucket",
        shiftrightunsigned(col("z"), 2 * bits - bucketBits).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        (max(col("x")) - min(col("x"))).as("x_span"),
        (max(col("y")) - min(col("y"))).as("y_span"))
  }
}
