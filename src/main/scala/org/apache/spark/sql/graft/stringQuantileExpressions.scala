/**
 * String quantile SQL functions — order statistics over STRINGS (natural
 * codepoint ordering), which no numeric quantile family can express,
 * BEYOND the reference surface:
 *
 *   approx_percentile_str(col, percentage)  agg -> STRING (or
 *     ARRAY<STRING> for an array of percentages)
 *   approx_partition_bounds_str(col, n)     agg -> ARRAY<STRING>: n-1
 *     split keys for an n-way range partitioning by a string key
 *     (url/domain/doc-id) — the sorted-write planner for key types the
 *     numeric approx_partition_bounds cannot cover
 *
 * Classic mergeable ItemsSketch, k shared with the MERGEABLE numeric
 * family (`spark.sql.dataSketches.quantiles.mergeable.k` — same
 * algorithm, same error model), EXCLUSIVE search criterion, parameters
 * frozen driver-side.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.conf.GraftConf
import graft.sketches.StringQuantileFacade

/** One-shot string quantile agg; also backs `approx_partition_bounds_str`
 *  (the builder passes evenly-spaced ranks). Null for an empty group. */
case class ApproxPercentileStr(
    child: Expression,
    percentageExpression: Expression,
    k: Int,
    override val prettyName: String = "approx_percentile_str",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StringQuantileFacade] with PercentageSupport {

  override def children: Seq[Expression] = child :: percentageExpression :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, percentageInputType)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnsArray) ArrayType(StringType, containsNull = false) else StringType

  override def createAggregationBuffer(): StringQuantileFacade =
    StringQuantileFacade.create(k)
  override def update(buf: StringQuantileFacade, input: InternalRow): StringQuantileFacade = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }
  override def merge(
      buf: StringQuantileFacade, other: StringQuantileFacade): StringQuantileFacade = {
    buf.merge(other)
    buf
  }
  override def eval(buf: StringQuantileFacade): Any = {
    if (buf.isEmpty) {
      null
    } else {
      val qs = buf.quantiles(percentages)
      if (returnsArray) {
        new GenericArrayData(qs.map(q => UTF8String.fromString(q): Any))
      } else {
        UTF8String.fromString(qs.head)
      }
    }
  }
  override def serialize(buf: StringQuantileFacade): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): StringQuantileFacade =
    StringQuantileFacade.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(n: Int): ApproxPercentileStr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ApproxPercentileStr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), percentageExpression = c(1))
}
