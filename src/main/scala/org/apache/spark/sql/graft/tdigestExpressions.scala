/**
 * t-digest SQL functions — double-precision quantile estimation with
 * accuracy concentrated at the distribution tails (error ~ q(1-q)),
 * BEYOND the reference surface (its quantile families are KLL/REQ/classic
 * with float narrowing). Same lifecycle discipline as every other graft
 * sketch family:
 *
 *   approx_percentile_tdigest(col, percentage)  one-shot agg -> DOUBLE
 *     (or ARRAY<DOUBLE> for an array of percentages)
 *   tdigest_accumulate(col)     agg: raw doubles -> serialized digest BINARY
 *   tdigest_combine(sketch)     agg: merge digest column -> BINARY
 *   tdigest_estimate(sketch, rank)  scalar: quantile at rank -> DOUBLE
 *   tdigest_rank(sketch, value)     scalar: normalized rank -> DOUBLE
 *
 * Compression k is frozen from `spark.sql.dataSketches.tdigest.k` at plan
 * resolution on the driver (the driver-frozen-parameter discipline —
 * executors never read SQLConf). Serialized form is the standard
 * DataSketches t-digest image.
 */
package org.apache.spark.sql.graft

import scala.util.control.NonFatal

import org.apache.datasketches.tdigest.TDigestDouble

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.conf.GraftConf
import graft.sketches.TDigestFacade

private[graft] object TDigestParams {
  def resolveK(): Int = GraftConf.tdigestK
}

/** One-shot `approx_percentile_tdigest(col, percentage)` -> DOUBLE /
 *  ARRAY<DOUBLE>; null for an empty group. */
case class ApproxPercentileTDigest(
    child: Expression,
    percentageExpression: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] with PercentageSupport {

  override def prettyName: String = "approx_percentile_tdigest"
  override def children: Seq[Expression] = child :: percentageExpression :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, percentageInputType)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnsArray) ArrayType(DoubleType, containsNull = false) else DoubleType

  override def createAggregationBuffer(): TDigestDouble = TDigestFacade.create(k)
  override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: TDigestDouble, other: TDigestDouble): TDigestDouble = {
    buf.merge(other)
    buf
  }
  override def eval(buf: TDigestDouble): Any = {
    if (buf.isEmpty) {
      null
    } else if (returnsArray) {
      new GenericArrayData(percentages.map(buf.getQuantile))
    } else {
      buf.getQuantile(percentages.head)
    }
  }
  override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): TDigestDouble = TDigestFacade.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ApproxPercentileTDigest =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ApproxPercentileTDigest =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), percentageExpression = c(1))
}

/** `tdigest_accumulate(col)` -> BINARY serialized t-digest. */
case class TDigestAccumulate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] with ImplicitCastInputTypes {

  override def prettyName: String = "tdigest_accumulate"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): TDigestDouble = TDigestFacade.create(k)
  override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: TDigestDouble, other: TDigestDouble): TDigestDouble = {
    buf.merge(other)
    buf
  }
  override def eval(buf: TDigestDouble): Any = buf.toByteArray
  override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): TDigestDouble = TDigestFacade.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): TDigestAccumulate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestAccumulate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `tdigest_combine(sketch)` -> BINARY merged t-digest. */
case class TDigestCombine(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble]
  with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "tdigest_combine"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): TDigestDouble = TDigestFacade.create(k)
  override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes != null) {
      try buf.merge(TDigestFacade.fromBytes(bytes))
      catch {
        case NonFatal(e) =>
          logWarning("Illegal input bytes for t-digest state")
          throw e
      }
    }
    buf
  }
  override def merge(buf: TDigestDouble, other: TDigestDouble): TDigestDouble = {
    buf.merge(other)
    buf
  }
  override def eval(buf: TDigestDouble): Any = buf.toByteArray
  override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): TDigestDouble = TDigestFacade.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): TDigestCombine =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestCombine =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Scalar `tdigest_estimate(sketch, rank)` -> DOUBLE quantile; null on
 *  corrupt bytes or an empty digest. */
case class TDigestEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "tdigest_estimate"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  @transient private[this] lazy val fn: (Any, Any) => Any = { (bytes, rank) =>
    try TDigestFacade.quantile(bytes.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])
    catch {
      case NonFatal(_) =>
        logWarning("Illegal input bytes for t-digest state")
        null
    }
  }

  override def nullSafeEval(bytes: Any, rank: Any): Any = fn(bytes, rank)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tdq", fn, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"""
         |Object $result = $ref.apply($b, $r);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (Double) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Scalar `tdigest_rank(sketch, value)` -> DOUBLE normalized rank; null on
 *  corrupt bytes or an empty digest. */
case class TDigestRank(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "tdigest_rank"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  @transient private[this] lazy val fn: (Any, Any) => Any = { (bytes, value) =>
    try TDigestFacade.rank(bytes.asInstanceOf[Array[Byte]], value.asInstanceOf[Double])
    catch {
      case NonFatal(_) =>
        logWarning("Illegal input bytes for t-digest state")
        null
    }
  }

  override def nullSafeEval(bytes: Any, value: Any): Any = fn(bytes, value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tdr", fn, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"""
         |Object $result = $ref.apply($b, $v);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (Double) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
