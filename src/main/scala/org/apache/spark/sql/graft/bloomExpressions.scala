/**
 * DataSketches BloomFilter SQL functions — approximate set membership
 * with no false negatives and a standard cross-system wire image,
 * BEYOND the reference surface. Complements `graft_bloom_agg` (Spark's
 * native bloom, readable only by Spark): these images ship to / load
 * from any DataSketches consumer, and intersection (membership in EVERY
 * input — bitwise-AND) has no Spark-native counterpart at all.
 *
 *   bloom_accumulate(col[, maxItems, fpp])  agg: string/long values ->
 *     serialized filter BINARY
 *   bloom_union(sketch[, maxItems, fpp])    agg: merge filter column (OR)
 *   bloom_intersect(sketch[, maxItems, fpp]) agg: intersect (AND); null
 *     for an empty group
 *   bloom_might_contain(sketch, value)      scalar -> BOOLEAN (null on
 *     corrupt bytes)
 *
 * (maxItems, fpp) size the bit array and hash count; partials built with
 * the same pair (and graft's fixed seed) are union-compatible. Both are
 * frozen into the plan at driver-side resolution — the driver-frozen-
 * parameter discipline of every graft sketch family.
 */
package org.apache.spark.sql.graft

import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sketches.{BloomIntersectionFacade, BloomSketchFacade, BloomUnionFacade}

private[graft] object BloomParams {
  val DefaultMaxItems: Long = 100000L
  val DefaultFpp: Double = 0.01

  def validate(fn: String, maxItems: Long, fpp: Double): Unit = {
    if (maxItems < 1) {
      throw new IllegalArgumentException(
        s"Function $fn requires maxItems to be positive, got $maxItems")
    }
    if (fpp <= 0.0 || fpp >= 1.0) {
      throw new IllegalArgumentException(
        s"Function $fn requires fpp to be in (0, 1), got $fpp")
    }
  }
}

/** `bloom_accumulate(col[, maxItems, fpp])` -> BINARY serialized filter. */
case class BloomAccumulate(
    child: Expression,
    maxItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomUnionFacade] with ImplicitCastInputTypes {

  override def prettyName: String = "bloom_accumulate"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, LongType))
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  @transient private lazy val updateOne: (BloomUnionFacade, Any) => Unit =
    child.dataType match {
      case StringType => (buf, v) => buf.update(v.asInstanceOf[UTF8String].toString)
      case LongType => (buf, v) => buf.update(v.asInstanceOf[Long])
      case t => throw new IllegalStateException(s"Unexpected data type ${t.catalogString}")
    }

  override def createAggregationBuffer(): BloomUnionFacade =
    BloomUnionFacade.create(maxItems, fpp)
  override def update(buf: BloomUnionFacade, input: InternalRow): BloomUnionFacade = {
    val v = child.eval(input)
    if (v != null) updateOne(buf, v)
    buf
  }
  override def merge(buf: BloomUnionFacade, other: BloomUnionFacade): BloomUnionFacade = {
    buf.merge(other)
    buf
  }
  override def eval(buf: BloomUnionFacade): Any = buf.toBytes
  override def serialize(buf: BloomUnionFacade): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BloomUnionFacade =
    BloomUnionFacade.fromBytes(maxItems, fpp, bytes)

  override def withNewMutableAggBufferOffset(n: Int): BloomAccumulate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAccumulate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `bloom_union(sketch[, maxItems, fpp])` -> BINARY bitwise-OR of filters. */
case class BloomUnionAgg(
    child: Expression,
    maxItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomUnionFacade]
  with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "bloom_union"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomUnionFacade =
    BloomUnionFacade.create(maxItems, fpp)
  override def update(buf: BloomUnionFacade, input: InternalRow): BloomUnionFacade = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes != null) {
      try buf.merge(bytes)
      catch {
        case NonFatal(e) =>
          logWarning("Illegal input bytes for bloom filter state")
          throw e
      }
    }
    buf
  }
  override def merge(buf: BloomUnionFacade, other: BloomUnionFacade): BloomUnionFacade = {
    buf.merge(other)
    buf
  }
  override def eval(buf: BloomUnionFacade): Any = buf.toBytes
  override def serialize(buf: BloomUnionFacade): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BloomUnionFacade =
    BloomUnionFacade.fromBytes(maxItems, fpp, bytes)

  override def withNewMutableAggBufferOffset(n: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `bloom_intersect(sketch[, maxItems, fpp])` -> BINARY bitwise-AND;
 *  null for an empty group. */
case class BloomIntersectAgg(
    child: Expression,
    maxItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomIntersectionFacade]
  with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "bloom_intersect"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomIntersectionFacade =
    BloomIntersectionFacade.create(maxItems, fpp)
  override def update(
      buf: BloomIntersectionFacade, input: InternalRow): BloomIntersectionFacade = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes != null) {
      try buf.intersect(bytes)
      catch {
        case NonFatal(e) =>
          logWarning("Illegal input bytes for bloom filter state")
          throw e
      }
    }
    buf
  }
  override def merge(
      buf: BloomIntersectionFacade,
      other: BloomIntersectionFacade): BloomIntersectionFacade = {
    buf.merge(other)
    buf
  }
  override def eval(buf: BloomIntersectionFacade): Any = buf.toResultBytes
  override def serialize(buf: BloomIntersectionFacade): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BloomIntersectionFacade =
    BloomIntersectionFacade.fromBytes(maxItems, fpp, bytes)

  override def withNewMutableAggBufferOffset(n: Int): BloomIntersectAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomIntersectAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Scalar `bloom_might_contain(sketch, value)` -> BOOLEAN; null on corrupt
 *  bytes. String and long values hash as the DataSketches standard, so
 *  filters built by OTHER DataSketches consumers answer correctly. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "bloom_might_contain"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, TypeCollection(StringType, LongType))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  @transient private[this] lazy val queryOne: (Any, Any) => Any = {
    val q: (org.apache.datasketches.filters.bloomfilter.BloomFilter, Any) => Boolean =
      right.dataType match {
        case StringType => (f, v) => f.query(v.asInstanceOf[UTF8String].toString)
        case LongType => (f, v) => f.query(v.asInstanceOf[Long])
        case t => throw new IllegalStateException(s"Unexpected data type ${t.catalogString}")
      }
    // The filter side is almost always a plan constant (broadcast scalar
    // subquery / literal), so Spark hands the SAME byte array every row:
    // memo the zero-copy wrap by reference identity. One-element memo is
    // deliberately tiny — a varying filter column still works, just
    // re-wraps (no copy either way; wrap is read-only over the bytes).
    var lastBytes: Array[Byte] = null
    var lastFilter: org.apache.datasketches.filters.bloomfilter.BloomFilter = null
    (bytesRaw, v) =>
      try {
        val bytes = bytesRaw.asInstanceOf[Array[Byte]]
        if (bytes ne lastBytes) {
          lastFilter = BloomSketchFacade.wrapBytes(bytes)
          lastBytes = bytes
        }
        Boolean.box(q(lastFilter, v))
      } catch {
        case NonFatal(_) =>
          logWarning("Illegal input bytes for bloom filter state")
          null
      }
  }

  override def nullSafeEval(bytes: Any, v: Any): Any = queryOne(bytes, v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomq", queryOne, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"""
         |Object $result = $ref.apply($b, $v);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (Boolean) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Scalar `graft_might_contain(bloom, hashedValue)` over SPARK's
 * runtime-filter bloom image (`org.apache.spark.util.sketch.BloomFilter`,
 * the `graft_bloom_agg` wire format — distinct from the DataSketches
 * filters `bloom_might_contain` probes). A drop-in for Spark's own
 * `BloomFilterMightContain`, which it replaces because that expression's
 * codegen emits `(Long)<negative literal>` when the probe side constant-
 * folds — Janino parses the cast as a subtraction from the class name
 * and the whole projection falls back to interpreted.
 *
 * The filter side is almost always a plan constant (scalar subquery), so
 * the deserialization is memoized by byte-array reference identity, as in
 * [[BloomMightContain]].
 */
case class SparkBloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "graft_might_contain"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  @transient private[this] lazy val queryOne: (Any, Any) => Any = {
    var lastBytes: Array[Byte] = null
    var lastFilter: org.apache.spark.util.sketch.BloomFilter = null
    (bytesRaw, v) =>
      try {
        val bytes = bytesRaw.asInstanceOf[Array[Byte]]
        if (bytes ne lastBytes) {
          lastFilter = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bytes))
          lastBytes = bytes
        }
        Boolean.box(lastFilter.mightContainLong(v.asInstanceOf[Long]))
      } catch {
        case NonFatal(_) =>
          logWarning("Illegal input bytes for bloom filter state")
          null
      }
  }

  override def nullSafeEval(bytes: Any, v: Any): Any = queryOne(bytes, v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomq", queryOne, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"""
         |Object $result = $ref.apply($b, java.lang.Long.valueOf($v));
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (Boolean) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
