/**
 * Theta-sketch SQL functions: set-operation cardinalities. BEYOND the
 * reference surface (its CPC/HLL family only merges): theta sketches
 * answer |A ∪ B|, |A ∩ B|, and |A \ B| between independently-sketched
 * sets — at 100 TB, corpus-overlap questions (how many users/documents do
 * two slices share?) without ever co-shuffling the raw sets.
 *
 *   theta_accumulate(col)   agg: string/long column -> compact sketch BINARY
 *   theta_union(sketch)     agg: merge sketch column -> BINARY
 *   theta_intersect(sketch) agg: intersect sketch column -> BINARY (null on empty)
 *   theta_a_not_b(a, b)     scalar: difference sketch -> BINARY
 *   theta_containment(a, b) scalar: |A ∩ B| / |A| -> DOUBLE (null on empty A)
 *   theta_estimate(sketch)  scalar: cardinality -> BIGINT (null on corrupt)
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

import graft.conf.GraftConf
import graft.sketches.{ThetaIntersectionFacade, ThetaSketchFacade, ThetaUnionFacade}

private[graft] object ThetaParams {
  def resolveLgK(): Int = GraftConf.thetaLgK
}

/** `theta_accumulate(col)` -> BINARY compact theta sketch. */
case class ThetaAccumulate(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaUnionFacade] with ImplicitCastInputTypes {

  override def prettyName: String = "theta_accumulate"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(TypeCollection(StringType, LongType))
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  @transient private lazy val updateOne: (ThetaUnionFacade, Any) => Unit = child.dataType match {
    case StringType => (buf, v) => buf.update(v.asInstanceOf[UTF8String].toString)
    case LongType => (buf, v) => buf.update(v.asInstanceOf[Long])
    case t => throw new IllegalStateException(s"Unexpected data type ${t.catalogString}")
  }

  override def createAggregationBuffer(): ThetaUnionFacade = ThetaUnionFacade.create(lgK)
  override def update(buf: ThetaUnionFacade, input: InternalRow): ThetaUnionFacade = {
    val v = child.eval(input)
    if (v != null) updateOne(buf, v)
    buf
  }
  override def merge(buf: ThetaUnionFacade, other: ThetaUnionFacade): ThetaUnionFacade = {
    buf.merge(other)
    buf
  }
  override def eval(buf: ThetaUnionFacade): Any = buf.toBytes
  override def serialize(buf: ThetaUnionFacade): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): ThetaUnionFacade =
    ThetaUnionFacade.fromBytes(lgK, bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaAccumulate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaAccumulate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `theta_union(sketch)` -> BINARY union of serialized sketches. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaUnionFacade]
  with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "theta_union"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ThetaUnionFacade = ThetaUnionFacade.create(lgK)
  override def update(buf: ThetaUnionFacade, input: InternalRow): ThetaUnionFacade = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes != null) {
      try buf.merge(bytes)
      catch {
        case NonFatal(e) =>
          logWarning("Illegal input bytes for theta sketch state")
          throw e
      }
    }
    buf
  }
  override def merge(buf: ThetaUnionFacade, other: ThetaUnionFacade): ThetaUnionFacade = {
    buf.merge(other)
    buf
  }
  override def eval(buf: ThetaUnionFacade): Any = buf.toBytes
  override def serialize(buf: ThetaUnionFacade): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): ThetaUnionFacade =
    ThetaUnionFacade.fromBytes(lgK, bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `theta_intersect(sketch)` -> BINARY intersection; null for an empty group. */
case class ThetaIntersectAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaIntersectionFacade]
  with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "theta_intersect"
  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ThetaIntersectionFacade =
    ThetaIntersectionFacade.create(lgK)
  override def update(buf: ThetaIntersectionFacade, input: InternalRow): ThetaIntersectionFacade = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes != null) {
      try buf.intersect(bytes)
      catch {
        case NonFatal(e) =>
          logWarning("Illegal input bytes for theta sketch state")
          throw e
      }
    }
    buf
  }
  override def merge(
      buf: ThetaIntersectionFacade,
      other: ThetaIntersectionFacade): ThetaIntersectionFacade = {
    buf.merge(other)
    buf
  }
  override def eval(buf: ThetaIntersectionFacade): Any = buf.toResultBytes
  override def serialize(buf: ThetaIntersectionFacade): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): ThetaIntersectionFacade =
    ThetaIntersectionFacade.fromBytes(lgK, bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Scalar `theta_a_not_b(a, b)` -> BINARY difference sketch; null on corrupt. */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "theta_a_not_b"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  @transient private[this] lazy val fn: (Any, Any) => Any = { (a, b) =>
    try ThetaSketchFacade.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    catch {
      case NonFatal(_) =>
        logWarning("Illegal input bytes for theta sketch state")
        null
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = fn(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("anotb", fn, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object $result = $ref.apply($a, $b);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (byte[]) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Scalar `theta_intersect_pair(a, b)` -> BINARY intersection sketch;
 * null on corrupt. The per-ROW companion to the [[ThetaIntersectAgg]]
 * aggregate: once sketches are joined side by side (a pairwise source
 * matrix, a day×day retention grid), set algebra runs inside the row
 * with no extra aggregation pass.
 */
case class ThetaIntersectPair(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "theta_intersect_pair"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  @transient private[this] lazy val fn: (Any, Any) => Any = { (a, b) =>
    try ThetaSketchFacade.intersectPair(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    catch {
      case NonFatal(_) =>
        logWarning("Illegal input bytes for theta sketch state")
        null
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = fn(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("interPair", fn, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object $result = $ref.apply($a, $b);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (byte[]) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Scalar `theta_union_pair(a, b)` -> BINARY union sketch; null on
 *  corrupt. `lgK` (the accumulate-side conf) is frozen driver-side at
 *  resolution, bounding the result's nominal size. */
case class ThetaUnionPair(left: Expression, right: Expression, lgK: Int)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "theta_union_pair"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  @transient private[this] lazy val fn: (Any, Any) => Any = { (a, b) =>
    try ThetaSketchFacade.unionPair(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], lgK)
    catch {
      case NonFatal(_) =>
        logWarning("Illegal input bytes for theta sketch state")
        null
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = fn(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unionPair", fn, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object $result = $ref.apply($a, $b);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (byte[]) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Scalar `theta_containment(a, b)` -> DOUBLE `|A ∩ B| / |A|` — the
 * decontamination measure (what fraction of benchmark A appears in
 * corpus B), which Jaccard understates when `|B| >> |A|`. Exact while
 * both sketches are exact (sub-2^lgK cardinalities). Null on corrupt
 * bytes and for an empty A (the fraction is undefined, not 0).
 */
case class ThetaContainment(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "theta_containment"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  @transient private[this] lazy val fn: (Any, Any) => Any = { (a, b) =>
    try ThetaSketchFacade.containment(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    catch {
      case NonFatal(_) =>
        logWarning("Illegal input bytes for theta sketch state")
        null
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = fn(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("containFn", fn, classOf[(Any, Any) => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object $result = $ref.apply($a, $b);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (java.lang.Double) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Scalar `theta_estimate(sketch)` -> BIGINT; null on corrupt bytes. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with Logging {

  override def prettyName: String = "theta_estimate"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  @transient private[this] lazy val decodeFn: Any => Any = { (bytesRaw: Any) =>
    try java.lang.Long.valueOf(ThetaSketchFacade.estimate(bytesRaw.asInstanceOf[Array[Byte]]))
    catch {
      case NonFatal(_) =>
        logWarning("Illegal input bytes for theta sketch state")
        null
    }
  }

  override def nullSafeEval(bytes: Any): Any = decodeFn(bytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = ctx.addReferenceObj("decodeFn", decodeFn, classOf[Any => Any].getCanonicalName)
    val result = ctx.freshName("result")
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |Object $result = $fn.apply($bytes);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (java.lang.Long) $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
