package graft.sketches

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

/**
 * Facades over DataSketches theta sketches — the SET-OPERATION sketch
 * family (union / intersection / difference cardinalities), which the
 * CPC/HLL distinct-count family cannot answer (those only merge). Pure
 * JVM, no Spark dependency; the serialized form is a standard compact
 * theta sketch image, loadable by any DataSketches consumer.
 *
 * Exactness: a theta sketch with lgK nominal entries is EXACT below
 * 2^lgK distinct items, and intersections/differences of exact sketches
 * are exact — the property the correctness oracles pin.
 */
object ThetaSketchFacade {
  /** Wrap serialized compact-sketch bytes (throws on corrupt input). */
  def sketchFromBytes(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Long =
    Math.round(sketchFromBytes(bytes).getEstimate)

  /** A \ B as compact-sketch bytes. */
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(sketchFromBytes(a), sketchFromBytes(b))
      .toByteArray

  /** A ∩ B as compact-sketch bytes. No lgK: an intersection's theta is
   *  the min of its inputs', so the result needs no nominal size. */
  def intersectPair(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(sketchFromBytes(a))
    inter.intersect(sketchFromBytes(b))
    inter.getResult.toByteArray
  }

  /** containment(A, B) = |A ∩ B| / |A| from the double estimates — the
   *  decontamination measure (what fraction of benchmark A leaked into
   *  corpus B), which Jaccard understates when |B| >> |A|. Exact while
   *  both sketches are exact (sub-2^lgK). Null when A is empty: the
   *  fraction is undefined, not 0. */
  def containment(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val sa = sketchFromBytes(a)
    if (sa.getEstimate == 0.0) null
    else {
      val inter = SetOperation.builder().buildIntersection()
      inter.intersect(sa)
      inter.intersect(sketchFromBytes(b))
      java.lang.Double.valueOf(inter.getResult.getEstimate / sa.getEstimate)
    }
  }

  /** A ∪ B as compact-sketch bytes; `lgK` bounds the RESULT's nominal
   *  size (the accumulate-side conf, frozen driver-side like every
   *  sketch param here). */
  def unionPair(a: Array[Byte], b: Array[Byte], lgK: Int): Array[Byte] = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(sketchFromBytes(a))
    u.union(sketchFromBytes(b))
    u.getResult.toByteArray
  }
}

/**
 * Union-based accumulation buffer: accepts raw values AND serialized
 * sketches (theta unions update directly from data, so one buffer serves
 * both the accumulate and the combine aggregates).
 */
final class ThetaUnionFacade(val lgK: Int) {
  private val union: Union = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def update(v: String): Unit = union.update(v)
  def update(v: Long): Unit = union.update(v)
  def merge(bytes: Array[Byte]): Unit =
    union.union(ThetaSketchFacade.sketchFromBytes(bytes))
  def merge(other: ThetaUnionFacade): Unit = union.union(other.result)

  def result: CompactSketch = union.getResult
  def toBytes: Array[Byte] = result.toByteArray
}

object ThetaUnionFacade {
  def create(lgK: Int): ThetaUnionFacade = new ThetaUnionFacade(lgK)
  /** Rebuild a buffer from a serialized compact image (partial-agg shuffle). */
  def fromBytes(lgK: Int, bytes: Array[Byte]): ThetaUnionFacade = {
    val f = new ThetaUnionFacade(lgK)
    f.merge(bytes)
    f
  }
}

/**
 * Intersection accumulation buffer. An intersection with zero inputs has
 * no defined result (the identity would be the universe), so emptiness is
 * tracked explicitly and serialized as a one-byte marker.
 */
final class ThetaIntersectionFacade(val lgK: Int) {
  private val inter = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
  private var hasInput = false

  def intersect(bytes: Array[Byte]): Unit = {
    inter.intersect(ThetaSketchFacade.sketchFromBytes(bytes))
    hasInput = true
  }
  def merge(other: ThetaIntersectionFacade): Unit = {
    if (other.hasInput) {
      inter.intersect(other.inter.getResult)
      hasInput = true
    }
  }
  def isEmpty: Boolean = !hasInput
  /** Compact result bytes; null when no input arrived (empty group). */
  def toResultBytes: Array[Byte] = if (hasInput) inter.getResult.toByteArray else null

  def toBytes: Array[Byte] =
    if (hasInput) Array[Byte](1) ++ inter.getResult.toByteArray else Array[Byte](0)
}

object ThetaIntersectionFacade {
  def create(lgK: Int): ThetaIntersectionFacade = new ThetaIntersectionFacade(lgK)
  def fromBytes(lgK: Int, bytes: Array[Byte]): ThetaIntersectionFacade = {
    val f = new ThetaIntersectionFacade(lgK)
    if (bytes.nonEmpty && bytes(0) == 1) f.intersect(bytes.drop(1))
    f
  }
}
