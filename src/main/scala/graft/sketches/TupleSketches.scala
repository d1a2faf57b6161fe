package graft.sketches

import java.util.Locale

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tuple.{AnotB, CompactSketch, Intersection, Sketch, Sketches, Union}
import org.apache.datasketches.tuple.adouble.{DoubleSketch, DoubleSummary,
  DoubleSummaryDeserializer, DoubleSummarySetOperations}

/**
 * Facades over DataSketches TUPLE sketches — theta sketches whose retained
 * keys each carry a double "summary" value. Where the theta family answers
 * "how many distinct keys", the tuple family answers "how many distinct
 * keys AND what do their values aggregate to" in the same single pass:
 * deduplicated token totals across shards that repeat documents, revenue
 * over the distinct customers shared by two corpus slices, first-seen
 * minima per user — without ever co-shuffling the raw sets.
 *
 * Summary modes (how repeated updates to the SAME key combine):
 *   sum — per-key running sum; min/max — per-key extremum; one — always 1.0
 *   (a distinct-count weight, making sum-of-summaries == distinct estimate).
 *
 * Exactness contract (pinned by the correctness oracles): below 2^lgK
 * distinct keys the sketch retains every key, theta == 1, and both the
 * distinct count and the summed summary values are EXACT; intersections /
 * differences of exact sketches are exact.
 *
 * Serialized form is the standard DataSketches compact tuple image with
 * per-entry DoubleSummary payloads (value + mode byte), loadable by any
 * DataSketches consumer. Pure JVM, no Spark dependency.
 */
object TupleSketchFacade {

  /** Parse a user-facing mode name; throws IllegalArgumentException on junk. */
  def parseMode(name: String): DoubleSummary.Mode =
    name.toLowerCase(Locale.ROOT) match {
      case "sum" => DoubleSummary.Mode.Sum
      case "min" => DoubleSummary.Mode.Min
      case "max" => DoubleSummary.Mode.Max
      case "one" => DoubleSummary.Mode.AlwaysOne
      case other => throw new IllegalArgumentException(
        s"Unsupported tuple summary mode: $other (expected one of sum, min, max, one)")
    }

  def setOps(mode: DoubleSummary.Mode): DoubleSummarySetOperations =
    new DoubleSummarySetOperations(mode, mode)

  /** Wrap serialized compact tuple-sketch bytes (throws on corrupt input). */
  def sketchFromBytes(bytes: Array[Byte]): Sketch[DoubleSummary] =
    Sketches.heapifySketch(Memory.wrap(bytes), new DoubleSummaryDeserializer())

  /** (distinct-key estimate, estimated sum of per-key summary values).
   *  Sum-of-retained-summaries is scaled by 1/theta — the standard
   *  tuple-sketch unbiased estimator; exact (theta == 1) below capacity. */
  def estimate(bytes: Array[Byte]): (Long, Double) = {
    val sk = sketchFromBytes(bytes)
    var sum = 0.0
    val it = sk.iterator()
    while (it.next()) sum += it.getSummary.getValue
    (Math.round(sk.getEstimate), sum / sk.getTheta)
  }

  /** A \ B as compact-sketch bytes (summaries carried from A unchanged). */
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    AnotB.aNotB(sketchFromBytes(a), sketchFromBytes(b)).toByteArray
}

/**
 * Accumulation buffer for the tuple aggregates. Tuple unions (unlike theta
 * unions) cannot ingest raw values, so the buffer keeps BOTH an updatable
 * sketch (raw key/value updates) and a lazily-created union (serialized
 * sketch merges); the result folds the two together. Safe under any
 * interleaving of update() and merge().
 */
final class TupleUnionFacade(val lgK: Int, val mode: DoubleSummary.Mode) {
  private val updatable = new DoubleSketch(lgK, mode)
  private var mergeUnion: Union[DoubleSummary] = null
  private var hasUpdates = false

  def update(key: String, v: Double): Unit = { updatable.update(key, Double.box(v)); hasUpdates = true }
  def update(key: Long, v: Double): Unit = { updatable.update(key, Double.box(v)); hasUpdates = true }

  private def ensureUnion(): Union[DoubleSummary] = {
    if (mergeUnion == null) {
      mergeUnion = new Union[DoubleSummary](1 << lgK, TupleSketchFacade.setOps(mode))
    }
    mergeUnion
  }

  def merge(bytes: Array[Byte]): Unit =
    ensureUnion().union(TupleSketchFacade.sketchFromBytes(bytes))

  def merge(other: TupleUnionFacade): Unit = ensureUnion().union(other.result)

  def result: CompactSketch[DoubleSummary] = {
    if (mergeUnion == null) {
      updatable.compact()
    } else if (!hasUpdates) {
      mergeUnion.getResult
    } else {
      val u = new Union[DoubleSummary](1 << lgK, TupleSketchFacade.setOps(mode))
      u.union(mergeUnion.getResult)
      u.union(updatable.compact())
      u.getResult
    }
  }

  def toBytes: Array[Byte] = result.toByteArray
}

object TupleUnionFacade {
  def create(lgK: Int, mode: DoubleSummary.Mode): TupleUnionFacade =
    new TupleUnionFacade(lgK, mode)

  /** Rebuild a buffer from a serialized compact image (partial-agg shuffle). */
  def fromBytes(lgK: Int, mode: DoubleSummary.Mode, bytes: Array[Byte]): TupleUnionFacade = {
    val f = new TupleUnionFacade(lgK, mode)
    f.merge(bytes)
    f
  }
}

/**
 * Intersection accumulation buffer; same empty-tracking shape as
 * [[ThetaIntersectionFacade]] (an intersection of zero inputs has no
 * defined result), serialized as a one-byte marker + compact image.
 * Summaries of keys present on both sides combine with the mode's
 * intersection rule (sum adds, min/max take the extremum).
 */
final class TupleIntersectionFacade(val mode: DoubleSummary.Mode) {
  private val inter = new Intersection[DoubleSummary](TupleSketchFacade.setOps(mode))
  private var hasInput = false

  def intersect(bytes: Array[Byte]): Unit = {
    inter.intersect(TupleSketchFacade.sketchFromBytes(bytes))
    hasInput = true
  }
  def merge(other: TupleIntersectionFacade): Unit = {
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

object TupleIntersectionFacade {
  def create(mode: DoubleSummary.Mode): TupleIntersectionFacade =
    new TupleIntersectionFacade(mode)
  def fromBytes(mode: DoubleSummary.Mode, bytes: Array[Byte]): TupleIntersectionFacade = {
    val f = new TupleIntersectionFacade(mode)
    if (bytes.nonEmpty && bytes(0) == 1) f.intersect(bytes.drop(1))
    f
  }
}
