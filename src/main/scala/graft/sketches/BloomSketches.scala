package graft.sketches

import org.apache.datasketches.filters.bloomfilter.{BloomFilter, BloomFilterBuilder}
import org.apache.datasketches.memory.Memory

/**
 * Facade over the DataSketches BloomFilter — approximate set membership
 * with NO false negatives and a standard cross-system wire image
 * (`toByteArray`/`heapify`), complementing the Spark-native
 * `graft_bloom_agg` (whose image only Spark reads): build the filter
 * here, ship the bytes to any DataSketches consumer — or the reverse,
 * which is what incremental dedup against a corpus maintained by another
 * engine needs.
 *
 * Mergeability contract: filters built with the same (maxItems, fpp,
 * seed) triple have identical bit-array size, hash count, and seed, so
 * `union`/`intersect` are well-defined; graft freezes the triple into
 * the plan driver-side (the same discipline as every sketch family), so
 * a 1000-executor job cannot mix incompatible partials. Pure JVM, no
 * Spark dependency.
 */
object BloomSketchFacade {

  /** Fixed hash seed: partial filters must share it to union, and a
   *  DIFFERENT engine must know it to query the shipped image. The
   *  DataSketches library default update seed, for familiarity. */
  val Seed: Long = 9001L

  def create(maxItems: Long, fpp: Double): BloomFilter =
    BloomFilterBuilder.createByAccuracy(maxItems, fpp, Seed)

  def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.heapify(Memory.wrap(bytes))

  /** Zero-copy read-only view for QUERIES — no bit-array copy per call
   *  (heapify copies; a 100k-item 1% filter is ~120 KB). */
  def wrapBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.wrap(Memory.wrap(bytes))
}

/**
 * Union accumulation buffer: one filter updated with raw values and/or
 * unioned with serialized partials. Safe under any interleaving of
 * update() and merge() — union is bitwise-OR over identically-shaped
 * bit arrays.
 */
final class BloomUnionFacade(val maxItems: Long, val fpp: Double) {
  private val filter = BloomSketchFacade.create(maxItems, fpp)

  def update(v: String): Unit = filter.update(v)
  def update(v: Long): Unit = filter.update(v)
  def merge(bytes: Array[Byte]): Unit = filter.union(BloomSketchFacade.fromBytes(bytes))
  def merge(other: BloomUnionFacade): Unit = filter.union(other.filter)
  def toBytes: Array[Byte] = filter.toByteArray
}

object BloomUnionFacade {
  def create(maxItems: Long, fpp: Double): BloomUnionFacade =
    new BloomUnionFacade(maxItems, fpp)
  def fromBytes(maxItems: Long, fpp: Double, bytes: Array[Byte]): BloomUnionFacade = {
    val f = new BloomUnionFacade(maxItems, fpp)
    f.merge(bytes)
    f
  }
}

/**
 * Intersection accumulation buffer (bitwise-AND — membership in EVERY
 * input filter; a true Spark's `bloom_filter_agg` cannot express). Empty
 * tracking mirrors [[TupleIntersectionFacade]]: an intersection of zero
 * inputs has no defined result, serialized as a one-byte marker +
 * filter image.
 */
final class BloomIntersectionFacade(val maxItems: Long, val fpp: Double) {
  private var filter: org.apache.datasketches.filters.bloomfilter.BloomFilter = null

  def intersect(bytes: Array[Byte]): Unit = {
    val in = BloomSketchFacade.fromBytes(bytes)
    if (filter == null) filter = in else filter.intersect(in)
  }
  def merge(other: BloomIntersectionFacade): Unit = {
    if (other.filter != null) {
      if (filter == null) filter = other.filter else filter.intersect(other.filter)
    }
  }
  /** Filter bytes; null when no input arrived (empty group). */
  def toResultBytes: Array[Byte] = if (filter == null) null else filter.toByteArray
  def toBytes: Array[Byte] =
    if (filter == null) Array[Byte](0) else Array[Byte](1) ++ filter.toByteArray
}

object BloomIntersectionFacade {
  def create(maxItems: Long, fpp: Double): BloomIntersectionFacade =
    new BloomIntersectionFacade(maxItems, fpp)
  def fromBytes(maxItems: Long, fpp: Double, bytes: Array[Byte]): BloomIntersectionFacade = {
    val f = new BloomIntersectionFacade(maxItems, fpp)
    if (bytes.nonEmpty && bytes(0) == 1) f.intersect(bytes.drop(1))
    f
  }
}
