package graft.sketches

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch, LongsSketch}
import org.apache.datasketches.memory.Memory

/**
 * Facade over Misra-Gries-style frequent-items sketches (reference:
 * freqItemSketches.scala:37-99). Two concrete element types, String and
 * Long, mirroring the reference's `TypeCollection(LongType, StringType)`
 * input surface. Items are returned with `ErrorType.NO_FALSE_POSITIVES`,
 * sorted by estimated count descending (library order).
 *
 * The sketch is EXACT while the number of distinct items stays below
 * ~0.75 * maxMapSize (no eviction happens) — the basis for the
 * exact-answer oracle checks on low-cardinality columns.
 */
sealed trait FreqSketchFacade {
  def isEmpty: Boolean
  /** v is a String for the string variant, java.lang.Long for the long variant. */
  def update(v: Any): Unit
  def merge(other: FreqSketchFacade): Unit
  /** (item, estimatedCount) pairs, most frequent first. */
  def frequentItems: Array[(Any, Long)]
  def toBytes: Array[Byte]
}

object FreqSketchFacade {
  def createString(maxMapSize: Int): FreqSketchFacade =
    new StringFreqFacade(new ItemsSketch[String](maxMapSize))
  def createLong(maxMapSize: Int): FreqSketchFacade =
    new LongFreqFacade(new LongsSketch(maxMapSize))
  def stringFromBytes(bytes: Array[Byte]): FreqSketchFacade =
    new StringFreqFacade(ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe()))
  def longFromBytes(bytes: Array[Byte]): FreqSketchFacade =
    new LongFreqFacade(LongsSketch.getInstance(Memory.wrap(bytes)))
}

private final class StringFreqFacade(val impl: ItemsSketch[String]) extends FreqSketchFacade {
  override def isEmpty: Boolean = impl.isEmpty
  override def update(v: Any): Unit = impl.update(v.asInstanceOf[String])
  override def merge(other: FreqSketchFacade): Unit =
    impl.merge(other.asInstanceOf[StringFreqFacade].impl)
  override def frequentItems: Array[(Any, Long)] =
    impl.getFrequentItems(ErrorType.NO_FALSE_POSITIVES).map(r => (r.getItem: Any, r.getEstimate))
  override def toBytes: Array[Byte] = impl.toByteArray(new ArrayOfStringsSerDe())
}

private final class LongFreqFacade(val impl: LongsSketch) extends FreqSketchFacade {
  override def isEmpty: Boolean = impl.isEmpty
  override def update(v: Any): Unit = impl.update(v.asInstanceOf[Long])
  override def merge(other: FreqSketchFacade): Unit =
    impl.merge(other.asInstanceOf[LongFreqFacade].impl)
  override def frequentItems: Array[(Any, Long)] =
    impl.getFrequentItems(ErrorType.NO_FALSE_POSITIVES).map(r => (r.getItem: Any, r.getEstimate))
  override def toBytes: Array[Byte] = impl.toByteArray
}
