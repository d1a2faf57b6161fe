package graft.sketches

import scala.collection.mutable

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tuple.{CompactSketch, Sketch, Sketches, Union}
import org.apache.datasketches.tuple.strings.{ArrayOfStringsSketch, ArrayOfStringsSummary,
  ArrayOfStringsSummaryDeserializer, ArrayOfStringsSummarySetOperations}

/**
 * Facade over the DataSketches FDT (Frequent Distinct Tuples) machinery —
 * the ArrayOfStrings tuple sketch: each retained entry is a DISTINCT
 * string tuple, so grouping retained entries by a subset of the tuple
 * positions estimates "which dimension combinations have the most
 * DISTINCT ids" (fdt.FdtSketch's question) — dedup-aware heavy hitters,
 * e.g. which (source, lang) slices contribute the most distinct
 * documents, robust to any one document being ingested many times.
 * (Plain freq-items would count repeats; a tuple sketch counts each
 * distinct tuple once.)
 *
 * Exactness contract: below 2^lgK distinct tuples every tuple is
 * retained and theta == 1, so per-group distinct counts are EXACT.
 * Serialized form is the standard DataSketches compact tuple image with
 * ArrayOfStrings summaries, loadable by any DataSketches consumer
 * (fdt.FdtSketch serializes the same representation). Pure JVM.
 */
object FdtSketchFacade {

  def sketchFromBytes(bytes: Array[Byte]): Sketch[ArrayOfStringsSummary] =
    Sketches.heapifySketch(Memory.wrap(bytes), new ArrayOfStringsSummaryDeserializer())

  /**
   * Top-k primary-key groups by estimated distinct-tuple count: group the
   * retained DISTINCT tuples by the `indices` positions, estimate each
   * group as retained/theta (the standard unbiased estimator; exact at
   * theta == 1), order by estimate descending with the rendered key
   * ascending as the total tie-break.
   */
  def topK(
      bytes: Array[Byte],
      indices: Array[Int],
      k: Int,
      sep: String = ","): Seq[(String, Long)] = {
    val sk = sketchFromBytes(bytes)
    val counts = mutable.HashMap.empty[String, Long]
    val it = sk.iterator()
    while (it.next()) {
      val tuple = it.getSummary.getValue
      val key = indices.map(tuple(_)).mkString(sep)
      counts.update(key, counts.getOrElse(key, 0L) + 1L)
    }
    val theta = sk.getTheta
    counts.toSeq
      .map { case (key, c) => (key, Math.round(c / theta)) }
      .sortBy { case (key, est) => (-est, key) }
      .take(k)
  }
}

/**
 * Accumulation buffer for the FDT aggregates — the [[TupleUnionFacade]]
 * shape over ArrayOfStrings summaries: an updatable sketch for raw tuple
 * updates plus a lazy union for serialized-image merges.
 */
final class FdtUnionFacade(val lgK: Int) {
  private val updatable = new ArrayOfStringsSketch(lgK)
  private var mergeUnion: Union[ArrayOfStringsSummary] = null
  private var hasUpdates = false

  def update(tuple: Array[String]): Unit = {
    updatable.update(tuple, tuple)
    hasUpdates = true
  }

  private def ensureUnion(): Union[ArrayOfStringsSummary] = {
    if (mergeUnion == null) {
      mergeUnion = new Union[ArrayOfStringsSummary](
        1 << lgK, new ArrayOfStringsSummarySetOperations())
    }
    mergeUnion
  }

  def merge(bytes: Array[Byte]): Unit =
    ensureUnion().union(FdtSketchFacade.sketchFromBytes(bytes))

  def merge(other: FdtUnionFacade): Unit = ensureUnion().union(other.result)

  def result: CompactSketch[ArrayOfStringsSummary] = {
    if (mergeUnion == null) {
      updatable.compact()
    } else if (!hasUpdates) {
      mergeUnion.getResult
    } else {
      val u = new Union[ArrayOfStringsSummary](
        1 << lgK, new ArrayOfStringsSummarySetOperations())
      u.union(mergeUnion.getResult)
      u.union(updatable.compact())
      u.getResult
    }
  }

  def toBytes: Array[Byte] = result.toByteArray
}

object FdtUnionFacade {
  def create(lgK: Int): FdtUnionFacade = new FdtUnionFacade(lgK)
  def fromBytes(lgK: Int, bytes: Array[Byte]): FdtUnionFacade = {
    val f = new FdtUnionFacade(lgK)
    f.merge(bytes)
    f
  }
}
