package graft.sketches

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.ReservoirItemsUnion

/**
 * Facade over the DataSketches reservoir-items sampling sketch (string
 * items): a MERGEABLE uniform sample of up to `k` items from a stream of
 * unknown size — the primitive behind "sample 1M documents from 100 TB"
 * without a global sort or a second pass. Partial reservoirs built per
 * partition union into an unbiased reservoir of the whole stream.
 *
 * Sampling is genuinely random (the library's RNG is not seedable), so
 * only under-full reservoirs (n <= k, which keep every item) are
 * byte-deterministic; assertions on over-full reservoirs must be
 * property-based (size == k, items ⊆ input, n == stream size).
 */
final class ReservoirFacade(val k: Int) {
  import ReservoirFacade.SERDE
  private val union: ReservoirItemsUnion[String] = ReservoirItemsUnion.newInstance(k)

  // a union that never received input has a null result (e.g. the empty
  // partial-aggregation buffers of empty shuffle partitions) — every
  // accessor below must treat that as the empty reservoir
  private def result: Option[org.apache.datasketches.sampling.ReservoirItemsSketch[String]] =
    Option(union.getResult)

  def update(v: String): Unit = union.update(v)
  def merge(bytes: Array[Byte]): Unit = union.update(Memory.wrap(bytes), SERDE)
  def merge(other: ReservoirFacade): Unit = other.result.foreach(union.update)

  /** Total stream size observed (not the sample size). */
  def n: Long = result.map(_.getN).getOrElse(0L)
  def samples: Array[String] = result match {
    case Some(r) if r.getNumSamples > 0 => r.getSamples(classOf[java.lang.String])
    case _ => Array.empty
  }
  /** Serialized SKETCH image (not the union's) — one wire format for
   *  accumulate output, combine input, shuffle state, and estimate. */
  def toBytes: Array[Byte] = result
    .getOrElse(org.apache.datasketches.sampling.ReservoirItemsSketch.newInstance[String](k))
    .toByteArray(SERDE)
}

object ReservoirFacade {
  private val SERDE = new ArrayOfStringsSerDe()

  def create(k: Int): ReservoirFacade = new ReservoirFacade(k)
  def fromBytes(k: Int, bytes: Array[Byte]): ReservoirFacade = {
    val f = new ReservoirFacade(k)
    f.merge(bytes)
    f
  }

  /** Direct read-out of a serialized sketch image (no union, so the
   *  stored k is respected regardless of the reader's k). */
  def readSamples(bytes: Array[Byte]): (Long, Array[String]) = {
    val sk = org.apache.datasketches.sampling.ReservoirItemsSketch
      .heapify[String](Memory.wrap(bytes), SERDE)
    val samples =
      if (sk.getNumSamples == 0) Array.empty[String]
      else sk.getSamples(classOf[java.lang.String]).map(_.toString)
    (sk.getN, samples)
  }
}
