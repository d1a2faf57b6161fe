package graft.sketches

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble

/**
 * Facade over the DataSketches t-digest — the centroid-based quantile
 * sketch (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
 * t-Digests"). Complements the KLL/REQ/classic families already exposed:
 * where those give uniform rank-error guarantees, the t-digest
 * concentrates accuracy at the DISTRIBUTION TAILS (error scales with
 * q(1-q)), which is what latency/price outlier monitoring wants, and its
 * double-precision values avoid the reference families' float narrowing.
 *
 * Mergeability contract: digests merge associatively with bounded error
 * growth, so partial aggregation (map-side combine) is safe — the
 * standard TypedImperativeAggregate lifecycle. Serialized form is the
 * standard DataSketches t-digest image (`toByteArray`/`heapify`),
 * loadable by any DataSketches consumer. Pure JVM, no Spark dependency.
 */
object TDigestFacade {

  /** Empty digest with compression parameter `k` (10..10000 enforced at
   *  the conf layer; larger k = more centroids = tighter error). */
  def create(k: Int): TDigestDouble = new TDigestDouble(k.toShort)

  /** Heapify serialized digest bytes (throws on corrupt input). */
  def fromBytes(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  /** Quantile at `rank` in [0,1]; null for an empty digest. */
  def quantile(bytes: Array[Byte], rank: Double): java.lang.Double = {
    val td = fromBytes(bytes)
    if (td.isEmpty) null else Double.box(td.getQuantile(rank))
  }

  /** Normalized rank of `value` in [0,1]; null for an empty digest. */
  def rank(bytes: Array[Byte], value: Double): java.lang.Double = {
    val td = fromBytes(bytes)
    if (td.isEmpty) null else Double.box(td.getRank(value))
  }
}
