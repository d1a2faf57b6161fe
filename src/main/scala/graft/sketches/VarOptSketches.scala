package graft.sketches

import scala.jdk.CollectionConverters._

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.{VarOptItemsSketch, VarOptItemsUnion}

/**
 * Facade over the DataSketches VarOpt (variance-optimal) WEIGHTED
 * sampling sketch: a mergeable sample of up to `k` items where inclusion
 * probability is proportional to weight and each kept item carries an
 * adjusted weight making subset-sum estimates unbiased — the primitive
 * behind importance-weighted training mixtures ("sample documents
 * proportional to quality score") at stream scale.
 *
 * Like the reservoir, the RNG is not seedable: under-full sketches
 * (n <= k) keep every item with its EXACT original weight
 * (deterministic as a weighted set); over-full behavior is
 * property-testable only.
 */
final class VarOptFacade(val k: Int) {
  import VarOptFacade.SERDE
  private var gadget: VarOptItemsSketch[String] = VarOptItemsSketch.newInstance(k)

  def update(v: String, weight: Double): Unit = gadget.update(v, weight)

  def merge(other: VarOptFacade): Unit = {
    val u = VarOptItemsUnion.newInstance[String](k)
    u.update(gadget)
    u.update(other.gadget)
    gadget = u.getResult
  }
  def merge(bytes: Array[Byte]): Unit = {
    val u = VarOptItemsUnion.newInstance[String](k)
    u.update(gadget)
    u.update(Memory.wrap(bytes), SERDE)
    gadget = u.getResult
  }

  /** Total stream size observed. */
  def n: Long = gadget.getN
  /** (item, adjusted weight) pairs; weights are exact while n <= k. */
  def samples: Array[(String, Double)] =
    gadget.getSketchSamples.iterator().asScala
      .map(ws => (ws.getItem.toString, ws.getWeight))
      .toArray
  def toBytes: Array[Byte] = gadget.toByteArray(SERDE)
}

object VarOptFacade {
  private val SERDE = new ArrayOfStringsSerDe()

  def create(k: Int): VarOptFacade = new VarOptFacade(k)
  def fromBytes(k: Int, bytes: Array[Byte]): VarOptFacade = {
    val f = new VarOptFacade(k)
    f.merge(bytes)
    f
  }

  /** Direct read-out of a serialized sketch image. */
  def readSamples(bytes: Array[Byte]): (Long, Array[(String, Double)]) = {
    val sk = VarOptItemsSketch.heapify[String](Memory.wrap(bytes), SERDE)
    val samples = sk.getSketchSamples.iterator().asScala
      .map(ws => (ws.getItem.toString, ws.getWeight))
      .toArray
    (sk.getN, samples)
  }
}
