package graft.sketches

import java.util.Locale

import org.apache.datasketches.cpc.{CpcSketch, CpcUnion}
import org.apache.datasketches.hll.{HllSketch, Union => HllUnion}
import org.apache.datasketches.memory.Memory

/**
 * Distinct-count sketch algorithm selector (reference:
 * distinctCntSketches.scala:38-107): CPC (default, lgK=11) or HLL (lgK=12).
 */
sealed abstract class DistinctAlgo(val name: String)
object DistinctAlgo {
  case object CPC extends DistinctAlgo("CPC")
  case object HLL extends DistinctAlgo("HLL")

  def fromString(s: String): DistinctAlgo = s.toUpperCase(Locale.ROOT) match {
    case "CPC" => CPC
    case "HLL" => HLL
    case other => throw new IllegalArgumentException(
      s"Unknown distinct count sketch implementation: $other (expected CPC or HLL)")
  }
}

/**
 * Facade over CPC/HLL cardinality sketches. Pure JVM, no Spark dependency.
 * Estimates are truncated (not rounded) to Long, matching the reference
 * (reference: distinctCntSketches.scala:90,105).
 */
sealed trait DistinctSketchFacade {
  def algo: DistinctAlgo
  def isEmpty: Boolean
  def update(v: Long): Unit
  def update(v: String): Unit
  def merge(other: DistinctSketchFacade): Unit
  def estimate: Long
  def toBytes: Array[Byte]
}

object DistinctSketchFacade {
  def create(algo: DistinctAlgo, lgK: Int): DistinctSketchFacade = algo match {
    case DistinctAlgo.CPC => new CpcFacade(new CpcSketch(lgK), lgK)
    case DistinctAlgo.HLL => new HllFacade(new HllSketch(lgK), lgK)
  }

  def fromBytes(algo: DistinctAlgo, lgK: Int, bytes: Array[Byte]): DistinctSketchFacade =
    algo match {
      case DistinctAlgo.CPC => new CpcFacade(CpcSketch.heapify(Memory.wrap(bytes)), lgK)
      case DistinctAlgo.HLL => new HllFacade(HllSketch.heapify(Memory.wrap(bytes)), lgK)
    }
}

private final class CpcFacade(var impl: CpcSketch, lgK: Int) extends DistinctSketchFacade {
  override def algo: DistinctAlgo = DistinctAlgo.CPC
  override def isEmpty: Boolean = impl.isEmpty
  override def update(v: Long): Unit = impl.update(v)
  override def update(v: String): Unit = impl.update(v)
  override def merge(other: DistinctSketchFacade): Unit = {
    val union = new CpcUnion(lgK)
    union.update(impl)
    union.update(other.asInstanceOf[CpcFacade].impl)
    impl = union.getResult
  }
  override def estimate: Long = impl.getEstimate.toLong
  override def toBytes: Array[Byte] = impl.toByteArray
}

// HLL serializes compact (smallest image; Union re-hydrates it fine).
private final class HllFacade(var impl: HllSketch, lgK: Int) extends DistinctSketchFacade {
  override def algo: DistinctAlgo = DistinctAlgo.HLL
  override def isEmpty: Boolean = impl.isEmpty
  override def update(v: Long): Unit = impl.update(v)
  override def update(v: String): Unit = impl.update(v)
  override def merge(other: DistinctSketchFacade): Unit = {
    val union = new HllUnion(lgK)
    union.update(impl)
    union.update(other.asInstanceOf[HllFacade].impl)
    impl = union.getResult
  }
  override def estimate: Long = impl.getEstimate.toLong
  override def toBytes: Array[Byte] = impl.toCompactByteArray
}
