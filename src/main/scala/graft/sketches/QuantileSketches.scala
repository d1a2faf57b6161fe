package graft.sketches

import java.util.Locale

import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantiles.{DoublesSketch, DoublesUnion, UpdateDoublesSketch}
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.req.ReqSketch

/**
 * Quantile-sketch algorithm selector. Mirrors the reference's three
 * algorithms (reference: quantileSketches.scala:42-142):
 *   - KLL:        KllFloatsSketch, k default 200
 *   - REQ:        ReqSketch (relative-error, accurate at rank extremes), k default 12
 *   - MERGEABLE:  classic DoublesSketch, k default 128
 */
sealed abstract class QuantileAlgo(val name: String)
object QuantileAlgo {
  case object KLL extends QuantileAlgo("KLL")
  case object REQ extends QuantileAlgo("REQ")
  case object MERGEABLE extends QuantileAlgo("MERGEABLE")

  def fromString(s: String): QuantileAlgo = s.toUpperCase(Locale.ROOT) match {
    case "KLL" => KLL
    case "REQ" => REQ
    case "MERGEABLE" => MERGEABLE
    case other => throw new IllegalArgumentException(
      s"Unknown quantile sketch implementation: $other (expected KLL, REQ or MERGEABLE)")
  }
}

/**
 * Uniform facade over the three DataSketches quantile families, pure JVM
 * (no Spark dependency) so it is reusable from Catalyst expressions,
 * `Aggregator`s and streaming state alike.
 *
 * Semantics notes (both deliberate reference-compat choices):
 *   - All inputs are narrowed to Float before being fed to the sketch,
 *     regardless of the declared input type (reference:
 *     quantileSketches.scala:250-255).
 *   - Quantiles/PMF use the EXCLUSIVE search criterion, which matches the
 *     datasketches-java 2.x behavior the reference was built against
 *     (e.g. p0.5 of {0,1,2,10} = 2, see reference ApproximateQuerySuite
 *     expectations).
 *   - PMF split points are `i * (max-min)/numSplits` for i in 1..n-1 —
 *     NOT offset by the min value. This replicates a reference quirk
 *     (reference: quantileSketches.scala:100-104) for output compatibility;
 *     it only differs from equi-width-over-[min,max] buckets when min != 0.
 */
sealed trait QuantileSketchFacade {
  def algo: QuantileAlgo
  def isEmpty: Boolean
  def update(v: Float): Unit
  /** Merge `other` (must be the same algorithm) into this facade. */
  def merge(other: QuantileSketchFacade): Unit
  def quantiles(ranks: Array[Double]): Array[Double]
  def pmf(numSplits: Int): Array[Double]
  /** Cumulative ranks at the same (un-offset) split points as [[pmf]];
   *  the final element is always 1.0. */
  def cdf(numSplits: Int): Array[Double]
  /** Normalized rank of `value` under the EXCLUSIVE criterion
   *  (= fraction of items strictly below `value`). */
  def rank(value: Double): Double
  def toBytes: Array[Byte]

  protected def splitPoints(min: Double, max: Double, numSplits: Int): Array[Double] = {
    val splitSize = (max - min) / numSplits
    (1 until numSplits).map(_ * splitSize).toArray
  }
}

object QuantileSketchFacade {
  private[sketches] val CRITERIA = QuantileSearchCriteria.EXCLUSIVE

  def create(algo: QuantileAlgo, k: Int): QuantileSketchFacade = algo match {
    case QuantileAlgo.KLL => new KllFacade(KllFloatsSketch.newHeapInstance(k), k)
    case QuantileAlgo.REQ => new ReqFacade(ReqSketch.builder().setK(k).build(), k)
    case QuantileAlgo.MERGEABLE =>
      new MergeableFacade(DoublesSketch.builder().setK(k).build(), k)
  }

  /** Deserialize a DataSketches byte image produced by [[QuantileSketchFacade.toBytes]]. */
  def fromBytes(algo: QuantileAlgo, k: Int, bytes: Array[Byte]): QuantileSketchFacade = {
    val mem = Memory.wrap(bytes)
    algo match {
      case QuantileAlgo.KLL => new KllFacade(KllFloatsSketch.heapify(mem), k)
      case QuantileAlgo.REQ => new ReqFacade(ReqSketch.heapify(mem), k)
      case QuantileAlgo.MERGEABLE =>
        new MergeableFacade(UpdateDoublesSketch.heapify(mem), k)
    }
  }
}

private final class KllFacade(var impl: KllFloatsSketch, k: Int) extends QuantileSketchFacade {
  import QuantileSketchFacade.CRITERIA
  override def algo: QuantileAlgo = QuantileAlgo.KLL
  override def isEmpty: Boolean = impl.isEmpty
  override def update(v: Float): Unit = impl.update(v)
  override def merge(other: QuantileSketchFacade): Unit =
    impl.merge(other.asInstanceOf[KllFacade].impl)
  override def quantiles(ranks: Array[Double]): Array[Double] =
    impl.getQuantiles(ranks, CRITERIA).map(_.toDouble)
  override def pmf(numSplits: Int): Array[Double] = {
    val sp = splitPoints(impl.getMinItem.toDouble, impl.getMaxItem.toDouble, numSplits)
    impl.getPMF(sp.map(_.toFloat), CRITERIA)
  }
  override def cdf(numSplits: Int): Array[Double] = {
    val sp = splitPoints(impl.getMinItem.toDouble, impl.getMaxItem.toDouble, numSplits)
    impl.getCDF(sp.map(_.toFloat), CRITERIA)
  }
  override def rank(value: Double): Double = impl.getRank(value.toFloat, CRITERIA)
  override def toBytes: Array[Byte] = impl.toByteArray
}

private final class ReqFacade(var impl: ReqSketch, k: Int) extends QuantileSketchFacade {
  import QuantileSketchFacade.CRITERIA
  override def algo: QuantileAlgo = QuantileAlgo.REQ
  override def isEmpty: Boolean = impl.isEmpty
  override def update(v: Float): Unit = impl.update(v)
  override def merge(other: QuantileSketchFacade): Unit =
    impl.merge(other.asInstanceOf[ReqFacade].impl)
  override def quantiles(ranks: Array[Double]): Array[Double] =
    impl.getQuantiles(ranks, CRITERIA).map(_.toDouble)
  override def pmf(numSplits: Int): Array[Double] = {
    val sp = splitPoints(impl.getMinItem.toDouble, impl.getMaxItem.toDouble, numSplits)
    impl.getPMF(sp.map(_.toFloat), CRITERIA)
  }
  override def cdf(numSplits: Int): Array[Double] = {
    val sp = splitPoints(impl.getMinItem.toDouble, impl.getMaxItem.toDouble, numSplits)
    impl.getCDF(sp.map(_.toFloat), CRITERIA)
  }
  override def rank(value: Double): Double = impl.getRank(value.toFloat, CRITERIA)
  override def toBytes: Array[Byte] = impl.toByteArray
}

private final class MergeableFacade(var impl: UpdateDoublesSketch, k: Int)
  extends QuantileSketchFacade {
  import QuantileSketchFacade.CRITERIA
  override def algo: QuantileAlgo = QuantileAlgo.MERGEABLE
  override def isEmpty: Boolean = impl.isEmpty
  override def update(v: Float): Unit = impl.update(v.toDouble)
  override def merge(other: QuantileSketchFacade): Unit = {
    val union = DoublesUnion.builder().setMaxK(k).build()
    union.union(impl)
    union.union(other.asInstanceOf[MergeableFacade].impl)
    impl = union.getResult
  }
  override def quantiles(ranks: Array[Double]): Array[Double] =
    impl.getQuantiles(ranks, CRITERIA)
  override def pmf(numSplits: Int): Array[Double] = {
    val sp = splitPoints(impl.getMinItem, impl.getMaxItem, numSplits)
    impl.getPMF(sp, CRITERIA)
  }
  override def cdf(numSplits: Int): Array[Double] = {
    val sp = splitPoints(impl.getMinItem, impl.getMaxItem, numSplits)
    impl.getCDF(sp, CRITERIA)
  }
  override def rank(value: Double): Double = impl.getRank(value, CRITERIA)
  override def toBytes: Array[Byte] = impl.toByteArray
}
