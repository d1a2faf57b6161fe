package graft.sketches

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantiles.{ItemsSketch, ItemsUnion}

/**
 * Facade over the DataSketches generic ItemsSketch specialized to String
 * with the natural (codepoint) ordering — quantiles over ORDERED STRINGS,
 * which the numeric families cannot express: the median URL, and above
 * all RANGE-PARTITION BOUNDARIES over string keys (url/domain/doc-id),
 * the planner input for writing a 100 TB table partitioned by a string
 * key without a global sort.
 *
 * Same classic mergeable-quantiles algorithm as the MERGEABLE numeric
 * family (k power of 2, default 128; rank error ~1.7% at k=128), same
 * EXCLUSIVE search criterion as every graft quantile estimator, same
 * standard DataSketches wire image (`toByteArray(ArrayOfStringsSerDe)`).
 * Pure JVM, no Spark dependency.
 */
final class StringQuantileFacade(val k: Int) {
  import StringQuantileFacade.{CMP, SERDE}

  // ItemsUnion accepts BOTH raw item updates and sketch merges, so one
  // buffer serves the whole TypedImperativeAggregate lifecycle
  private val union: ItemsUnion[String] =
    ItemsUnion.getInstance(classOf[String], k, CMP)

  def update(v: String): Unit = union.update(v)
  def merge(bytes: Array[Byte]): Unit =
    union.union(ItemsSketch.getInstance(classOf[String], Memory.wrap(bytes), CMP, SERDE))
  def merge(other: StringQuantileFacade): Unit = union.union(other.result)

  def result: ItemsSketch[String] = union.getResult
  def isEmpty: Boolean = result.isEmpty

  /** Quantiles at `ranks` under the EXCLUSIVE criterion (the repo-wide
   *  convention, matching DuckDB's inverse-CDF semantics on exact data). */
  def quantiles(ranks: Array[Double]): Array[String] =
    result.getQuantiles(ranks, QuantileSketchFacade.CRITERIA)

  def toBytes: Array[Byte] = result.toByteArray(SERDE)
}

object StringQuantileFacade {
  private[sketches] val CMP: java.util.Comparator[String] =
    java.util.Comparator.naturalOrder[String]()
  private[sketches] val SERDE = new ArrayOfStringsSerDe()

  def create(k: Int): StringQuantileFacade = new StringQuantileFacade(k)

  def fromBytes(k: Int, bytes: Array[Byte]): StringQuantileFacade = {
    val f = new StringQuantileFacade(k)
    f.merge(bytes)
    f
  }
}
