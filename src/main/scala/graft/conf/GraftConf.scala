package graft.conf

import java.util.Locale

import org.apache.spark.sql.internal.SQLConf

/**
 * Session configuration for the graft sketch engine.
 *
 * Keys and defaults mirror the reference plugin's surface
 * (reference: DataSketchConf.scala:27-124) so existing users can switch
 * without changing their configs. Unlike the reference — which re-reads
 * `SQLConf.get` inside executor-side buffer factories
 * (reference: quantileSketches.scala:52-62) — graft resolves every sketch
 * parameter ONCE on the driver when the expression is constructed and
 * freezes it into the expression tree. On a 1000-executor cluster this
 * guarantees all partial aggregates use identical sketch parameters even
 * if task-local conf propagation is altered, and makes plans
 * self-describing.
 */
object GraftConf {
  val QUANTILE_SKETCH_IMPL_KEY = "spark.sql.dataSketches.quantiles.sketchImpl"
  val QUANTILE_KLL_K_KEY = "spark.sql.dataSketches.quantiles.kll.k"
  val QUANTILE_REQ_K_KEY = "spark.sql.dataSketches.quantiles.req.k"
  val QUANTILE_MERGEABLE_K_KEY = "spark.sql.dataSketches.quantiles.mergeable.k"
  val FREQITEMS_MAX_MAP_SIZE_KEY = "spark.sql.dataSketches.freqItems.maxMapSize"
  val DISTINCT_CNT_SKETCH_IMPL_KEY = "spark.sql.dataSketches.distinctCnt.sketchImpl"
  val DISTINCT_CNT_CPC_LGK_KEY = "spark.sql.dataSketches.distinctCnt.cpc.lgK"
  val DISTINCT_CNT_HLL_LGK_KEY = "spark.sql.dataSketches.distinctCnt.hll.lgK"

  private def conf: SQLConf = SQLConf.get

  private def getInt(key: String, default: Int): Int =
    conf.getConfString(key, default.toString).toInt

  /** Default quantile algorithm: REQ, k=12 (reference: DataSketchConf.scala:36-55). */
  def quantileSketchImpl: String =
    conf.getConfString(QUANTILE_SKETCH_IMPL_KEY, "REQ").toUpperCase(Locale.ROOT)
  def quantileKllK: Int = getInt(QUANTILE_KLL_K_KEY, 200)
  def quantileReqK: Int = getInt(QUANTILE_REQ_K_KEY, 12)
  def quantileMergeableK: Int = getInt(QUANTILE_MERGEABLE_K_KEY, 128)

  /** Misra-Gries map size; sketch is exact while #distinct < 0.75 * this. */
  def freqItemsMaxMapSize: Int = getInt(FREQITEMS_MAX_MAP_SIZE_KEY, 1024)

  /** Default distinct-count algorithm: CPC, lgK=11 (reference: DataSketchConf.scala:73-85). */
  def distinctCntSketchImpl: String =
    conf.getConfString(DISTINCT_CNT_SKETCH_IMPL_KEY, "CPC").toUpperCase(Locale.ROOT)
  def distinctCntCpcLgK: Int = getInt(DISTINCT_CNT_CPC_LGK_KEY, 11)
  def distinctCntHllLgK: Int = getInt(DISTINCT_CNT_HLL_LGK_KEY, 12)
}
