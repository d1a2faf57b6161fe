/**
 * Typed, documented SQLConf entries for the graft sketch parameters.
 *
 * Mirrors the reference plugin's registration of its conf surface into
 * Spark's conf registry (reference: DataSketchConf.scala:34-92, which uses
 * `SQLConf.buildConf` + `checkValue(s)`), rather than reading raw
 * `getConfString`: registered entries are visible in `SET -v`, documented
 * via `.doc`, and — most importantly — validated AT `SET` TIME with a
 * helpful message (`SET spark.sql.dataSketches.quantiles.kll.k=abc` fails
 * immediately instead of surfacing a bare NumberFormatException at plan
 * time).
 *
 * Lives under `org.apache.spark.sql` because `SQLConf.buildConf` is
 * `private[sql]`. [[graft.conf.GraftConf]] keeps the public accessor
 * surface and delegates here.
 */
package org.apache.spark.sql.graft

import java.util.Locale

import org.apache.spark.internal.config.ConfigEntry
import org.apache.spark.sql.internal.SQLConf

object GraftConfEntries {

  private def buildConf(key: String) = SQLConf.buildConf(key)

  val QUANTILE_SKETCH_IMPL: ConfigEntry[String] =
    buildConf("spark.sql.dataSketches.quantiles.sketchImpl")
      .doc("The sketch implementation used by the quantile estimation functions: " +
        "REQ (relative-error, accurate tails), KLL (uniform rank error), or " +
        "MERGEABLE (classic quantiles sketch).")
      .stringConf
      .transform(_.toUpperCase(Locale.ROOT))
      .checkValues(Set("REQ", "KLL", "MERGEABLE"))
      .createWithDefault("REQ")

  val QUANTILE_KLL_K: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.quantiles.kll.k")
      .doc("The parameter `k` of the KLL quantile sketch; larger is more accurate.")
      .intConf
      .checkValue(_ > 0, "The parameter `k` must be positive.")
      .createWithDefault(200)

  val QUANTILE_REQ_K: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.quantiles.req.k")
      .doc("The parameter `k` of the REQ quantile sketch; must be even and in [4, 1024].")
      .intConf
      .checkValue(_ > 0, "The parameter `k` must be positive.")
      .createWithDefault(12)

  val QUANTILE_MERGEABLE_K: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.quantiles.mergeable.k")
      .doc("The parameter `k` of the MERGEABLE (classic doubles) quantile sketch; " +
        "must be a power of 2.")
      .intConf
      .checkValue(_ > 0, "The parameter `k` must be positive.")
      .createWithDefault(128)

  val FREQITEMS_MAX_MAP_SIZE: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.freqItems.maxMapSize")
      .doc("The physical size of the frequent-items sketch's internal hash map; " +
        "must be a power of 2. The sketch tracks up to 0.75 * maxMapSize items " +
        "exactly; both accuracy and memory are functions of this value.")
      .intConf
      .checkValue(v => v > 0 && (v & (v - 1)) == 0,
        "The parameter `maxMapSize` must be a power of 2.")
      .createWithDefault(1024)

  val DISTINCT_CNT_SKETCH_IMPL: ConfigEntry[String] =
    buildConf("spark.sql.dataSketches.distinctCnt.sketchImpl")
      .doc("The sketch implementation used by the distinct-count estimation " +
        "functions: CPC (compressed probabilistic counting) or HLL (HyperLogLog).")
      .stringConf
      .transform(_.toUpperCase(Locale.ROOT))
      .checkValues(Set("CPC", "HLL"))
      .createWithDefault("CPC")

  val DISTINCT_CNT_CPC_LGK: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.distinctCnt.cpc.lgK")
      .doc("The parameter `lgK` of the CPC distinct-count sketch (log2 of the " +
        "number of bins); must be in [4, 26].")
      .intConf
      .checkValue(_ > 0, "The parameter `lgK` must be positive.")
      .createWithDefault(11)

  val DISTINCT_CNT_HLL_LGK: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.distinctCnt.hll.lgK")
      .doc("The parameter `lgK` of the HLL distinct-count sketch (log2 of the " +
        "number of buckets); must be in [4, 21].")
      .intConf
      .checkValue(_ > 0, "The parameter `lgK` must be positive.")
      .createWithDefault(12)

  val THETA_LGK: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.theta.lgK")
      .doc("The log2 nominal entry count of the theta set-operation sketches " +
        "(theta_accumulate/union/intersect); sketches are exact below 2^lgK " +
        "distinct items.")
      .intConf
      .checkValue(v => v >= 4 && v <= 26, "The parameter `lgK` must be in [4, 26].")
      .createWithDefault(12)

  val TUPLE_LGK: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.tuple.lgK")
      .doc("The log2 nominal entry count of the tuple sketches " +
        "(tuple_accumulate/union/intersect); both the distinct-key count and " +
        "the summed summary values are exact below 2^lgK distinct keys.")
      .intConf
      .checkValue(v => v >= 4 && v <= 26, "The parameter `lgK` must be in [4, 26].")
      .createWithDefault(12)

  val TDIGEST_K: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.tdigest.k")
      .doc("The compression parameter of the t-digest quantile sketches " +
        "(approx_percentile_tdigest/tdigest_accumulate); more centroids = " +
        "tighter rank error, concentrated at the distribution tails.")
      .intConf
      .checkValue(v => v >= 10 && v <= 10000, "The parameter `k` must be in [10, 10000].")
      .createWithDefault(200)

  val FD_ELL: ConfigEntry[Int] =
    buildConf("spark.sql.dataSketches.fd.ell")
      .doc("The sketch size (rows retained) of the Frequent-Directions matrix " +
        "sketch (fd_accumulate without an explicit ell argument); the Gram " +
        "approximation's spectral error is bounded by ||A||_F^2 / ell.")
      .intConf
      .checkValue(v => v >= 2 && v <= 4096, "The parameter `ell` must be in [2, 4096].")
      .createWithDefault(16)

  val APPROX_COUNT_DISTINCT_ENABLED: ConfigEntry[Boolean] =
    buildConf("spark.sql.graft.approxCountDistinct.enabled")
      .doc("When true, exact COUNT(DISTINCT x) aggregates over string/integral " +
        "columns (single argument, no FILTER clause) are rewritten to the " +
        "approx_count_distinct sketch aggregate — one pass with bounded state " +
        "instead of the Expand + second shuffle the exact plan needs. Results " +
        "become estimates (exact below the sketch's deterministic region).")
      .booleanConf
      .createWithDefault(false)

  val APPROX_COUNT_DISTINCT_IMPL: ConfigEntry[String] =
    buildConf("spark.sql.graft.approxCountDistinct.impl")
      .doc("Sketch family used by the COUNT(DISTINCT) rewrite: HLL (exact below " +
        "~3/4*2^lgK distinct values, then estimates) or CPC (estimates " +
        "everywhere, smaller serialized state). lgK comes from the family's " +
        "spark.sql.dataSketches.distinctCnt.*.lgK entry.")
      .stringConf
      .transform(_.toUpperCase(Locale.ROOT))
      .checkValues(Set("CPC", "HLL"))
      .createWithDefault("HLL")

  /**
   * Forces object initialization, registering every entry above into
   * SQLConf's static registry. Called from `Graft.install` so the entries
   * are visible in `SET -v` (and validated on `SET`) as soon as the
   * extension is installed.
   */
  def ensureRegistered(): Unit = ()

  def getString(entry: ConfigEntry[String]): String = SQLConf.get.getConf(entry)
  def getInt(entry: ConfigEntry[Int]): Int = SQLConf.get.getConf(entry)
  def getBoolean(entry: ConfigEntry[Boolean]): Boolean = SQLConf.get.getConf(entry)
}
