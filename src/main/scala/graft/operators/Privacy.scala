package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Privacy gates for corpus release: k-anonymity over quasi-identifier
 * columns — the check a dataset export runs before metadata columns
 * (language, source, geography, timestamps) ship alongside content.
 * Complements the content-level PII redaction in [[TextOps]].
 *
 * Scale design: both operators are a single hash aggregation on the
 * quasi-identifier key. Suppression joins the qualifying group KEYS back
 * left-semi — co-partitioned with the aggregation's own shuffle, rows
 * never buffer per group (no window), and the semi-join side carries
 * keys only, never payload columns.
 */
object Privacy {

  /** Per-group k-anonymity profile: (quasi..., n, anonymous) — one row
    * per distinct quasi-identifier combination, `anonymous = n >= k`.
    * Null quasi-values form their own group (SQL GROUP BY semantics),
    * which is the conservative reading: a null combination seen once is
    * still a singleton that re-identifies. */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** Suppression release: only rows whose quasi-identifier combination
    * appears >= k times survive — every released row hides among at
    * least k-1 others. The join is NULL-SAFE (`<=>`), matching
    * [[kAnonymityProfile]]'s null-combination grouping: a null combo
    * seen >= k times is released like any other group, instead of
    * being silently dropped by non-null-safe key equality. */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val keep = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") >= k)
      .select(quasiCols.zipWithIndex.map { case (c, i) => col(c).as(s"__k$i") }: _*)
    val cond = quasiCols.zipWithIndex
      .map { case (c, i) => df(c) <=> keep(s"__k$i") }
      .reduce(_ && _)
    df.join(keep, cond, "left_semi")
  }

  /** Distinct l-diversity: k-anonymity's blind spot is a group of k
    * rows that all share ONE sensitive value — group size hides nothing
    * when the attribute itself is unanimous. Per quasi-identifier
    * combination this reports the number of DISTINCT sensitive values
    * (`diversity`) and whether it clears `l`. Output: one row per
    * combination (quasi..., n, diversity, diverse).
    *
    * Scale shape: one hash aggregation on the quasi key; the exact
    * `count(distinct)` rewrites to a two-phase expand-aggregate
    * (partial per-value dedup map-side), never a per-group buffer. */
  def lDiversityProfile(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("diversity"))
      .withColumn("diverse", col("diversity") >= l)
  }

  /** Deterministic keyed pseudonymization: replace each listed column's
    * value with the engine's 60-bit md5-hash-space surrogate of
    * `salt:value` — referential consistency survives (equal values map
    * to equal surrogates across every table sharing the salt, so joins
    * and distinct counts still work), while the raw identifier never
    * leaves the cluster. Rotating the salt unlinks releases from each
    * other. Nulls stay null; the mapping is one-way (recovery only by
    * re-hashing a known identifier, not by inversion). A pure
    * projection — no shuffle, no state. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        conv(substring(md5(concat(lit(s"$salt:"), col(c).cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long"))
    }
  }
}
