package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/**
 * Exact multi-objective skyline (Pareto frontier): the rows not
 * dominated by any other row, where s dominates r iff s is >= r on
 * every maximized dimension, <= on every minimized dimension, and
 * strictly better on at least one. The curation use: the
 * quality/cost/recency frontier of candidate training sources —
 * "no other source is at least as good on every axis and better on
 * one".
 *
 * Scale design — the classic two-phase distributed skyline:
 *
 *  1. *Local prune* (`mapPartitions`): each partition keeps only its
 *     own skyline. Lossless — a row dominated inside one partition is
 *     dominated globally, and dominance is transitive, so every
 *     globally dominated row has a dominating witness among the
 *     survivors. For non-adversarial data the local skyline of a
 *     random partition is tiny (expected O(log^{d-1} n)), so the
 *     surviving candidate set is orders of magnitude smaller than the
 *     input. No shuffle: the only wide op in the whole operator is
 *     Spark broadcasting the candidates.
 *  2. *Global filter*: anti-join the full input against the broadcast
 *     candidate set on the strict-dominance predicate (a broadcast
 *     nested-loop join — |rows| x |candidates| comparisons, the
 *     irreducible cost of exact dominance, but streamed and fully
 *     parallel; candidates stay on the executors, never the driver).
 *
 * Worst case (all rows mutually incomparable) the candidate set IS
 * the input — that input has no useful skyline anyway, and broadcasting
 * it would OOM executors silently. `maxCandidates` fails fast after the
 * local prune instead (the [[graft.operators.EventOps.seasonalDecompose]]
 * maxSpan discipline): raise loudly, let the caller pre-aggregate or
 * drop dimensions.
 *
 * Dimensions must be long-castable and non-null ([[Graph]]'s
 * fail-fast discipline: a silently null-casting string id would
 * otherwise vanish a row from the dominance order). Duplicate rows
 * (equal on every dimension) never strictly dominate each other, so
 * all copies of a frontier point are returned.
 */
object Skyline {

  /** Skyline of `df` maximizing `maxCols` and minimizing `minCols`;
   *  returns the input rows (original schema) on the frontier. Fails
   *  fast when the locally-pruned candidate set exceeds `maxCandidates`
   *  (a near-incomparable input that would blow the broadcast). */
  def skyline(
      df: DataFrame,
      maxCols: Seq[String],
      minCols: Seq[String],
      maxCandidates: Long = 1000000L): DataFrame = {
    val dims = maxCols ++ minCols
    require(maxCandidates >= 1,
      s"maxCandidates must be >= 1, got $maxCandidates")
    require(dims.nonEmpty, "skyline needs at least one dimension")
    require(dims.distinct.size == dims.size,
      s"skyline dimensions must be distinct, got $dims")
    val inCols = df.columns.toSeq
    // normalize to uniform "bigger is better": minimized dims negate.
    // (Long.MinValue has no negation; real measures never sit there.)
    val dimExprs = maxCols.map(c => toDim(col(c), c)) ++
      minCols.map(c => -toDim(col(c), c))
    val d = dims.size
    val withDims = df.select(
      inCols.map(col) ++
        dimExprs.zipWithIndex.map { case (e, i) => e.as(s"__sky_d$i") }: _*)
    val enc = Encoders.row(withDims.schema)
    val base = inCols.size
    // phase 1: per-partition skyline — O(rows x local-skyline size)
    val local = withDims.mapPartitions { it =>
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Row)]
      it.foreach { r =>
        val v = Array.tabulate(d)(i => r.getLong(base + i))
        var dominated = false
        var i = 0
        while (i < kept.length && !dominated) {
          if (dominates(kept(i)._1, v)) dominated = true else i += 1
        }
        if (!dominated) {
          // evict kept points the new one dominates, then keep it
          var j = kept.length - 1
          while (j >= 0) { if (dominates(v, kept(j)._1)) kept.remove(j); j -= 1 }
          kept += ((v, r))
        }
      }
      kept.iterator.map(_._2)
    }(enc)
    // guard the broadcast BEFORE it happens: materialize the pruned
    // candidates once (they feed the broadcast anyway) and fail loudly
    // on a near-incomparable input instead of OOMing executors
    val localCp = local.localCheckpoint()
    val nCand = localCp.count()
    if (nCand > maxCandidates) {
      throw new IllegalStateException(
        s"skyline: $nCand locally-pruned candidates exceed maxCandidates=" +
          s"$maxCandidates — the input is near-incomparable on $dims; " +
          "pre-aggregate or reduce dimensions")
    }
    // phase 2: survivors = rows no candidate STRICTLY dominates
    val cand = broadcast(localCp.select(
      (0 until d).map(i => col(s"__sky_d$i").as(s"__sky_c$i")): _*))
    val allGeq = (0 until d)
      .map(i => col(s"__sky_c$i") >= col(s"__sky_d$i"))
      .reduce(_ && _)
    val anyGt = (0 until d)
      .map(i => col(s"__sky_c$i") > col(s"__sky_d$i"))
      .reduce(_ || _)
    withDims.join(cand, allGeq && anyGt, "left_anti")
      .select(inCols.map(col): _*)
  }

  /** p dominates q: >= everywhere, > somewhere (dims pre-negated). */
  private def dominates(p: Array[Long], q: Array[Long]): Boolean = {
    var geqAll = true
    var gtAny = false
    var i = 0
    while (i < p.length && geqAll) {
      if (p(i) < q(i)) geqAll = false
      else if (p(i) > q(i)) gtAny = true
      i += 1
    }
    geqAll && gtAny
  }

  /** Long-castable, non-null dimension; fails fast otherwise. */
  private def toDim(c: Column, name: String): Column = {
    val l = c.try_cast("long")
    when(c.isNull || l.isNull,
      raise_error(concat(lit(s"skyline dimension '$name' must be a non-null " +
        "long-castable value, got: "), coalesce(c.cast("string"), lit("null")))))
      .otherwise(l)
  }
}
