package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over (user, type, timestamp) streams — the
 * funnel/cohort queries product pipelines run next to sessionization
 * ([[graft.streaming.StreamingOps.sessionize]]) and point-in-time
 * enrichment ([[AsofJoin]]). Timestamps are integer epoch values
 * (micros here, any unit works), so every comparison is exact in any
 * engine.
 *
 * Cache lifecycle: both operators cache intermediate frames that the
 * returned plan references more than once (Spark does no cross-branch
 * plan dedup, so uncached they would recompute per branch). Entries are
 * registered by logical plan — re-running the SAME funnel/cohort reuses
 * them rather than stacking copies — but a long-lived session cycling
 * many DIFFERENT funnels should release them between pipelines with
 * `spark.catalog.clearCache()` (the Verify/Bench harnesses do).
 */
object EventOps {

  /**
   * Ordered multi-step funnel: for each user, the FIRST occurrence of
   * `steps.head`, then the first occurrence of each later step STRICTLY
   * AFTER the previous step's time and within `within` time units of it.
   * Returns one row per user who entered the funnel:
   * (user_id, t1, ..., tn) with nulls from the first step the user
   * dropped at — count(t_k) over the result is the classic funnel
   * stage-conversion report.
   *
   * Scale design: each stage is one filter + min-aggregate keyed on the
   * user (map-side partial combine) and one user-keyed join against the
   * previous stage — no windows, no per-user event sorting, no row
   * blowup; all stage frames are one row per qualifying user, far
   * smaller than the event stream, so AQE broadcasts them as the funnel
   * narrows.
   */
  def funnelStages(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      within: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(within > 0, s"within must be positive, got $within")
    val base = events.select(col(userCol).as("user_id"), col(typeCol).as("__et"),
      col(tsCol).as("__t"))
    // each stage frame: one row per user who reached that stage, carrying
    // every earlier stage time (functionally user-determined, grouped
    // along so no re-join is needed). Every frame is CACHED: stage k's
    // plan embeds stage k-1's, and the final assembly references each
    // frame again — Spark does no cross-branch plan dedup, so uncached,
    // stage 1 (a full event-stream aggregate) would execute once per
    // later stage. Frames are per-user rows, far smaller than the
    // stream.
    val first = base.where(col("__et") === steps.head)
      .groupBy("user_id").agg(min(col("__t")).as("t1"))
      .cache()
    val stages = steps.tail.zipWithIndex.scanLeft(first) { case (prev, (step, i)) =>
      val tPrev = s"t${i + 1}"
      val tCur = s"t${i + 2}"
      base.where(col("__et") === step)
        .join(prev, "user_id")
        .where(col("__t") > col(tPrev) && col("__t") <= col(tPrev) + within)
        .groupBy((col("user_id") +: (1 to i + 1).map(k => col(s"t$k"))): _*)
        .agg(min(col("__t")).as(tCur))
        .cache()
    }
    // left-join each stage's new column back so drop-offs keep their row
    // with nulls from the stage they missed
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      acc.join(stage.select(col("user_id"), col(s"t${i + 2}")), Seq("user_id"), "left")
    }
  }

  /**
   * Retention cohorts on integer time buckets: each user's cohort is
   * their first active bucket (`floor(ts / bucket)`); the output counts
   * distinct users per (cohort_bucket, bucket_offset) — the classic
   * triangle retention matrix, built entirely from integer arithmetic
   * so any SQL engine reproduces it exactly.
   *
   * Scale design: one distinct over (user, bucket) — the only pass over
   * the raw events — then a user-keyed min-aggregate and join (both
   * reuse the same key), and a final small aggregate over the matrix
   * cells.
   */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    // integer `div`, not floor(double division): an epoch-nanos timestamp
    // (~1.7e18) already exceeds a double's 2^53 exact range before the
    // divide, which would misbucket boundary events
    // cached: feeds both the cohort aggregate and the matrix join — the
    // only pass over the raw events must not run twice
    val active = events
      .select(col(userCol).as("user_id"),
        expr(s"`$tsCol` div $bucket").as("wk"))
      .distinct()
      .cache()
    val cohorts = active.groupBy("user_id").agg(min(col("wk")).as("cohort_bucket"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_bucket"), (col("wk") - col("cohort_bucket")).as("bucket_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /**
   * Exponentially decayed event counts per group: each event weighs
   * `2^-age`, with age in integer `halfLifeBuckets` of `bucket` time
   * units before the corpus's newest event — "how active is this
   * source NOW", the recency signal a freshness-weighted data mixture
   * feeds on, next to the raw count it replaces.
   *
   * Determinism by construction: half-life weights are DYADIC — the
   * weight is the integer `2^40 >> age` (ages >= 41 decay to exactly
   * zero: 2^-41 is below the grain, the documented truncation) — so
   * the per-group sum is exact BIGINT arithmetic in any order, on any
   * engine, at any partitioning; `decayed_fp` is in units of 2^-40.
   * Headroom: 2^63 / 2^40 = 8.3M max-weight events per group before
   * overflow; beyond that, shrink the unit.
   *
   * Scale shape: one max-ts aggregate (one-row broadcast), then one
   * hash aggregation — the events stream once.
   */
  def decayedCounts(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      bucket: Long,
      halfLifeBuckets: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    require(halfLifeBuckets > 0,
      s"halfLifeBuckets must be positive, got $halfLifeBuckets")
    val bucketed = events.select(col(groupCol).as("g"),
      expr(s"`$tsCol` div $bucket").as("bk"))
    val newest = broadcast(bucketed.agg(max(col("bk")).as("max_bk")))
    bucketed.crossJoin(newest)
      .withColumn("age", expr(s"(max_bk - bk) div $halfLifeBuckets"))
      .withColumn("w", when(col("age") <= 40,
        expr(s"shiftright(${1L << 40}L, cast(age as int))")).otherwise(0L))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("decayed_fp"))
  }
}
