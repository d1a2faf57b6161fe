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

  /** Fixed-point scale for [[seasonalDecompose]] components. */
  val SeasonScale: Long = 1000000L

  /**
   * Classical additive seasonal decomposition of a daily event-count
   * series: `count = trend + seasonal + residual`, the STL-shaped
   * volume-anomaly primitive ("is today's ingest low, or is it just
   * Sunday?"). Day buckets come from `dayCol` (an integer day number);
   * the series is densified onto a contiguous day spine (gap days
   * count 0 — a silent no-data day is exactly the anomaly this exists
   * to surface), then:
   *
   *   - `trend_fp`   = centered `period`-day moving average (only days
   *                    with a FULL window are emitted — the standard
   *                    edge truncation),
   *   - `seasonal_fp`= per-phase (day MOD period) mean of the
   *                    detrended series, computed over full-window
   *                    days, re-centered so the period sums to ~0,
   *   - `resid_fp`   = the remainder; `|resid_fp|` large flags the
   *                    anomalous days.
   *
   * All components are integer fixed-point ([[SeasonScale]] per count
   * unit) with divisions on non-negative operands only, so results are
   * bit-identical across engines and partitionings.
   *
   * Scale shape: the raw stream collapses to one row per day in a
   * single hash aggregate; everything after runs on the day spine
   * (365 rows/year — droplet-sized forever), so windows over it are
   * cheap even though unpartitioned. The heavy lifting is the first
   * aggregate, which is partial-aggregable and streams once.
   */
  def seasonalDecompose(
      events: DataFrame,
      dayCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val half = (period - 1) / 2
    require(period % 2 == 1, s"period must be odd (centered window), got $period")
    val S = SeasonScale
    // the +1e12 offsets below keep every DIV dividend non-negative ONLY
    // while |det_fp| <= 1e12, i.e. daily counts <= 1e12/S = 1e6. Enforce
    // the precondition loudly — beyond it Spark's DIV (truncate toward
    // zero) would silently diverge from floor-division engines and break
    // the bit-identical contract. Shard by key and pre-aggregate if a
    // stream legitimately exceeds a million events/day.
    val maxDaily = 1000000000000L / S
    val daily = events.select(col(dayCol).cast("long").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .withColumn("n", when(col("n") > maxDaily,
        raise_error(concat(lit("seasonalDecompose: day "),
          col("day").cast("string"), lit(" has "), col("n").cast("string"),
          lit(s" events, max supported is $maxDaily"))))
        .otherwise(col("n")))
    val bounds = broadcast(daily.agg(
      min("day").as("d0"), max("day").as("d1")))
    // densify: the spine generates [d0, d1] and left-joins real counts.
    // Fail fast on an absurd span — ONE corrupt row (epoch-0 timestamp,
    // year-9999 typo) would otherwise make sequence() generate billions
    // of spine rows with no error until the executor OOMs
    val maxSpan = 1000000L // ~2700 years of days
    val spine = bounds
      .select(when(col("d1") - col("d0") > maxSpan,
        raise_error(concat(lit("seasonalDecompose: day span "),
          (col("d1") - col("d0")).cast("string"),
          lit(s" exceeds $maxSpan — corrupt outlier day values?"))))
        .otherwise(col("d0")).as("d0"), col("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
    import org.apache.spark.sql.expressions.Window
    // the spine is one-row-per-day small; a global ordered window over
    // it is a deliberate single-partition op on droplet data
    val wTrend = Window.orderBy("day").rowsBetween(-half, half)
    val trended = spine
      .withColumn("win_n", count(lit(1)).over(wTrend))
      .withColumn("trend_fp",
        expr(s"(sum(n * ${S}L) OVER (ORDER BY day ROWS BETWEEN $half " +
          s"PRECEDING AND $half FOLLOWING)) DIV $period"))
      .where(col("win_n") === period) // full windows only
      .withColumn("phase", pmod(col("day"), lit(period.toLong)))
      .withColumn("det_fp", col("n") * S - col("trend_fp"))
    // materialize once before the seasonal join fans out (3 consumers);
    // checkpoint blocks free with the RDD, no session cache residue
    val cached = trended.localCheckpoint()
    // per-phase mean of the detrended series; the offset keeps the
    // dividend non-negative so DIV truncation matches every engine
    val big = 1000000000000L
    val seasonal = cached.groupBy("phase")
      .agg(expr(s"(sum(det_fp + ${big}L) DIV count(1)) - ${big}L")
        .as("seasonal_raw"))
    // re-center: seasonal components sum to ~0 over one period
    val meanAdj = broadcast(seasonal.agg(
      expr(s"(sum(seasonal_raw + ${big}L) DIV count(1)) - ${big}L")
        .as("adj")))
    val seas = broadcast(seasonal.crossJoin(meanAdj)
      .select(col("phase"), (col("seasonal_raw") - col("adj")).as("seasonal_fp")))
    cached.join(seas, Seq("phase"))
      .select(col("day"), col("n"), col("trend_fp"), col("seasonal_fp"),
        (col("det_fp") - col("seasonal_fp")).as("resid_fp"))
  }

  /** Fixed-point scale for [[transitionMatrix]] probabilities (ppm). */
  val TransScale: Long = 1000000L

  /**
   * First-order event-type transition matrix: for each user's event
   * stream in (ts, id) order, count (from_type -> to_type) steps and
   * their fixed-point row-conditional probabilities — the Markov-chain
   * summary behind session simulation, bot detection ("view->view->
   * view loops"), and funnel-shape drift. Output: (from_type, to_type,
   * n, p_ppm) where p_ppm = n * [[TransScale]] DIV Σ_to n.
   *
   * Determinism: the successor is defined by the TOTAL order (ts, id)
   * within each user, so ties on ts cannot reorder across engines.
   *
   * Scale shape: one `lead` window PARTITIONED BY USER (parallel,
   * state bounded by a user's own history), then one (from, to) hash
   * count and a from-level re-aggregate joined back — type-pair
   * cardinality, not event cardinality, past the first aggregate.
   */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      // materialize before the row-total join fans out; checkpoint
      // blocks free with the RDD, no session cache residue
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val rowTotals = steps.groupBy("from_type").agg(sum("n").as("tot"))
    steps.join(broadcast(rowTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr(s"(n * ${TransScale}L) DIV tot").as("p_ppm"))
  }

  /**
   * Per-key interval coverage: the union-length sweep over half-open
   * [start, end) integer intervals — "how much wall-clock was this
   * user/device/job actually active, how many dead gaps, was anything
   * double-booked". One row per key:
   *
   *   - `covered`    = length of the UNION of the key's intervals
   *                    (overlaps counted once),
   *   - `span`       = max(end) − min(start),
   *   - `n_gaps`     / `max_gap` = uncovered holes strictly inside the
   *                    span (adjacent intervals — end == next start —
   *                    are continuous, not a gap),
   *   - `n_overlaps` = intervals starting strictly before the running
   *                    max end of their predecessors (the
   *                    double-booking count).
   *
   * The sweep is the classic sorted running-max: with intervals in
   * (start, end) order and `pmax` the max end over STRICT predecessors,
   * an interval contributes `max(0, end − max(start, pmax))` new
   * coverage. Per-row values depend on tie order, but every output here
   * is a tie-symmetric AGGREGATE, so the result is identical on any
   * engine's stable (start, end) sort. All-integer arithmetic.
   *
   * Intervals with end < start raise (a silently dropped or clamped
   * interval skews coverage); end == start is a legal empty interval
   * (contributes 0). Null keys/bounds are excluded like every
   * aggregation here.
   *
   * Scale shape: ONE key-partitioned ordered window + one hash
   * aggregate — state bounded by a key's own interval count (the
   * [[transitionMatrix]] per-user-stream justification), payload never
   * moves, no joins, no driver state.
   */
  def intervalCoverage(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val st = col(startCol).cast("long")
    val en = col(endCol).cast("long")
    val iv = df
      .select(col(keyCol).as("k"), st.as("st"), en.as("en"))
      .where(col("k").isNotNull && col("st").isNotNull && col("en").isNotNull)
      .withColumn("en", when(col("en") < col("st"),
        raise_error(concat(lit("intervalCoverage: end < start for key "),
          col("k").cast("string"), lit(": ["), col("st").cast("string"),
          lit(", "), col("en").cast("string"), lit(")"))))
        .otherwise(col("en")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("st"), col("en"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    iv.withColumn("pmax", max(col("en")).over(w))
      .groupBy(col("k").as(keyCol))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(greatest(lit(0L),
          col("en") - greatest(col("st"), coalesce(col("pmax"), col("st")))))
          .as("covered"),
        (max(col("en")) - min(col("st"))).as("span"),
        sum(when(col("pmax").isNotNull && col("st") > col("pmax"), 1L)
          .otherwise(0L)).as("n_gaps"),
        coalesce(max(when(col("pmax").isNotNull && col("st") > col("pmax"),
          col("st") - col("pmax"))), lit(0L)).as("max_gap"),
        sum(when(col("pmax").isNotNull && col("st") < col("pmax"), 1L)
          .otherwise(0L)).as("n_overlaps"))
  }

  /**
   * One-sided CUSUM change-point detection per key over an integer
   * (period, value) series — "did this source's daily volume shift up,
   * and when": `s_i = max(0, s_{i-1} + (x_i - mean))` in 1e6 fixed
   * point, alarming when `s` exceeds `thresholdPpm` × the key's mean.
   *
   * The max(0,·) recurrence is NOT a window function — but its closed
   * form is: with `c_i = Σ_{j<=i}(x_j - mean)`, `s_i = c_i -
   * min(0, min_{j<=i} c_j)`. So the whole detector is TWO
   * key-partitioned windows (running sum, running min) + one hash
   * agg — no iteration, no state, engine-exact integers end to end.
   *
   * Output per key: (key, n_periods, mean_fp, max_s_fp, n_alarms,
   * first_alarm), where `first_alarm` is the earliest period whose
   * CUSUM cleared the threshold (null if none). Periods are the
   * OBSERVED ones in order; absent periods contribute nothing (callers
   * wanting zero-filled gaps compose with a spine upstream).
   *
   * Scale shape: windows partition by key (the natural shuffle), the
   * per-key series is the collapsed (key, period) count table — days,
   * not events — so even a 100 TB event log windows over droplets.
   */
  def cusumChangepoint(
      df: DataFrame,
      keyCol: String,
      periodCol: String,
      valueCol: String,
      thresholdPpm: Long): DataFrame = {
    require(thresholdPpm > 0, s"thresholdPpm must be > 0, got $thresholdPpm")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("p")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val series = df.select(col(keyCol).as("k"), col(periodCol).cast("long").as("p"),
        col(valueCol).cast("long").as("x"))
      .where(col("k").isNotNull && col("p").isNotNull && col("x").isNotNull)
    val stats = series.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("tot"))
      .withColumn("mean_fp", expr("(tot * 1000000L) DIV n"))
    val s = series.join(stats, Seq("k"))
      .withColumn("c", sum(col("x") * lit(1000000L) - col("mean_fp")).over(w))
      .withColumn("s_fp", col("c") - least(lit(0L), min(col("c")).over(w)))
      // overflow-safe alarm bar: (ppm * mean_fp) DIV 1e6, not s * 1e6
      .withColumn("alarm",
        col("s_fp") > expr(s"($thresholdPpm * mean_fp) DIV 1000000L"))
    s.groupBy(col("k").as(keyCol))
      .agg(
        count(lit(1)).as("n_periods"),
        max(col("mean_fp")).as("mean_fp"),
        max(col("s_fp")).as("max_s_fp"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("alarm"), col("p"))).as("first_alarm"))
  }
}
