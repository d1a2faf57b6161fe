package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/**
 * One-pass table profiling on the sketch surface: for every requested
 * column, (n_rows, n_nulls, approximate n_distinct, quartiles p25/p50/
 * p75 for numeric columns, min/max for numeric columns) — the
 * data-quality snapshot a curation pipeline takes before and after each
 * transformation stage.
 *
 * Scale design: ALL columns' statistics ride ONE global aggregate over
 * ONE scan — per-column distinct sketches (`approx_count_distinct_ex`)
 * and quantile sketches (`approx_percentile_ex`) partially aggregate
 * map-side, so the shuffle carries a single row of bounded sketch state
 * per partition regardless of table width or row count. Profiling a
 * 100 TB table costs exactly one pass; the per-column reshaping
 * (struct + explode) happens on the ONE aggregated row. Contrast with
 * naive per-column `count(DISTINCT ...)` profiling, which shuffles the
 * full column domain once per column.
 *
 * Distinct counts hash the column's string rendering (injective for the
 * supported primitive types), so one sketch family profiles every
 * column type uniformly; medians/extremes are computed on the
 * double-cast value for numeric columns and are null otherwise.
 *
 * The distinct sketch is pinned to HLL rather than the session default:
 * HLL's coupon-list mode is EXACT below ~3/4*2^lgK distinct values, so
 * profiles of low/moderate-cardinality columns report true counts (CPC
 * is a statistical estimator even in its sparse region — observed 97
 * for a true 100).
 */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    profileBy(df, Nil, cols)

  /** round(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford expected
    * leading-digit frequencies in parts-per-million. */
  val BenfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /**
   * Benford's-law leading-digit profile of a positive numeric column —
   * the fabricated-data smell test: organically-grown magnitudes
   * (transaction values, populations, file sizes) lead with 1 ~30% of
   * the time; synthetic or tampered columns drift toward uniform.
   * Output: one row per digit 1-9 with the observed count, the Benford
   * expectation (ppm), and the digit's chi-square contribution in 1e3
   * fixed point.
   *
   * Engine-portable by construction: values quantize to
   * `round(x*scale)` BIGINTs, the leading digit comes from the INTEGER
   * decimal rendering (every engine prints integers identically — no
   * float formatting, no log10 boundary jitter at powers of ten), and
   * the chi-square term is ((1e3·obs − n·e DIV 1e3))² DIV (n·e DIV
   * 1e3), all floor division. Non-positive and null values are
   * excluded (Benford is defined on positive magnitudes).
   *
   * Scale shape: one projection + one 9-group hash aggregate; the
   * digit table is driver-size.
   */
  def benfordProfile(df: DataFrame, valueCol: String, scale: Long = 100L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val v = round(col(valueCol) * lit(scale)).cast("long")
    val obs = df.where(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(v.as("v")).where(col("v") > 0)
      .withColumn("digit", substring(col("v").cast("string"), 1, 1).cast("int"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .withColumn("expected_ppm",
        element_at(typedlit(BenfordPpm), col("digit")))
    val n = broadcast(obs.agg(sum(col("n_obs")).as("n")))
    digits.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("expected_ppm"))
      .crossJoin(n)
      .withColumn("chi2_fp",
        expr("""CASE WHEN (n * expected_ppm) DIV 1000 > 0
                THEN ((1000 * n_obs - (n * expected_ppm) DIV 1000)
                      * (1000 * n_obs - (n * expected_ppm) DIV 1000))
                     DIV ((n * expected_ppm) DIV 1000)
                ELSE 0 END"""))
      .select(col("digit"), col("n_obs"), col("expected_ppm"), col("chi2_fp"))
  }

  /**
   * Robust per-group outlier summary on the median/MAD scale: per
   * group, the LOWER median of the fixed-point value, the lower median
   * of absolute deviations from it (MAD), and how many rows deviate by
   * more than `madK`×MAD — the skew/outlier gate that, unlike
   * mean/stddev, a few extreme rows cannot drag.
   *
   * Determinism: values quantize to `round(x*scale)` integers; both
   * medians are the value at row_number `(n+1)/2` under a total order
   * (value, then id) — no interpolation, no floats — so the summary is
   * bit-identical in any engine. Two group-partitioned sorts and one
   * broadcast of |groups| medians; rows never leave their group
   * partition, so the plan scales with the widest group, not the table.
   */
  def robustOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      scale: Int = 1000,
      madK: Int = 3): DataFrame =
    robustDeviations(df, groupCol, valueCol, idCol, scale)
      .groupBy(col("g").as(groupCol))
      .agg(
        count(lit(1)).as("n"),
        first("med_fp").as("med_fp"),
        first("mad_fp").as("mad_fp"),
        sum(when(col("dev") > lit(madK) * col("mad_fp"), 1L).otherwise(0L))
          .as("n_outliers"))

  /**
   * Row-level companion of [[robustOutliers]]: every (non-null,
   * non-NaN) row tagged with its group's lower median, MAD, absolute
   * deviation, and the `madK`×MAD outlier flag — the anomaly-detection
   * shape (WHICH day spiked), where the summary only says how many.
   */
  def robustFlags(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      scale: Int = 1000,
      madK: Int = 3): DataFrame =
    robustDeviations(df, groupCol, valueCol, idCol, scale)
      .select(
        col("g").as(groupCol), col("id").as(idCol),
        col("x").as("x_fp"), col("med_fp"), col("mad_fp"),
        col("dev").as("dev_fp"),
        (col("dev") > lit(madK) * col("mad_fp")).as("is_outlier"))

  /** Shared median/MAD machinery: (g, id, x, med_fp, mad_fp, dev) per
   *  surviving row. Lower medians at rank (n+1)/2 under the total order
   *  (value, id); two group-partitioned sorts + two broadcasts of
   *  |groups| scalars. */
  private def robustDeviations(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      scale: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = df.where(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(
        col(groupCol).as("g"),
        col(idCol).as("id"),
        round(col(valueCol).cast("double") * scale).cast("long").as("x"))

    def lowerMedian(in: DataFrame, valCol: String, outCol: String): DataFrame = {
      val w = Window.partitionBy("g").orderBy(col(valCol), col("id"))
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        // Column `/` is double division — truncate back to the integer
        // rank (exact: halves are representable)
        .where(col("rn") === ((col("n") + 1) / 2).cast("long"))
        .select(col("g"), col(valCol).as(outCol))
    }

    val med = lowerMedian(x, "x", "med_fp")
    val dev = x.join(broadcast(med), Seq("g"))
      .withColumn("dev", abs(col("x") - col("med_fp")))
    val mad = lowerMedian(dev.select(col("g"), col("id"), col("dev")), "dev", "mad_fp")
    dev.join(broadcast(mad), Seq("g"))
  }

  /**
   * Filter-sweep report: for each candidate threshold, how many rows
   * and how much weight (token mass) would survive `valueCol >=
   * threshold` — the quality-vs-quantity curve a curation run reads
   * BEFORE committing to a cutoff, from ONE pass over the corpus.
   *
   * One conditional-sum aggregate per threshold inside a single
   * map-side-combining aggregation (no explode: the corpus is never
   * multiplied by |thresholds|), then the one aggregated row unpivots
   * with `stack` into (threshold, n_rows, weight_kept) — driver and
   * shuffle both carry O(|thresholds|) scalars. Null values never pass
   * any threshold.
   */
  def filterSweep(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds.distinct.size == thresholds.size, "duplicate thresholds")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        coalesce(sum(when(col(valueCol) >= t, 1L).otherwise(0L)), lit(0L))
          .as(s"__n_$i"),
        coalesce(sum(when(col(valueCol) >= t, col(weightCol).cast("long"))
          .otherwise(0L)), lit(0L)).as(s"__w_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = thresholds.zipWithIndex
      .map { case (t, i) => s"CAST($t AS DOUBLE), __n_$i, __w_$i" }
      .mkString(", ")
    one.select(expr(
        s"stack(${thresholds.size}, $stackArgs) AS (threshold, n_rows, weight_kept)"))
  }

  /**
   * Inter-annotator agreement (Cohen's kappa) between two label columns
   * — the standard QC gate for labeled training data: raw percent
   * agreement flatters raters who both spam the majority class, kappa
   * discounts the agreement their marginals would produce by chance.
   * Rows with a null on either side are excluded (an abstention is not
   * a label). One row: (n_items, n_agree, kappa_fp) with kappa in 1e4
   * fixed point, truncated toward zero (sign-safe on both engines), or
   * NULL when chance agreement is 1 (degenerate single-class marginals
   * — kappa is undefined there).
   *
   * All-integer arithmetic: with S = Σ_k rowMarginal(k)·colMarginal(k),
   *   kappa = (agree·n − S) / (n² − S)
   * — exact longs end to end (n² fits: 3e9 rows is the practical bound,
   * beyond that pre-aggregate per shard). Scale shape: two grouped
   * counts over one scan each, a |labels|×|labels| equi-join on label
   * value (tiny), and one-row cross joins.
   */
  def labelAgreement(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val lab = df
      .select(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .cache()
    val margA = lab.groupBy("a").agg(count(lit(1)).as("na"))
    val margB = lab.groupBy("b").agg(count(lit(1)).as("nb"))
    val chance = margA.join(margB, col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("s"))
    val base = lab.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(col("a") === col("b"), 1L).otherwise(0L)), lit(0L))
        .as("agree"))
    base.crossJoin(chance).select(
      col("n").as("n_items"),
      col("agree").as("n_agree"),
      expr("""CASE WHEN n * n = s THEN NULL
              WHEN agree * n - s < 0
                THEN -(((s - agree * n) * 10000L) DIV (n * n - s))
              ELSE ((agree * n - s) * 10000L) DIV (n * n - s) END""")
        .cast("long").as("kappa_fp"))
  }

  /**
   * Fleiss' kappa: [[labelAgreement]]'s generalization to m raters per
   * item — the QC gate for crowd-labeled corpora where every item gets
   * a fixed-size rater panel. Input is LONG format (one row per rating:
   * item, label); every item must carry exactly `m` ratings or the job
   * raises naming the offending item (silently averaging variable
   * panels is how agreement numbers lie).
   *
   * All-integer derivation: with N items, T = Σ_i Σ_k n_ik² and
   * Q = Σ_k S_k² (S_k the global count of label k),
   *   kappa = ((T − Nm)·Nm − Q·(m−1)) / ((m−1)·((Nm)² − Q))
   * — exact longs (bound: N·m up to ~1e8 ratings keeps every product
   * under 2^63; shard and pre-aggregate beyond). Returned in 1e4 fixed
   * point, truncated toward zero sign-safely; NULL when chance
   * agreement is 1 (Q = (Nm)², degenerate single-label input). One row:
   * (n_items, n_ratings, kappa_fp).
   *
   * Scale shape: one (item,label) count, two small re-aggregations, and
   * one-row cross joins — the rating table is scanned once.
   */
  def fleissKappa(df: DataFrame, itemCol: String, labelCol: String, m: Int): DataFrame = {
    require(m >= 2, s"fleissKappa needs at least 2 raters per item, got $m")
    val lab = df
      .select(col(itemCol).as("item"), col(labelCol).cast("string").as("lab"))
      .where(col("item").isNotNull && col("lab").isNotNull)
    val cell = lab.groupBy("item", "lab").agg(count(lit(1)).as("nik")).cache()
    val perItem = cell.groupBy("item").agg(sum("nik").as("mi"))
    // the panel-size contract is enforced IN the aggregate: any item off
    // m ratings raises with its id before a kappa is ever emitted
    val guard = perItem.agg(coalesce(sum(when(col("mi") =!= m.toLong,
        raise_error(concat(lit("fleissKappa: item "), col("item").cast("string"),
          lit(" has "), col("mi").cast("string"),
          lit(s" ratings, expected $m"))).cast("long"))
      .otherwise(0L)), lit(0L)).as("guard_zero"),
      count(lit(1)).as("n_items"))
    val t = cell.agg(coalesce(sum(col("nik") * col("nik")), lit(0L)).as("t2"))
    val q = cell.groupBy("lab").agg(sum("nik").as("sk"))
      .agg(coalesce(sum(col("sk") * col("sk")), lit(0L)).as("qq"))
    guard.crossJoin(t).crossJoin(q).select(
      // guard_zero is 0 by construction but MUST be referenced: an
      // unreferenced column is pruned and the raise inside it with it
      (col("n_items") + col("guard_zero")).as("n_items"),
      ((col("n_items") + col("guard_zero")) * m).as("n_ratings"),
      expr(s"""CASE WHEN (n_items * $m) * (n_items * $m) = qq THEN NULL
               WHEN (t2 - n_items * $m) * (n_items * $m) - qq * ${m - 1} < 0
                 THEN -(((qq * ${m - 1} - (t2 - n_items * $m) * (n_items * $m))
                         * 10000L)
                        DIV (${m - 1} * ((n_items * $m) * (n_items * $m) - qq)))
               ELSE (((t2 - n_items * $m) * (n_items * $m) - qq * ${m - 1})
                     * 10000L)
                    DIV (${m - 1} * ((n_items * $m) * (n_items * $m) - qq))
               END""").cast("long").as("kappa_fp"))
  }

  /**
   * Per-label confusion statistics for a prediction column against a
   * gold column: (label, tp, fp, fn, precision_fp, recall_fp, f1_fp) —
   * the classifier-evaluation primitive (is the quality filter's "toxic"
   * class actually precise before it deletes a terabyte?). All integer:
   * precision = tp/(tp+fp) and recall = tp/(tp+fn) in 1e4 fixed point
   * (floor, the documented contract), and F1 avoids nested division via
   * the exact identity F1 = 2·tp / (2·tp + fp + fn). A label never
   * predicted has NULL precision (0/0), never gold has NULL recall;
   * rows with a null on either side are excluded. Output covers the
   * UNION of gold and predicted label sets.
   *
   * Scale shape: one (gold,pred) count over the data, then label-space
   * re-aggregations and joins (|labels|² rows at most) — the scored
   * table is scanned once.
   */
  def confusionStats(df: DataFrame, goldCol: String, predCol: String): DataFrame = {
    val cm = df
      .select(col(goldCol).cast("string").as("g"), col(predCol).cast("string").as("p"))
      .where(col("g").isNotNull && col("p").isNotNull)
      .groupBy("g", "p").agg(count(lit(1)).as("n"))
      .cache()
    val tp = cm.where(col("g") === col("p"))
      .select(col("g").as("label"), col("n").as("tp"))
    val predTot = cm.groupBy(col("p").as("label")).agg(sum("n").as("pred_n"))
    val goldTot = cm.groupBy(col("g").as("label")).agg(sum("n").as("gold_n"))
    predTot.join(goldTot, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left_outer")
      .select(
        col("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("pred_n"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("gold_n"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .select(col("label"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          expr("(tp * 10000L) DIV (tp + fp)")).as("precision_fp"),
        when(col("tp") + col("fn") > 0,
          expr("(tp * 10000L) DIV (tp + fn)")).as("recall_fp"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr("(2L * tp * 10000L) DIV (2L * tp + fp + fn)")).as("f1_fp"))
  }

  /**
   * Majority-vote label resolution: one row per item with the winning
   * label, its vote count, the panel size, and the winner's share in
   * 1e4 fixed point (floor division — the documented contract, so both
   * engines agree bit-for-bit). Vote ties break to the LEXICOGRAPHICALLY
   * smallest label: deterministic across engines, partitionings, and
   * retries — a "random" tie-break silently unbalances downstream class
   * distributions between runs. Null labels are abstentions (excluded
   * from votes and the panel size).
   *
   * Scale shape: one (item,label) count then a per-item
   * WindowGroupLimit-style top-1 — no collect, no cross join.
   */
  def consensusLabels(df: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val counts = df
      .select(col(itemCol).as("item"), col(labelCol).cast("string").as("lab"))
      .where(col("item").isNotNull && col("lab").isNotNull)
      .groupBy("item", "lab").agg(count(lit(1)).as("n_votes"))
    counts
      .withColumn("n_raters", sum(col("n_votes")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("item")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("item")
          .orderBy(col("n_votes").desc, col("lab"))))
      .where(col("rk") === 1)
      .select(col("item"), col("lab").as("label"),
        col("n_votes"), col("n_raters"),
        expr("(n_votes * 10000L) DIV n_raters").as("share_fp"))
  }

  /**
   * [[profile]] per group — the per-source / per-language quality
   * dashboard shape. Identical single-pass design: one grouped
   * aggregate carries every profiled column's sketches, then the
   * per-column reshaping runs on the aggregated rows (one per group).
   */
  def profileBy(df: DataFrame, groupCols: Seq[String], cols: Seq[String] = Nil): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols else df.columns.toSeq.filterNot(groupCols.contains)
    require(targets.nonEmpty, "no columns to profile")
    val missing = (targets ++ groupCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the input: ${missing.mkString(", ")}")
    def numeric(c: String): Boolean =
      df.schema(df.schema.fieldIndex(c)).dataType.isInstanceOf[NumericType]

    val aggs = targets.flatMap { c =>
      val base = Seq(
        count(col(c)).as(s"__pf_cnt_$c"),
        call_function("approx_count_distinct_hll", col(c).cast("string"))
          .as(s"__pf_nd_$c"))
      val num =
        if (numeric(c)) Seq(
          // one quantile sketch per column would serve all three ranks,
          // but the one-shot function re-accumulates per call; the three
          // aggregates still merge map-side in the same single pass
          call_function("approx_percentile_ex", col(c).cast("double"), lit(0.25))
            .as(s"__pf_p25_$c"),
          call_function("approx_percentile_ex", col(c).cast("double"), lit(0.5))
            .as(s"__pf_p50_$c"),
          call_function("approx_percentile_ex", col(c).cast("double"), lit(0.75))
            .as(s"__pf_p75_$c"),
          min(col(c).cast("double")).as(s"__pf_min_$c"),
          max(col(c).cast("double")).as(s"__pf_max_$c"))
        else Seq(
          lit(null).cast("double").as(s"__pf_p25_$c"),
          lit(null).cast("double").as(s"__pf_p50_$c"),
          lit(null).cast("double").as(s"__pf_p75_$c"),
          lit(null).cast("double").as(s"__pf_min_$c"),
          lit(null).cast("double").as(s"__pf_max_$c"))
      base ++ num
    } :+ count(lit(1)).as("__pf_rows")

    val grouped = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val perColumn = targets.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__pf_rows").as("n_rows"),
        (col("__pf_rows") - col(s"__pf_cnt_$c")).as("n_nulls"),
        col(s"__pf_nd_$c").as("n_distinct"),
        col(s"__pf_p25_$c").as("p25"),
        col(s"__pf_p50_$c").as("p50"),
        col(s"__pf_p75_$c").as("p75"),
        col(s"__pf_min_$c").as("min_d"),
        col(s"__pf_max_$c").as("max_d"))
    }
    val statFields = Seq("col_name", "n_rows", "n_nulls", "n_distinct",
      "p25", "p50", "p75", "min_d", "max_d")
    grouped
      .select((groupCols.map(col) :+ explode(array(perColumn: _*)).as("p")): _*)
      .select((groupCols.map(col) ++ statFields.map(f => col(s"p.$f").as(f))): _*)
  }

  /** lcm(1..15): the common denominator that makes variable-panel
   *  Krippendorff disagreement exact in longs (see below). */
  private val PanelLcm: Long = 360360L

  /**
   * Krippendorff's alpha (nominal data) — the agreement coefficient for
   * the REALISTIC labeling campaign where panel sizes vary per item
   * (raters drop out, adjudication adds a third vote). Items with fewer
   * than 2 ratings carry no disagreement information and are excluded,
   * per the standard definition; [[fleissKappa]] is the fixed-panel
   * special case.
   *
   * All-integer derivation: with per-item label counts n_ic, item sizes
   * n_i in [2, 16], n = Σ n_i over included items, Q = Σ_c t_c² over
   * global label totals t_c, and L = lcm(1..15) = 360360:
   *   Do_scaled = Σ_i Σ_c n_ic·(n_i − n_ic) · (L / (n_i − 1))   (exact:
   *               L is divisible by every n_i − 1)
   *   alpha     = 1 − (Do_scaled · (n − 1)) / (L · (n² − Q))
   * (the (n − 1) factor comes from the expected coincidences
   * e_ck = t_c·t_k/(n − 1) in the canonical nominal-alpha definition)
   * returned in 1e4 fixed point, truncated toward zero sign-safely;
   * NULL when every rating is the same label (n² = Q, chance
   * disagreement zero). Exact while n ≤ ~3e6 ratings (n²·L < 2^63);
   * pre-aggregate per shard beyond — a bound a human-labeling campaign
   * does not approach. One row: (n_items, n_ratings, alpha_fp).
   *
   * Scale shape: one (item,label) count, two small re-aggregations,
   * one-row cross joins — the rating table is scanned once.
   */
  def krippendorffAlpha(df: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val lab = df
      .select(col(itemCol).as("item"), col(labelCol).cast("string").as("lab"))
      .where(col("item").isNotNull && col("lab").isNotNull)
    val cell = lab.groupBy("item", "lab").agg(count(lit(1)).as("nik"))
    val perItem = cell.groupBy("item")
      .agg(sum("nik").as("ni"), collect_list(struct(col("lab"), col("nik"))).as("cells"))
      .where(col("ni") >= 2L)
      // panel sizes above 16 break the lcm trick — raise, don't drift
      .withColumn("ni", when(col("ni") > 16L,
        raise_error(concat(lit("krippendorffAlpha: item "),
          col("item").cast("string"), lit(" has "), col("ni").cast("string"),
          lit(" ratings, max supported is 16")))).otherwise(col("ni")))
      // three downstream aggregates read this; an eager checkpoint
      // materializes it once and frees with the RDD instead of
      // lingering in the session cache
      .localCheckpoint()
    val doScaled = perItem.select(col("ni"),
        explode(col("cells")).as("c"))
      .agg(coalesce(sum(col("c.nik") * (col("ni") - col("c.nik")) *
        (lit(PanelLcm) / (col("ni") - lit(1L))).cast("long")), lit(0L)).as("do_scaled"))
    val nTot = perItem.agg(
      count(lit(1)).as("n_items"), coalesce(sum("ni"), lit(0L)).as("n"))
    val q = perItem.select(explode(col("cells")).as("c"))
      .groupBy(col("c.lab")).agg(sum(col("c.nik")).as("tc"))
      .agg(coalesce(sum(col("tc") * col("tc")), lit(0L)).as("qq"))
    nTot.crossJoin(doScaled).crossJoin(q).select(
      col("n_items"), col("n").as("n_ratings"),
      expr(s"""CASE WHEN n * n = qq THEN NULL
               WHEN ${PanelLcm}L * (n * n - qq) - do_scaled * (n - 1L) < 0
                 THEN -(((do_scaled * (n - 1L) - ${PanelLcm}L * (n * n - qq)) * 10000L)
                        DIV (${PanelLcm}L * (n * n - qq)))
               ELSE ((${PanelLcm}L * (n * n - qq) - do_scaled * (n - 1L)) * 10000L)
                    DIV (${PanelLcm}L * (n * n - qq)) END""")
        .cast("long").as("alpha_fp"))
  }

  /**
   * Theil-Sen robust trend per group: the (lower-)median of all
   * pairwise slopes (y2−y1)/(x2−x1) over x1 < x2 — the volume/quality
   * trend estimator that one outlier day cannot drag, unlike least
   * squares. Pairs with equal x are excluded (undefined slope).
   *
   * Deterministic: the LOWER median picks an actual slope element
   * (row (n_pairs+1)/2 in slope order), and each slope is one IEEE
   * double division — byte-identical across engines, partitionings,
   * and retries. Groups are capped at `maxPoints` (pairs grow O(n²));
   * a larger group raises with its key — silently sampling a trend
   * input is how regressions hide. Per-group pair lists live inside
   * one `collect_list` bounded by maxPoints², never on the driver.
   * Returns (group, n_points, n_pairs, slope) — slope NULL when no
   * valid pair exists.
   */
  def theilSenTrend(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      maxPoints: Int = 256): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val pts = df.select(col(groupCol).as("g"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .where(col("g").isNotNull && col("x").isNotNull && col("y").isNotNull)
      // read by the guard count and BOTH sides of the pair self-join —
      // checkpoint once, freed with the RDD (no session cache residue)
      .localCheckpoint()
    val guarded = pts.groupBy("g").agg(count(lit(1)).as("np"))
      .withColumn("np", when(col("np") > maxPoints.toLong,
        raise_error(concat(lit("theilSenTrend: group "), col("g").cast("string"),
          lit(" has "), col("np").cast("string"),
          lit(s" points, max supported is $maxPoints")))).otherwise(col("np")))
    val slopes = pts.as("a").join(pts.as("b"),
        col("a.g") === col("b.g") && col("a.x") < col("b.x"))
      .select(col("a.g").as("g"),
        ((col("b.y") - col("a.y")) / (col("b.x") - col("a.x"))).as("slope"))
    val med = slopes.groupBy("g").agg(
        count(lit(1)).as("n_pairs"),
        sort_array(collect_list(col("slope"))).as("ss"))
      .select(col("g"), col("n_pairs"),
        element_at(col("ss"), ((col("n_pairs") + lit(1L)) / lit(2L)).cast("int"))
          .as("slope"))
    guarded.join(med, Seq("g"), "left")
      .select(col("g"), col("np").as("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("slope"))
  }

  /** Fixed-point scale for [[fdStrength]] (parts per million). */
  val FdScale: Long = 1000000L

  /**
   * Approximate functional-dependency strength for declared column
   * pairs: for each (lhs -> rhs), the fraction of rows that agree with
   * their lhs-group's MAJORITY rhs value — 1.0 means the dependency
   * holds exactly, lower values quantify how dirty the mapping is. The
   * schema-inference / data-quality primitive behind "is `lang`
   * actually determined by `source` in this crawl?". Output one row
   * per pair: (lhs, rhs, n, strength_ppm, exact).
   *
   * Nulls group as values on both sides (SQL GROUP BY semantics): a
   * null rhs shared by a whole lhs-group is still a consistent
   * mapping.
   *
   * Scale shape: per pair, one (lhs, rhs) hash count, one lhs-level
   * max re-aggregate (partial-aggregable, shrinking), one scalar sum —
   * no joins, no windows, payload never moves. Pairs evaluate
   * independently and union at the end.
   */
  def fdStrength(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (lhs, rhs) column pair")
    pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs).as("__l"), col(rhs).as("__r"))
        .agg(count(lit(1)).as("c"))
        .groupBy("__l")
        .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
        .agg(sum(col("mx")).as("agree"), sum(col("tot")).as("n"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(expr(s"(agree * ${FdScale}L) DIV n"), lit(FdScale))
            .as("strength_ppm"))
        .withColumn("exact", col("strength_ppm") === FdScale)
    }.reduce(_ unionAll _)
  }

}

/**
 * Corpus version management: what changed between two snapshots of a
 * document corpus — the audit a pipeline runs after every refresh
 * ("this crawl added 2M docs, removed 40k, silently rewrote 300k").
 *
 * [[CorpusDiff.diff]] classifies every document id as added / removed /
 * changed / unchanged by comparing content fingerprints (md5 of the
 * whitespace-normalized lower-cased text — [[TextOps.fingerprint]], so
 * formatting-only edits don't count as changes).
 *
 * Scale design: each side reduces to (id, 16-byte fingerprint) BEFORE
 * the full-outer join, so the only shuffle moves ids + digests, never
 * text — the same never-shuffle-text rule as the dedup family. At
 * 100 TB both sides hash-partition on id; with bucketed snapshot tables
 * the join is shuffle-free.
 */
object CorpusDiff {

  /** One row per id present in either snapshot: (id, status) with
    * status in {added, removed, changed, unchanged}. */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as("id"),
        TextOps.fingerprint(col(textCol)).as(s"__fp_$side"))
    fp(oldDf, "old").join(fp(newDf, "new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The dashboard row: counts per status, including unchanged. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
}

/**
 * Corpus-level text report card — the one-row dashboard a curation run
 * prints before and after each stage: volume, token counts, language
 * mix, quality rate, and duplicate rate, all integer-exact (so the
 * whole row replays bit-for-bit in any engine; distribution SHAPES are
 * the [[Profiler]]/sketch family's job).
 *
 * One pass + two tiny aggregates: per-document metrics project map-side
 * (pinned tokenizer, native marker counts), the global rollup is a
 * single aggregate, and the language argmax folds over the bounded
 * per-language count table.
 */
object TextProfile {

  /** One row: (n_docs, total_tokens, min_tokens, max_tokens, n_langs,
    * top_lang, top_lang_ppm, quality_docs, distinct_norm_docs). */
  def report(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = df.select(
      col(idCol).as("id"),
      TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      TextOps.languageId(col(textCol)).as("lang"),
      TextOps.qualityFlag(col(textCol)).cast("long").as("q"),
      TextOps.fingerprint(col(textCol)).as("fp"))
    val langs = perDoc.groupBy("lang").agg(count(lit(1)).as("n"))
    val top = langs.orderBy(col("n").desc, col("lang")).limit(1)
      .select(col("lang").as("top_lang"), col("n").as("top_n"))
    val nLangs = langs.agg(count(lit(1)).as("n_langs"))
    perDoc.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("q")).as("quality_docs"),
        countDistinct(col("fp")).as("distinct_norm_docs"))
      .crossJoin(broadcast(nLangs))
      .crossJoin(broadcast(top))
      .select(col("n_docs"), col("total_tokens"), col("min_tokens"),
        col("max_tokens"), col("n_langs"), col("top_lang"),
        expr("top_n * 1000000L div n_docs").as("top_lang_ppm"),
        col("quality_docs"), col("distinct_norm_docs"))
  }
}
