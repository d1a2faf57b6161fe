package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic DataFrame-level sampling operators for corpus curation.
 * (The SQL-function samplers — `reservoir_sample`, `varopt_sample` — live
 * in the sketch registry; these are the whole-row, exactly-reproducible
 * variants a curation pipeline uses to build eval splits and per-stratum
 * quotas.)
 */
object Sampling {

  /**
   * Exactly `k` rows per stratum (fewer when the stratum is smaller),
   * chosen by ranking the stratum's rows on the md5 of their id — a
   * uniform permutation under the hash's random-oracle view, with zero
   * RNG: the same rows are selected on every run, every partitioning,
   * every engine (the DuckDB oracle replays the identical ranking).
   *
   * Scale design: one shuffle on the strata columns; Spark 3.5+ rewrites
   * the `row_number() <= k` filter into WindowGroupLimit, so each map
   * partition pre-prunes to its local top-k before the shuffle — the
   * shuffle carries O(partitions * k) rows per stratum, not the corpus.
   */
  def stratifiedSample(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__graft_rnk", row_number().over(w))
      .where(col("__graft_rnk") <= k)
      .drop("__graft_rnk")
  }

  /** The 2^60 hash-fraction denominator of [[weightedMix]]: 15 md5 hex
   *  digits read as an integer are uniform on [0, 2^60). */
  private val HashSpace: BigInt = BigInt(2).pow(60)

  /**
   * Corpus mixing — the "data mixture" step of a training pipeline: keep
   * each stratum's rows at its own RATIONAL sampling rate (`num/den`,
   * e.g. `"web" -> (1, 10)` keeps ~10%), rows from unlisted strata at
   * `defaultRate`. A row is kept iff the integer value of the first 15
   * md5 hex digits of its id falls below `floor(2^60 * num/den)` —
   * seedless and exactly reproducible on every run, partitioning, and
   * engine (thresholds are precomputed BigInt literals; no float ever
   * enters the comparison).
   *
   * Scale design: a pure map-side filter — NO shuffle, no RNG state, no
   * per-partition coordination; rates can be retuned and re-run with
   * byte-identical selection of the surviving rows (and supersets nest:
   * raising a rate only ADDS rows, the property mixture sweeps rely on).
   */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, (Int, Int)],
      defaultRate: (Int, Int) = (1, 1)): DataFrame = {
    def thresh(r: (Int, Int)): Long = {
      val (num, den) = r
      require(den > 0 && num >= 0 && num <= den, s"rate must be in [0,1], got $num/$den")
      (HashSpace * num / den).toLong
    }
    val hv = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val cutoff = rates.toSeq.sortBy(_._1).foldRight(lit(thresh(defaultRate))) {
      case ((s, r), alt) => when(col(stratumCol) === s, lit(thresh(r))).otherwise(alt)
    }
    df.where(hv < cutoff)
  }

  /**
   * Rebalance a corpus toward a TARGET mixture under a TOKEN budget: for
   * each group (language/source/domain), keep a deterministic hash slice
   * sized so the group's expected surviving tokens hit
   * `share * budget` (clamped at keep-everything for under-represented
   * groups — rebalancing deletes, it cannot invent data). The DoReMi /
   * data-mixture curation step as one operator.
   *
   * Exact integer contract end to end: per-group token totals are LONG
   * sums of the pinned token counter, the budget is an integer fraction
   * of the corpus total, and each group's keep threshold is
   * `floor(2^60 * desired / actual)` over the same md5 60-bit hash space
   * as [[weightedMix]] — so selection is a pure function of the id,
   * stable across runs/engines/parallelism, and replayable by the
   * driver's DuckDB oracle (q128).
   *
   * Scale design: ONE tiny aggregate (one LONG per group — bounded by
   * the group-key cardinality, collected like every other bounded
   * driver scalar here), then a map-side literal CASE filter. The corpus
   * is never shuffled.
   */
  def rebalanceMixture(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      targetShares: Map[String, (Int, Int)],
      budgetNum: Int,
      budgetDen: Int): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"budget must be a fraction in [0,1], got $budgetNum/$budgetDen")
    targetShares.values.foreach { case (n, d) =>
      require(d > 0 && n >= 0, s"shares must be non-negative rationals")
    }
    val toks = TextOps.tokenCount(col(textCol)).cast("long")
    val totals = df.groupBy(col(groupCol).as("g")).agg(sum(toks).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = BigInt(totals.values.sum) * budgetNum / budgetDen
    val thresholds: Map[String, Long] = totals.map { case (g, t) =>
      val (n, d) = targetShares.getOrElse(g, (0, 1))
      val desired = budget * n / d
      val cut =
        if (t <= 0L) BigInt(0)
        else (HashSpace * desired / t).min(HashSpace)
      g -> cut.toLong
    }
    val hv = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val cutoff = thresholds.toSeq.sortBy(_._1).foldRight(lit(0L): Column) {
      case ((g, c), alt) => when(col(groupCol) === g, lit(c)).otherwise(alt)
    }
    df.where(hv < cutoff)
  }

  /**
   * Deterministic disjoint split assignment (train/val/test): partition
   * the 2^60 hash space of [[weightedMix]] into consecutive ranges
   * proportional to the integer `weights`, and label each row by the
   * range its id's hash fraction falls in. Every row gets EXACTLY one
   * label (disjoint and exhaustive by construction), membership is a
   * pure function of the id — stable across runs, partitionings,
   * engines, and additions to the corpus (a new document never moves an
   * old one between splits). Pure map-side `when` chain over precomputed
   * BigInt boundaries; no shuffle, no RNG.
   *
   * A non-empty `salt` prefixes the hash input (`salt ':' id`) so the
   * whole assignment can be REDRAWN deliberately (a fresh eval split
   * uncorrelated with the last one) while the default stays the legacy
   * unsalted draw. Rotating the salt is an explicit leakage event:
   * rows migrate between splits, so anything trained on the old split
   * must not be evaluated on the new one.
   */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)],
      outCol: String = "split",
      salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive weights, got $splits")
    val total = splits.map(_._2).sum
    val bounds = splits.map(_._2).scanLeft(0)(_ + _).tail
      .map(c => (HashSpace * c / total).toLong)
    val keyed =
      if (salt.isEmpty) col(idCol).cast("string")
      else concat(lit(s"$salt:"), col(idCol).cast("string"))
    val hv = conv(substring(md5(keyed.cast("binary")), 1, 15), 16, 10)
      .cast("long")
    // the last range's bound is 2^60 itself == the hash-value supremum,
    // so the final otherwise is unreachable but keeps the column non-null
    val label = splits.init.zip(bounds.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), b), alt) => when(hv < b, lit(name)).otherwise(alt)
    }
    // a null id would fall through every when() into the LAST split,
    // silently contaminating the eval split with unidentifiable rows —
    // drop them instead (the weightedMix null behavior)
    df.where(col(idCol).isNotNull).withColumn(outCol, label)
  }

  /**
   * Deterministic global corpus shuffle — the "shuffle the training data
   * once, reproducibly" step before sharded tokenization: each row gets a
   * `shard` in [0, numShards) and a contiguous 1-based `pos` within its
   * shard, both pure functions of (seed, id) via md5 — so the same seed
   * yields the byte-identical order on every run, partitioning, and
   * engine, and a different seed yields an independent permutation
   * (epoch reshuffles are just seed+1).
   *
   * Scale design: ONE shuffle, keyed on the shard — each reducer sorts
   * only its own shards' rows by the 15-hex-digit hash key (Spark sorts
   * within the window partition; nothing is globally ordered, which a
   * training dataloader doesn't need — it reads whole shards). At 100 TB
   * with numShards sized so a shard fits an executor (e.g. 10k+ shards),
   * the per-shard sort is an in-memory or single-spill sort, never a
   * global range exchange. Writers then
   * `partitionBy("shard").sortBy("pos")` without re-shuffling.
   */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: Long): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val key = md5(concat(lit(s"$seed:"), col(idCol).cast("string")).cast("binary"))
    // 15 hex digits are uniform on [0, 2^60) — non-negative, so plain
    // mod IS the balanced shard assignment (no pmod needed)
    val shard = (conv(substring(key, 1, 15), 16, 10).cast("long") % numShards)
      .cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__graft_key"), col(idCol))
    df.where(col(idCol).isNotNull)
      .withColumn("__graft_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("__graft_key")
  }

  /**
   * Token-budget selection — "take the highest-quality documents until
   * the token budget is spent": order rows by (`scoreCol` DESC, `idCol`
   * ASC) and keep the maximal prefix whose cumulative token count stays
   * <= `budget`. EXACT — the result row set equals the single-machine
   * `cumsum-over-sorted <= budget` filter — without ever globally
   * sorting the corpus.
   *
   * Scale design (the quantile-refinement pattern): each round, ONE
   * [[graft.functions.approx_partition_bounds]] pass proposes `buckets`
   * score ranges over the still-undecided slice, and one aggregate
   * computes each range's EXACT row/token totals (the sketch only
   * balances the ranges; correctness never depends on its accuracy).
   * Ranges that wholly fit the remaining budget are selected by a score
   * THRESHOLD, ranges wholly past it are discarded, and only the one
   * boundary range stays undecided — shrinking ~`buckets`x per round, so
   * a 100 TB corpus reaches `refineLimit` rows in log_buckets(N) ~ 5-6
   * scans, each with the narrowing score interval PUSHED DOWN to the
   * scan. Ties: equal scores always share a range (bounds are data
   * values), and a boundary range stuck on ONE distinct score re-runs
   * the same walk on the id tiebreaker (ids <= 2^53 — exact as doubles).
   * The final <= `refineLimit` undecided rows take a single-partition
   * running-sum window — the only non-distributed step, explicitly
   * bounded. Driver-side state per round is one bounds array plus
   * <= `buckets`+1 aggregate rows (the bounded-collect model of
   * [[graft.operators.Dedup.connectedComponents]]).
   *
   * Returns (id, score, tokens) for the selected rows, unordered. Rows
   * with a null id, score, or tokens are dropped up front (they have no
   * place in the total order); tokens must be >= 0 for the prefix
   * semantics to hold.
   */
  def selectByTokenBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long,
      buckets: Int = 64,
      refineLimit: Long = 100000L): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(refineLimit >= 1, s"refineLimit must be >= 1, got $refineLimit")
    import org.apache.spark.sql.Row
    val d = df.select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        col(tokensCol).cast("long").as("tokens"))
      // NaN has no consistent rank (Spark orders it above every double,
      // the bucketizer's >= comparisons order it below) — a NaN score is
      // an upstream bug, not a rankable document
      .where(col("id").isNotNull && col("score").isNotNull &&
        col("tokens").isNotNull && !isnan(col("score")))
      // every refinement round re-reads this projection at least twice
      // (bounds pass + exact range stats), and scoring typically runs a
      // classifier over full text — cache the 24-byte-per-row projection
      // once instead of re-scoring the corpus each round (the cache
      // transfers to the returned plan per the package cache contract)
      .cache()

    // One refinement round over the rows of `pred`, ordered by `key`
    // (descending when `desc`). Returns (fully-selected predicate,
    // their token total, boundary predicate or null, boundary count,
    // boundary distinct-key-range flag) — all predicates are value
    // thresholds on `key`, so they push down to the scan next round.
    case class Walk(sel: Option[Column], selTokens: Long,
      boundary: Option[Column], bCount: Long, bSingleKey: Boolean)
    def walk(pred: Column, key: String, desc: Boolean, rem: Long): Walk = {
      val u = d.where(pred)
      val boundsRow = u.agg(org.apache.spark.sql.functions.call_function(
          "approx_partition_bounds", col(key).cast("double"), lit(buckets))
          .as("bs"))
        .collect()(0)
      // null bounds = the slice is empty (nothing left to decide)
      val bounds =
        if (boundsRow.isNullAt(0)) Array.empty[Double]
        else boundsRow.getSeq[Double](0).toArray
      // bucket = #bounds <= key via the native binary-search bucketizer
      // (O(log buckets) per row, codegen-safe at any bucket count);
      // equal keys always share a bucket
      val bucketExpr =
        if (bounds.isEmpty) lit(0)
        else call_function("graft_value_bucket", col(key).cast("double"),
          array(bounds.toSeq.map(lit(_)): _*))
      val stats = u.groupBy(bucketExpr.as("b"))
        .agg(sum("tokens").as("toks"), count(lit(1)).as("cnt"),
          min(col(key).cast("double")).as("lo"),
          max(col(key).cast("double")).as("hi"))
        .collect().sortBy(r => if (desc) -r.getInt(0) else r.getInt(0))
      // walk buckets best-first; buckets wholly inside the remaining
      // budget select, the first overflowing bucket is the boundary,
      // everything past it is already beyond the prefix (cum is
      // monotone), so it needs no predicate at all
      var remaining = rem
      var taken = 0L
      var selThresh: Option[Row] = None
      var boundaryRow: Option[Row] = None
      var i = 0
      while (i < stats.length && boundaryRow.isEmpty) {
        val r = stats(i)
        if (r.getLong(1) <= remaining) {
          remaining -= r.getLong(1); taken += r.getLong(1)
          selThresh = Some(r)
        } else boundaryRow = Some(r)
        i += 1
      }
      def kd = col(key).cast("double")
      val sel = selThresh.map { r =>
        // contiguous best-first region: a single value threshold
        if (desc) pred && kd >= lit(r.getDouble(3))
        else pred && kd <= lit(r.getDouble(4))
      }
      boundaryRow match {
        case None => Walk(sel, taken, None, 0L, bSingleKey = false)
        case Some(r) =>
          val b = r.getInt(0)
          val lo = r.getDouble(3)
          val hi = r.getDouble(4)
          val loB = if (b == 0) None else Some(bounds(b - 1))
          val hiB = if (b == bounds.length) None else Some(bounds(b))
          val bp = Seq(loB.map(v => kd >= lit(v)), hiB.map(v => kd < lit(v)))
            .flatten.foldLeft(pred)(_ && _)
          Walk(sel, taken, Some(bp), r.getLong(2), bSingleKey = lo == hi)
      }
    }

    var selected: List[Column] = Nil
    var spent = 0L
    var undecided: Option[Column] = Some(lit(true))
    var key = "score"
    var desc = true
    var lastCount = Long.MaxValue
    var rounds = 0
    // each round shrinks the undecided slice ~buckets-fold; the round cap
    // only guards a degenerate sketch (then the window below still gives
    // the exact answer, just over more rows than refineLimit)
    while (undecided.isDefined && rounds < 16 && {
      val w = walk(undecided.get, key, desc, budget - spent)
      w.sel.foreach(s => selected ::= s)
      spent += w.selTokens
      undecided = w.boundary
      rounds += 1
      val progress = w.bCount < lastCount
      lastCount = w.bCount
      if (w.bCount <= refineLimit) false
      else if (w.bSingleKey && key == "score") {
        // one distinct score spans the boundary: the order inside it is
        // the id tiebreaker — same walk, ascending ids
        key = "id"; desc = false; lastCount = Long.MaxValue; true
      } else progress
    }) ()

    val selectedDf = selected match {
      case Nil => d.where(lit(false))
      case ps => d.where(ps.reduce(_ || _))
    }
    undecided match {
      case None => selectedDf
      case Some(bp) =>
        // bounded final step: running sum over the <= refineLimit
        // undecided rows in full (score desc, id) order — one partition
        // BY CONSTRUCTION of the refinement, not an accident of data
        val w = Window.orderBy(col("score").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val kept = d.where(bp)
          .withColumn("__cum", sum(col("tokens")).over(w))
          .where(col("__cum") <= lit(budget - spent))
          .drop("__cum")
        selectedDf.unionByName(kept)
    }
  }

  /**
   * Per-group token-budget selection — "per language, the best documents
   * until that language's token budget is spent": within each `groupCol`
   * value, rows are ordered (`scoreCol` DESC, `idCol` ASC) and the
   * maximal prefix with cumulative `tokensCol` <= the group's budget
   * survives. Budgets come from `budgets` with `defaultBudget` for
   * unlisted groups. Returns (group, id, score, tokens); null
   * group/id/score/tokens or NaN-score rows are dropped (as in
   * [[selectByTokenBudget]]).
   *
   * Scale design: ONE hash shuffle by group, each group's running sum a
   * partition-local window — natural when groups are many and bounded
   * (languages, sources, domains). A single group holding a large share
   * of a 100 TB corpus serializes that group's window into one task; for
   * that shape run the multi-round [[selectByTokenBudget]] on the big
   * group's slice instead (same semantics, log-round scans).
   */
  def selectByTokenBudgetPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0, s"defaultBudget must be >= 0, got $defaultBudget")
    require(budgets.values.forall(_ >= 0), s"budgets must be >= 0, got $budgets")
    val budgetExpr = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (g, b)) => when(col("grp") === lit(g), lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        col(tokensCol).cast("long").as("tokens"))
      .where(col("grp").isNotNull && col("id").isNotNull &&
        col("score").isNotNull && col("tokens").isNotNull && !isnan(col("score")))
      .withColumn("__cum", sum(col("tokens")).over(w))
      .where(col("__cum") <= budgetExpr)
      .drop("__cum")
  }

  /**
   * Byte-balanced output sharding (the compaction planner): assign every
   * row a shard id so that consecutive rows in `idCol` order fill each
   * shard up to `targetBytes` — `shard = floor(exclusive_prefix_sum(
   * bytesCol, over id order) / targetBytes)`. EXACT: identical to the
   * single-machine cumulative-sum assignment, for reproducible
   * ~equal-byte output files (a writer then partitions by `shard`).
   * Rows larger than `targetBytes` advance the prefix past one or more
   * shard boundaries, so shard ids may skip — by design, ids stay
   * monotone in the row order. Returns (id, bytes, shard); null
   * id/bytes rows are dropped (they have no place in the order).
   *
   * Scale design — a distributed EXACT global prefix sum, no global
   * sort: ONE `approx_partition_bounds` pass proposes `buckets` id
   * ranges (the sketch only balances them; correctness never depends on
   * its accuracy), each row gets its range via the native binary-search
   * bucketizer, and the running sum decomposes into a per-bucket window
   * (distributed — each bucket is one partition's worth by
   * construction) plus per-bucket start offsets, computed by a window
   * over the <= `buckets`+1-row totals frame and BROADCAST-joined back.
   * Driver-side state is one bounds array (the bounded-collect model of
   * [[selectByTokenBudget]]); everything else is one shuffle by bucket.
   * Size `buckets` so a bucket's rows fit one task at the target scale
   * (100 TB / 8192 buckets ~ 12 GB per window partition).
   */
  def sizeShards(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      targetBytes: Long,
      buckets: Int = 256): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val d = df.select(col(idCol).cast("long").as("id"),
        col(bytesCol).cast("long").as("bytes"))
      .where(col("id").isNotNull && col("bytes").isNotNull)
    val boundsRow = d.agg(call_function("approx_partition_bounds",
        col("id").cast("double"), lit(buckets)).as("bs"))
      .collect()(0)
    val bounds =
      if (boundsRow.isNullAt(0)) Array.empty[Double]
      else boundsRow.getSeq[Double](0).toArray
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else call_function("graft_value_bucket", col("id").cast("double"),
        array(bounds.toSeq.map(lit(_)): _*))
    val bucketed = d.withColumn("__bk", bucketExpr)
    // per-bucket byte totals -> exclusive running offsets: <= buckets+1
    // rows, so the single-partition window is bounded BY CONSTRUCTION
    val offsets = bucketed.groupBy("__bk").agg(sum("bytes").as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(
        Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__tot")
    // id buckets are contiguous ranges, so (bucket, id-within-bucket)
    // order IS global id order and the offsets stitch the prefix exactly
    val wLocal = Window.partitionBy("__bk").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("__bk"))
      .withColumn("__cum",
        col("__off") + coalesce(sum("bytes").over(wLocal), lit(0L)))
      // integer division, not floor(double /): exact at any prefix size
      .select(col("id"), col("bytes"),
        expr(s"__cum DIV ${targetBytes}L").cast("long").as("shard"))
  }

  /**
   * Temperature-balanced group sampling — the mC4/XLM-R "alpha sampling"
   * step, as pure subsampling: group g keeps rows at rate
   * `r_g = (n_min / n_g)^(1 - alpha)` (the rarest group keeps 100%), so
   * post-sample shares are proportional to `p_g^alpha` — alpha = 1 keeps
   * the natural distribution, alpha = 0 equalizes groups, the common
   * alpha = 0.5 (default) is the square-root temperature.
   *
   * Selection reuses [[weightedMix]]'s seedless md5-fraction: a row
   * survives iff its 15-hex-digit md5 fraction falls below
   * `floor(2^60 * r_g)`. With alpha = 0.5 the whole threshold
   * computation (one division, one sqrt, one scale by an exact power of
   * two, one floor) is IEEE exactly-rounded, so selection reproduces
   * bit-identically in any engine; other alphas go through `pow`, whose
   * last-ulp differences could flip a row only if some hash hits the
   * exact threshold boundary (probability ~ rows / 2^60).
   *
   * Scale design: one tiny grouped count (broadcast back), then a pure
   * map-side filter — the corpus itself never shuffles.
   */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .withColumn("__thr",
        floor(pow(col("__nmin").cast("double") / col("__n").cast("double"),
          lit(1.0 - alpha)) * lit(HashSpace.toDouble)).cast("long"))
      .select(col(groupCol), col("__thr"))
    val hv = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    df.join(broadcast(rates), Seq(groupCol))
      .where(hv < col("__thr"))
      .drop("__thr")
  }

  /**
   * Rank-based percentile of `valueCol` WITHIN each group (ascending
   * rank `r`, ties broken by `idCol`; pct = r / group size, rounded
   * 9 dp) — the scale-free normalization that makes quality scores
   * comparable ACROSS sources whose score distributions differ (a 0.9
   * raw score can be mediocre for Wikipedia and exceptional for a web
   * crawl). One window per group partition: fully parallel across
   * groups, no global sort, no single-partition stage.
   */
  def groupPercentile(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    df.select(col(idCol), col(groupCol), col(valueCol))
      .withColumn("rank_in_group", row_number().over(w).cast("long"))
      .withColumn("n_in_group",
        count(lit(1)).over(Window.partitionBy(col(groupCol))).cast("long"))
      .withColumn("pct",
        round(col("rank_in_group").cast("double") / col("n_in_group"), 9))
  }

  /**
   * Neyman-style stratified sample-size allocation: split a row budget
   * across strata proportionally to `N_h * spread_h`, where spread is
   * the interquartile range of `valueCol` — strata that are both large
   * AND internally varied get more of the budget, uniform strata get
   * probed lightly. The sampling-design complement to
   * [[stratifiedSample]] (which takes a per-stratum k as given).
   *
   * Everything is integer-exact and engine-portable: values are scaled
   * to fixed point (`round(value * scale)`), quartiles are DISCRETE
   * rank statistics (the ceil(n/4)-th and ceil(3n/4)-th smallest, id
   * tiebreak — no interpolation, no float percentile), the weight is
   * `N_h * (IQR + 1)` (the +1 keeps zero-spread strata allocatable),
   * and the allocation is `(budget * w_h) DIV Σw` — floor division, so
   * Σalloc <= budget with the remainder unallocated (deterministic;
   * no largest-remainder tie ambiguity across engines).
   *
   * Scale shape: one window per stratum partition for the two rank
   * statistics (WindowGroupLimit-style per-group work, no global
   * sort), one group aggregate, one broadcast one-row total join.
   */
  def neymanAllocation(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valueCol: String,
      budget: Long,
      scale: Long = 1000L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val v = round(col(valueCol) * lit(scale)).cast("long")
    // null values are EXCLUDED up front: they carry no spread signal,
    // and engines disagree on null sort position (Spark first, DuckDB
    // last), which would silently shift the rank statistics
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"), col(idCol))
    val ranked = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(idCol), v.as("v"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))).cast("long"))
    val quart = ranked
      .groupBy(col(groupCol).as("g"))
      .agg(
        max(col("n")).as("n_h"),
        max(when(col("rn") === expr("(n + 3L) DIV 4L"), col("v"))).as("q25"),
        max(when(col("rn") === expr("(3L * n + 3L) DIV 4L"), col("v"))).as("q75"))
      .withColumn("spread", col("q75") - col("q25"))
      .withColumn("w_h", col("n_h") * (col("spread") + 1L))
    val tot = broadcast(quart.agg(sum(col("w_h")).as("w_tot")))
    quart.crossJoin(tot)
      .select(
        col("g"), col("n_h"), col("spread"),
        expr(s"(${budget}L * w_h) DIV w_tot").as("alloc"))
  }

  /**
   * Deterministic curriculum interleave: assign each row a fixed-width
   * difficulty bucket (`floor(difficulty / binWidth)`), position rows
   * within their bucket (ascending difficulty, id tiebreak), and emit
   * (id, bucket, pos). Consuming in (pos, bucket) order yields the
   * round-robin curriculum — one row from each difficulty band, easiest
   * band first within each cycle — so every training window sees the
   * full difficulty spectrum instead of a sorted-by-difficulty corpus's
   * phase shifts. The ordering is a pure function of (difficulty, id) —
   * reproducible across runs and engines.
   *
   * Scale shape: the in-bucket rank is a DISTRIBUTED rank (the SNM /
   * [[distributedCumSum]] pattern): rows sub-bucket by approximate
   * global difficulty ranges (equal difficulties share a sub-bucket, so
   * the split is monotone in the (difficulty, id) order), row_number
   * runs per (bucket, sub-bucket), and sub-bucket count offsets restore
   * the exact per-bucket position — one giant difficulty band no longer
   * serializes into a single task. Degenerate case: a band where every
   * row has the SAME difficulty collapses to one sub-bucket (no worse
   * than the naive window).
   */
  def curriculumInterleave(
      df: DataFrame,
      idCol: String,
      difficultyCol: String,
      binWidth: Double,
      buckets: Int = 64): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val bucket = floor(col(difficultyCol) / lit(binWidth)).cast("long")
    val base = df.select(col(idCol), col(difficultyCol))
      .withColumn("bucket", bucket)
    val boundsRow = base.agg(call_function("approx_partition_bounds",
      col(difficultyCol).cast("double"), lit(buckets)).as("bs")).collect()(0)
    val bucketed =
      if (boundsRow.isNullAt(0)) base.withColumn("__b", lit(0))
      else base.withColumn("__b", call_function("graft_bucket_index",
        array(boundsRow.getSeq[Double](0).map(lit): _*),
        col(difficultyCol).cast("double")))
    val wLocal = Window.partitionBy(col("bucket"), col("__b"))
      .orderBy(col(difficultyCol), col(idCol))
    val partial = bucketed
      .withColumn("__rn", row_number().over(wLocal).cast("long"))
    val wOff = Window.partitionBy(col("bucket")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Null-safe stitch: rows with a null difficulty land in the null
    // (bucket, __b) cell and must keep their positions (they were their
    // own window partition before the de-skew) — a plain equi-join
    // would silently drop them.
    val offs = bucketed.groupBy("bucket", "__b")
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("bucket").as("__r_bucket"), col("__b").as("__r_b"),
        col("__off"))
    partial.join(offs,
        col("bucket") <=> col("__r_bucket") && col("__b") <=> col("__r_b"))
      .withColumn("pos", col("__off") + col("__rn"))
      .select(col(idCol), col("bucket"), col("pos"))
  }

  /**
   * Robust per-group scaling: `(value - median) / IQR` with the
   * quartiles read from ONE sketch aggregation per group and broadcast
   * back — median/IQR are outlier-immune where mean/stddev are not, so
   * this is the normalization of choice for heavy-tailed quality
   * scores. NULL `robust` where a group's IQR is zero (degenerate
   * constant group). The corpus never shuffles: the group stats travel
   * to it, not it to them. Exact whenever groups are inside the sketch's
   * exact regime (bump `spark.sql.dataSketches.quantiles.kll.k` for
   * bigger groups); approximate-but-bounded beyond.
   */
  def groupRobustScale(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valueCol: String): DataFrame = {
    val p = df.groupBy(col(groupCol))
      .agg(expr(s"approx_percentile_ex($valueCol, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .select(col(groupCol), col("ps")(0).as("__p25"), col("ps")(1).as("__p50"),
        col("ps")(2).as("__p75"))
    df.join(broadcast(p), Seq(groupCol))
      .withColumn("robust", when(col("__p75") =!= col("__p25"),
        round((col(valueCol) - col("__p50")) / (col("__p75") - col("__p25")), 9)))
      .select(col(idCol), col(groupCol), col(valueCol), col("robust"))
  }

  /**
   * Systematic probability-proportional-to-size sampling, the
   * deterministic weighted pick behind data mixing: per group, lay the
   * rows out on an integer weight line in (id) order, place ~`k`
   * equally-spaced marks (`step = total_weight DIV k`), and select
   * each row as many times as marks land inside its weight span —
   * `multiplicity = cum DIV step - (cum - w) DIV step`. A row with
   * weight w is picked with probability ~ k·w/W, heavy rows (w > step)
   * with multiplicity > 1, and the whole draw is a pure function of
   * the data: no RNG, identical on every engine, partitioning and
   * retry — the property that makes yesterday's 100 TB mixture
   * reproducible today. Output: (group..., id, weight, multiplicity),
   * selected rows only; Σ multiplicity per group ∈ [k, k + k) by the
   * floor arithmetic (document-exact k needs a trailing trim, which
   * would break per-row independence — callers wanting exact counts
   * compose with a LIMIT per group downstream).
   *
   * Weights must be POSITIVE integers (fail-fast otherwise: a zero
   * weight row can never be picked and silently skews the marks; cast
   * fractional weights to a fixed-point grain upstream).
   *
   * Scale shape: the per-group cumulative weight is a DISTRIBUTED
   * prefix sum (the SNM bucketed-rank pattern, [[Dedup
   * .sortedNeighborhoodCandidates]]): rows bucket by approximate id
   * ranges, the ordered window runs per (group, bucket) — parallel even
   * inside ONE giant group — and per-bucket weight offsets (a window
   * over the droplet-sized (group, bucket) total table) restore the
   * exact group-wide running sum. No unbounded single-partition sort
   * anywhere; group cardinality never collected (the only collect is
   * the global <= `buckets`-element id-bounds array).
   */
  def systematicPpsSample(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      weightCol: String,
      k: Int,
      buckets: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val wcast = col(weightCol).cast("long")
    val checked = df.withColumn("__w",
      when(wcast.isNull || wcast <= 0,
        raise_error(concat(
          lit(s"systematicPpsSample: $weightCol must be a positive long, got: "),
          coalesce(col(weightCol).cast("string"), lit("null")))))
        .otherwise(wcast))
    distributedCumSum(checked, groupCols, idCol, buckets)
      // groups lighter than k marks sample every row once per step=1
      .withColumn("__step", greatest(expr(s"__tot DIV $k"), lit(1L)))
      .withColumn("multiplicity",
        expr("__cum DIV __step - (__cum - __w) DIV __step"))
      .where(col("multiplicity") > 0)
      .select(groupCols.map(col) :+ col(idCol) :+
        col("__w").as("weight") :+ col("multiplicity"): _*)
  }

  /**
   * Distributed per-group prefix sum of a positive `__w` column in
   * (id) order — the shared engine under [[systematicPpsSample]] and
   * [[Packing.chunkPack]]. Rows bucket by APPROXIMATE global id ranges
   * (one bounded `approx_partition_bounds` collect), the cumulative
   * window runs per (group, bucket) — parallel even inside one giant
   * group — and per-bucket offsets (a window over the droplet-sized
   * (group, bucket) total table, partitions of <= `buckets` rows)
   * restore the exact group-wide running sum. Bucket membership is
   * monotone in id, so within a group every row of bucket b precedes
   * every row of b+1 and the composition is exact.
   *
   * Input must already carry `__w` (positive long); output adds
   * `__cum` (inclusive running sum in (group, id) order) and `__tot`
   * (group total). No unbounded single-partition sort anywhere; group
   * cardinality never collected.
   *
   * Correctness guards: ids must be NON-NULL (a null id has no
   * position on the weight line — fail fast rather than silently
   * dropping the row in the bucket-stitch join); bucket bounds are
   * TYPE-MATCHED to the id column (string ids sketch with
   * `approx_partition_bounds_str` over the raw value, so bucket order
   * agrees with the window's lexicographic sort — a numeric cast
   * would bucket '9' after '10' and corrupt the running sum); the
   * stitch join is NULL-SAFE on the group columns, so rows in a
   * null-keyed group keep their own cumulative line instead of
   * vanishing.
   */
  private[graft] def distributedCumSum(
      checked: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      buckets: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = checked.schema(idCol).dataType
    val numericId = idType match {
      case _: NumericType | DateType | TimestampType | BooleanType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"distributedCumSum: unsupported id type $other for $idCol " +
          "(numeric, date/timestamp, boolean or string)")
    }
    // Fail fast on null ids at the point of consumption (same
    // discipline as systematicPpsSample's weight guard).
    def guarded(c: Column): Column =
      when(col(idCol).isNull, raise_error(lit(
        s"distributedCumSum: id column $idCol must be non-null"))).otherwise(c)
    val bucketed = if (numericId) {
      val boundsRow = checked.agg(call_function("approx_partition_bounds",
        col(idCol).cast("double"), lit(buckets)).as("bs")).collect()(0)
      if (boundsRow.isNullAt(0)) checked.withColumn("__b", guarded(lit(0)))
      else checked.withColumn("__b", guarded(call_function("graft_bucket_index",
        array(boundsRow.getSeq[Double](0).map(lit): _*),
        col(idCol).cast("double"))))
    } else {
      val boundsRow = checked.agg(call_function("approx_partition_bounds_str",
        col(idCol), lit(buckets)).as("bs")).collect()(0)
      if (boundsRow.isNullAt(0)) checked.withColumn("__b", guarded(lit(0)))
      else checked.withColumn("__b", guarded(call_function("graft_bucket_index",
        array(boundsRow.getSeq[String](0).map(lit): _*), col(idCol))))
    }
    val gb = (groupCols :+ "__b").map(col)
    val partGb = Window.partitionBy(gb: _*)
    val cumGb = partGb.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val partial = bucketed.withColumn("__pc", sum(col("__w")).over(cumGb))
    val wOff = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val joinCols = groupCols :+ "__b"
    val offs = bucketed.groupBy(gb: _*).agg(sum(col("__w")).as("__bw"))
      .withColumn("__off", coalesce(sum(col("__bw")).over(wOff), lit(0L)))
      .withColumn("__tot", sum(col("__bw")).over(
        Window.partitionBy(groupCols.map(col): _*)))
      .select(joinCols.map(c => col(c).as(s"__r_$c")) :+
        col("__off") :+ col("__tot"): _*)
    val cond = joinCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    partial.join(offs, cond)
      .withColumn("__cum", col("__off") + col("__pc"))
      .drop(joinCols.map(c => s"__r_$c") ++ Seq("__b", "__pc", "__off"): _*)
  }

  /** Fixed-point scale for [[mixtureReweight]] shares/weights (ppm). */
  val MixScale: Long = 1000000L

  /**
   * Mixture reweighting for data mixing: given TARGET group shares in
   * ppm, compute each group's actual share and the inverse-propensity
   * weight `w_ppm = (target_ppm · n_total) DIV n_group` — the factor a
   * sampler multiplies into per-row weights so the drawn mixture hits
   * the target composition ("rebalance the crawl to 30% code, 5%
   * math, ..."). Groups absent from `targets` get target 0 and weight
   * 0 (dropped from the mixture); target groups absent from the DATA
   * are returned with n_rows 0 so a mis-typed target key is visible,
   * not silently unreachable. All-integer (ppm fixed point), so the
   * plan is engine-exact.
   *
   * Output: (grp, n_rows, share_ppm, target_ppm, weight_ppm) — one
   * row per group present in data or targets ("grp", not "group" —
   * the latter is a reserved word downstream SQL engines would choke
   * on unquoted).
   *
   * Scale shape: one hash count over the corpus, a broadcast join of
   * the droplet target table, one scalar total — the corpus streams
   * once and never shuffles by anything wider than the group key.
   */
  def mixtureReweight(
      df: DataFrame,
      groupCol: String,
      targets: Seq[(String, Long)]): DataFrame = {
    require(targets.nonEmpty, "mixtureReweight: empty target list")
    require(targets.map(_._1).distinct.size == targets.size,
      s"mixtureReweight: duplicate target groups in ${targets.map(_._1)}")
    targets.foreach { case (g, ppm) =>
      require(ppm >= 0 && ppm <= MixScale,
        s"mixtureReweight: target for '$g' must be in [0, $MixScale] ppm, got $ppm")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(groupCol).cast("string").as("grp"))
      .where(col("grp").isNotNull)
      .groupBy("grp").agg(count(lit(1)).as("n_rows"))
    val tgt = spark.createDataset(targets).toDF("grp", "target_ppm")
    val joined = counts.join(broadcast(tgt), Seq("grp"), "full_outer")
      .select(col("grp"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("target_ppm"), lit(0L)).as("target_ppm"))
    val total = broadcast(joined.agg(sum("n_rows").as("__n")))
    joined.crossJoin(total).select(
      col("grp"), col("n_rows"),
      when(col("__n") > 0, expr(s"(n_rows * ${MixScale}L) DIV __n"))
        .otherwise(0L).as("share_ppm"),
      col("target_ppm"),
      when(col("n_rows") > 0, expr("(target_ppm * __n) DIV n_rows"))
        .otherwise(0L).as("weight_ppm"))
  }

  /**
   * Cross-source score normalization: append each row's within-group
   * ECDF in ppm — `ecdf_ppm = 1e6 · |{group rows with score <= s}| DIV
   * n_group` — so quality scores from different sources/models/scales
   * become comparable on one integer [0, 1e6] axis (the "mix by
   * per-source quantile, not by raw score" step of data mixing, and
   * the integer-exact cousin of quantile normalization in omics).
   * EXACT (no sketch), ties share one ECDF value, engine-portable.
   *
   * Scale shape: the corpus collapses to a per-(group, score) COUNT
   * table (one partial-aggregable hash agg — bounded by the number of
   * distinct scores, not rows), the ECDF is a distributed prefix sum
   * over that table ([[distributedCumSum]] — parallel even inside one
   * giant group), and the ppm rides back on a (group, score) equi-join.
   * The corpus itself is never globally sorted or windowed.
   *
   * Null group keys form their own group (null-safe throughout); a
   * null score fails fast — it has no place on the score line.
   */
  def quantileNormalize(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      buckets: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "quantileNormalize: empty groupCols")
    val counts = df
      .groupBy((groupCols :+ scoreCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w",
        when(col(scoreCol).isNull, raise_error(lit(
          s"quantileNormalize: $scoreCol must be non-null")))
          .otherwise(col("__n")))
      .drop("__n")
    val ecdf = distributedCumSum(counts, groupCols, scoreCol, buckets)
      .withColumn("ecdf_ppm", expr(s"(__cum * ${MixScale}L) DIV __tot"))
      .select((groupCols :+ scoreCol).map(col) :+ col("ecdf_ppm"): _*)
    val keyed = (groupCols :+ scoreCol)
      .foldLeft(ecdf)((d, c) => d.withColumnRenamed(c, s"__e_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"__e_$c"))
      .reduce(_ && _) && col(scoreCol) === col(s"__e_$scoreCol")
    df.join(keyed, cond)
      .drop((groupCols :+ scoreCol).map(c => s"__e_$c"): _*)
  }

}
