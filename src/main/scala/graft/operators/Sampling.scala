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
   * Deterministic disjoint split assignment (train/val/test): partition
   * the 2^60 hash space of [[weightedMix]] into consecutive ranges
   * proportional to the integer `weights`, and label each row by the
   * range its id's hash fraction falls in. Every row gets EXACTLY one
   * label (disjoint and exhaustive by construction), membership is a
   * pure function of the id — stable across runs, partitionings,
   * engines, and additions to the corpus (a new document never moves an
   * old one between splits). Pure map-side `when` chain over precomputed
   * BigInt boundaries; no shuffle, no RNG.
   */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive weights, got $splits")
    val total = splits.map(_._2).sum
    val bounds = splits.map(_._2).scanLeft(0)(_ + _).tail
      .map(c => (HashSpace * c / total).toLong)
    val hv = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
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
}
