package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining: concatenate each group's
 * documents on one token line in (id) order and cut it into
 * fixed-`budget` chunks ("concat-then-chunk", the standard pretraining
 * packing — documents may straddle a chunk boundary; the alternative,
 * first-fit bin packing, is an inherently sequential recurrence that
 * neither distributes nor replays deterministically under reordering).
 *
 * The chunk geometry is a pure function of the data: with `cum` the
 * inclusive running token sum per group in (id) order,
 *
 *   first_chunk  = (cum − tokens) DIV budget
 *   last_chunk   = (cum − 1) DIV budget
 *   chunk_offset = (cum − tokens) MOD budget   (position inside first)
 *   n_chunks     = last_chunk − first_chunk + 1 (boundary straddles)
 *
 * — all exact longs, so a 100 TB corpus packs to byte-identical chunk
 * assignments on every engine, partitioning, and retry, and yesterday's
 * chunk ids are stable under append-only growth (new ids sort after).
 *
 * Token counts must be POSITIVE (a zero-token doc has no span and
 * would silently vanish from packing audits — fail fast instead).
 */
object Packing {

  /**
   * Pack `df`'s rows into `budget`-token chunks per group. Output:
   * (group..., id, n_tokens, first_chunk, last_chunk, chunk_offset,
   * n_chunks), one row per input row.
   *
   * Scale shape: the running token sum is [[Sampling.distributedCumSum]]
   * — the bucketed prefix sum, parallel even inside one giant group —
   * and everything after is a stateless projection. No unbounded
   * single-partition sort, no driver state.
   */
  def chunkPack(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      tokenCol: String,
      budget: Long,
      buckets: Int = 64): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val tcast = col(tokenCol).cast("long")
    val checked = df.withColumn("__w",
      when(tcast.isNull || tcast <= 0,
        raise_error(concat(
          lit(s"chunkPack: $tokenCol must be a positive long, got: "),
          coalesce(col(tokenCol).cast("string"), lit("null")))))
        .otherwise(tcast))
    Sampling.distributedCumSum(checked, groupCols, idCol, buckets)
      .withColumn("first_chunk", expr(s"(__cum - __w) DIV ${budget}L"))
      .withColumn("last_chunk", expr(s"(__cum - 1L) DIV ${budget}L"))
      .select(groupCols.map(col) ++ Seq(
        col(idCol),
        col("__w").as("n_tokens"),
        col("first_chunk"),
        col("last_chunk"),
        expr(s"(__cum - __w) % ${budget}L").as("chunk_offset"),
        (col("last_chunk") - col("first_chunk") + 1L).as("n_chunks")): _*)
  }

  /**
   * The loader-side half of [[chunkPack]]: one row per (group, chunk)
   * — how many docs contribute to the chunk and how many of its tokens
   * each boundary class fills. Output: (group..., chunk, n_docs,
   * n_tokens, is_full) where `is_full` asserts the packing invariant: every
   * chunk is filled to exactly `budget` tokens EXCEPT each group's
   * last — a partially-filled interior chunk means corrupt packing,
   * and this is the table that catches it before a trainer does.
   *
   * A doc spanning chunks [f, l] contributes
   * `min(end, (c+1)·budget) − max(start, c·budget)` tokens to chunk c,
   * with start/end recovered exactly from the chunkPack geometry.
   *
   * Scale shape: chunkPack's distributed prefix sum, then a bounded
   * per-doc explode (a doc yields `n_chunks` rows — its token count
   * DIV budget + 2 at most) and one (group, chunk) hash aggregate.
   */
  def chunkManifest(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      tokenCol: String,
      budget: Long,
      buckets: Int = 64): DataFrame = {
    val packed = chunkPack(df, groupCols, idCol, tokenCol, budget, buckets)
      .withColumn("__start", col("first_chunk") * budget + col("chunk_offset"))
      .withColumn("__end", col("__start") + col("n_tokens"))
    packed
      .select(groupCols.map(col) ++ Seq(
        explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk"),
        col("__start"), col("__end")): _*)
      .withColumn("__tok",
        least(col("__end"), (col("chunk") + 1L) * budget) -
          greatest(col("__start"), col("chunk") * budget))
      .groupBy((groupCols :+ "chunk").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
      .withColumn("is_full", col("n_tokens") === budget)
  }
}
