package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/**
 * Streaming variants of the training-data pipeline operators, for
 * continuous ingestion (`readStream` -> curate -> `writeStream`).
 *
 * State-bounded by design — at 100 TB/day the state store, not the
 * micro-batch, is what fails first:
 *  - dedup keys the state on the 16-byte binary md5 digest (never the
 *    document, never the 32-char hex rendering)
 *    and uses `dropDuplicatesWithinWatermark`, so entries are evicted once
 *    the watermark passes — memory is bounded by the dedup horizon, not
 *    the stream's lifetime. Duplicates arriving WITHIN the horizon are
 *    dropped exactly; a re-occurrence after eviction re-emits (the
 *    documented at-least-once-unique semantics of horizon-bounded dedup).
 *  - sessionization uses `session_window`, whose state closes and emits as
 *    soon as the watermark passes a session's gap — the streaming analogue
 *    of the batch q27 sessionize query.
 *
 * Stateless operators (quality scoring, language ID, token counts,
 * fingerprints, simhash) need no streaming variant: the `TextOps` /
 * `graft_*` expressions apply to streaming DataFrames unchanged.
 */
object StreamingOps {

  /**
   * Streaming exact (or whitespace/case-normalized) dedup: keep the first
   * document per content hash within the watermark horizon.
   */
  def dedupByContent(
      df: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermarkDelay: String,
      normalized: Boolean = false): DataFrame = {
    // unhex folds the 32-char hex rendering back to the true 16-byte
    // digest, halving per-key state size vs keying on the hex string
    val key: Column =
      if (normalized) unhex(TextOps.fingerprint(col(textCol)))
      else unhex(md5(col(textCol).cast("binary")))
    df.withColumn("__graft_content_hash", key)
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_content_hash")
      .drop("__graft_content_hash")
  }

  /**
   * Streaming sessionization: one row per (key, session) with bounds and
   * event count, emitted (append mode) once the watermark closes the
   * session. Gap semantics match the batch `session_window` operator.
   */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      eventTimeCol: String,
      gap: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
