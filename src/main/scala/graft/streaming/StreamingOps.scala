package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /**
   * Streaming per-key admission quota: pass through at most `k` rows per
   * key, then drop the rest — the ingestion-side "cap documents per
   * domain/source" control of a curation pipeline, as a custom stateful
   * operator (`flatMapGroupsWithState`) rather than an aggregation.
   *
   * State is ONE Long per key (rows admitted so far) and is removed by
   * an event-time timeout `stateTtlMs` after the key's LATEST event
   * (anchoring the TTL to the watermark instead would expire everything
   * the moment the watermark first jumps) — so state is bounded by the
   * number of keys active within the horizon, not the stream's lifetime
   * (same bound class as [[dedupByContent]]). After expiry a key's
   * quota resets: the documented per-horizon-quota semantics, not a
   * lifetime quota. `eventTimeCol` must be a TIMESTAMP column.
   *
   * Which k rows win within one micro-batch is arrival-order dependent
   * (inherent to admission control under concurrency); the COUNT
   * admitted is exact.
   */
  def quotaPerKey(
      df: DataFrame,
      keyCol: String,
      eventTimeCol: String,
      watermarkDelay: String,
      k: Int,
      stateTtlMs: Long = 24L * 3600 * 1000): DataFrame = {
    require(k > 0, s"quota must be positive, got $k")
    require(stateTtlMs > 0, s"state TTL must be positive, got $stateTtlMs")
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    implicit val rowEnc: Encoder[Row] = Encoders.row(df.schema)
    val tsIdx = df.schema.fieldIndex(eventTimeCol)
    // A null event time cannot anchor the TTL (getTime would NPE) and a
    // null key stringified as "null" would silently share a quota with a
    // literal "null" key — drop both up front. Null-keyed/null-timed rows
    // never count against any quota; route them to a quarantine sink
    // upstream if they must be kept. With nulls gone, String.valueOf
    // below only ever renders real keys.
    df.where(col(keyCol).isNotNull && col(eventTimeCol).isNotNull)
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupByKey((r: Row) => String.valueOf(r.getAs[Any](keyCol)))(Encoders.STRING)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(0L)
            val admitted = Vector.newBuilder[Row]
            var nAdmitted = 0L
            var maxEventMs = Long.MinValue
            rows.foreach { r =>
              val t = r.getAs[java.sql.Timestamp](tsIdx).getTime
              if (t > maxEventMs) maxEventMs = t
              if (seen + nAdmitted < k) {
                admitted += r
                nAdmitted += 1
              }
            }
            state.update(seen + nAdmitted)
            // timeout must land strictly past the current watermark; a
            // fully-late batch clamps to watermark+1 (expires next batch)
            state.setTimeoutTimestamp(
              math.max(maxEventMs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            admitted.result().iterator
          }
      }
  }
}
