package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Record linkage (entity resolution) for dirty metadata: match noisy
 * records (scraped titles, OCR'd names, user-typed fields) against a
 * clean reference by edit distance — the join that standard equi-joins
 * cannot express. The classic use in a training-data pipeline is
 * canonicalizing source metadata before dedup groups on it.
 *
 * Scale design: never all-pairs. Candidates come from a BLOCKING join —
 * each side emits a small set of block keys (prefix, suffix, and a
 * length band by default) and only same-key pairs are scored. Blocking
 * is the standard recall/cost knob of record linkage: a typo that
 * mangles every block key of a record escapes matching (bounded misses,
 * linear cost) — the multi-key union keeps single-typo records
 * recallable since one edit can break at most two of the three keys.
 * The expensive `levenshtein` runs only on blocked candidates, and the
 * final best-match pick is a partial-aggregable `min_by` struct — no
 * windows, no driver state.
 */
object Linkage {

  /** Default block keys: 3-char prefix, 3-char suffix, and the
   *  length band `len DIV 4` prefixed to dodge collisions with the
   *  text keys. One edit changes at most two of the three. */
  private def blockKeys(c: String): org.apache.spark.sql.Column = array(
    concat(lit("p:"), substring(col(c), 1, 3)),
    concat(lit("s:"), substring(col(c), -3, 3)),
    concat(lit("l:"), (length(col(c)).cast("long") / lit(4L)).cast("long").cast("string")))

  /**
   * Link each record of `dirty` to its best match in `clean`:
   * levenshtein distance <= `maxDist`, ties broken by smallest clean
   * id (deterministic). Returns
   * (dirty_id, clean_id, dist) — dirty records with no candidate
   * within `maxDist` are absent (left-join downstream if the miss set
   * is needed). Ids must be long-castable; names are matched verbatim
   * (normalize case/whitespace upstream — that's a cleaning decision,
   * not a linkage one).
   */
  def linkByEditDistance(
      dirty: DataFrame,
      dirtyId: String,
      dirtyName: String,
      clean: DataFrame,
      cleanId: String,
      cleanName: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = dirty
      .select(col(dirtyId).cast("long").as("dirty_id"), col(dirtyName).as("dn"))
      .where(col("dirty_id").isNotNull && col("dn").isNotNull)
      .withColumn("bk", explode(blockKeys("dn")))
    val c = clean
      .select(col(cleanId).cast("long").as("clean_id"), col(cleanName).as("cn"))
      .where(col("clean_id").isNotNull && col("cn").isNotNull)
      .withColumn("bk", explode(blockKeys("cn")))
    // a pair sharing 2+ block keys would score twice — distinct BEFORE
    // the levenshtein so each candidate is scored once
    val cand = d.join(c, Seq("bk"))
      .select(col("dirty_id"), col("dn"), col("clean_id"), col("cn"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("dn"), col("cn")))
      .where(col("dist") <= maxDist)
      .groupBy("dirty_id")
      // min over (dist, clean_id) struct = best distance, then smallest id
      .agg(min(struct(col("dist"), col("clean_id"))).as("best"))
      .select(col("dirty_id"), col("best.clean_id").as("clean_id"),
        col("best.dist").cast("long").as("dist"))
  }
}
