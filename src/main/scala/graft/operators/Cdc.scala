package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Change-data-capture merge: apply a batch of keyed changes
 * (op ∈ {I, U, D}) to a snapshot — the upsert step every incremental
 * corpus pipeline runs between crawls (new documents in, revised
 * documents replaced, takedown/erasure deletes out; the batch
 * complement of the q181 delete-propagation gate).
 *
 * Semantics (deterministic, single batch): `D` drops the snapshot row;
 * `U` and `I` both land the change row (an upsert — `U` on an absent
 * key inserts, `I` on a present key replaces, so replaying the same
 * batch is idempotent). At most one change per key is assumed;
 * `requireUniqueKeys` validates that cheaply when asked.
 *
 * Scale shape: ONE left-anti join of the snapshot against change KEYS
 * (broadcast when the batch is small — the usual case; the snapshot
 * itself streams through untouched) plus a union with the surviving
 * change rows. No window, no full-table shuffle of the snapshot.
 */
object Cdc {

  def mergeChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      idCol: String,
      opCol: String,
      requireUniqueKeys: Boolean = false): DataFrame = {
    // an unrecognized op would silently act as a DELETE (its key anti-
    // joins the snapshot row away but the change row never lands) —
    // fail loudly instead; the scan is change-batch-sized and lazy
    val bad = changes
      .where(!coalesce(col(opCol).isin("I", "U", "D"), lit(false)))
      .limit(1).count()
    require(bad == 0L,
      s"mergeChanges: $opCol values must be I, U or D")
    if (requireUniqueKeys) {
      val dups = changes.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
        .where(col("__n") > 1).limit(1).count()
      require(dups == 0L, s"mergeChanges: multiple changes share one $idCol")
    }
    val untouched = snapshot.join(
      changes.select(col(idCol)), Seq(idCol), "left_anti")
    val landed = changes.where(col(opCol).isin("I", "U")).drop(opCol)
    untouched.unionByName(landed)
  }
}
