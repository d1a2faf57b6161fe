package graft

/**
 * Batch pipeline operators over DataFrames.
 *
 * ==Cache lifecycle contract==
 *
 * Several operators `.cache()` an intermediate frame that the returned
 * (lazy) plan references from more than one branch — funnel stages,
 * retention activity, shingle/word projections, k-means assignments,
 * coverage models. Spark performs no cross-branch plan deduplication, so
 * without the cache the shared subtree would recompute once per
 * consuming branch; with it, each branch reads the materialized blocks.
 *
 * Because the result is lazy, the operator CANNOT unpersist before
 * returning — the blocks are populated only when the caller executes the
 * plan, and live until released. Operators with a bounded internal loop
 * (`Dedup.connectedComponents`, `IvfIndex.build`, k-means) unpersist
 * their own loop state before returning; the caches backing the
 * ''returned'' plan transfer to the caller. In a long-lived session,
 * release them after the result is materialized (written / collected /
 * no longer re-queried) with either:
 *
 *  - `spark.sharedState.cacheManager.clearCache()` — drop everything
 *    (what `graft.Verify` and `graft.Bench` do between queries), or
 *  - `spark.catalog.clearCache()` — the public equivalent.
 *
 * Unreleased caches are not a correctness issue — the storage layer
 * evicts LRU under memory pressure and recomputes — but repeated
 * operator invocations in one session accumulate storage blocks and the
 * eviction churn shows up as latency noise (observed as the round-5
 * q21 bench regression before per-query clearing).
 */
package object operators {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{array, element_at, transform}

  /**
   * Evaluate `f` with `arr` computed ONCE per row: wraps it in a
   * single-element array and binds it as a lambda variable. Higher-order
   * functions don't codegen, and a captured subtree in a lambda BODY
   * re-evaluates per element — so `transform(sequence(...), i =>
   * slice(words(text), ...))` tokenizes the document once per output
   * element (quadratic). Any expression that feeds a derived array into
   * per-element lambdas should route through this hoist.
   */
  private[operators] def boundOnce(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), f), 1)
}
