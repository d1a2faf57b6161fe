package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over corpus-derived graphs (near-dup similarity edges,
 * link/citation structure): fixed-point PageRank for centrality-based
 * canonical-document selection and spam-farm detection. Complements the
 * connected-components labeling in [[Dedup.connectedComponents]].
 *
 * All rank mass is INTEGER (a global scale of 1e12 per unit), every
 * per-iteration update is `DIV`/`sum` on longs — order-independent and
 * overflow-free (total mass 1e12 << 2^63), so the result is
 * bit-identical across engines, partitionings, and retries: the
 * property a 100 TB re-run needs to be diff-able against yesterday's.
 */
object Graph {

  /** Total fixed-point mass distributed across the graph (1e12). */
  val RankScale: Long = 1000000000000L

  /**
   * `iters` synchronous PageRank iterations with damping
   * `dampNum/dampDen` (default 85/100). `nodes` is one column `idCol`;
   * `edges` has `src`/`dst` columns (directed; symmetrize upstream for
   * similarity graphs). Returns (id, rank_fp).
   *
   * Update rule (pure integer):
   *   share(u)  = rank(u) DIV outdeg(u)
   *   rank'(v)  = ((dampDen - dampNum) * (SCALE DIV N)
   *               + dampNum * sum_{u->v} share(u)) DIV dampDen
   * Dangling-node mass is dropped (the standard simplification; ranks
   * remain comparable, they just don't sum to SCALE).
   *
   * Scale design: each iteration is one broadcast-or-shuffle join of
   * the rank vector (8+8 bytes per node) against the edge list plus one
   * partial-aggregable sum by `dst` — document payloads never
   * participate. The driver holds one scalar (N). Iterations re-cache
   * the rank vector and unpersist the previous one, so lineage stays
   * O(1) regardless of `iters`.
   */
  def pageRankFp(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      iters: Int,
      dampNum: Int = 85,
      dampDen: Int = 100): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= num <= den, got $dampNum/$dampDen")
    // the edge list is consumed once per iteration — pin it (and the
    // node table) so an expensive upstream (e.g. a similarity join
    // producing the edges) runs once, not `iters` times; N comes from
    // the same cached table, not a second distinct pass
    val ids = nodes.select(col(idCol).as("id")).distinct().cache()
    val n = ids.count()
    require(n > 0, "pageRankFp: empty node set")
    val base = (RankScale / n) // SCALE DIV N, exact long division
    // hoist the degree join out of the loop: each edge carries its
    // source's out-degree, so an iteration is ONE rank-vector join +
    // one partial-aggregable sum — two exchanges, not four. The RAW
    // edge list is pinned first: the degree self-join references it on
    // both sides, so without the cache an expensive upstream producer
    // (similarity join) would evaluate twice just to fill `e`
    val rawEdges = edges.cache()
    val e = rawEdges
      .join(rawEdges.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .select(col("src"), col("dst"), col("deg"))
      .cache()
    e.count() // materialize so the raw list can drop now
    rawEdges.unpersist(blocking = false)
    var ranks = ids.withColumn("rank_fp", lit(base)).cache()
    for (_ <- 1 to iters) {
      val inbound = ranks
        .join(e, ranks("id") === e("src"))
        .select(col("dst"), expr("rank_fp DIV deg").as("share"))
        .groupBy(col("dst").as("id"))
        .agg(sum("share").as("s"))
      val next = ids.join(inbound, Seq("id"), "left")
        .select(col("id"),
          expr(s"(${(dampDen - dampNum).toLong}L * ${base}L + " +
            s"${dampNum.toLong}L * coalesce(s, 0L)) DIV ${dampDen.toLong}L")
            .as("rank_fp"))
        .cache()
      next.count() // materialize before dropping the parent cache
      ranks.unpersist()
      ranks = next
    }
    // the final rank vector is already materialized, so the working
    // tables can go; the returned frame itself stays cached (per-query
    // working state; the harness/caller clears it) — unpersisting IT
    // would force a full all-iterations recompute on first use
    e.unpersist(blocking = false)
    ids.unpersist(blocking = false)
    ranks
  }
}
