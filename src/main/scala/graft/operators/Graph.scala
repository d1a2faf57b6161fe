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

  /** Canonical undirected edge list: self-loops dropped, endpoints
   *  ordered (a < b), duplicates collapsed. */
  private def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.where(col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()

  /** Triangles via degree-ordered orientation + adjacency intersection:
   *  orient every edge from the endpoint with the smaller (degree, id)
   *  to the larger (a DAG — each triangle appears exactly once as edge
   *  (u,v) plus a common out-neighbor c), collect each node's
   *  out-neighbors once, and intersect the two lists per edge. The
   *  intermediate is |E| rows carrying O(d_out) arrays — NOT the
   *  Σ C(d_out, 2) wedge blow-up a three-way edge self-join
   *  materializes — and d_out ≈ d/2 toward higher-degree nodes only,
   *  the bound that survives hub skew at 100 TB. The adjacency table is
   *  |V| rows (broadcast-able on most graphs; AQE decides).
   *  Output: one row (u, v, common) per oriented edge. */
  private def edgeTriangles(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
    val o = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("a")).otherwise(col("b")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("b")).otherwise(col("a")).as("v"))
    // adjacency sorted ONCE per node; per-edge intersection is then an
    // allocation-free sorted merge (graft_sorted_intersect codegen) —
    // array_intersect would rebuild a hash set of the larger side per
    // edge, which dominates wall-clock on million-edge graphs. The
    // adjacency table is |V| rows / O(|E|) longs — BROADCAST it so the
    // edge stream never shuffles with duplicated neighbor arrays
    // attached (that duplication is Σd², the wedge blow-up in disguise).
    val adj = o.groupBy(col("u").as("node"))
      .agg(sort_array(collect_list(col("v").cast("long"))).as("nbrs"))
    // a v with no out-edges closes no triangle — inner joins suffice
    o.join(broadcast(adj.select(col("node").as("u"), col("nbrs").as("nu"))), Seq("u"))
      .join(broadcast(adj.select(col("node").as("v"), col("nbrs").as("nv"))), Seq("v"))
      .select(col("u"), col("v"),
        graft.functions.graft_sorted_intersect(col("nu"), col("nv")).as("common"))
  }

  /**
   * Global triangle census of an undirected graph: one row
   * (n_nodes, n_edges, n_triangles, gcc_fp) where gcc is the global
   * clustering coefficient 3T / #wedges in 1e4 fixed point (0 when the
   * graph has no wedges). The quality signal for corpus-derived
   * similarity graphs: a near-dup graph whose gcc collapses after a
   * pipeline change usually means the candidate generator broke.
   */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol).cache()
    // materialize before fanning out: the aggregate branches otherwise
    // race to fill the cache and each recomputes the (expensive) edge
    // producer — the pageRankFp e.count() pattern
    canon.count()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tris = edgeTriangles(canon)
      .agg(coalesce(sum(size(col("common"))), lit(0)).cast("long")
        .as("n_triangles"))
    // n_edges = Σdeg/2 — one deg pass feeds nodes, wedges, AND edges
    val degAgg = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("deg")) / 2).cast("long").as("n_edges"),
      (sum(col("deg") * (col("deg") - 1)) / 2).cast("long").as("n_wedges"))
    degAgg.crossJoin(tris)
      .select(
        col("n_nodes"), col("n_edges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("(3L * n_triangles * 10000L) DIV n_wedges"))
          .otherwise(0L).as("gcc_fp"))
  }

  /**
   * Link prediction by neighborhood overlap: the `topN` NON-adjacent
   * node pairs with the most common neighbors, scored also by
   * neighborhood Jaccard in 1e4 fixed point — the "these two documents
   * share every near-dup partner but never matched directly" signal
   * that catches candidate-generation misses in a dedup graph.
   *
   * Wedge generation is the skew hazard: a middle node of degree d
   * emits C(d,2) candidate pairs, so super-hubs (which carry no
   * discriminative signal — everything is their neighbor) are excluded
   * by `maxMiddleDeg` BEFORE the self-join; the cost bound is then
   * nodes × C(maxMiddleDeg, 2) regardless of how skewed the graph is.
   * Returns (a, b, cn, jaccard_fp), ordered (cn desc, jaccard desc,
   * a, b) — fully deterministic.
   */
  def commonNeighborPairs(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      topN: Int,
      maxMiddleDeg: Long = Long.MaxValue): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol).cache()
    canon.count() // materialize before branches fan out (see above)
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // symmetric adjacency, hub middles dropped before the wedge join
    val adj = canon.select(col("a").as("m"), col("b").as("x"))
      .unionAll(canon.select(col("b").as("m"), col("a").as("x")))
      .join(deg.withColumnRenamed("node", "m"), Seq("m"))
      .where(col("deg") <= maxMiddleDeg)
      .select(col("m"), col("x"))
    val cn = adj.as("l").join(adj.as("r"),
        col("l.m") === col("r.m") && col("l.x") < col("r.x"))
      .select(col("l.x").as("a"), col("r.x").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
    val nonAdj = cn.join(canon, Seq("a", "b"), "left_anti")
    nonAdj
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
      .select(col("a"), col("b"), col("cn"),
        expr("(cn * 10000L) DIV (da + db - cn)").as("jaccard_fp"))
      .orderBy(col("cn").desc, col("jaccard_fp").desc, col("a"), col("b"))
      .limit(topN)
  }

  /**
   * Local clustering coefficients for the `topN` highest-degree nodes
   * (ties to the lower id): (node, deg, n_tri, lcc_fp) with
   * lcc = 2*tri / (deg*(deg-1)) in 1e4 fixed point — which hub
   * neighborhoods are tight communities vs star-shaped spam.
   */
  def localClustering(
      edges: DataFrame, srcCol: String, dstCol: String, topN: Int): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol).cache()
    canon.count() // materialize before branches fan out (see above)
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // each edge's common-list contributes size(common) triangles to
    // BOTH endpoints and one apiece to every common node — only the
    // middle attribution explodes (one row per triangle)
    val et = edgeTriangles(canon).cache()
    val asEnds = et
      .select(explode(array(col("u"), col("v"))).as("node"),
        size(col("common")).cast("long").as("w"))
      .where(col("w") > 0)
    val asMid = et.select(explode(col("common")).as("node"), lit(1L).as("w"))
    val perNode = asEnds.unionAll(asMid)
      .groupBy("node").agg(sum("w").as("n_tri"))
    // orderBy+limit plans as TakeOrderedAndProject (per-partition top-N
    // then a driver merge of topN rows) — no single-partition window
    val top = deg.orderBy(col("deg").desc, col("node")).limit(topN)
    top.join(perNode, Seq("node"), "left")
      .select(
        col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") > 1,
          expr("(2L * coalesce(n_tri, 0L) * 10000L) DIV (deg * (deg - 1L))"))
          .otherwise(0L).as("lcc_fp"))
  }
}
