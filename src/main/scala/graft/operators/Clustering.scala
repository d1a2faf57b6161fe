package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed k-means clustering of embedding columns — the grouping
 * stage of SemDeDup-style semantic dedup (cluster, then near-dup only
 * within clusters) and of domain-balancing pipelines (cluster, then
 * sample per cluster).
 *
 * Design for 100 TB:
 *  - Lloyd iterations are pure DataFrame aggregations: assignment is a
 *    stateless projection against BROADCAST centroid literals (k*d
 *    doubles baked into the plan — no join, no shuffle of the corpus),
 *    and the centroid update is one `posexplode` + groupBy(cluster, dim)
 *    shuffle of k*d partial sums with map-side combine. The corpus is
 *    never collected; the driver holds only the k*d centroid matrix per
 *    iteration (the same bounded-scalar contract as the IVF probe-set
 *    collect, `IvfIndex.scala`).
 *  - DETERMINISTIC REPLAY: vectors are quantized to an integer lattice
 *    (`round(x * quantScale)`), centroid updates use the floor of the
 *    per-cluster mean, and ties in the argmin break toward the smallest
 *    seed id. Every quantity is then an integer-valued double (exact in
 *    FP regardless of partitioning or summation order), so cluster
 *    assignments are bit-reproducible across engines, run-to-run, and
 *    at any parallelism — the property the duckdb oracle (q122) pins.
 *    Seeding is the k lowest-id vectors: reproducible without an RNG.
 *    The lattice spacing (1/quantScale of the embedding scale) is far
 *    below any plausible cluster separation, so assignments match
 *    float k-means everywhere except exact decision boundaries.
 */
object Clustering {

  /** Squared L2 distance to a centroid literal, sequential over dims. */
  private def sqDist(v: Column, cent: Array[Double]): Column =
    aggregate(
      zip_with(v, typedlit(cent.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0.0d),
      (acc, x) => acc + x)

  /**
   * Assign every row to the nearest of `k` centroids after `iters`
   * Lloyd updates from the deterministic seed (the `k` lowest-id rows).
   * Returns (id, cluster) where cluster is the SEED id of the centroid
   * lineage (stable labels even if a cluster empties out).
   */
  def kmeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      quantScale: Int = 1000): DataFrame = {
    val q = quantized(df, idCol, vecCol, quantScale)
    assignToCentroids(q, trainCentroids(q, k, iters))
      .select(col("id"), col("cluster"))
  }

  /** Project to (id, v) on the integer lattice — the trainer's input. */
  private[operators] def quantized(
      df: DataFrame, idCol: String, vecCol: String, quantScale: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      transform(col(vecCol), x => round(x.cast("double") * quantScale).cast("double"))
        .as("v"))

  /** Nearest-centroid label per row: distances array + array_position of
   *  the min — first match, so ties break toward the earlier (lower seed
   *  id) centroid; centroid order is kept id-ascending. Pure projection
   *  against broadcast literals — no join, no shuffle. */
  private[operators] def assignToCentroids(
      q: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    val dists = array(cents.map { case (_, c) => sqDist(col("v"), c) }: _*)
    val labels = typedlit(cents.map(_._1))
    q.withColumn("cluster",
      element_at(labels, array_position(dists, array_min(dists)).cast("int")))
  }

  /**
   * Deterministic Lloyd training over a pre-quantized (id, v) frame:
   * seeds are the k lowest-id vectors, each round is one shuffle of k*d
   * partial sums, centroid = floor of the per-cluster mean (stays on the
   * lattice). Returns the seed-labelled centroid list, id-ascending.
   * Exposed so subspace trainers (product quantization) can share the
   * replay contract.
   */
  private[operators] def trainCentroids(
      q: DataFrame, k: Int, iters: Int): Seq[(Long, Array[Double])] = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    // deterministic seed: the k lowest-id vectors (k*d doubles to driver)
    var cents: Seq[(Long, Array[Double])] = q.orderBy("id").limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

    for (_ <- 1 to iters) {
      // one shuffle of k*d partial sums; floor-of-mean keeps the lattice
      val sums = assignToCentroids(q, cents)
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("dim"), floor(col("s") / col("n")).cast("double").as("c"))
        .collect()
      cents = sums.groupBy(_.getLong(0)).map { case (cl, rows) =>
        val c = new Array[Double](rows.map(_.getInt(1)).max + 1)
        rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
        (cl, c)
      }.toSeq.sortBy(_._1)
    }
    cents
  }

  /**
   * Simplified (centroid-based) silhouette per cluster: for each row,
   * `a` = squared lattice distance to its own centroid, `b` = the
   * nearest OTHER centroid, `s = (b - a)/max(a, b)` in 1e4 fixed point
   * (non-negative by construction — `a` is the argmin). High mean
   * silhouette = tight, well-separated cluster; near zero = the cluster
   * boundary cuts through a blob and per-cluster curation decisions
   * (SemDeDup radii, per-cluster sampling quotas) are noise. The
   * O(n·k) centroid form of the O(n²) full silhouette — the only one
   * that exists at 100 TB.
   *
   * Determinism: distances are exact integer-valued doubles on the
   * quantized lattice, so `s_fp` is one integer floor division; the
   * per-cluster mean is floor(Σs/n). Scale shape: one stateless
   * projection against broadcast centroid literals + one k-group
   * aggregate. Output: (cluster, n, mean_sil_fp).
   */
  def silhouetteProfile(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      quantScale: Int = 1000): DataFrame = {
    val q = quantized(df, idCol, vecCol, quantScale)
    val cents = trainCentroids(q, k, iters)
    val dists = array(cents.map { case (_, c) => sqDist(col("v"), c) }: _*)
    val labels = typedlit(cents.map(_._1))
    q.withColumn("dists", dists)
      .withColumn("pos",
        array_position(col("dists"), array_min(col("dists"))).cast("int"))
      .withColumn("cluster", element_at(labels, col("pos")))
      .withColumn("a", element_at(col("dists"), col("pos")))
      // b = nearest OTHER centroid (filter by index); null when k = 1
      .withColumn("b",
        array_min(filter(col("dists"), (_, i) => i =!= col("pos") - 1)))
      .withColumn("s_fp",
        when(col("b").isNotNull && greatest(col("a"), col("b")) > 0,
          expr("(CAST(b - a AS BIGINT) * 10000L) DIV CAST(greatest(a, b) AS BIGINT)"))
          .otherwise(0L))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("s_fp")).as("ssum"))
      .select(col("cluster"), col("n"),
        expr("ssum DIV n").as("mean_sil_fp"))
  }

  /**
   * Per-cluster sizes and within-cluster mean squared distance — the
   * SSE/k diagnostic for choosing k. Same determinism contract.
   */
  def kmeansProfile(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      quantScale: Int = 1000): DataFrame = {
    val a = kmeansAssign(df, idCol, vecCol, k, iters, quantScale)
    a.groupBy("cluster").agg(count(lit(1)).as("n_members"))
      .orderBy("cluster")
  }
}
