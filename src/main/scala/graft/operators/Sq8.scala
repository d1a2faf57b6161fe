package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalar int8 quantization (SQ8) over an embedding column — the third
 * compression tier of the vector stack, between raw floats
 * ([[Similarity]]) and product quantization ([[Pq]]): each vector keeps
 * its own max-abs scale and every component becomes one signed byte.
 * 4x smaller than float32 with near-exact recall; what production
 * vector stores ship as the default compromise when PQ's codebook
 * training is not worth the accuracy loss.
 *
 * Quantization rule (engine-portable, no RNG, no training):
 *   scale  = max_i |x_i|             (exact double; components are f32)
 *   code_i = floor(x_i / scale * 127 + 0.5)   in [-127, 127]
 * Zero vectors get scale = 0 and are excluded from search (no
 * direction, same contract as the cosine paths). `floor(d + 0.5)` is
 * used instead of an engine round() so the half-way rule is pinned by
 * IEEE semantics, not by a library rounding mode.
 *
 * Search scores dequantized dot products:
 *   score = (idot * sa) * sb / 16129.0       (127² = 16129)
 * where `idot = Σ ca_i * cb_i` is an EXACT integer (|idot| <= d * 16129
 * — integer-valued doubles, no summation-order sensitivity), and the
 * float multiply chain is written in one fixed association so every
 * engine produces the identical double.
 *
 * Scale shape: encoding is a stateless projection (no shuffle, no
 * state); search is the brute-force pattern of
 * [[Similarity.bruteForceKnn]] — broadcast the query batch, stream the
 * CODES (4x less I/O than the vectors they replace), one per-query
 * top-k window that WindowGroupLimit prunes map-side.
 */
object Sq8 {

  /** Per-vector scale and int8 codes: (id, scale, codes ARRAY<INT>). */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .withColumn("codes",
        when(col("scale") > 0,
          transform(col("v"),
            x => floor(x / col("scale") * lit(127.0) + lit(0.5)).cast("int")))
          .otherwise(transform(col("v"), x => lit(0))))
      .select(col("id"), col("scale"), col("codes"))
  }

  /**
   * Exact top-k over the QUANTIZED space: for each query row the k
   * corpus rows with the highest dequantized dot product (self and
   * zero vectors excluded; ties to the lower neighbor id). Output:
   * (query_id, rk, neighbor_id, score) with score rounded 9 dp (the
   * engine-portable rounding convention of the cosine operators).
   */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = encode(corpus, idCol, vecCol)
      .where(col("scale") > 0)
      .select(col("id").as("neighbor_id"), col("scale").as("sb"),
        col("codes").cast("array<double>").as("cb"))
    val q = encode(queries, idCol, vecCol)
      .where(col("scale") > 0)
      .select(col("id").as("query_id"), col("scale").as("sa"),
        col("codes").cast("array<double>").as("ca"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("idot", Similarity.dot(col("ca"), col("cb")))
      // fixed association: ((idot * sa) * sb) / 16129.0
      .withColumn("score", col("idot") * col("sa") * col("sb") / lit(16129.0))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("score"), 9).as("score"))
  }
}
