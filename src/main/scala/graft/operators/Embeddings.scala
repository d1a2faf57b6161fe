package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-column preprocessing for the similarity/dedup operators:
 * L2 normalization and random-projection dimensionality reduction.
 *
 * Random projection (Achlioptas-style ±1 signs) preserves pairwise
 * distances within (1±eps) at outDim = O(log n / eps^2) — the standard
 * way to cut the cosine-arithmetic cost of brute-force/IVF/LSH stages
 * by 4-8x before indexing. The sign matrix derives from md5(seed:j:i),
 * so it is reproducible bit-for-bit anywhere (the DuckDB oracle
 * rebuilds the identical matrix from the same formula) with zero RNG
 * state to ship; it broadcasts to executors as a plan literal
 * (outDim x inDim doubles — a few KB), and each row projects with
 * outDim codegen'd `graft_dot` calls. No shuffle, no UDF.
 */
object Embeddings {

  /** ±1 sign matrix (outDim rows x inDim cols): +1 iff the first hex
   *  char of md5("seed:j:i") is 0-7 (i.e. its top bit is 0). */
  def projectionMatrix(inDim: Int, outDim: Int, seed: Long): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        md.reset()
        val d = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
        if (((d(0) >> 4) & 0x8) == 0) 1.0 else -1.0
      }
    }
  }

  /**
   * Append `outCol` = the `outDim`-dimensional ±1 random projection of
   * `vecCol` (read as array<double>).
   */
  def randomProjection(
      df: DataFrame,
      vecCol: String,
      outCol: String,
      inDim: Int,
      outDim: Int,
      seed: Long = 42L): DataFrame = {
    require(inDim > 0 && outDim > 0, "dimensions must be positive")
    val m = typedlit(projectionMatrix(inDim, outDim, seed))
    // boundOnce: the cast input vector is shared by every output
    // dimension's dot — captured raw it would re-convert the float
    // array once per output dim
    df.withColumn(outCol,
      graft.operators.boundOnce(col(vecCol).cast("array<double>")) { v =>
        transform(m, row => Similarity.dot(v, row))
      })
  }

  /**
   * Append `outCol` = a `bits`-bit sign signature of the md5-seeded ±1
   * random projection ([[projectionMatrix]]), packed into ONE BIGINT —
   * the bit-packed hyperplane-LSH code a production vector store keeps
   * resident (8 bytes per vector; 32x smaller than the float32 vector,
   * 4x smaller than [[Sq8]] codes). Cosine similarity maps to Hamming
   * distance between codes (Charikar 2002); search is XOR + popcount.
   *
   * Determinism: each projection is the sequential double dot the
   * oracle replays bit-for-bit (q44's contract), and the sign test +
   * bit packing are exact integer ops, so the code — and any ranking
   * over it — reproduces across engines and partitionings. `bits`
   * must be <= 63 (bit 63 would need unsigned semantics).
   */
  def hammingCode(
      df: DataFrame,
      vecCol: String,
      outCol: String,
      inDim: Int,
      bits: Int,
      seed: Long = 42L): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    randomProjection(df, vecCol, "__hc_proj", inDim, bits, seed)
      .withColumn(outCol,
        aggregate(
          graft.operators.boundOnce(col("__hc_proj")) { p =>
            transform(sequence(lit(0), lit(bits - 1)),
              j => when(element_at(p, j + 1) >= 0.0,
                call_function("shiftleft", lit(1L), j))
                .otherwise(lit(0L)))
          },
          lit(0L), (acc, x) => acc + x))
      .drop("__hc_proj")
  }

  /**
   * Hamming top-k over [[hammingCode]] signatures: for each query row
   * the `k` corpus rows with the smallest code distance (self excluded,
   * ties to the lower neighbor id). The scan reads 8-byte codes — the
   * XOR+popcount per pair is ~2 cycles inside codegen; at 100 TB this
   * is the candidate generator in front of an exact rerank
   * ([[Similarity.projectedKnn]]'s second stage), not the final answer.
   * Output: (query_id, rk, neighbor_id, hamming).
   */
  def hammingKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      inDim: Int,
      bits: Int = 63,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null/malformed vectors yield a null code — excluded on both sides
    // (no signature, and a null distance would sort ABOVE real matches
    // in the ascending rank)
    val c = hammingCode(corpus, vecCol, "code", inDim, bits, seed)
      .where(col("code").isNotNull)
      .select(col(idCol).as("neighbor_id"), col("code").as("cc"))
    val q = hammingCode(queries, vecCol, "code", inDim, bits, seed)
      .where(col("code").isNotNull)
      .select(col(idCol).as("query_id"), col("code").as("qc"))
    val w = Window.partitionBy("query_id").orderBy(col("hamming"), col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming", expr("bit_count(qc ^ cc)"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        col("hamming").cast("int").as("hamming"))
  }

  /**
   * Append `outCol` = `vecCol` scaled to unit L2 norm (null-norm rows
   * keep a null output: no direction exists). The norm is materialized
   * as its own column first — dividing inside the transform lambda
   * would re-evaluate the dot product per element (no CSE in lambdas).
   */
  def normalizeL2(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val v: Column = col(vecCol).cast("array<double>")
    df.withColumn("__graft_norm", sqrt(Similarity.dot(v, v)))
      .withColumn(outCol, when(col("__graft_norm") > 0,
        transform(v, x => x / col("__graft_norm"))))
      .drop("__graft_norm")
  }

  /**
   * Embedding-column QC: per group, how many vectors are null, the
   * wrong dimension, contain a non-finite (NaN/Inf) or null element,
   * or are exactly zero (no direction — poisons cosine math downstream)
   * — the gate an embedding table passes before any ANN index build or
   * semantic dedup trusts it. A vector counts in the FIRST failing
   * category only (null → wrong-dim → non-finite → zero), so the
   * columns partition the failures and `n_vectors - n_null - ... -
   * n_zero` is the clean count.
   *
   * All outputs are integer counts from element-local predicates (no
   * float accumulation), computed in one partial-aggregable pass —
   * vectors never shuffle, only the per-group counter tuple does.
   */
  def embeddingQc(
      df: DataFrame,
      vecCol: String,
      groupCols: Seq[String],
      expectedDim: Int): DataFrame = {
    require(expectedDim >= 1, s"expectedDim must be >= 1, got $expectedDim")
    val v = col(vecCol)
    val isNullV = v.isNull
    val wrongDim = !isNullV && size(v) =!= expectedDim
    val nonFinite = !isNullV && size(v) === expectedDim &&
      exists(v, x => x.isNull || isnan(x.cast("double")) ||
        abs(x.cast("double")) === lit(Double.PositiveInfinity))
    val zeroVec = !isNullV && size(v) === expectedDim && !nonFinite &&
      forall(v, x => x === lit(0.0))
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    grouped.agg(
      count(lit(1)).as("n_vectors"),
      cnt(isNullV).as("n_null"),
      cnt(wrongDim).as("n_wrong_dim"),
      cnt(nonFinite).as("n_nonfinite"),
      cnt(zeroVec).as("n_zero"))
  }
}
