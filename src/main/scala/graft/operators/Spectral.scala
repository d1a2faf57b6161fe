package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sketches.FrequentDirections

/**
 * Spectral analytics over embedding columns, built on the one-pass
 * matrix aggregates (`vec_gram_agg` / Frequent Directions).
 *
 * Scale design: every operator here reads the corpus EXACTLY ONCE
 * through a mergeable aggregate whose state is d^2 doubles; the only
 * driver-side object is the d x d Gram itself (bounded by the embedding
 * dimension, never by the corpus — the same bounded-collect contract as
 * the IVF probe set), and the only thing shipped back to executors is a
 * d x m projection matrix as a broadcast plan literal. The corpus is
 * never collected, never shuffled.
 *
 * Determinism: [[covarianceN2]] runs on the integer lattice
 * (`round(x*quantScale)`), where Gram entries, dimension sums, row
 * count, and the n^2-scaled covariance are all integers — exact in FP
 * at any parallelism, replayable bit-for-bit by any engine (q124's
 * oracle). The eigen-based operators are deterministic for a fixed
 * corpus (same Gram -> same Jacobi rotations) but not engine-portable,
 * so their queries pin CONTRACTS (energy ordering, captured fraction,
 * orthonormality) rather than raw values — the q25/q121 pattern.
 */
object Spectral {

  /** Quantize to the integer lattice, appending a homogeneous 1 so ONE
   *  Gram aggregate yields entries, per-dim sums, AND the row count:
   *  G'[d][d] = n, G'[i][d] = sum(v_i), G'[i][j] = gram(i, j). */
  private def homogeneousQuant(vecCol: Column, quantScale: Int): Column =
    concat(
      transform(vecCol, x => round(x.cast("double") * quantScale).cast("double")),
      array(lit(1.0d)))

  /** One distributed Gram pass, result to the driver (d' x d' doubles). */
  private def gramToDriver(df: DataFrame, v: Column): (Array[Double], Int) = {
    val row = df.select(v.as("v"))
      .agg(call_function("vec_gram_agg", col("v")).as("g"))
      .collect()(0)
    require(!row.isNullAt(0), "empty input: no vectors to aggregate")
    val flat = row.getSeq[Double](0).toArray
    val d = math.sqrt(flat.length).toInt
    require(d * d == flat.length, s"non-square gram of length ${flat.length}")
    (flat, d)
  }

  /**
   * The n^2-scaled population covariance matrix as exact integers:
   * `cov_n2(i, j) = n * gram(i, j) - sum_i * sum_j` over the quantized
   * vectors. One homogeneous-coordinate Gram pass delivers gram, sums,
   * and n together; LONG arithmetic (exact to 2^63) on the driver emits
   * the upper triangle as (i, j, cov_n2).
   */
  def covarianceN2(df: DataFrame, vecCol: String, quantScale: Int = 1000): DataFrame = {
    val (flat, dp) = gramToDriver(df, homogeneousQuant(col(vecCol), quantScale))
    val d = dp - 1
    val n = flat(d * dp + d).toLong
    val s = (0 until d).map(i => flat(i * dp + d).toLong)
    val rows = for { i <- 0 until d; j <- i until d } yield
      (i, j, n * flat(i * dp + j).toLong - s(i) * s(j))
    df.sparkSession.createDataFrame(rows).toDF("i", "j", "cov_n2")
  }

  /**
   * Top-m principal directions of the corpus Gram: one `vec_gram_agg`
   * pass, then a driver-side Jacobi eigen-decomposition of the d x d
   * matrix. Returns (m orthonormal components as rows, the m
   * eigenvalues descending, d).
   */
  def principalComponents(
      df: DataFrame,
      vecCol: String,
      m: Int): (Array[Array[Double]], Array[Double], Int) = {
    val (flat, d) = gramToDriver(df, col(vecCol).cast("array<double>"))
    require(m >= 1 && m <= d, s"m must be in [1, $d], got $m")
    val (eig, vecs) = FrequentDirections.symEigen(flat, d)
    val order = eig.indices.sortBy(i => -eig(i)).take(m)
    val comps = order.map { e =>
      val v = new Array[Double](d)
      var i = 0
      while (i < d) { v(i) = vecs(i * d + e); i += 1 }
      v
    }.toArray
    (comps, order.map(eig(_)).toArray, d)
  }

  /**
   * Second-moment DRIFT between two corpus slices, exact: for slices A
   * and B, `drift(i, j) = n_B * G_A(i, j) - n_A * G_B(i, j)` — the
   * cross-normalized Gram difference (zero iff the two slices' mean
   * second moments agree at (i, j)), computed on the integer lattice so
   * every entry is LONG-exact at any parallelism. One Gram pass per
   * slice; assembly on the driver over the bounded d x d matrices.
   * Output: (i, j, drift) upper triangle. Distribution shift between
   * ingestion snapshots / sources shows up as structured mass here
   * (e.g. a mean shift along dim k inflates row/col k) — and because
   * entries are exact integers, alerting thresholds are reproducible
   * across runs, engines, and cluster sizes.
   */
  def gramDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      vecCol: String,
      quantScale: Int = 1000): DataFrame = {
    val (fa, dpa) = gramToDriver(dfA, homogeneousQuant(col(vecCol), quantScale))
    val (fb, dpb) = gramToDriver(dfB, homogeneousQuant(col(vecCol), quantScale))
    require(dpa == dpb, s"dimension mismatch: ${dpa - 1} vs ${dpb - 1}")
    val d = dpa - 1
    val na = fa(d * dpa + d).toLong
    val nb = fb(d * dpa + d).toLong
    val rows = for { i <- 0 until d; j <- i until d } yield
      (i, j, nb * fa(i * dpa + j).toLong - na * fb(i * dpa + j).toLong)
    dfA.sparkSession.createDataFrame(rows).toDF("i", "j", "drift")
  }

  /** Dot of a vector column against a literal direction (sequential). */
  private def dotLit(v: Column, c: Array[Double]): Column =
    aggregate(zip_with(v, typedlit(c.toSeq), (a, b) => a * b),
      lit(0.0d), (acc, x) => acc + x)

  /**
   * Project every vector onto the corpus's top-m principal directions.
   * Output: (id, proj: array<double> length m, residual_sq) where
   * `residual_sq = |v|^2 - |proj|^2` is the energy OUTSIDE the top-m
   * subspace — the PCA-residual outlier score used for embedding QC
   * (corrupted / out-of-distribution vectors carry high residual).
   * The projection matrix is a plan literal: the scoring pass is a
   * stateless map with zero shuffles.
   */
  def pcaProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int): DataFrame = {
    val (comps, _, _) = principalComponents(df, vecCol, m)
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("proj", array(comps.map(c => dotLit(col("v"), c)): _*))
      .select(
        col("id"),
        col("proj"),
        (aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x) -
          aggregate(col("proj"), lit(0.0d), (acc, x) => acc + x * x))
          .as("residual_sq"))
  }
}
