package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/**
 * Column-based Scala API over the graft SQL functions, for users who prefer
 * the DataFrame DSL to `expr(...)`. Requires the functions to be registered
 * in the session ([[GraftExtensions]] / [[Graft.install]]).
 */
object functions {
  // --- quantiles -------------------------------------------------------
  def approx_percentile_ex(col: Column, percentage: Column): Column =
    F.call_function("approx_percentile_ex", col, percentage)
  def approx_percentile_kll(col: Column, percentage: Column): Column =
    F.call_function("approx_percentile_kll", col, percentage)
  def approx_percentile_req(col: Column, percentage: Column): Column =
    F.call_function("approx_percentile_req", col, percentage)
  def approx_percentile_mergeable(col: Column, percentage: Column): Column =
    F.call_function("approx_percentile_mergeable", col, percentage)
  def approx_percentile_accumulate(col: Column): Column =
    F.call_function("approx_percentile_accumulate", col)
  def approx_percentile_combine(sketch: Column): Column =
    F.call_function("approx_percentile_combine", sketch)
  def approx_percentile_estimate(sketch: Column, percentage: Column): Column =
    F.call_function("approx_percentile_estimate", sketch, percentage)
  def approx_pmf_estimate(sketch: Column, numSplits: Column): Column =
    F.call_function("approx_pmf_estimate", sketch, numSplits)
  def approx_pmf_estimate(sketch: Column): Column =
    F.call_function("approx_pmf_estimate", sketch)

  def approx_cdf_estimate(sketch: Column, numSplits: Column): Column =
    F.call_function("approx_cdf_estimate", sketch, numSplits)
  def approx_cdf_estimate(sketch: Column): Column =
    F.call_function("approx_cdf_estimate", sketch)
  def approx_rank_estimate(sketch: Column, value: Column): Column =
    F.call_function("approx_rank_estimate", sketch, value)

  // --- frequent items --------------------------------------------------
  def approx_freqitems(col: Column): Column = F.call_function("approx_freqitems", col)
  def approx_freqitems_accumulate(col: Column): Column =
    F.call_function("approx_freqitems_accumulate", col)
  def approx_freqitems_combine(sketch: Column): Column =
    F.call_function("approx_freqitems_combine", sketch)
  def approx_freqitems_estimate(sketch: Column): Column =
    F.call_function("approx_freqitems_estimate", sketch)

  // --- distinct counts -------------------------------------------------
  def approx_count_distinct_ex(col: Column): Column =
    F.call_function("approx_count_distinct_ex", col)
  def approx_count_distinct_cpc(col: Column): Column =
    F.call_function("approx_count_distinct_cpc", col)
  def approx_count_distinct_hll(col: Column): Column =
    F.call_function("approx_count_distinct_hll", col)
  def approx_count_distinct_accumulate(col: Column): Column =
    F.call_function("approx_count_distinct_accumulate", col)
  def approx_count_distinct_combine(sketch: Column): Column =
    F.call_function("approx_count_distinct_combine", sketch)
  def approx_count_distinct_estimate(sketch: Column): Column =
    F.call_function("approx_count_distinct_estimate", sketch)

  // --- varopt weighted sampling ----------------------------------------
  def varopt_sample(col: Column, weight: Column, k: Int): Column =
    F.call_function("varopt_sample", col, weight, F.lit(k))
  def varopt_accumulate(col: Column, weight: Column, k: Int): Column =
    F.call_function("varopt_accumulate", col, weight, F.lit(k))
  def varopt_combine(sketch: Column, k: Int): Column =
    F.call_function("varopt_combine", sketch, F.lit(k))
  def varopt_estimate(sketch: Column): Column =
    F.call_function("varopt_estimate", sketch)

  // --- EBPPS strict-PPS sampling ----------------------------------------
  def ebpps_sample(col: Column, weight: Column, k: Int): Column =
    F.call_function("ebpps_sample", col, weight, F.lit(k))
  def ebpps_accumulate(col: Column, weight: Column, k: Int): Column =
    F.call_function("ebpps_accumulate", col, weight, F.lit(k))
  def ebpps_combine(sketch: Column, k: Int): Column =
    F.call_function("ebpps_combine", sketch, F.lit(k))
  def ebpps_estimate(sketch: Column): Column =
    F.call_function("ebpps_estimate", sketch)

  // --- reservoir sampling ----------------------------------------------
  def reservoir_sample(col: Column, k: Int): Column =
    F.call_function("reservoir_sample", col, F.lit(k))
  def reservoir_accumulate(col: Column, k: Int): Column =
    F.call_function("reservoir_accumulate", col, F.lit(k))
  def reservoir_combine(sketch: Column, k: Int): Column =
    F.call_function("reservoir_combine", sketch, F.lit(k))
  def reservoir_estimate(sketch: Column): Column =
    F.call_function("reservoir_estimate", sketch)

  // --- theta set-operation sketches ------------------------------------
  def theta_accumulate(col: Column): Column = F.call_function("theta_accumulate", col)
  def theta_union(sketch: Column): Column = F.call_function("theta_union", sketch)
  def theta_intersect(sketch: Column): Column = F.call_function("theta_intersect", sketch)
  def theta_a_not_b(a: Column, b: Column): Column = F.call_function("theta_a_not_b", a, b)
  def theta_estimate(sketch: Column): Column = F.call_function("theta_estimate", sketch)
  def theta_intersect_pair(a: Column, b: Column): Column =
    F.call_function("theta_intersect_pair", a, b)
  def theta_union_pair(a: Column, b: Column): Column =
    F.call_function("theta_union_pair", a, b)

  // --- text / vector pipeline ------------------------------------------
  def graft_simhash(text: Column): Column = F.call_function("graft_simhash", text)
  def graft_hamming_hex(a: Column, b: Column): Column =
    F.call_function("graft_hamming_hex", a, b)
  def graft_dot(a: Column, b: Column): Column = F.call_function("graft_dot", a, b)
  def graft_int8_quantize(v: Column): Column = F.call_function("graft_int8_quantize", v)
  def graft_lsh_buckets(v: Column, dim: Int, bits: Int, tables: Int, seed: Long): Column =
    F.call_function("graft_lsh_buckets", v, F.lit(dim), F.lit(bits), F.lit(tables), F.lit(seed))
  def graft_minhash(shingles: Column, numHashes: Int): Column =
    F.call_function("graft_minhash", shingles, F.lit(numHashes))
  def graft_winnow(text: Column, k: Int, w: Int): Column =
    F.call_function("graft_winnow", text, F.lit(k), F.lit(w))
  def graft_word_shingles(text: Column, n: Int): Column =
    F.call_function("graft_word_shingles", text, F.lit(n))
  def graft_word_shingle_seq(text: Column, n: Int): Column =
    F.call_function("graft_word_shingle_seq", text, F.lit(n))
  def graft_drop_words(text: Column, positions: Column): Column =
    F.call_function("graft_drop_words", text, positions)
  def graft_fold_accents(text: Column): Column =
    F.call_function("graft_fold_accents", text)
  def graft_normalize_unicode(text: Column, form: String): Column =
    F.call_function("graft_normalize_unicode", text, F.lit(form))
  def graft_marker_hits(text: Column, words: Seq[String]): Column =
    F.call_function("graft_marker_hits", (text +: words.map(F.lit)): _*)
  def graft_filter_lines(text: Column, minWords: Int, requirePunct: Boolean,
      dropMarkers: Seq[String]): Column =
    F.call_function("graft_filter_lines",
      (text +: F.lit(minWords) +: F.lit(requirePunct) +: dropMarkers.map(F.lit)): _*)
  def graft_repetition_stats(text: Column): Column =
    F.call_function("graft_repetition_stats", text)
  def graft_bloom_agg(value: Column, expectedItems: Long): Column =
    F.call_function("graft_bloom_agg", value, F.lit(expectedItems))
  def graft_might_contain(bloom: Column, value: Column): Column =
    F.call_function("graft_might_contain", bloom, value)

  // --- tuple sketches (distinct keys + per-key double summaries) -------
  def tuple_accumulate(key: Column, value: Column, mode: String = "sum"): Column =
    F.call_function("tuple_accumulate", key, value, F.lit(mode))
  def tuple_union(sketch: Column, mode: String = "sum"): Column =
    F.call_function("tuple_union", sketch, F.lit(mode))
  def tuple_intersect(sketch: Column, mode: String = "sum"): Column =
    F.call_function("tuple_intersect", sketch, F.lit(mode))
  def tuple_a_not_b(a: Column, b: Column): Column = F.call_function("tuple_a_not_b", a, b)
  def tuple_estimate(sketch: Column): Column = F.call_function("tuple_estimate", sketch)

  // --- t-digest quantiles (double precision, tail-weighted accuracy) ---
  def approx_percentile_tdigest(col: Column, percentage: Column): Column =
    F.call_function("approx_percentile_tdigest", col, percentage)
  def tdigest_accumulate(col: Column): Column = F.call_function("tdigest_accumulate", col)
  def tdigest_combine(sketch: Column): Column = F.call_function("tdigest_combine", sketch)
  def tdigest_estimate(sketch: Column, rank: Column): Column =
    F.call_function("tdigest_estimate", sketch, rank)
  def tdigest_rank(sketch: Column, value: Column): Column =
    F.call_function("tdigest_rank", sketch, value)

  /** n-1 split points dividing `col` into n near-equal-frequency ranges. */
  def approx_partition_bounds(col: Column, n: Int): Column =
    F.call_function("approx_partition_bounds", col, F.lit(n))

  def graft_nearest_cells(v: Column, cents: Column, nprobe: Int): Column =
    F.call_function("graft_nearest_cells", v, cents, F.lit(nprobe))

  // --- DataSketches BloomFilter (cross-system membership) --------------
  def bloom_accumulate(col: Column, maxItems: Long = 100000L, fpp: Double = 0.01): Column =
    F.call_function("bloom_accumulate", col, F.lit(maxItems), F.lit(fpp))
  def bloom_union(sketch: Column, maxItems: Long = 100000L, fpp: Double = 0.01): Column =
    F.call_function("bloom_union", sketch, F.lit(maxItems), F.lit(fpp))
  def bloom_intersect(sketch: Column, maxItems: Long = 100000L, fpp: Double = 0.01): Column =
    F.call_function("bloom_intersect", sketch, F.lit(maxItems), F.lit(fpp))
  def bloom_might_contain(sketch: Column, value: Column): Column =
    F.call_function("bloom_might_contain", sketch, value)

  // --- string quantiles (order statistics over string keys) ------------
  def approx_percentile_str(col: Column, percentage: Column): Column =
    F.call_function("approx_percentile_str", col, percentage)
  def approx_partition_bounds_str(col: Column, n: Int): Column =
    F.call_function("approx_partition_bounds_str", col, F.lit(n))

  // --- frequent distinct tuples (dedup-aware heavy hitters) ------------
  def fdt_accumulate(dims: Column): Column = F.call_function("fdt_accumulate", dims)
  def fdt_union(sketch: Column): Column = F.call_function("fdt_union", sketch)
  def fdt_topk(sketch: Column, indices: Seq[Int], k: Int): Column =
    F.call_function("fdt_topk", sketch, F.array(indices.map(F.lit): _*), F.lit(k))

  // --- hashed linear classifier inference ------------------------------
  def graft_hashed_bow_score(text: Column, weights: Seq[Double]): Column =
    F.call_function("graft_hashed_bow_score", text,
      F.array(weights.map(F.lit): _*))

  // --- range-partition bucketing ---------------------------------------
  def graft_value_bucket(v: Column, bounds: Seq[Double]): Column =
    F.call_function("graft_value_bucket", v,
      F.array(bounds.map(F.lit): _*))
  def graft_bucket_index(bounds: Column, v: Column): Column =
    F.call_function("graft_bucket_index", bounds, v)

  // --- sparse integer-weighted vectors ---------------------------------
  def graft_sparse_dot(keysA: Column, valsA: Column,
      keysB: Column, valsB: Column): Column =
    F.call_function("graft_sparse_dot", keysA, valsA, keysB, valsB)

  def graft_sorted_intersect(a: Column, b: Column): Column =
    F.call_function("graft_sorted_intersect", a, b)

  // --- matrix / spectral aggregates (Gram + Frequent Directions) -------
  def vec_gram_agg(vec: Column): Column = F.call_function("vec_gram_agg", vec)
  def fd_accumulate(vec: Column, ell: Int): Column =
    F.call_function("fd_accumulate", vec, F.lit(ell))
  def fd_combine(sketch: Column): Column = F.call_function("fd_combine", sketch)
  def fd_gram_estimate(sketch: Column): Column =
    F.call_function("fd_gram_estimate", sketch)
  def fd_singular_values(sketch: Column): Column =
    F.call_function("fd_singular_values", sketch)
  def fd_error_bound(sketch: Column): Column =
    F.call_function("fd_error_bound", sketch)
}
