package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * t-digest quantiles: double-precision, tail-weighted accuracy, the full
 * accumulate/combine/estimate lifecycle, rank queries, partition-bound
 * planning, and the standard DataSketches wire image in both directions.
 */
class TDigestSuite extends AnyFunSuite with GraftSparkSession {

  private def setup(): Unit =
    spark.range(0, 10001)
      .selectExpr("CAST(id AS DOUBLE) AS v", "id % 4 AS g")
      .createOrReplaceTempView("td_vals")

  test("one-shot percentile: scalar and array shapes, tight on uniform data") {
    setup()
    val r = spark.sql("""
      |SELECT approx_percentile_tdigest(v, 0.5) AS m,
      |       approx_percentile_tdigest(v, array(0.1d, 0.9d)) AS deciles
      |FROM td_vals""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 5000.0) <= 150.0)
    val d = r.getSeq[Double](1)
    assert(d.length === 2)
    assert(math.abs(d(0) - 1000.0) <= 120.0)
    assert(math.abs(d(1) - 9000.0) <= 120.0)
  }

  test("lifecycle: per-group accumulate, cross-group combine, estimate + rank") {
    setup()
    val r = spark.sql("""
      |WITH parts AS (SELECT g, tdigest_accumulate(v) AS sk FROM td_vals GROUP BY g)
      |SELECT tdigest_estimate(tdigest_combine(sk), 0.5d) AS m,
      |       tdigest_rank(tdigest_combine(sk), 2500.0d) AS r
      |FROM parts""".stripMargin).collect()(0)
    // merged digests carry ~2x the single-pass error at mid ranks
    assert(math.abs(r.getDouble(0) - 5000.0) <= 300.0)
    assert(math.abs(r.getDouble(1) - 0.25) <= 0.03)
  }

  test("extremes are exact: rank 0 / rank 1 return the true min and max") {
    setup()
    val r = spark.sql("""
      |SELECT tdigest_estimate(tdigest_accumulate(v), 0.0d),
      |       tdigest_estimate(tdigest_accumulate(v), 1.0d)
      |FROM td_vals""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 10000.0)
  }

  test("empty input: estimate and rank are null, not NaN") {
    val r = spark.sql("""
      |SELECT tdigest_estimate(tdigest_accumulate(v), 0.5d),
      |       tdigest_rank(tdigest_accumulate(v), 1.0d),
      |       approx_percentile_tdigest(v, 0.5)
      |FROM (SELECT CAST(NULL AS DOUBLE) AS v WHERE 1 = 0)""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("corrupt bytes estimate to null; non-constant percentage rejected") {
    val r = spark.sql(
      "SELECT tdigest_estimate(binary('garbage'), 0.5d), tdigest_rank(binary('x'), 1.0d)")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    val e = intercept[Exception] {
      spark.sql("SELECT approx_percentile_tdigest(v, v) FROM VALUES (0.5d) AS t(v)")
        .collect()
    }
    assert(e.getMessage.contains("constant literal"))
  }

  test("wire format is the standard DataSketches t-digest image, both directions") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.tdigest.TDigestDouble
    // raw library image -> graft estimator
    val raw = new TDigestDouble(200.toShort)
    (1 to 100).foreach(i => raw.update(i.toDouble))
    spark.createDataFrame(Seq(Tuple1(raw.toByteArray))).toDF("sk")
      .createOrReplaceTempView("td_raw")
    val est = spark.sql("SELECT tdigest_estimate(sk, 1.0d) FROM td_raw").collect()(0)
    assert(est.getDouble(0) === 100.0)
    // graft accumulate output -> raw library heapify
    val bytes = spark.sql(
      "SELECT tdigest_accumulate(v) FROM VALUES (1.0d), (2.0d), (3.0d) AS t(v)")
      .collect()(0).getAs[Array[Byte]](0)
    val heapified = TDigestDouble.heapify(Memory.wrap(bytes))
    assert(heapified.getTotalWeight === 3L)
    assert(heapified.getMaxValue === 3.0)
  }

  test("conf controls compression and rejects junk at SET time") {
    setup()
    try {
      spark.sql("SET spark.sql.dataSketches.tdigest.k=1000")
      val tight = spark.sql(
        "SELECT approx_percentile_tdigest(v, 0.5) FROM td_vals").collect()(0).getDouble(0)
      assert(math.abs(tight - 5000.0) <= 50.0)
    } finally spark.sql("RESET spark.sql.dataSketches.tdigest.k")
    val e = intercept[IllegalArgumentException] {
      spark.sql("SET spark.sql.dataSketches.tdigest.k=3")
    }
    assert(e.getMessage.contains("[10, 10000]"))
  }

  test("partition bounds divide a skewed column into near-equal ranges") {
    // heavily skewed: x^2 over uniform ids — equal-WIDTH buckets would be
    // wildly unbalanced; the bounds must still equalize FREQUENCY
    spark.range(0, 20000).selectExpr("CAST(id * id AS DOUBLE) AS v")
      .createOrReplaceTempView("td_skew")
    val bounds = spark.sql("SELECT approx_partition_bounds(v, 4) FROM td_skew")
      .collect()(0).getSeq[Double](0)
    assert(bounds.length === 3)
    assert(bounds === bounds.sorted)
    // each of the 4 ranges holds 25% +- the KLL rank error (1.65% at k=200)
    val counts = spark.sql(s"""
      |SELECT sum(CASE WHEN v < ${bounds(0)} THEN 1 ELSE 0 END),
      |       sum(CASE WHEN v >= ${bounds(0)} AND v < ${bounds(1)} THEN 1 ELSE 0 END),
      |       sum(CASE WHEN v >= ${bounds(1)} AND v < ${bounds(2)} THEN 1 ELSE 0 END),
      |       sum(CASE WHEN v >= ${bounds(2)} THEN 1 ELSE 0 END)
      |FROM td_skew""".stripMargin).collect()(0)
    (0 until 4).foreach { i =>
      assert(math.abs(counts.getLong(i) / 20000.0 - 0.25) <= 0.04,
        s"bucket $i holds ${counts.getLong(i)}")
    }
    // n < 2 rejected at resolution
    val e = intercept[Exception] {
      spark.sql("SELECT approx_partition_bounds(v, 1) FROM td_skew").collect()
    }
    assert(e.getMessage.contains("at least 2"))
  }
}
