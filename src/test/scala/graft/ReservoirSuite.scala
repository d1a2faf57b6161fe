package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Mergeable reservoir sampling: under-full reservoirs keep everything
 * (deterministic); over-full reservoirs are property-checked (size,
 * membership, total-count bookkeeping) since the sample is random.
 */
class ReservoirSuite extends AnyFunSuite with GraftSparkSession {

  test("under-full reservoir keeps every value across a shuffle") {
    val r = spark.sql(
      """SELECT k, sort_array(reservoir_sample(v, 10)) FROM VALUES
        |  ('a', 'x'), ('a', 'y'), ('a', 'z'), ('b', 'q')
        |AS t(k, v) GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(r.toSeq === Seq(Row("a", Seq("x", "y", "z")), Row("b", Seq("q"))))
  }

  test("over-full reservoir: size k, members of input, n = stream size") {
    val row = spark.sql(
      """SELECT reservoir_sample(CAST(id AS STRING), 50) AS sample,
        |       reservoir_estimate(reservoir_accumulate(CAST(id AS STRING), 50)) AS est
        |FROM range(10000)""".stripMargin).collect()(0)
    val sample = row.getSeq[String](0)
    assert(sample.length === 50)
    assert(sample.toSet.size === 50) // sampling without replacement
    assert(sample.forall(s => s.toLong >= 0 && s.toLong < 10000))
    val est = row.getStruct(1)
    assert(est.getLong(0) === 10000L) // n tracks the full stream
    assert(est.getSeq[String](1).length === 50)
  }

  test("lifecycle: accumulate per group -> combine -> estimate") {
    val r = spark.sql(
      """WITH s AS (
        |  SELECT id % 4 AS g, reservoir_accumulate(CAST(id AS STRING), 25) AS sk
        |  FROM range(1000) GROUP BY 1)
        |SELECT reservoir_estimate(reservoir_combine(sk, 25)) AS est FROM s""".stripMargin)
      .collect()(0).getStruct(0)
    assert(r.getLong(0) === 1000L)      // merged n = whole stream
    assert(r.getSeq[String](1).length === 25)
  }

  test("corrupt bytes yield null from the estimator") {
    val r = spark.sql("SELECT reservoir_estimate(binary('garbage'))").collect()
    assert(r.toSeq === Seq(Row(null)))
    val e = intercept[Exception] {
      spark.sql("SELECT reservoir_sample(CAST(id AS STRING), id) FROM range(3)").collect()
    }
    assert(e.getMessage.contains("constant integer literal"))
  }

  test("varopt: under-full keeps exact weights; weighted inclusion beyond k") {
    val exact = spark.sql(
      """SELECT inline(varopt_sample(col, w, 10)) FROM VALUES
        |  ('a', 5.0), ('b', 1.0), ('c', 2.5) AS t(col, w)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(exact === Seq(("a", 5.0), ("b", 1.0), ("c", 2.5)))
    // over-full: heavy item (weight 1000 vs 1) is virtually always kept
    val over = spark.sql(
      """SELECT inline(varopt_sample(CAST(id AS STRING),
        |  CASE WHEN id = 0 THEN 1000.0 ELSE 1.0 END, 20)) FROM range(2000)""".stripMargin)
      .collect().map(_.getString(0))
    assert(over.length === 20)
    assert(over.contains("0"), "heavy item must be sampled")
    // lifecycle + total-weight conservation: sum of adjusted weights of
    // an unbiased sample estimates the total stream weight exactly
    // (varopt preserves total mass across merge)
    val est = spark.sql(
      """WITH s AS (
        |  SELECT id % 4 g, varopt_accumulate(CAST(id AS STRING), 2.0, 25) sk
        |  FROM range(1000) GROUP BY 1)
        |SELECT varopt_estimate(varopt_combine(sk, 25)) FROM s""".stripMargin)
      .collect()(0).getStruct(0)
    assert(est.getLong(0) === 1000L)
    val totalWeight = est.getSeq[Row](1).map(_.getDouble(1)).sum
    assert(math.abs(totalWeight - 2000.0) < 1e-6)
  }

  test("ebpps: integer expected size keeps the exact multiset") {
    // equal weights with n <= k make every inclusion probability
    // min(1, k*w/W) = 1 -> C integer, no partial item, deterministic
    val r = spark.sql(
      """SELECT k, sort_array(ebpps_sample(v, 1.0, 10)) FROM VALUES
        |  ('a', 'x'), ('a', 'y'), ('a', 'z'), ('b', 'q')
        |AS t(k, v) GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(r.toSeq === Seq(Row("a", Seq("x", "y", "z")), Row("b", Seq("q"))))
  }

  test("ebpps: strict PPS — a heavy item bounds C and is always kept") {
    // C = min(k, W/w_max) = 2999/1000 = 2.999: ONE heavy item shrinks
    // the whole sample to floor/ceil(C) = 2 or 3 (strict
    // proportionality — varopt would keep 20). The heavy item's own
    // probability is c*w/W = 1 exactly, so it is always present.
    val row = spark.sql(
      """SELECT ebpps_sample(CAST(id AS STRING),
        |  CASE WHEN id = 0 THEN 1000.0 ELSE 1.0 END, 20) AS s FROM range(2000)""".stripMargin)
      .collect()(0)
    val sample = row.getSeq[String](0)
    assert(sample.contains("0"), "probability-1 item must always be sampled")
    assert(sample.length >= 2 && sample.length <= 3)
    assert(sample.toSet.size === sample.length) // without replacement
  }

  test("ebpps lifecycle: n and cumulative weight are exact across merge") {
    val est = spark.sql(
      """WITH s AS (
        |  SELECT id % 4 AS g, ebpps_accumulate(CAST(id AS STRING), 2.0, 25) AS sk
        |  FROM range(1000) GROUP BY 1)
        |SELECT ebpps_estimate(ebpps_combine(sk, 25)) AS est FROM s""".stripMargin)
      .collect()(0).getStruct(0)
    assert(est.getLong(0) === 1000L)
    assert(math.abs(est.getDouble(1) - 2000.0) < 1e-6)
    val samples = est.getSeq[String](2)
    // equal weights -> C = min(k, W/w_max) = 25 exactly: no partial item
    assert(samples.length === 25)
    assert(samples.forall(s => s.toLong >= 0 && s.toLong < 1000))
  }

  test("ebpps: corrupt bytes yield null; non-literal k rejected") {
    val r = spark.sql("SELECT ebpps_estimate(binary('garbage'))").collect()
    assert(r.toSeq === Seq(Row(null)))
    val e = intercept[Exception] {
      spark.sql("SELECT ebpps_sample(CAST(id AS STRING), 1.0, id) FROM range(3)").collect()
    }
    assert(e.getMessage.contains("constant integer literal"))
  }
}
