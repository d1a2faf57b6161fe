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
}
