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
}
