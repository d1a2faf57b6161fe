package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.conf.GraftConf

/**
 * Theta set-operation sketches: union / intersection / difference
 * cardinalities between independently-built sketches — exact below the
 * sketch's nominal entry count, which every assertion here relies on.
 */
class ThetaSketchSuite extends AnyFunSuite with GraftSparkSession {

  private def setup(): Unit = {
    spark.sql("""
      |SELECT k, theta_accumulate(v) AS sk FROM VALUES
      |  ('a', 'u1'), ('a', 'u2'), ('a', 'u3'), ('a', 'u1'),
      |  ('b', 'u2'), ('b', 'u3'), ('b', 'u4')
      |AS t(k, v) GROUP BY k""".stripMargin)
      .createOrReplaceTempView("theta_sets")
  }

  test("accumulate + estimate dedupes within a set") {
    setup()
    val r = spark.sql(
      "SELECT k, theta_estimate(sk) FROM theta_sets ORDER BY k").collect()
    assert(r.toSeq === Seq(Row("a", 3L), Row("b", 3L)))
  }

  test("union / intersection / difference between sets are exact") {
    setup()
    val r = spark.sql("""
      |SELECT theta_estimate(theta_union(sk)) AS u,
      |       theta_estimate(theta_intersect(sk)) AS i
      |FROM theta_sets""".stripMargin).collect()
    assert(r.toSeq === Seq(Row(4L, 2L))) // {u1..u4}, {u2,u3}
    val d = spark.sql("""
      |SELECT theta_estimate(theta_a_not_b(
      |  (SELECT sk FROM theta_sets WHERE k = 'a'),
      |  (SELECT sk FROM theta_sets WHERE k = 'b'))) AS a_only""".stripMargin).collect()
    assert(d.toSeq === Seq(Row(1L))) // {u1}
  }

  test("intersect of an empty group is null; estimate of corrupt bytes is null") {
    val r = spark.sql(
      "SELECT theta_intersect(sk) FROM (SELECT CAST(null AS BINARY) sk) WHERE sk IS NOT NULL")
      .collect()
    assert(r.isEmpty || r.forall(_.isNullAt(0)))
    val c = spark.sql("SELECT theta_estimate(binary('garbage'))").collect()
    assert(c.toSeq === Seq(Row(null)))
  }

  test("sketch images survive a shuffle round trip and integral input works") {
    val r = spark.sql("""
      |WITH s AS (SELECT theta_accumulate(v) sk FROM VALUES (1L), (2L), (3L) t(v) GROUP BY v % 2)
      |SELECT theta_estimate(theta_union(sk)) FROM s""".stripMargin).collect()
    assert(r.toSeq === Seq(Row(3L)))
  }

  test("theta lgK conf is registered and validated") {
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"SET ${GraftConf.THETA_LGK_KEY}=99").collect()
    }
    assert(e.getMessage.contains("[4, 26]"))
    withSQLConf(GraftConf.THETA_LGK_KEY -> "10") {
      assert(GraftConf.thetaLgK === 10)
    }
  }
}
