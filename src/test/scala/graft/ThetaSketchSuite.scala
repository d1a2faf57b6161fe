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

  test("scalar pair intersection/union match the aggregate set ops") {
    setup()
    // a = {u1,u2,u3}, b = {u2,u3,u4}: per-row algebra on the joined
    // sketch table, no second aggregation pass
    val r = spark.sql("""
      |SELECT theta_estimate(theta_intersect_pair(a.sk, b.sk)) AS i,
      |       theta_estimate(theta_union_pair(a.sk, b.sk)) AS u
      |FROM theta_sets a JOIN theta_sets b ON a.k = 'a' AND b.k = 'b'""".stripMargin)
      .collect()
    assert(r.toSeq === Seq(Row(2L, 4L)))
    // corrupt input -> null, not a task failure (the a_not_b contract)
    val c = spark.sql("""
      |SELECT theta_intersect_pair(sk, binary('garbage')),
      |       theta_union_pair(binary('garbage'), sk)
      |FROM theta_sets WHERE k = 'a'""".stripMargin).collect()
    assert(c.forall(row => row.isNullAt(0) && row.isNullAt(1)))
  }

  test("source overlap matrix: exact pairwise jaccard, corpus read once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // srcA/srcB share their first 8 words (1 shared 8-gram), srcC is
    // disjoint; every doc is exactly 8 words = one shingle each
    val docs = Seq(
      ("srcA", "w1 w2 w3 w4 w5 w6 w7 w8"),
      ("srcA", "a1 a2 a3 a4 a5 a6 a7 a8"),
      ("srcB", "w1 w2 w3 w4 w5 w6 w7 w8"),
      ("srcC", "c1 c2 c3 c4 c5 c6 c7 c8")).toDF("source", "text")
    val m = graft.operators.Dedup
      .sourceOverlapMatrix(docs, "source", "text", n = 8)
      .orderBy("src_a", "src_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(m.keySet === Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    assert(m(("srcA", "srcB")) === ((2L, 1L, 1L, 0.5)))
    assert(m(("srcA", "srcC")) === ((2L, 1L, 0L, 0.0)))
    assert(m(("srcB", "srcC")) === ((1L, 1L, 0L, 0.0)))
    // the pair join broadcasts the tiny sketch table — never a
    // corpus-sized shuffle join
    val plan = graft.operators.Dedup
      .sourceOverlapMatrix(docs, "source", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("containment |A∩B|/|A| is exact, directional, null on empty A / corrupt") {
    setup()
    // A = {u1,u2,u3}, B = {u2,u3,u4}: containment(A,B) = 2/3, (B,A) = 2/3;
    // with B' = B ∪ {u5,u6} containment(A,B') stays 2/3 while jaccard drops
    val r = spark.sql("""
      |SELECT round(theta_containment(a.sk, b.sk), 9),
      |       round(theta_containment(b.sk, a.sk), 9)
      |FROM (SELECT sk FROM theta_sets WHERE k = 'a') a,
      |     (SELECT sk FROM theta_sets WHERE k = 'b') b""".stripMargin).collect()(0)
    assert(r.getDouble(0) === math.rint(2.0 / 3.0 * 1e9) / 1e9)
    assert(r.getDouble(1) === math.rint(2.0 / 3.0 * 1e9) / 1e9)
    // empty A -> null (undefined, not 0); corrupt bytes -> null
    val empty = spark.sql("""
      |SELECT theta_containment(theta_accumulate(CAST(NULL AS STRING)), sk),
      |       theta_containment(binary('junk'), sk)
      |FROM theta_sets WHERE k = 'a'
      |GROUP BY sk""".stripMargin).collect()(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1))
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
