package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.conf.GraftConf

/**
 * Tuple sketches: distinct-key cardinality plus per-key double summaries
 * in one sketch — exact below the nominal entry count (the regime every
 * assertion here pins), with sum/min/max/one summary modes and set
 * operations that carry the summaries through.
 */
class TupleSketchSuite extends AnyFunSuite with GraftSparkSession {

  private def setup(): Unit = {
    // Two slices: slice 'a' holds docs d1 (10 tokens), d2 (20), d3 (30);
    // slice 'b' holds d2 (20), d3 (30), d4 (40). d1 appears TWICE in 'a'
    // (a shard duplicate) so sum-vs-min modes diverge on it.
    spark.sql("""
      |SELECT * FROM VALUES
      |  ('a', 'd1', 10.0d), ('a', 'd1', 10.0d), ('a', 'd2', 20.0d), ('a', 'd3', 30.0d),
      |  ('b', 'd2', 20.0d), ('b', 'd3', 30.0d), ('b', 'd4', 40.0d)
      |AS t(slice, doc, tokens)""".stripMargin)
      .createOrReplaceTempView("tuple_docs")
  }

  test("accumulate + estimate: sum mode adds repeats, min mode dedupes them") {
    setup()
    val r = spark.sql("""
      |SELECT slice,
      |       tuple_estimate(tuple_accumulate(doc, tokens, 'sum')) AS s,
      |       tuple_estimate(tuple_accumulate(doc, tokens, 'min')) AS m
      |FROM tuple_docs GROUP BY slice ORDER BY slice""".stripMargin).collect()
    assert(r.map(_.getString(0)).toSeq === Seq("a", "b"))
    val a = r(0)
    assert(a.getStruct(1) === Row(3L, 70.0)) // d1 counted twice in sum mode
    assert(a.getStruct(2) === Row(3L, 60.0)) // min mode: one value per distinct doc
    assert(r(1).getStruct(1) === Row(3L, 90.0))
    assert(r(1).getStruct(2) === Row(3L, 90.0))
  }

  test("one mode makes value_sum equal the distinct count") {
    setup()
    val r = spark.sql("""
      |SELECT tuple_estimate(tuple_accumulate(doc, tokens, 'one')) AS e
      |FROM tuple_docs""".stripMargin).collect()
    assert(r.head.getStruct(0) === Row(4L, 4.0))
  }

  test("union / intersection / difference carry summaries through") {
    setup()
    spark.sql("""
      |SELECT slice, tuple_accumulate(doc, tokens, 'min') AS sk
      |FROM tuple_docs GROUP BY slice""".stripMargin)
      .createOrReplaceTempView("tuple_sketches")
    val u = spark.sql("""
      |SELECT tuple_estimate(tuple_union(sk, 'min')) AS u,
      |       tuple_estimate(tuple_intersect(sk, 'min')) AS i
      |FROM tuple_sketches""".stripMargin).collect()
    // union: d1..d4 once each = 100; intersection: {d2, d3} min(min_a, min_b)
    assert(u.head.getStruct(0) === Row(4L, 100.0))
    assert(u.head.getStruct(1) === Row(2L, 50.0))
    val d = spark.sql("""
      |SELECT tuple_estimate(tuple_a_not_b(
      |  (SELECT sk FROM tuple_sketches WHERE slice = 'a'),
      |  (SELECT sk FROM tuple_sketches WHERE slice = 'b'))) AS a_only""".stripMargin).collect()
    assert(d.head.getStruct(0) === Row(1L, 10.0)) // {d1} with its min summary
  }

  test("sum-mode intersection adds the two sides' summaries") {
    setup()
    spark.sql("""
      |SELECT slice, tuple_accumulate(doc, tokens, 'sum') AS sk
      |FROM tuple_docs GROUP BY slice""".stripMargin)
      .createOrReplaceTempView("tuple_sketches_sum")
    val r = spark.sql("""
      |SELECT tuple_estimate(tuple_intersect(sk, 'sum')) AS i
      |FROM tuple_sketches_sum""".stripMargin).collect()
    // {d2: 20+20, d3: 30+30} = 100
    assert(r.head.getStruct(0) === Row(2L, 100.0))
  }

  test("sketch images survive a shuffle round trip and integral keys work") {
    val r = spark.sql("""
      |WITH s AS (SELECT tuple_accumulate(k, v) sk FROM
      |  VALUES (1L, 1.0d), (2L, 2.0d), (3L, 3.0d) t(k, v) GROUP BY k % 2)
      |SELECT tuple_estimate(tuple_union(sk)) FROM s""".stripMargin).collect()
    assert(r.head.getStruct(0) === Row(3L, 6.0))
  }

  test("nulls are skipped; empty-group intersect is null; corrupt bytes are null") {
    val e = spark.sql("""
      |SELECT tuple_estimate(tuple_accumulate(k, v)) FROM
      |  VALUES ('a', 1.0d), (null, 9.0d), ('b', cast(null as double)) t(k, v)""".stripMargin)
      .collect()
    assert(e.head.getStruct(0) === Row(1L, 1.0))
    val c = spark.sql("SELECT tuple_estimate(binary('garbage'))").collect()
    assert(c.toSeq === Seq(Row(null)))
  }

  test("mode argument is validated at resolution time") {
    val e = intercept[Exception] {
      spark.sql("SELECT tuple_accumulate(k, v, 'median') FROM VALUES ('a', 1.0d) t(k, v)")
        .collect()
    }
    assert(e.getMessage.contains("Unsupported tuple summary mode"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT tuple_accumulate(k, v, k) FROM VALUES ('a', 1.0d) t(k, v)").collect()
    }
    assert(e2.getMessage.contains("constant string literal"))
  }

  test("tuple lgK conf is registered and validated") {
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"SET ${GraftConf.TUPLE_LGK_KEY}=99").collect()
    }
    assert(e.getMessage.contains("[4, 26]"))
    withSQLConf(GraftConf.TUPLE_LGK_KEY -> "10") {
      assert(GraftConf.tupleLgK === 10)
    }
  }
}
