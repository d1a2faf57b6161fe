package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in COUNT(DISTINCT) -> sketch rewrite: plan shape, exactness in the
  * sketch's deterministic region, and every scope guard. */
class ApproxRewriteSuite extends AnyFunSuite with GraftSparkSession {

  private val Enabled = "spark.sql.graft.approxCountDistinct.enabled"
  private val Impl = "spark.sql.graft.approxCountDistinct.impl"

  // events.parquet carries nanos timestamps: infer + materialize ONCE
  // under the nanosAsLong conf, then serve every test from the cache
  private lazy val events: org.apache.spark.sql.DataFrame =
    withSQLConf("spark.sql.legacy.parquet.nanosAsLong" -> "true") {
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "event_type", "value").cache()
      df.count()
      df
    }

  test("off by default: exact distinct plan unchanged") {
    val df = events.selectExpr("count(DISTINCT user_id) AS n")
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("approx_count_distinct_ex"))
  }

  test("enabled: rewrites to the sketch agg, drops Expand, stays exact sub-capacity") {
    val exact = events.selectExpr("count(DISTINCT user_id) AS n")
      .collect()(0).getLong(0)
    withSQLConf(Enabled -> "true") {
      val df = events.selectExpr("count(DISTINCT user_id) AS n")
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("approx_count_distinct_ex"), opt)
      val phys = df.queryExecution.executedPlan.toString
      // the exact plan needs Expand + a second distinct shuffle; the
      // sketch plan is a single ObjectHashAggregate pass
      assert(!phys.contains("Expand"), phys)
      assert(phys.contains("ObjectHashAggregate"), phys)
      // HLL coupon mode is exact at this cardinality
      assert(df.collect()(0).getLong(0) === exact)
      // grouped shape too
      val g = events.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      assert(g.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct_ex"))
      val gExact = events.groupBy("event_type")
        .agg(countDistinct("user_id").as("n"))
      withSQLConf(Enabled -> "false") {
        val m1 = g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val m2 = gExact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(m1 === m2)
      }
    }
  }

  test("scope guards: FILTER, multi-column, fractional types stay exact") {
    withSQLConf(Enabled -> "true") {
      val f = events.selectExpr(
        "count(DISTINCT user_id) FILTER (WHERE event_type = 'click') AS n")
      assert(!f.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct_ex"))
      val multi = events.selectExpr("count(DISTINCT user_id, event_type) AS n")
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct_ex"))
      val dbl = events.selectExpr("count(DISTINCT value) AS n")
      assert(!dbl.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct_ex"))
      // a plain (non-distinct) count never rewrites
      val plain = events.selectExpr("count(user_id) AS n")
      assert(!plain.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct_ex"))
    }
  }

  test("impl conf is honored and validated") {
    withSQLConf(Enabled -> "true", Impl -> "CPC") {
      val df = events.selectExpr("count(DISTINCT user_id) AS n")
      assert(df.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct_ex"))
      assert(df.collect()(0).getLong(0) > 0L)
    }
    intercept[IllegalArgumentException] {
      spark.conf.set(Impl, "FOO")
    }
    // mixed aggregate lists rewrite only the distinct count
    withSQLConf(Enabled -> "true") {
      val mixed = events.groupBy("event_type").agg(
        countDistinct("user_id").as("n"), count(lit(1)).as("c"),
        sum("value").as("s"))
      val opt = mixed.queryExecution.optimizedPlan.toString
      assert(opt.contains("approx_count_distinct_ex"), opt)
      assert(opt.contains("sum"), opt)
      assert(mixed.collect().length === 5)
    }
  }
}
