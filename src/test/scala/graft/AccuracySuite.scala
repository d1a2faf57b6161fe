package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.conf.GraftConf

/**
 * Accuracy envelopes on real (sf0.01) data, mirroring the reference's
 * published observations (BASELINE.md): REQ/KLL percentile rank error,
 * CPC/HLL relative error at above-capacity cardinality, and freq-items
 * exactness below map capacity.
 */
class AccuracySuite extends AnyFunSuite with GraftSparkSession {

  private lazy val lineitem = {
    val df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    df.createOrReplaceTempView("li")
    df
  }

  test("percentile rank error stays within sketch guarantees (60k rows)") {
    lineitem
    val n = lineitem.count()
    for (impl <- Seq("KLL", "REQ", "MERGEABLE")) {
      withSQLConf(GraftConf.QUANTILE_SKETCH_IMPL_KEY -> impl) {
        val est = spark.sql(
          "SELECT approx_percentile_ex(l_extendedprice, 0.95) FROM li")
          .collect()(0).getDouble(0)
        // actual rank of the estimate must be near 0.95
        val rank = lineitem.where(col("l_extendedprice") <= est).count().toDouble / n
        assert(math.abs(rank - 0.95) < 0.02, s"impl=$impl rank=$rank")
      }
    }
  }

  test("distinct-count relative error < 3% above sketch capacity (15k keys)") {
    lineitem
    val exact = spark.sql("SELECT count(DISTINCT l_orderkey) FROM li").collect()(0).getLong(0)
    for (f <- Seq("approx_count_distinct_cpc", "approx_count_distinct_hll")) {
      val est = spark.sql(s"SELECT $f(l_orderkey) FROM li").collect()(0).getLong(0)
      val err = math.abs(est - exact).toDouble / exact
      assert(err < 0.03, s"f=$f est=$est exact=$exact err=$err")
      assert(est != exact, s"$f should be approximate at this cardinality")
    }
  }

  test("freq items exact below map capacity on real data") {
    lineitem
    val sketch = spark.sql(
      """SELECT item, estimated FROM
        |(SELECT inline(approx_freqitems(l_returnflag)) FROM li)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = lineitem.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch === exact)
  }

  test("theta set-operation error < 3% above the exact region (15k keys)") {
    lineitem
    // l_orderkey cardinality ~15k >> 2^12 nominal entries: estimates are
    // approximate; union/intersect of over-capacity sketches must stay
    // within theta's error bounds
    val exact = spark.sql("SELECT count(DISTINCT l_orderkey) FROM li").collect()(0).getLong(0)
    val r = spark.sql(
      """WITH s AS (
        |  SELECT l_orderkey % 2 AS g, theta_accumulate(l_orderkey) sk
        |  FROM li GROUP BY 1)
        |SELECT theta_estimate(theta_union(sk)),
        |       theta_estimate(theta_intersect(sk)) FROM s""".stripMargin).collect()(0)
    val unionEst = r.getLong(0)
    val unionErr = math.abs(unionEst - exact).toDouble / exact
    assert(unionErr < 0.03, s"union est=$unionEst exact=$exact err=$unionErr")
    // even/odd orderkey sets are disjoint: intersection estimate must be
    // a tiny fraction of the union even above capacity
    assert(r.getLong(1) < exact / 20)
  }

  test("scalar theta pair ops stay within error bounds above capacity (15k keys)") {
    lineitem
    // two OVERLAPPING over-capacity sets: A = keys < 2/3·max, B = keys >
    // 1/3·max — the pair forms must estimate |A ∩ B| ~ 1/3 and
    // |A ∪ B| = all within theta bounds even when every input sketch is
    // in estimation mode
    val r = spark.sql(
      """WITH m AS (SELECT max(l_orderkey) AS mx FROM li),
        |a AS (SELECT theta_accumulate(l_orderkey) sk FROM li, m
        |      WHERE l_orderkey < mx * 2 DIV 3),
        |b AS (SELECT theta_accumulate(l_orderkey) sk FROM li, m
        |      WHERE l_orderkey > mx DIV 3)
        |SELECT theta_estimate(theta_union_pair(a.sk, b.sk)),
        |       theta_estimate(theta_intersect_pair(a.sk, b.sk))
        |FROM a CROSS JOIN b""".stripMargin).collect()(0)
    val exact = spark.sql(
      """WITH m AS (SELECT max(l_orderkey) AS mx FROM li)
        |SELECT count(DISTINCT l_orderkey),
        |       count(DISTINCT CASE WHEN l_orderkey < mx * 2 DIV 3
        |                            AND l_orderkey > mx DIV 3
        |                           THEN l_orderkey END)
        |FROM li, m""".stripMargin).collect()(0)
    val uErr = math.abs(r.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0)
    val iErr = math.abs(r.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1)
    assert(uErr < 0.03, s"union est=${r.getLong(0)} exact=${exact.getLong(0)} err=$uErr")
    // intersections of estimating sketches carry both inputs' error;
    // allow the standard looser bound
    assert(iErr < 0.06, s"inter est=${r.getLong(1)} exact=${exact.getLong(1)} err=$iErr")
  }

  test("reservoir sampling is unbiased enough: halves get ~half the sample (60k rows)") {
    lineitem
    val sample = spark.sql(
      "SELECT reservoir_sample(CAST(l_orderkey AS STRING), 2000) FROM li")
      .collect()(0).getSeq[String](0)
    assert(sample.length === 2000)
    val median = spark.sql("SELECT approx_percentile_ex(l_orderkey, 0.5) FROM li")
      .collect()(0).getLong(0)
    val below = sample.count(_.toLong <= median)
    // binomial(2000, ~0.5): 6 sigma ~ 134
    assert(math.abs(below - 1000) < 150, s"below-median count $below should be ~1000")
  }

  test("FD Gram error shrinks with ell and stays far under the worst-case bound") {
    import graft.sketches.{FrequentDirections, GramAccumulator}
    val r = new scala.util.Random(21L)
    val d = 24
    // realistic spectrum: a few strong directions + isotropic tail
    val dirs = Array.fill(4)(Array.fill(d)(r.nextGaussian()))
    val rows = Array.fill(2000) {
      val strong = dirs.zipWithIndex.map { case (u, k) =>
        val a = r.nextGaussian() * (8.0 / (k + 1))
        u.map(_ * a)
      }.transpose.map(_.sum)
      strong.zip(Array.fill(d)(r.nextGaussian() * 0.3)).map { case (a, b) => a + b }
    }
    val exact = GramAccumulator.create(d)
    rows.foreach(exact.update)
    val g = exact.gram
    def maxAbsErr(ell: Int): (Double, Double) = {
      val fd = FrequentDirections.create(ell, d)
      rows.foreach(fd.update)
      val err = g.zip(fd.gram).map { case (a, b) => math.abs(a - b) }.max
      (err, fd.frobeniusSquared / ell)
    }
    val (e4, b4) = maxAbsErr(4)
    val (e8, b8) = maxAbsErr(8)
    val (e16, b16) = maxAbsErr(16)
    assert(e4 <= b4 && e8 <= b8 && e16 <= b16)
    // error drops substantially as ell doubles past the true rank (~4)
    assert(e16 < e4 * 0.5, s"e4=$e4 e8=$e8 e16=$e16")
    // on a low-rank-plus-noise spectrum, the realized error sits WELL
    // under the worst-case 1/ell bound once ell covers the strong rank
    assert(e16 < 0.2 * b16, s"e16=$e16 bound=$b16")
  }
}
