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
}
