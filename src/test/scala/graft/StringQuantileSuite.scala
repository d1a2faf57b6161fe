package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * String quantiles (classic mergeable ItemsSketch under natural
 * ordering): exact below k, EXCLUSIVE criterion parity with the numeric
 * families, partition-bound planning over string keys, wire image.
 */
class StringQuantileSuite extends AnyFunSuite with GraftSparkSession {

  test("exact region: median and quartiles match the rank identity") {
    // 26 single-letter strings — far below k=128, so the sketch is exact;
    // EXCLUSIVE: quantile(p) = value at 1-based rank floor(p*n)+1, capped
    spark.range(0, 26).selectExpr("char(97 + id) AS s")
      .createOrReplaceTempView("sq_letters")
    val r = spark.sql("""
      |SELECT approx_percentile_str(s, 0.5),
      |       approx_percentile_str(s, array(0.25d, 0.75d))
      |FROM sq_letters""".stripMargin).collect()(0)
    assert(r.getString(0) === "n") // floor(0.5*26)+1 = 14 -> 'n'
    assert(r.getSeq[String](1) === Seq("g", "t")) // ranks 7 and 20
  }

  test("group-wise string medians; empty group is null") {
    spark.sql("""
      |SELECT * FROM VALUES ('x', 'apple'), ('x', 'banana'), ('x', 'cherry'),
      |  ('y', 'kiwi'), ('y', CAST(NULL AS STRING))
      |AS t(g, s)""".stripMargin).createOrReplaceTempView("sq_groups")
    val rows = spark.sql("""
      |SELECT g, approx_percentile_str(s, 0.5) FROM sq_groups
      |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getString(1) === "banana")
    assert(rows(1).getString(1) === "kiwi") // nulls skipped, single value
    val empty = spark.sql(
      "SELECT approx_percentile_str(s, 0.5) FROM sq_groups WHERE s IS NULL").collect()(0)
    assert(empty.isNullAt(0))
  }

  test("partition bounds over a uniform string key balance the ranges") {
    spark.range(0, 20000).selectExpr("md5(CAST(id AS STRING)) AS key")
      .createOrReplaceTempView("sq_keys")
    val bounds = spark.sql("SELECT approx_partition_bounds_str(key, 8) FROM sq_keys")
      .collect()(0).getSeq[String](0)
    assert(bounds.length === 7)
    assert(bounds === bounds.sorted)
    val total = 20000.0
    val counts = spark.sql(s"""
      |SELECT size(filter(array(${bounds.map(b => s"'$b'").mkString(",")}),
      |            x -> x <= key)) AS bucket, count(*) AS n
      |FROM sq_keys GROUP BY 1""".stripMargin).collect()
    assert(counts.length === 8)
    counts.foreach { r =>
      assert(math.abs(r.getLong(1) / total - 0.125) <= 0.04,
        s"bucket ${r.getInt(0)} holds ${r.getLong(1)}")
    }
  }

  test("partials merge losslessly across partitions (same answer repartitioned)") {
    // classic quantile compaction is randomized ABOVE the exact region, so
    // partition-independence is only guaranteed while n <= k; stay exact
    spark.range(0, 100).selectExpr("md5(CAST(id AS STRING)) AS key")
      .createOrReplaceTempView("sq_rep")
    val a = spark.sql("SELECT approx_percentile_str(key, 0.5) FROM sq_rep").collect()(0)
    val b = spark.table("sq_rep").repartition(13)
      .selectExpr("approx_percentile_str(key, 0.5)").collect()(0)
    assert(a.getString(0) === b.getString(0))
  }

  test("wire image loads in the raw library with the standard string serde") {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.quantiles.ItemsSketch
    val facade = graft.sketches.StringQuantileFacade.create(128)
    Seq("a", "b", "c").foreach(facade.update)
    val sk = ItemsSketch.getInstance(classOf[String], Memory.wrap(facade.toBytes),
      java.util.Comparator.naturalOrder[String](), new ArrayOfStringsSerDe())
    assert(sk.getN === 3L)
    assert(sk.getMaxItem === "c")
  }

  test("junk arguments rejected: non-constant percentage, n < 2") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT approx_percentile_str(s, CAST(rand() AS DOUBLE)) " +
        "FROM VALUES ('a') AS t(s)").collect()
    }
    assert(e1.getMessage.contains("constant literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT approx_partition_bounds_str(s, 1) FROM VALUES ('a') AS t(s)")
        .collect()
    }
    assert(e2.getMessage.contains("at least 2"))
  }
}
