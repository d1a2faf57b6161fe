package graft

import org.apache.datasketches.cpc.CpcSketch
import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantiles.DoublesSketch
import org.apache.datasketches.req.ReqSketch
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.conf.GraftConf

/**
 * Wire-format compatibility in both directions (SURVEY.md §7.4): the BINARY
 * sketch state must be a genuine DataSketches image, so
 *  (a) images produced by raw datasketches-java load into the estimators;
 *  (b) accumulate output loads into raw datasketches-java.
 * This is what lets summary tables be shared with non-Spark consumers.
 */
class WireFormatSuite extends AnyFunSuite with GraftSparkSession {

  private def estimateSql(fn: String, bytes: Array[Byte], extra: String = ""): Row = {
    import spark.implicits._
    Seq(bytes).toDF("s").selectExpr(s"$fn(s$extra)").collect()(0)
  }

  test("raw library images decode through the estimators") {
    // KLL image built directly with datasketches-java 6.2.0
    val kll = KllFloatsSketch.newHeapInstance(200)
    Seq(0f, 1f, 2f, 10f).foreach(kll.update)
    withSQLConf(GraftConf.QUANTILE_SKETCH_IMPL_KEY -> "KLL") {
      assert(estimateSql("approx_percentile_estimate", kll.toByteArray, ", 0.5") === Row(2.0))
    }

    val req = ReqSketch.builder().setK(12).build()
    Seq(0f, 1f, 2f, 10f).foreach(req.update)
    withSQLConf(GraftConf.QUANTILE_SKETCH_IMPL_KEY -> "REQ") {
      assert(estimateSql("approx_percentile_estimate", req.toByteArray, ", 0.5") === Row(2.0))
    }

    val mergeable = DoublesSketch.builder().setK(128).build()
    Seq(0.0, 1.0, 2.0, 10.0).foreach(mergeable.update)
    withSQLConf(GraftConf.QUANTILE_SKETCH_IMPL_KEY -> "MERGEABLE") {
      assert(estimateSql("approx_percentile_estimate", mergeable.toByteArray, ", 0.5") === Row(2.0))
    }

    val cpc = new CpcSketch(11)
    Seq("a", "b", "c").foreach(cpc.update)
    assert(estimateSql("approx_count_distinct_estimate", cpc.toByteArray) === Row(3L))
  }

  test("accumulate output loads in raw datasketches-java") {
    val qBytes = spark.sql(
      "SELECT approx_percentile_accumulate(c) FROM VALUES (0), (1), (2), (10) AS t(c)")
      .collect()(0).getAs[Array[Byte]](0)
    // default impl is REQ
    val req = ReqSketch.heapify(Memory.wrap(qBytes))
    assert(req.getN === 4)

    val dBytes = spark.sql(
      "SELECT approx_count_distinct_accumulate(c) FROM VALUES ('a'), ('b'), ('c') AS t(c)")
      .collect()(0).getAs[Array[Byte]](0)
    val cpc = CpcSketch.heapify(Memory.wrap(dBytes))
    assert(math.round(cpc.getEstimate) === 3L)
  }

  test("tuple sketch images are standard DataSketches images, both directions") {
    import org.apache.datasketches.tuple.Sketches
    import org.apache.datasketches.tuple.adouble.{DoubleSketch, DoubleSummary,
      DoubleSummaryDeserializer}
    // raw library image -> graft estimator
    val raw = new DoubleSketch(12, DoubleSummary.Mode.Sum)
    raw.update("a", Double.box(1.5))
    raw.update("a", Double.box(2.5))
    raw.update("b", Double.box(3.0))
    assert(estimateSql("tuple_estimate", raw.compact().toByteArray) === Row(Row(2L, 7.0)))
    // graft accumulate output -> raw library heapify
    val tBytes = spark.sql(
      "SELECT tuple_accumulate(k, v) FROM VALUES ('a', 1.0d), ('b', 2.0d) AS t(k, v)")
      .collect()(0).getAs[Array[Byte]](0)
    val heapified = Sketches.heapifySketch(
      Memory.wrap(tBytes), new DoubleSummaryDeserializer())
    assert(math.round(heapified.getEstimate) === 2L)
    var sum = 0.0
    val it = heapified.iterator()
    while (it.next()) sum += it.getSummary.getValue
    assert(sum === 3.0)
  }

  test("ebpps images are standard DataSketches images, both directions") {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.sampling.EbppsItemsSketch
    // raw library image -> graft estimator
    val raw = new EbppsItemsSketch[String](10)
    Seq("a", "b", "c").foreach(raw.update(_, 1.0))
    val est = estimateSql("ebpps_estimate", raw.toByteArray(new ArrayOfStringsSerDe()))
      .getStruct(0)
    assert(est.getLong(0) === 3L)
    assert(math.abs(est.getDouble(1) - 3.0) < 1e-9)
    assert(est.getSeq[String](2).sorted === Seq("a", "b", "c"))
    // graft accumulate output -> raw library heapify
    val bytes = spark.sql(
      "SELECT ebpps_accumulate(c, 1.0, 10) FROM VALUES ('a'), ('b') AS t(c)")
      .collect()(0).getAs[Array[Byte]](0)
    val heapified = EbppsItemsSketch.heapify[String](
      Memory.wrap(bytes), new ArrayOfStringsSerDe())
    assert(heapified.getN === 2L)
    assert(math.abs(heapified.getCumulativeWeight - 2.0) < 1e-9)
  }

  test("sketches accumulated in different partitions merge losslessly") {
    import spark.implicits._
    // two disjoint halves accumulated separately, combined via SQL; KLL
    // (k=200) is exact at n=100, so combine must reproduce the one-shot
    withSQLConf(GraftConf.QUANTILE_SKETCH_IMPL_KEY -> "KLL") {
      val df = (1 to 100).map(i => (i % 2, i.toDouble)).toDF("part", "v")
      df.createOrReplaceTempView("halves")
      val combined = spark.sql(
        """SELECT approx_percentile_estimate(approx_percentile_combine(s), 0.5) FROM
          |(SELECT part, approx_percentile_accumulate(v) s FROM halves GROUP BY part)""".stripMargin)
        .collect()(0)
      val direct = spark.sql("SELECT approx_percentile_ex(v, 0.5) FROM halves").collect()(0)
      assert(combined.getDouble(0) === direct.getDouble(0))
    }
  }

  test("FD and Gram images: graft-specific layout pinned byte-for-byte") {
    import graft.sketches.{FrequentDirections, GramAccumulator}
    // These two are the ONLY graft sketch families with a graft-native
    // wire format (no DataSketches matrix sketch exists to be compatible
    // with); pin the exact layout so stored summary tables survive
    // library upgrades: little-endian [magic, ell|d, d|n, used] header
    // then doubles.
    val fd = FrequentDirections.create(2, 2)
    fd.update(Array(1.0, 2.0))
    val fdBytes = fd.toBytes
    val bb = java.nio.ByteBuffer.wrap(fdBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() === 0x46447331) // "FDs1"
    assert(bb.getInt() === 2 && bb.getInt() === 2 && bb.getInt() === 1)
    assert(bb.getDouble() === 5.0) // frobenius ledger
    assert(bb.getDouble() === 1.0 && bb.getDouble() === 2.0)
    assert(fdBytes.length === 16 + 8 + 2 * 8)

    val g = GramAccumulator.create(2)
    g.update(Array(3.0, 4.0))
    val gBytes = g.toBytes
    val gb = java.nio.ByteBuffer.wrap(gBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(gb.getInt() === 0x47524d31) // "GRM1"
    assert(gb.getInt() === 2 && gb.getLong() === 1L)
    assert(Seq(gb.getDouble(), gb.getDouble(), gb.getDouble(), gb.getDouble())
      === Seq(9.0, 12.0, 12.0, 16.0))
    assert(gBytes.length === 4 + 4 + 8 + 4 * 8)
    // and the golden bytes round-trip through the SQL estimators
    import spark.implicits._
    val est = Seq(fdBytes).toDF("s")
      .selectExpr("fd_error_bound(s)", "fd_gram_estimate(s)[3]").collect()(0)
    assert(est.getDouble(0) === 2.5 && est.getDouble(1) === 4.0)
  }
}
