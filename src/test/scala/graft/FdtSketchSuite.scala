package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Frequent-distinct-tuple sketches: dedup-aware heavy hitters — exact
 * below capacity, repeat-ingestion robustness, the union lifecycle, a
 * deterministic top-k order, and null handling.
 */
class FdtSketchSuite extends AnyFunSuite with GraftSparkSession {

  private def setup(): Unit =
    // source 'a' has 3 distinct docs (one ingested twice), 'b' has 2,
    // 'c' has 1 — the distinct ranking a > b > c must ignore the repeat
    spark.sql("""
      |SELECT * FROM VALUES
      |  ('a', 'd1'), ('a', 'd1'), ('a', 'd2'), ('a', 'd3'),
      |  ('b', 'd4'), ('b', 'd5'), ('c', 'd6')
      |AS t(src, doc)""".stripMargin).createOrReplaceTempView("fdt_docs")

  test("topk ranks groups by DISTINCT tuples, not ingestion counts") {
    setup()
    val r = spark.sql("""
      |SELECT inline(fdt_topk(fdt_accumulate(array(src, doc)), array(0), 3))
      |FROM fdt_docs""".stripMargin).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ===
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("multi-position group keys join with commas; ties break on key") {
    setup()
    val r = spark.sql("""
      |SELECT fdt_topk(fdt_accumulate(array(src, doc)), array(0, 1), 2)
      |FROM fdt_docs""".stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    // every (src, doc) tuple is distinct-count 1; order is key ascending
    assert(r.map(x => (x.getString(0), x.getLong(1))) ===
      Seq(("a,d1", 1L), ("a,d2", 1L)))
  }

  test("union of per-slice sketches equals the one-shot over the whole corpus") {
    setup()
    val merged = spark.sql("""
      |SELECT inline(fdt_topk(fdt_union(s), array(0), 3))
      |FROM (SELECT fdt_accumulate(array(src, doc)) AS s
      |      FROM fdt_docs GROUP BY src)""".stripMargin).collect()
    assert(merged.map(x => (x.getString(0), x.getLong(1))).toSeq ===
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("null arrays and null elements are skipped, not counted or crashed") {
    val r = spark.sql("""
      |SELECT fdt_topk(fdt_accumulate(arr), array(0), 5)
      |FROM VALUES (array('a', 'x')), (CAST(NULL AS ARRAY<STRING>)),
      |  (array('a', CAST(NULL AS STRING)))
      |AS t(arr)""".stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(x => (x.getString(0), x.getLong(1))) === Seq(("a", 1L)))
  }

  test("corrupt bytes yield null; junk indices/k rejected at resolution") {
    val r = spark.sql("SELECT fdt_topk(binary('garbage'), array(0), 1)").collect()(0)
    assert(r.isNullAt(0))
    val e1 = intercept[Exception] {
      spark.sql("SELECT fdt_topk(fdt_accumulate(array(v)), array(v_idx), 1) " +
        "FROM VALUES ('a', 0) AS t(v, v_idx)").collect()
    }
    assert(e1.getMessage.contains("constant integer-array literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT fdt_topk(fdt_accumulate(array(v)), array(0), 0) " +
        "FROM VALUES ('a') AS t(v)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("k must be positive"))
  }

  test("image loads in the raw library as an ArrayOfStrings tuple sketch") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.tuple.Sketches
    import org.apache.datasketches.tuple.strings.ArrayOfStringsSummaryDeserializer
    setup()
    val bytes = spark.sql(
      "SELECT fdt_accumulate(array(src, doc)) FROM fdt_docs")
      .collect()(0).getAs[Array[Byte]](0)
    val sk = Sketches.heapifySketch(
      Memory.wrap(bytes), new ArrayOfStringsSummaryDeserializer())
    assert(math.round(sk.getEstimate) === 6L) // 6 distinct (src, doc) tuples
  }
}
