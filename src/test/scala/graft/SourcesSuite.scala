package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Source/sink coverage mirroring the reference README's usage: CSV in
 * (header + custom separator), sketch summary tables out/in through
 * parquet and CSV round trips.
 */
class SourcesSuite extends AnyFunSuite with GraftSparkSession {

  test("csv source with header/sep options feeds sketch aggregates") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val csv = s"$dir/values.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "id;v\n1;0\n2;1\n3;2\n4;10\n")
    val df = spark.read.format("csv")
      .option("header", "true").option("sep", ";").option("inferSchema", "true")
      .load(csv)
    df.createOrReplaceTempView("csv_values")
    val r = spark.sql(
      "SELECT approx_percentile_ex(v, 0.5), approx_count_distinct_ex(CAST(id AS BIGINT)) " +
        "FROM csv_values").collect()
    assert(r.toSeq === Seq(Row(2, 4L)))
  }

  test("summary tables survive a csv round trip (base64 sketch state)") {
    val dir = Files.createTempDirectory("graft_csv_rt").toString
    // CSV cannot carry raw binary; base64 it like a real export would
    spark.sql(
      """SELECT base64(approx_count_distinct_accumulate(c)) AS s64
        |FROM VALUES ('a'), ('b'), ('c') AS t(c)""".stripMargin)
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").csv(dir)
      .selectExpr("approx_count_distinct_estimate(unbase64(s64)) AS nd").collect()
    assert(back.toSeq === Seq(Row(3L)))
  }
}
