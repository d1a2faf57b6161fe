package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clustering, Dedup}

/**
 * Deterministic k-means and the streaming LSH near-dup operator: cluster
 * recovery on separated synthetic data, bit-reproducibility across
 * parallelism, and streaming-vs-batch pair-set agreement.
 */
class ClusteringSuite extends AnyFunSuite with GraftSparkSession {

  private def clusteredVecs(n: Int, d: Int, k: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    // well-separated centers at distance ~20, noise sigma 1
    val centers = Array.fill(k)(Array.fill(d)(r.nextGaussian() * 10))
    (0 until n).map { i =>
      val c = i % k
      (i.toLong, c, centers(c).map(x => (x + r.nextGaussian()).toFloat).toSeq)
    }
  }

  test("kmeansAssign recovers well-separated clusters") {
    import spark.implicits._
    val k = 4
    val data = clusteredVecs(200, 8, k, 7L)
    val df = data.map { case (id, _, v) => (id, v) }.toDF("id", "vec")
    val assigned = Clustering.kmeansAssign(df, "id", "vec", k, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // assignment must be a bijection truth-cluster <-> label
    val byTruth = data.groupBy(_._2).view.mapValues(_.map(t => assigned(t._1)).distinct)
    byTruth.foreach { case (_, labels) => assert(labels.size === 1) }
    assert(byTruth.values.flatten.toSet.size === k)
  }

  test("silhouetteProfile: separated clusters score near 1, blob near 0") {
    import spark.implicits._
    val k = 3
    val data = clusteredVecs(150, 6, k, 9L)
    val df = data.map { case (id, _, v) => (id, v) }.toDF("id", "vec")
    val out = Clustering.silhouetteProfile(df, "id", "vec", k, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === k)
    assert(out.map(_._2).sum === 150L)
    // well-separated synthetic clusters: every mean silhouette high
    out.foreach { case (_, _, s) => assert(s > 7000L, s"low silhouette $s") }
    // one undifferentiated blob split into 3: silhouettes collapse
    val rnd = new scala.util.Random(13)
    val blob = (0 until 90).map(i => (i.toLong,
      Seq.fill(6)(rnd.nextFloat() - 0.5f)))
      .toDF("id", "vec")
    val blobOut = Clustering.silhouetteProfile(blob, "id", "vec", 3, iters = 2)
      .collect().map(_.getLong(2))
    assert(blobOut.forall(_ < 7000L))
  }

  test("kmeansAssign is bit-identical across parallelism") {
    import spark.implicits._
    val data = clusteredVecs(120, 6, 3, 8L)
    val df1 = data.map { case (id, _, v) => (id, v) }.toDF("id", "vec").repartition(1)
    val df7 = data.map { case (id, _, v) => (id, v) }.toDF("id", "vec").repartition(7)
    val a1 = Clustering.kmeansAssign(df1, "id", "vec", 3, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val a7 = Clustering.kmeansAssign(df7, "id", "vec", 3, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a1.toSeq === a7.toSeq)
  }

  test("cluster labels are the seed ids; iters=0 assigns to raw seeds") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)),
      (2L, Seq(0.4f, 0f)), (3L, Seq(10f, 9.5f))).toDF("id", "vec")
    val a = Clustering.kmeansAssign(df, "id", "vec", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("streaming nearDupPairs equals batch minhashLshPairs after distinct") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      1L -> base,
      2L -> base, // exact dup of 1
      3L -> (base + " extra"), // near dup of 1/2
      4L -> "completely different content with nothing shared at all here now",
      5L -> "completely different content with nothing shared at all here soon")
    val batch = Dedup.minhashLshPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val input = MemoryStream[(Long, String)](spark)
    val out = graft.streaming.StreamingOps.nearDupPairs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val sink = "neardup_test_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      input.addData(docs.take(2))
      q.processAllAvailable()
      input.addData(docs.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(batch.exists { case (a, b, _, _) => a == 1L && b == 2L }) // sanity
  }

  test("plan shapes: assignment and PCA scoring are shuffle-free maps") {
    import spark.implicits._
    val data = clusteredVecs(60, 6, 3, 11L)
    val df = data.map { case (id, _, v) => (id, v) }.toDF("id", "vec")
    // final assignment: centroids are plan literals — scan + project, no
    // Exchange (the corpus is never shuffled to be labeled)
    val assignPlan = graft.operators.Clustering
      .kmeansAssign(df, "id", "vec", 3, 0)
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"), assignPlan)
    // PCA projection: one Gram pass happened at build time; the scoring
    // pass itself is a stateless map against broadcast literals
    val pcaPlan = graft.operators.Spectral
      .pcaProject(df, "id", "vec", 2)
      .queryExecution.executedPlan.toString
    assert(!pcaPlan.contains("Exchange"), pcaPlan)
    // the gram aggregate plans as partial/final ObjectHashAggregate with
    // ONE exchange carrying only the d^2 partial state
    val gramPlan = df.selectExpr("vec_gram_agg(CAST(vec AS ARRAY<DOUBLE>)) g")
      .queryExecution.executedPlan.toString
    assert(gramPlan.contains("ObjectHashAggregate"), gramPlan)
    assert("Exchange".r.findAllIn(gramPlan).length === 1, gramPlan)
  }

  test("streaming nearDupPairs maxPerBucket caps state but keeps verifying") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val text = "identical text repeated many times for bucket capping test purposes"
    val docs = (1L to 6L).map(_ -> text)
    val input = MemoryStream[(Long, String)](spark)
    val out = graft.streaming.StreamingOps.nearDupPairs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxPerBucket = 2)
    val sink = "neardup_cap_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      input.addData(docs)
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table(sink).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every later doc still verifies against the 2 stored members
    assert(pairs === Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (2L, 4L), (2L, 5L), (2L, 6L)))
  }
}
