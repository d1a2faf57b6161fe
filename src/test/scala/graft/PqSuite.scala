package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/**
 * Product quantization: per-block codebook shape, reconstruction sanity
 * (codes of near-identical vectors agree), ADC search top-k contract,
 * and bit-reproducibility across parallelism.
 */
class PqSuite extends AnyFunSuite with GraftSparkSession {

  private def vecs(n: Int, d: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    // two separated modes per block so k=2 codebooks are meaningful
    (0 until n).map { i =>
      val mode = i % 2
      (i.toLong, Array.fill(d)((mode * 10 + r.nextGaussian()).toFloat).toSeq)
    }
  }

  test("encode: one code column per block, labels drawn from seed ids") {
    import spark.implicits._
    val df = vecs(40, 8, 3L).toDF("id", "vec")
    val coded = Pq.encode(df, "id", "vec", dim = 8, m = 2, k = 2, iters = 1)
    assert(coded.columns.toSeq === Seq("id", "code_0", "code_1"))
    val rows = coded.collect()
    assert(rows.length === 40)
    // seed labels are the 2 lowest ids
    rows.foreach { r =>
      assert(Set(0L, 1L).contains(r.getLong(1)))
      assert(Set(0L, 1L).contains(r.getLong(2)))
    }
    // the two modes must land on distinct codewords in every block
    val byMode = rows.groupBy(_.getLong(0) % 2)
    val codes0 = byMode.view.mapValues(_.map(_.getLong(1)).distinct).toMap
    assert(codes0(0L).size === 1 && codes0(1L).size === 1)
    assert(codes0(0L) !== codes0(1L))
  }

  test("adcSearch: topK rows per query, self excluded, rank follows adc") {
    import spark.implicits._
    val df = vecs(30, 8, 5L).toDF("id", "vec")
    val hits = Pq.adcSearch(df, "id", "vec",
      dim = 8, m = 2, k = 2, iters = 1, nq = 2, topK = 4).collect()
    val byQ = hits.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L))
    byQ.foreach { case (qid, rs) =>
      assert(rs.length === 4)
      assert(!rs.exists(_.getLong(1) == qid))
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getLong(2)).toSeq === sorted.map(_.getLong(2)).sorted.toSeq)
      // ADC of a same-mode neighbour beats the other mode by construction
      val best = sorted.head
      assert(best.getLong(1) % 2 === qid % 2)
    }
  }

  test("ivfAdcSearch: probed-cell hits are a subset of full ADC ranking") {
    import spark.implicits._
    val df = vecs(60, 8, 11L).toDF("id", "vec")
    val full = Pq.adcSearch(df, "id", "vec", 8, 2, 2, 1, nq = 2, topK = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ivf = Pq.ivfAdcSearch(df, "id", "vec", 8, 2, 2, 1,
      coarseK = 2, nprobe = 1, nq = 2, topK = 5).collect()
    assert(ivf.nonEmpty)
    // every pruned hit carries the same ADC distance the full scan gives
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(full.contains(key) && full(key) === r.getLong(2))
    }
    // nprobe = coarseK degenerates to the unpruned ranking
    val all = Pq.ivfAdcSearch(df, "id", "vec", 8, 2, 2, 1,
      coarseK = 2, nprobe = 2, nq = 2, topK = 5).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted.toSeq
    val ref = Pq.adcSearch(df, "id", "vec", 8, 2, 2, 1, nq = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted.toSeq
    assert(all === ref)
  }

  test("adcRecall: separated modes give perfect recall; bounds hold") {
    import spark.implicits._
    val df = vecs(40, 8, 13L).toDF("id", "vec")
    val rec = Pq.adcRecall(df, "id", "vec", 8, 2, 2, 1, nq = 2, topK = 4)
      .collect()
    assert(rec.length === 2)
    rec.foreach { r =>
      val (hits, fp) = (r.getLong(1), r.getLong(2))
      assert(hits >= 0 && hits <= 4)
      assert(fp === hits * 10000 / 4)
    }
  }

  test("codes and ADC hits are bit-identical across parallelism") {
    import spark.implicits._
    val data = vecs(50, 8, 9L)
    val df1 = data.toDF("id", "vec").repartition(1)
    val df7 = data.toDF("id", "vec").repartition(7)
    def run(df: org.apache.spark.sql.DataFrame) = (
      Pq.encode(df, "id", "vec", 8, 2, 2, 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq,
      Pq.adcSearch(df, "id", "vec", 8, 2, 2, 1, nq = 2, topK = 3).collect()
        .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getLong(2))).sorted.toSeq)
    assert(run(df1) === run(df7))
  }
}
