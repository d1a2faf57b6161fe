package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}

/** Persisted IVF index: build-once/query-many with partition-pruned probes. */
class IvfIndexSuite extends AnyFunSuite with GraftSparkSession {

  test("index query equals inline ivfKnn and physically prunes unprobed cells") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = e.where(col("vec_id") < 20)
    val path = Files.createTempDirectory("graft_ivf").toString

    IvfIndex.build(e, "vec_id", "embedding", path, nlist = 8, kmeansIters = 3)
    val fromIndex = IvfIndex.query(spark, path, queries, "vec_id", "embedding",
      k = 3, nprobe = 4)
    val inline = Similarity.ivfKnn(e, queries, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 4)
    // the quantizer is deterministic, so the persisted index must answer
    // identically to the inline computation
    assert(fromIndex.orderBy("query_id", "rk").collect().toSeq ===
      inline.orderBy("query_id", "rk").collect().toSeq)

    // pruning is physical: the scan's partition filter keeps unprobed
    // cells (and their files) out of the plan entirely
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
    // with 8 cells and 20 queries x 4 probes, at least one cell must be
    // probed; sanity-check the index layout on disk
    val cellDirs = new java.io.File(s"$path/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1 && cellDirs.length <= 8)
  }

  test("querying more probes than cells degrades gracefully to exhaustive") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.where(col("vec_id") < 5)
    val path = Files.createTempDirectory("graft_ivf_small").toString
    IvfIndex.build(e, "vec_id", "embedding", path, nlist = 4)
    val res = IvfIndex.query(spark, path, queries, "vec_id", "embedding",
      k = 2, nprobe = 16)
    // nprobe > nlist: every cell probed -> identical to exact brute force
    val exact = Similarity.bruteForceKnn(e, queries, "vec_id", "embedding", 2)
    assert(res.orderBy("query_id", "rk").collect().toSeq ===
      exact.orderBy("query_id", "rk").collect().toSeq)
  }
}
