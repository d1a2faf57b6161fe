package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink materializes every row without collecting to the driver.
    def exec(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Per query: one warm pass (JIT + codegen cache + parquet footers +
    // operator-internal cache population), timed reps, then CLEAR the
    // cache. Interleaving (vs a global warmup pass over all queries first)
    // keeps at most one query's operator caches resident: with 67 queries'
    // cached frames accumulated, block-eviction churn hit whichever
    // query's timed reps ran late (the r5 q21 2.4x regression).
    //
    // a failed query reports -1 so a regression can't masquerade as a
    // speedup; min-of-reps damps the shared machine's load noise (up to
    // 3x swings observed between identical runs)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // SPARK_GRAFT_ONLY=q70_...,q69_... scopes the run for local A/B
    // timing; the driver never sets it, so its benches stay exhaustive
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      try exec(fn) catch {
        case e: Throwable => System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { exec(fn); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      spark.sharedState.cacheManager.clearCache()
      // ContextCleaner reclaims finished queries' broadcasts/shuffles only
      // on GC; nudge it so 114 queries' debris doesn't crowd later timings
      // (runs outside the timed region; ~100ms per query)
      System.gc()
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}"""
    // The driver tail-captures stdout: at 67+ queries the per-query map
    // overflows its window, so persist the full JSON to a file and print
    // it BEFORE a compact total-only line, which must come LAST.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))
    println(full)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
        s""""reps":$reps,"nqueries":${results.size},"full":"${out.toAbsolutePath}"}""")
    spark.stop()
  }
}
