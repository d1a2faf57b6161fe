package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
    def exec(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String = sfDir): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
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
    val scaleJson = scaleSection(spark, sfDir, results, only.isDefined, exec)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","reps":$reps$scaleJson}"""
    // The driver tail-captures stdout: at 67+ queries the per-query map
    // overflows its window, so persist the full JSON to a file and print
    // it BEFORE a compact total-only line, which must come LAST.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))
    // ...and APPEND the same line to a per-run history file: BENCH_r*.json
    // tails truncate the per-query map, so round-over-round diffs of all
    // 200+ queries need the full JSON of every round in one place (the
    // repo keeps the file; one line per bench invocation).
    if (only.isEmpty) {
      val hist = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "bench_history.jsonl"))
      java.nio.file.Files.write(hist, (full + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    println(full)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
        s""""reps":$reps,"nqueries":${results.size}$scaleJson,""" +
        s""""full":"${out.toAbsolutePath}"}""")
    spark.stop()
  }

  /**
   * Scale-proof section: replay the dedup / ANN / graph head queries on a
   * `factor`x blowup of the bench tables and report scaled-vs-base wall
   * times. The blowup is `factor` structurally DISJOINT replicas — ids
   * are shifted per replica and document words get a per-replica suffix —
   * so near-dup pair counts, IVF cell sizes, and graph components grow
   * LINEARLY and a healthy ratio stays well under `factor` x (shared
   * fixed costs) instead of exploding quadratically as naive row
   * replication would. Skipped for scoped (SPARK_GRAFT_ONLY) runs and by
   * SPARK_GRAFT_SCALE=0.
   */
  private def scaleSection(
      spark: SparkSession,
      sfDir: String,
      base: scala.collection.Map[String, Double],
      scoped: Boolean,
      exec: ((SparkSession, String) => DataFrame, String) => Unit): String = {
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1")
    if (mode == "0" || (scoped && mode != "force")) return ""
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val heads = Seq(
      "q22_dedup_minhash",   // banded MinHash LSH near-dup over documents
      "q25_knn_ivf_recall",  // IVF ANN + brute-force recall over embeddings
      "q35_dedup_clusters",  // connected components (bounded union-find path)
      "q96_bm25_topk",       // BM25 corpus stats + inverted match + top-k
      "q114_lsh_index",      // persisted LSH index build + bucket-pruned query
      "q163_pagerank",       // fixed-point PageRank over the near-dup graph
      "q184_kcore",          // synchronous k-core peel over co-part edges
      "q219_entity_linkage", // name-TYPE linkage: ~flat, types don't grow 10x
      "q235_label_propagation", // sync LPA rounds over co-part edges
      "q238_snm_dedup")      // global-rank window blocking: O(n*w) candidates
    heads.filterNot(SparkEntry.queries.contains).foreach(n =>
      System.err.println(s"[bench] scale head $n missing from the inventory — skipped"))
    val tGen = System.nanoTime()
    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
    def blow(table: String, idCols: Seq[String], suffixWords: Option[String]): Unit = {
      val src = spark.read.parquet(s"$sfDir/$table.parquet")
      val shift = idCols.map { c =>
        c -> (src.agg(max(col(c).cast("long"))).head().getLong(0) + 1L)
      }.toMap
      var out = src.crossJoin(broadcast(
        spark.range(factor).select(col("id").as("rep"))))
      idCols.foreach { c =>
        // shifted ids stay LONG: casting back to a narrow source type
        // could wrap at high SF x factor and silently re-collide replicas,
        // inverting exactly the disjointness the ratios measure
        out = out.withColumn(c, col(c).cast("long") + col("rep") * lit(shift(c)))
      }
      // replica r > 0 suffixes every word: replicas share NO vocabulary,
      // so shingle/minhash candidates never pair across replicas
      suffixWords.foreach { tc =>
        out = out.withColumn(tc,
          when(col("rep") === 0, col(tc)).otherwise(concat_ws(" ",
            transform(split(col(tc), " "),
              w => concat(w, lit("_"), col("rep"))))))
      }
      out.drop("rep").write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }
    // the scale probe must NEVER abort the run: the base timings above
    // took minutes and the report they feed is the round's artifact
    try {
      blow("documents", Seq("doc_id"), Some("text"))
      blow("embeddings", Seq("vec_id"), None)
      blow("lineitem", Seq("l_orderkey", "l_partkey"), None)
      // part: ids shift, NAMES stay — 10x rows, same 64 name types, so
      // the type-collapsed linkage head should hold near-flat
      blow("part", Seq("p_partkey"), None)
      System.err.println(
        s"[bench] scale blowup x$factor built in ${(System.nanoTime() - tGen) / 1e9} sec")
      val rows = heads.filter(SparkEntry.queries.contains).map { name =>
        val fn = SparkEntry.queries(name)
        def onePass(): Double = {
          val t0 = System.nanoTime()
          val ok = try { exec(fn, dir); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] scale $name failed: ${e.getMessage}"); false
          }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val first = onePass()
        val t1 = base.getOrElse(name, -1.0)
        // the base side is min-of-warm-reps; a single cold scaled pass on
        // a noisy box can read over `factor`x without being superlinear.
        // Only such suspicious reads pay a warm re-measure (min of two) —
        // healthy heads stay one pass.
        val tN = if (first > 0 && t1 > 0 && first > factor * t1) {
          val second = onePass()
          if (second > 0) math.min(first, second) else first
        } else first
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        val ratio = if (tN > 0 && t1 > 0) tN / t1 else -1.0
        s"\"$name\":{\"base\":$t1,\"scaled\":$tN,\"ratio\":$ratio}"
      }
      s""","scale":{"factor":$factor,"queries":{${rows.mkString(",")}}}"""
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] scale section failed, reporting without it: $e")
        ""
    } finally {
      // the blowup is bench scratch, not testdata — drop it
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}
