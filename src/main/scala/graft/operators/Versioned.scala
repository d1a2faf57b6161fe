package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Versioned bucket-partitioned snapshot store with TIME TRAVEL — the
 * minimal MVCC lakehouse contract a 100 TB corpus pipeline needs:
 *
 *  - a commit applies a CDC batch (I/U/D, last-op-wins within batch)
 *    and writes ONLY the touched buckets as NEW immutable data dirs —
 *    an untouched bucket's bytes are never read or rewritten, so commit
 *    cost is proportional to the change set, not the corpus;
 *  - every version's manifest (`_versions/v<N>.json`) maps each bucket
 *    to the data dir serving it in that snapshot, so any historical
 *    version stays readable as long as its manifest survives —
 *    "what did the training corpus look like when run X was launched";
 *  - data dirs are append-only and the manifest is written LAST, so a
 *    crashed commit leaves only unreferenced stage garbage (collectable
 *    by a vacuum pass over dirs no manifest references), never a
 *    corrupt readable version.
 *
 * Layout:
 * {{{
 *   dir/_versions/v1.json        {"version":1,"buckets":{"0":"b0_v1",...}}
 *   dir/_versions/v2.json        untouched buckets keep pointing at v1 dirs
 *   dir/data/b<bucket>_v<ver>/   plain parquet, one dir per (bucket, ver)
 * }}}
 *
 * Determinism: version numbers are a dense sequence assigned by commit
 * order; the stored rows are exactly [[Cdc.mergeChanges]] over the
 * last-op-per-key collapse of the batch — a pure function of
 * (previous version, batch). No timestamps, no RNG.
 *
 * Concurrency contract: SINGLE WRITER (the standard CDC-apply shape —
 * one stream, one committer), and [[vacuum]] runs under the SAME
 * single-writer lock as commit. The layout still degrades SAFELY under
 * a contract violation: every attempt stages and lands its bucket dirs
 * under an ATTEMPT-UNIQUE name (`b<bucket>_v<ver>_<attempt>`), so two
 * racers targeting the same version never touch each other's files;
 * the exclusive manifest create (`fs.create(..., overwrite = false)`,
 * atomic on HDFS-like stores) plus a READ-BACK verify (which closes
 * LocalFileSystem's exists-then-create TOCTOU window) picks exactly
 * one winner, the loser throws before claiming success, and readers
 * are never exposed to a half commit. A crashed or losing attempt's
 * dirs are unreferenced garbage: [[vacuum]] sweeps them once the
 * store's latest version reaches the attempt's version (dirs ABOVE the
 * latest manifest are presumed in-flight and kept).
 */
object Versioned {

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(dir: String, v: Int) =
    new org.apache.hadoop.fs.Path(s"$dir/_versions/v$v.json")

  /** Highest committed version, or 0 when the store is uninitialized. */
  def latestVersion(spark: SparkSession, dir: String): Int = {
    val (hfs, _) = fs(spark, dir)
    val vdir = new org.apache.hadoop.fs.Path(s"$dir/_versions")
    if (!hfs.exists(vdir)) return 0
    hfs.listStatus(vdir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  private def readManifest(
      spark: SparkSession, dir: String, v: Int): Map[Long, String] = {
    val (hfs, _) = fs(spark, dir)
    val p = manifestPath(dir, v)
    require(hfs.exists(p), s"Versioned: version $v does not exist under $dir")
    val in = hfs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // {"version":N,"buckets":{"0":"b0_v1",...}} — hand-rolled like the
    // shard manifests; keys/dirs contain no JSON metacharacters
    "\"(\\d+)\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(
        txt.substring(txt.indexOf("\"buckets\"")))
      .map(m => m.group(1).toLong -> m.group(2)).toMap
  }

  private def writeManifest(
      spark: SparkSession, dir: String, v: Int,
      buckets: Map[Long, String]): Unit = {
    val (hfs, _) = fs(spark, dir)
    val body = buckets.toSeq.sortBy(_._1)
      .map { case (b, d) => s""""$b":"$d"""" }.mkString(",")
    val txt = s"""{"version":$v,"buckets":{$body}}"""
    val p = manifestPath(dir, v)
    require(!hfs.exists(p), s"Versioned: version $v already committed")
    val out = hfs.create(p, false)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
    // READ-BACK VERIFY: `create(overwrite = false)` is atomic on
    // HDFS-like stores but exists-then-open on LocalFileSystem, so two
    // racers can both "succeed" with the last writer's bytes landing.
    // Re-reading and comparing makes the loser of that clobber throw
    // instead of silently believing it committed — exactly one caller
    // ever returns from here for a given version.
    val in = hfs.open(p)
    val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    if (stored != txt) throw new IllegalStateException(
      s"Versioned: lost the commit race for version $v — manifest holds " +
        "another writer's content (single-writer contract violated)")
  }

  /** Initialize the store with `df` as version 1. Returns 1. */
  def init(df: DataFrame, idCol: String, dir: String, nBuckets: Int): Int = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    require(latestVersion(spark, dir) == 0,
      s"Versioned: $dir is already initialized")
    val buckets = writeBuckets(
      df.withColumn("__bucket", pmod(col(idCol).cast("long"), lit(nBuckets.toLong))),
      dir, version = 1)
    writeManifest(spark, dir, 1, buckets)
    1
  }

  /** Write `staged`'s buckets as ATTEMPT-UNIQUE `b<bucket>_v<version>_
   *  <attempt>` dirs; returns the bucket -> dirname map of what landed
   *  (emptied buckets absent). Unique names mean a racing or retried
   *  commit can never rename onto (or merge into — Hadoop
   *  LocalFileSystem silently merges dirs) another attempt's data: only
   *  the manifest decides which attempt's dirs serve a version. */
  private def writeBuckets(
      staged: DataFrame, dir: String, version: Int): Map[Long, String] = {
    val spark = staged.sparkSession
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val stage = s"$dir/data/__stage_v${version}_$attempt"
    staged.write.mode("overwrite").partitionBy("__bucket").parquet(stage)
    val (hfs, _) = fs(spark, dir)
    val landed = hfs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).filter(_.getName.startsWith("__bucket="))
      .map { p =>
        val b = p.getName.stripPrefix("__bucket=").toLong
        val name = s"b${b}_v${version}_$attempt"
        val dest = new org.apache.hadoop.fs.Path(s"$dir/data/$name")
        require(hfs.rename(p, dest), s"Versioned: rename $p -> $dest failed")
        b -> name
      }.toMap
    hfs.delete(new org.apache.hadoop.fs.Path(stage), true)
    landed
  }

  /**
   * Apply one CDC batch (`idCol`, `opCol` in {I,U,D}, `seqCol` breaking
   * within-batch races, payload...) on top of the latest version and
   * commit the result as a NEW version. Only buckets touched by the
   * batch are read or written; a bucket emptied by deletes drops out of
   * the new manifest. Returns the new version number.
   */
  def commit(
      changes: DataFrame,
      idCol: String,
      opCol: String,
      seqCol: String,
      dir: String,
      nBuckets: Int): Int = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = changes.sparkSession
    val cur = latestVersion(spark, dir)
    require(cur >= 1, s"Versioned: $dir is not initialized (call init first)")
    val pointers = readManifest(spark, dir, cur)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", seqCol)
      .withColumn("__bucket", pmod(col(idCol).cast("long"), lit(nBuckets.toLong)))
    val touched = latest.select("__bucket").distinct()
      .collect().map(_.getLong(0)).sorted // bounded by nBuckets
    val servedDirs = touched.flatMap(pointers.get).map(n => s"$dir/data/$n")
    val snap =
      if (servedDirs.isEmpty) {
        // all-new buckets: an empty frame with the post-merge schema
        latest.drop(opCol).where(lit(false))
      } else {
        spark.read.parquet(servedDirs.toSeq: _*)
          .withColumn("__bucket",
            pmod(col(idCol).cast("long"), lit(nBuckets.toLong)))
      }
    val merged = Cdc.mergeChanges(snap, latest, idCol, opCol)
      .localCheckpoint(true) // the write below must not re-read old dirs mid-swap
    val next = cur + 1
    val landed = writeBuckets(merged, dir, next)
    val newPointers = (pointers -- touched.filterNot(landed.contains)) ++ landed
    writeManifest(spark, dir, next, newPointers)
    next
  }

  /** Read snapshot `version` (latest when <= 0). A version whose commit
   *  deleted every row (empty manifest — a legal committed state) reads
   *  as an EMPTY DataFrame, with the schema borrowed from the nearest
   *  non-empty surviving version (backward first, then forward); only a
   *  store that never held a row anywhere is unreadable. */
  def read(spark: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val v = if (version <= 0) latestVersion(spark, dir) else version
    require(v >= 1, s"Versioned: no committed versions under $dir")
    val pointers = readManifest(spark, dir, v)
    if (pointers.nonEmpty) {
      spark.read.parquet(pointers.values.map(n => s"$dir/data/$n").toSeq: _*)
        .drop("__bucket")
    } else {
      val (hfs, _) = fs(spark, dir)
      val latest = latestVersion(spark, dir)
      val donor = ((v - 1) to 1 by -1).iterator ++ ((v + 1) to latest).iterator
      donor.map(dv => manifestPath(dir, dv))
        .filter(hfs.exists)
        .map(p => readManifest(spark, dir,
          p.getName.stripPrefix("v").stripSuffix(".json").toInt))
        .collectFirst { case ps if ps.nonEmpty =>
          spark.read.parquet(ps.values.map(n => s"$dir/data/$n").toSeq: _*)
            .drop("__bucket").where(lit(false))
        }
        .getOrElse(throw new IllegalStateException(
          s"Versioned: version $v is empty and no surviving version has " +
            "data to borrow a schema from"))
    }
  }

  /**
   * Retention + garbage collection: keep the newest `keepVersions`
   * manifests, delete the older ones, then delete every data dir no
   * SURVIVING manifest references — which also sweeps the stage
   * garbage of crashed commits at or below the latest version. Time
   * travel remains exact for every kept version (a data dir referenced
   * by any survivor is never touched). Returns
   * (versions_dropped, dirs_deleted).
   *
   * Concurrency: vacuum MUST run under the same single-writer lock as
   * [[commit]]. As defense in depth it additionally SKIPS dirs whose
   * version suffix exceeds the latest manifest (the stage / freshly
   * renamed dirs of a possibly in-flight commit), so even a lock
   * violation cannot yank data out from under a committing writer.
   *
   * Driver-side dir listing only — the same bounded-scan contract as
   * [[Sinks.vacuumOrphans]]; no executor work at all.
   */
  def vacuum(
      spark: SparkSession, dir: String, keepVersions: Int): (Int, Int) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val (hfs, _) = fs(spark, dir)
    val latest = latestVersion(spark, dir)
    require(latest >= 1, s"Versioned: $dir is not initialized")
    val cutoff = math.max(1, latest - keepVersions + 1)
    val dropped = (1 until cutoff).filter { v =>
      val p = manifestPath(dir, v)
      hfs.exists(p) && hfs.delete(p, false)
    }
    val live: Set[String] = (cutoff to latest)
      .filter(v => hfs.exists(manifestPath(dir, v)))
      .flatMap(v => readManifest(spark, dir, v).values).toSet
    val dataRoot = new org.apache.hadoop.fs.Path(s"$dir/data")
    // version of a data-dir name: b<bucket>_v<N>_<attempt> or
    // __stage_v<N>_<attempt> (older layouts lack the attempt suffix);
    // unparseable names are treated as in-flight (kept) — deleting only
    // what we understand is the safe direction
    val vPat = "_v(\\d+)(?:_|$)".r
    def dirVersion(n: String): Option[Int] =
      if (n.startsWith("b") || n.startsWith("__stage_v"))
        vPat.findFirstMatchIn(n).flatMap(_.group(1).toIntOption)
      else None
    val deleted =
      if (!hfs.exists(dataRoot)) 0
      else hfs.listStatus(dataRoot).map(_.getPath)
        .filterNot(p => live(p.getName))
        .filter(p => dirVersion(p.getName).exists(_ <= latest))
        .count(p => hfs.delete(p, true))
    (dropped.size, deleted)
  }

  /**
   * CHANGE DATA FEED: replay what each commit in `(fromVersion,
   * toVersion]` did, as one row per changed key — the Delta-CDF-style
   * read a downstream consumer tails instead of re-diffing whole
   * snapshots. Output: (version, op, id, payload...), where `version`
   * is the step's NEW version, op ∈ {I, U, D}, and D rows carry the
   * OLD payload (I/U the new one). Rows a commit rewrote byte-equal
   * (same bucket, unchanged key) are NOT changes and are not emitted.
   *
   * Scale shape: each step opens ONLY the buckets whose manifest
   * pointer changed between v-1 and v (the pointer diff is driver-side
   * and bounded by nBuckets) — a commit that touched 1 of 10k buckets
   * costs one bucket's read, not a snapshot scan; the per-step diff is
   * one id-equi full-outer join of those buckets' old/new rows. Steps
   * union lazily into a single plan.
   */
  def changes(
      spark: SparkSession,
      dir: String,
      idCol: String,
      fromVersion: Int,
      toVersion: Int): DataFrame = {
    val latest = latestVersion(spark, dir)
    require(fromVersion >= 1 && toVersion > fromVersion && toVersion <= latest,
      s"Versioned: need 1 <= from < to <= latest($latest), " +
        s"got ($fromVersion, $toVersion]")
    val steps = ((fromVersion + 1) to toVersion).flatMap { v =>
      val mo = readManifest(spark, dir, v - 1)
      val mn = readManifest(spark, dir, v)
      val touched = (mo.keySet ++ mn.keySet).filter(b => mo.get(b) != mn.get(b))
      val oldDirs = touched.toSeq.flatMap(mo.get).map(n => s"$dir/data/$n")
      val newDirs = touched.toSeq.flatMap(mn.get).map(n => s"$dir/data/$n")
      if (oldDirs.isEmpty && newDirs.isEmpty) None
      else {
        val probe = spark.read
          .parquet((if (newDirs.nonEmpty) newDirs else oldDirs): _*)
          .drop("__bucket")
        def side(dirs: Seq[String]) =
          if (dirs.nonEmpty) spark.read.parquet(dirs: _*).drop("__bucket")
          else probe.where(lit(false))
        val pay = probe.columns.filterNot(_ == idCol).toSeq
        def packed(d: DataFrame, as: String) = d.select(col(idCol),
          (if (pay.isEmpty) lit(1) else struct(pay.map(col): _*)).as(as))
        val j = packed(side(oldDirs), "__o")
          .join(packed(side(newDirs), "__n"), Seq(idCol), "full_outer")
        val op = when(col("__o").isNull, "I")
          .when(col("__n").isNull, "D")
          .when(!(col("__o") <=> col("__n")), "U")
        Some(j.withColumn("op", op).where(col("op").isNotNull)
          .withColumn("__p", coalesce(col("__n"), col("__o")))
          .select(Seq(lit(v).as("version"), col("op"), col(idCol)) ++
            pay.map(c => col(s"__p.$c").as(c)): _*))
      }
    }
    require(steps.nonEmpty,
      s"Versioned: no commits changed anything in ($fromVersion, $toVersion]")
    steps.reduce(_ unionAll _)
  }

  /**
   * Streaming commit sink: every micro-batch of the CDC stream becomes
   * one [[commit]]ed version — continuous ingestion where EACH batch's
   * snapshot remains time-travel readable (the audit trail
   * [[graft.streaming.StreamingOps.cdcSnapshotSink]]'s overwrite-in-
   * place variant deliberately does not keep). Caller picks trigger /
   * checkpoint and starts it; the store must be [[init]]ialized.
   */
  def commitSink(
      changes: DataFrame,
      idCol: String,
      opCol: String,
      seqCol: String,
      dir: String,
      nBuckets: Int): org.apache.spark.sql.streaming.DataStreamWriter[
      org.apache.spark.sql.Row] =
    changes.writeStream.outputMode("update").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       _: Long) =>
        if (!batch.isEmpty) {
          commit(batch, idCol, opCol, seqCol, dir, nBuckets)
          ()
        }
    }
}
