/**
 * Py4J entry point for PySpark users (pattern of the reference's
 * DataSketchApi, reference: DataSketchApi.scala:22-24): from a PySpark
 * session, `spark._jvm.org.apache.spark.api.python.GraftPythonApi.install(
 * spark._jsparkSession)` registers all graft SQL functions; subsequent
 * `selectExpr`/`spark.sql` calls execute entirely in the JVM — no Python
 * UDF boundary is crossed at query time.
 *
 * The operator wrappers below expose the flagship Scala pipeline
 * operators to Python as plain-typed methods (Py4J cannot supply Scala
 * default arguments or `Seq`s): pass `df._jdf`, wrap the returned plan
 * with `pyspark.sql.DataFrame(jdf, spark)`. Execution stays entirely
 * JVM-side — Python only exchanges plan handles.
 */
package org.apache.spark.api.python

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.GraftFunctionRegistry

import graft.operators.{AsofJoin, BloomIndex, Bpe, Classifier, Clustering, CorpusDiff,
  Dedup, Embeddings, IvfIndex, JoinStats, Privacy, Profiler, RangeJoin, Retrieval,
  Sampling, Similarity, Sinks, Spectral, TextIndex, TextOps, TextProfile, UrlOps}

object GraftPythonApi {
  def install(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.GraftConfEntries.ensureRegistered()
    GraftFunctionRegistry.install(spark)
  }

  def profile(df: DataFrame): DataFrame = Profiler.profile(df)

  def keyOverlap(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame =
    JoinStats.keyOverlap(left, leftKey, right, rightKey)

  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exactDedup(df, idCol, textCol)

  def normalizedDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.normalizedDedup(df, idCol, textCol)

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.ngramJaccardPairs(df, idCol, textCol)

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.minhashLshPairs(df, idCol, textCol)

  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame =
    Dedup.contaminatedDocs(corpus, benchmark, idCol, textCol)

  def connectedComponents(nodes: DataFrame, edges: DataFrame, idCol: String): DataFrame =
    Dedup.connectedComponents(nodes, edges, idCol)

  def bruteForceKnn(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    Similarity.bruteForceKnn(corpus, queries, idCol, vecCol, k)

  def asofBackward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String): DataFrame =
    AsofJoin.asofBackward(left, right, keyCol, tsCol)

  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int): DataFrame =
    Dedup.semanticDedup(df, idCol, vecCol, threshold, nlist)

  def parseUrls(df: DataFrame, urlCol: String): DataFrame =
    UrlOps.parseUrls(df, urlCol)

  def shuffleShards(df: DataFrame, idCol: String, numShards: Int, seed: Long): DataFrame =
    Sampling.shuffleShards(df, idCol, numShards, seed)

  def bloomIndexBuild(spark: SparkSession, path: String, corpus: DataFrame,
      keyCol: String, maxItems: Long, fpp: Double): Unit =
    BloomIndex.build(spark, path, corpus, keyCol, maxItems, fpp)

  def bloomIndexAppend(spark: SparkSession, path: String,
      batch: DataFrame, keyCol: String): Unit =
    BloomIndex.append(spark, path, batch, keyCol)

  def bloomIndexFilterNew(spark: SparkSession, path: String,
      batch: DataFrame, keyCol: String): DataFrame =
    BloomIndex.filterNew(spark, path, batch, keyCol)

  def contaminationOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, minFrac: Double): DataFrame =
    Dedup.contaminationOverlap(corpus, benchmark, idCol, textCol, n, minFrac)

  def sourceOverlapMatrix(df: DataFrame, groupCol: String,
      textCol: String, n: Int): DataFrame =
    Dedup.sourceOverlapMatrix(df, groupCol, textCol, n)

  def selectByTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, budget: Long): DataFrame =
    Sampling.selectByTokenBudget(df, idCol, scoreCol, tokensCol, budget)

  def sizeShards(df: DataFrame, idCol: String, bytesCol: String,
      targetBytes: Long, buckets: Int): DataFrame =
    Sampling.sizeShards(df, idCol, bytesCol, targetBytes, buckets)

  // (slot, n_pos, n_neg, totals, weight) rows; freeze into scoring with
  // graft.functions.graft_hashed_bow_score via fitWeights on the JVM side
  def trainHashedBow(df: DataFrame, labelCol: String, textCol: String,
      dim: Int, smoothing: Double): DataFrame =
    Classifier.trainHashedBow(df, labelCol, textCol, dim, smoothing)

  def filterLines(df: DataFrame, idCol: String, textCol: String,
      minWords: Int, requirePunct: Boolean,
      dropMarkers: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    TextOps.filterLines(df, idCol, textCol, minWords, requirePunct,
      dropMarkers.asScala.toSeq)
  }

  // queries: [[qid, "space separated terms"], ...] from the Python side
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: java.util.List[java.util.List[Object]], k: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val qs = queries.asScala.toSeq.map { pair =>
      val p = pair.asScala
      (p(0).asInstanceOf[Number].intValue(), p(1).asInstanceOf[String])
    }
    Retrieval.bm25TopK(df, idCol, textCol, qs, k)
  }

  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame =
    CorpusDiff.diff(oldDf, newDf, idCol, textCol)

  def buildVocab(df: DataFrame, textCol: String, topN: Int): DataFrame =
    TextOps.buildVocab(df, textCol, topN)

  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minRun: Int, maxPostings: Int): DataFrame =
    Dedup.repeatedSpans(df, idCol, textCol, n, minRun, maxPostings)

  def dedupSpansRewrite(df: DataFrame, idCol: String, textCol: String,
      n: Int, minRun: Int, maxPostings: Int): DataFrame =
    Dedup.dedupSpansRewrite(df, idCol, textCol, n, minRun, maxPostings)

  def asofForward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String): DataFrame =
    AsofJoin.asofForward(left, right, keyCol, tsCol)

  def overlapJoin(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bucketWidth: Double, keyCols: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    RangeJoin.overlapJoin(left, right, lLo, lHi, rLo, rHi, bucketWidth,
      keyCols.asScala.toSeq)
  }

  def ivfIndexBuild(df: DataFrame, idCol: String, vecCol: String,
      path: String, nlist: Int, kmeansIters: Int): Unit =
    IvfIndex.build(df, idCol, vecCol, path, nlist, kmeansIters)

  def ivfIndexQuery(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    IvfIndex.query(spark, path, queries, idCol, vecCol, k, nprobe)

  def textIndexBuild(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int): Unit =
    TextIndex.build(df, idCol, textCol, path, buckets)

  def textIndexAppend(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int): Unit =
    TextIndex.append(df, idCol, textCol, path, buckets)

  def textProfile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextProfile.report(df, idCol, textCol)

  def stripHtml(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(df.col(idCol),
      TextOps.htmlTagCount(df.col(textCol)).cast("long").as("n_tags"),
      TextOps.stripHtml(df.col(textCol)).as("clean"))

  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double): DataFrame =
    Sampling.temperatureSample(df, idCol, groupCol, alpha)

  def textIndexQuery(spark: SparkSession, path: String,
      queries: java.util.List[java.util.List[Object]], k: Int,
      buckets: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val qs = queries.asScala.toSeq.map { pair =>
      val p = pair.asScala
      (p(0).asInstanceOf[Number].intValue(), p(1).asInstanceOf[String])
    }
    TextIndex.query(spark, path, qs, k, buckets)
  }

  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    Clustering.kmeansAssign(df, idCol, vecCol, k, iters)

  def kmeansProfile(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    Clustering.kmeansProfile(df, idCol, vecCol, k, iters)

  def streamingNearDupPairs(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.streaming.StreamingOps.nearDupPairs(df, idCol, textCol)

  def covarianceN2(df: DataFrame, vecCol: String): DataFrame =
    Spectral.covarianceN2(df, vecCol)

  def pcaProject(df: DataFrame, idCol: String, vecCol: String, m: Int): DataFrame =
    Spectral.pcaProject(df, idCol, vecCol, m)

  def gramDrift(dfA: DataFrame, dfB: DataFrame, vecCol: String): DataFrame =
    Spectral.gramDrift(dfA, dfB, vecCol)

  // shares: [[group, num, den], ...] from the Python side
  def rebalanceMixture(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, shares: java.util.List[java.util.List[Object]],
      budgetNum: Int, budgetDen: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val m = shares.asScala.map { s =>
      val p = s.asScala
      p(0).asInstanceOf[String] ->
        (p(1).asInstanceOf[Number].intValue(), p(2).asInstanceOf[Number].intValue())
    }.toMap
    Sampling.rebalanceMixture(df, idCol, groupCol, textCol, m, budgetNum, budgetDen)
  }

  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Classifier.bigramLmScore(df, idCol, textCol)

  def bigramLmScoreAgainst(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame): DataFrame =
    Classifier.bigramLmScore(df, idCol, textCol, Some(reference))

  def tokenQuotaPerKey(df: DataFrame, keyCol: String, idCol: String,
      textCol: String, budgetTokens: Long): DataFrame =
    graft.streaming.StreamingOps.tokenQuotaPerKey(df, keyCol, idCol, textCol, budgetTokens)

  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, maxCosine: Double): DataFrame =
    Similarity.hardNegatives(corpus, queries, idCol, vecCol, k, maxCosine)

  def noveltyScores(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.noveltyScores(df, idCol, textCol)

  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
      binWidth: Double): DataFrame =
    Classifier.calibrationBins(df, labelCol, scoreCol, binWidth)

  /** `splits` as (name, weight) pairs, e.g. [("train", 8), ("val", 1), ("test", 1)]. */
  def leakageFreeSplits(nodes: DataFrame, edges: DataFrame, idCol: String,
      names: java.util.List[String], weights: java.util.List[Integer]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val splits = names.asScala.toSeq.zip(weights.asScala.toSeq.map(_.intValue))
    Dedup.leakageFreeSplits(nodes, edges, idCol, splits)
  }

  def windowedDistributionSketch(df: DataFrame, eventTimeCol: String,
      valCol: String, windowDuration: String, watermarkDelay: String): DataFrame =
    graft.streaming.StreamingOps.windowedDistributionSketch(
      df, eventTimeCol, valCol, windowDuration, watermarkDelay)

  def windowedTopItemsSketch(df: DataFrame, eventTimeCol: String,
      itemCol: String, windowDuration: String, watermarkDelay: String): DataFrame =
    graft.streaming.StreamingOps.windowedTopItemsSketch(
      df, eventTimeCol, itemCol, windowDuration, watermarkDelay)

  def globalRankDesc(df: DataFrame, idCol: String, valueCol: String,
      rankCol: String, buckets: Int): DataFrame =
    Classifier.globalRankDesc(df, idCol, valueCol, rankCol, buckets)

  def rrfEnsemble(df: DataFrame, idCol: String,
      signalCols: java.util.List[String], k: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    Classifier.rrfEnsemble(df, idCol, signalCols.asScala.toSeq, k)
  }

  def writeShardsWithManifest(df: DataFrame, idCol: String, textCol: String,
      path: String, numShards: Int): DataFrame =
    Sinks.writeShardsWithManifest(df, idCol, textCol, path, numShards)

  def spanCorruptionPairs(df: DataFrame, idCol: String, textCol: String,
      every: Int): DataFrame =
    TextOps.spanCorruptionPairs(df, idCol, textCol, every)

  def groupPercentile(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String): DataFrame =
    Sampling.groupPercentile(df, idCol, groupCol, valueCol)

  def curriculumInterleave(df: DataFrame, idCol: String, difficultyCol: String,
      binWidth: Double): DataFrame =
    Sampling.curriculumInterleave(df, idCol, difficultyCol, binWidth)

  def groupRobustScale(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String): DataFrame =
    Sampling.groupRobustScale(df, idCol, groupCol, valueCol)

  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextOps.tokenEntropy(df, idCol, textCol)

  def languageConfidence(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextOps.languageConfidence(df, idCol, textCol)

  def dedupSavings(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame =
    Dedup.dedupSavings(df, idCol, textCol, groupCol)

  def contrastiveTriplets(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, minPositive: Double, maxNegative: Double): DataFrame =
    Similarity.contrastiveTriplets(corpus, anchors, idCol, vecCol,
      minPositive, maxNegative)

  def bpeTrainMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    Bpe.trainMerges(df, textCol, rounds)

  def bpeTokenizeFertility(df: DataFrame, idCol: String, textCol: String,
      merges: java.util.List[java.util.List[String]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    Bpe.tokenizeFertility(df, idCol, textCol,
      merges.asScala.toSeq.map(p => (p.get(0), p.get(1))))
  }

  def fuzzyVocabPairs(df: DataFrame, textCol: String, maxDist: Int,
      minCount: Long): DataFrame =
    Dedup.fuzzyVocabPairs(df, textCol, maxDist, minCount)

  def keepBestPerCluster(df: DataFrame, idCol: String, compCol: String,
      scoreCol: String): DataFrame =
    Dedup.keepBestPerCluster(df, idCol, compCol, scoreCol)

  def softDedupWeights(df: DataFrame, idCol: String, textCol: String,
      seed: Long): DataFrame =
    Dedup.softDedupWeights(df, idCol, textCol, seed)

  def kAnonymityProfile(df: DataFrame, quasiCols: java.util.List[String],
      k: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    Privacy.kAnonymityProfile(df, quasiCols.asScala.toSeq, k)
  }

  def kAnonymitySuppress(df: DataFrame, quasiCols: java.util.List[String],
      k: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    Privacy.kAnonymitySuppress(df, quasiCols.asScala.toSeq, k)
  }

  def pageRankFp(nodes: DataFrame, edges: DataFrame, idCol: String,
      iters: Int, dampNum: Int, dampDen: Int): DataFrame =
    graft.operators.Graph.pageRankFp(nodes, edges, idCol, iters, dampNum, dampDen)

  def embeddingQc(df: DataFrame, vecCol: String,
      groupCols: java.util.List[String], expectedDim: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    Embeddings.embeddingQc(df, vecCol, groupCols.asScala.toSeq, expectedDim)
  }

  def filterSweep(df: DataFrame, valueCol: String, weightCol: String,
      thresholds: java.util.List[java.lang.Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    Profiler.filterSweep(df, valueCol, weightCol,
      thresholds.asScala.toSeq.map(_.doubleValue))
  }

  def paragraphLangProfile(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String): DataFrame =
    TextOps.paragraphLangProfile(df, idCol, textCol, sepRegex)

  def collocations(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame =
    TextOps.collocations(df, textCol, minCount, k)

  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      checkpoints: java.util.List[java.lang.Long]): DataFrame = {
    import scala.jdk.CollectionConverters._
    TextOps.vocabGrowth(df, idCol, textCol,
      checkpoints.asScala.toSeq.map(_.longValue))
  }

  def zipfSlope(df: DataFrame, textCol: String): DataFrame =
    TextOps.zipfSlope(df, textCol)

  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int): DataFrame =
    graft.operators.Pq.encode(df, idCol, vecCol, dim, m, k, iters)

  def pqAdcSearch(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int, nq: Int, topK: Int): DataFrame =
    graft.operators.Pq.adcSearch(df, idCol, vecCol, dim, m, k, iters, nq, topK)

  def pqIvfAdcSearch(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int, coarseK: Int, nprobe: Int,
      nq: Int, topK: Int): DataFrame =
    graft.operators.Pq.ivfAdcSearch(
      df, idCol, vecCol, dim, m, k, iters, coarseK, nprobe, nq, topK)

  def pqAdcRecall(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int, nq: Int, topK: Int): DataFrame =
    graft.operators.Pq.adcRecall(df, idCol, vecCol, dim, m, k, iters, nq, topK)

  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame =
    graft.operators.Profiler.robustOutliers(df, groupCol, valueCol, idCol)

  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    graft.operators.Graph.triangleStats(edges, srcCol, dstCol)

  def localClustering(edges: DataFrame, srcCol: String, dstCol: String,
      topN: Int): DataFrame =
    graft.operators.Graph.localClustering(edges, srcCol, dstCol, topN)

  def commonNeighborPairs(edges: DataFrame, srcCol: String, dstCol: String,
      topN: Int, maxMiddleDeg: Long): DataFrame =
    graft.operators.Graph.commonNeighborPairs(edges, srcCol, dstCol, topN, maxMiddleDeg)

  def pqAdcMrr(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int, nq: Int, topK: Int): DataFrame =
    graft.operators.Pq.adcMrr(df, idCol, vecCol, dim, m, k, iters, nq, topK)

  def applyDeletes(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, textCol: String, deletes: DataFrame): DataFrame =
    graft.operators.Sinks.applyDeletes(spark, path, idCol, textCol, deletes)

  def robustFlags(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, scale: Int, madK: Int): DataFrame =
    graft.operators.Profiler.robustFlags(df, groupCol, valueCol, idCol, scale, madK)

  def oovRate(df: DataFrame, groupCol: String, textCol: String, topN: Int): DataFrame =
    graft.operators.TextOps.oovRate(df, groupCol, textCol, topN)
}
