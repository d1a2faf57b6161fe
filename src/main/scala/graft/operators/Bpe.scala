package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed BPE (byte-pair-encoding) tokenizer training over a corpus —
 * the merge-rule learner every LLM data pipeline runs before it can count
 * a single training token. Mirrors the classic word-type formulation
 * (Sennrich et al. 2016): pair statistics are computed over the WORD
 * VOCABULARY weighted by word frequency, never over the token stream.
 *
 * Scale design:
 *  - The corpus collapses to word types in one hash aggregation: at
 *    100 TB the token stream is trillions of rows, the vocabulary is
 *    millions — every subsequent round runs on the vocabulary only.
 *  - Each round is one distributed pair-count aggregation (explode of
 *    adjacent symbol pairs, map-side partial sums) plus a driver-side
 *    argmax of exactly ONE row (`limit(1)` → TakeOrdered, no global
 *    sort materialization). The driver never holds more than the merge
 *    table itself (`rounds` rows).
 *  - Merge application is a codegen-friendly higher-order-function fold
 *    over each word's symbol array — no UDF, no shuffle; the vocabulary
 *    is re-cached per round so round k does not recompute folds 1..k-1
 *    (lineage truncation, the iterative-algorithm idiom).
 *  - Tie-breaks are total and engine-reproducible: highest pair count,
 *    then lexicographically smallest (left, right) pair.
 */
object Bpe {

  /**
   * Learn `rounds` BPE merge rules from `textCol`. Words are
   * whitespace-tokenized, lower-cased word types (the [[TextOps.words]]
   * convention); initial symbols are single characters. Returns the
   * merge table `(round, lhs, rhs, pair_count)` ordered by round —
   * round k's pair count is measured AFTER merges 1..k-1 are applied.
   * Stops early if no adjacent pair remains. Words containing U+001F
   * (the oracle's fold delimiter) are excluded by contract.
   */
  def trainMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = df.sparkSession
    val wordTypes = df
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .where(col("w") =!= "" && !col("w").contains(lit("\u001f")))
      .groupBy("w").agg(count(lit(1)).as("c"))
    var syms = wordTypes
      .select(filter(split(col("w"), ""), x => x =!= "").as("syms"), col("c"))
      .cache()
    // the previous round's cache: round r's fold still reads it while
    // round r's OWN cache fills (during the argmax job), so it can only
    // be dropped after that job — deferring the unpersist by one round
    // replaces the old per-round `folded.count()` materialization job
    // (rounds extra jobs per training run) with zero extra jobs
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        // this argmax job is ALSO what materializes `syms`' cache (its
        // lineage reads `prev`, still pinned from the previous round)
        val best = syms
          .where(size(col("syms")) >= 2)
          .select(posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
            .as(Seq("i", "lhs")), col("syms"), col("c"))
          .select(col("lhs"),
            element_at(col("syms"), col("i") + 2).as("rhs"), col("c"))
          .groupBy("lhs", "rhs").agg(sum("c").as("cnt"))
          .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
          .limit(1).collect()
        if (prev != null) { prev.unpersist(blocking = false); prev = null }
        if (best.isEmpty) {
          exhausted = true
        } else {
          val (a, b, cnt) =
            (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += Row(r, a, b, cnt)
          // greedy left-to-right non-overlapping merge: fold each word's
          // symbols; a freshly-merged tail (= a||b) can never re-match as
          // `a`, so the fold reproduces the scan-and-skip semantics
          val folded = syms.select(
            aggregate(col("syms"), array().cast(ArrayType(StringType)),
              (acc, x) =>
                when(x === lit(b) && size(acc) >= 1 &&
                    element_at(acc, -1) === lit(a),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                  .otherwise(concat(acc, array(x)))).as("syms"),
            col("c")).cache()
          prev = syms
          syms = folded
          r += 1
        }
      }
    } finally {
      syms.unpersist()
      if (prev != null) prev.unpersist(blocking = false)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /**
   * Tokenize `textCol` with a learned merge table (the inference side of
   * [[trainMerges]]): each word's character symbols are folded through
   * the merges IN RULE ORDER — the BPE contract — yielding
   * `(id, n_words, n_tokens, fertility_fp)` where fertility is
   * tokens-per-word in 1e4 fixed point (the cross-engine float
   * convention). The merge table is a driver-side argument (it is
   * `rounds` rows by construction), so the fold compiles to a literal
   * expression chain.
   *
   * The fold runs once per word TYPE, not per occurrence — the
   * vocabulary-collapse trick of [[trainMerges]] applied to inference:
   * a trillion-token corpus pays |merges| array folds per distinct
   * word, and the (word → token count) table joins back against the
   * exploded word stream (AQE broadcasts it while it fits; the join
   * key is the word either way, so the shuffle carries (id, word)
   * pairs, never text).
   */
  def tokenizeFertility(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val wordSyms = filter(split(col("w"), ""), x => x =!= "")
    val folded = merges.foldLeft(wordSyms) { case (acc0, (a, b)) =>
      aggregate(acc0, array().cast(ArrayType(StringType)),
        (acc, x) =>
          when(x === lit(b) && size(acc) >= 1 &&
              element_at(acc, -1) === lit(a),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
    }
    val docWords = df.select(col(idCol).as("id"),
        explode(TextOps.words(col(textCol))).as("w"))
      .where(col("w") =!= "" && !col("w").contains(lit("\u001f")))
    val tokensPerType = docWords.select("w").distinct()
      .select(col("w"), size(folded).as("nt"))
    docWords.join(tokensPerType, Seq("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("nt").as("n_tokens"))
      // half-up on the RATIONAL t*1e4/w via pure integer arithmetic —
      // no float representation in the fixed-point path, so the value is
      // bit-identical across engines
      .withColumn("fertility_fp",
        expr("(2 * n_tokens * 10000 + n_words) DIV (2 * n_words)"))
  }
}
