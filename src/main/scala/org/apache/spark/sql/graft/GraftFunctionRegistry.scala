/**
 * Registration of the 18 sketch SQL functions (reference name surface:
 * shims.scala:32-56). Three mechanisms, mirroring the reference:
 *   1. `SparkSessionExtensions.injectFunction` via [[graft.GraftExtensions]]
 *      (set `spark.sql.extensions=graft.GraftExtensions`);
 *   2. ServiceLoader auto-discovery via
 *      META-INF/services/org.apache.spark.sql.SparkSessionExtensionsProvider;
 *   3. imperative [[GraftFunctionRegistry.install]] on a live session.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

object GraftFunctionRegistry {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def expectArgs(name: String, ns: Seq[Int], args: Seq[Expression]): Unit = {
    if (!ns.contains(args.length)) {
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name: expected ${ns.mkString(" or ")}, " +
          s"got ${args.length}")
    }
  }

  private def fd(name: String, usage: String, arities: Seq[Int])(
      builder: Seq[Expression] => Expression): FunctionDescription = {
    val checked: Seq[Expression] => Expression = { args =>
      expectArgs(name, arities, args)
      builder(args)
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctionRegistry.getClass.getCanonicalName, null, name, usage, ""),
      checked)
  }

  lazy val expressions: Seq[FunctionDescription] = Seq(
    // --- quantiles -----------------------------------------------------
    fd("approx_percentile_ex",
      "_FUNC_(col, percentage) - approximate percentile(s) of numeric col; " +
        "algorithm from spark.sql.dataSketches.quantiles.sketchImpl", Seq(2)) { args =>
      val (a, k) = QuantileParams.resolveDefault()
      ApproxPercentileAgg(args(0), args(1), a, k, "approx_percentile_ex")
    },
    fd("approx_percentile_kll",
      "_FUNC_(col, percentage) - approximate percentile(s) via KLL floats sketch", Seq(2)) { args =>
      val (a, k) = QuantileParams.resolve("KLL")
      ApproxPercentileAgg(args(0), args(1), a, k, "approx_percentile_kll")
    },
    fd("approx_percentile_req",
      "_FUNC_(col, percentage) - approximate percentile(s) via REQ sketch", Seq(2)) { args =>
      val (a, k) = QuantileParams.resolve("REQ")
      ApproxPercentileAgg(args(0), args(1), a, k, "approx_percentile_req")
    },
    fd("approx_percentile_mergeable",
      "_FUNC_(col, percentage) - approximate percentile(s) via classic mergeable " +
        "DoublesSketch", Seq(2)) { args =>
      val (a, k) = QuantileParams.resolve("MERGEABLE")
      ApproxPercentileAgg(args(0), args(1), a, k, "approx_percentile_mergeable")
    },
    fd("approx_percentile_accumulate",
      "_FUNC_(col) - aggregate numeric col into a serialized quantile sketch (binary)",
      Seq(1)) { args =>
      val (a, k) = QuantileParams.resolveDefault()
      ApproxPercentileAccumulate(args(0), a, k)
    },
    fd("approx_percentile_combine",
      "_FUNC_(sketch) - merge serialized quantile sketches into one (binary)", Seq(1)) { args =>
      val (a, k) = QuantileParams.resolveDefault()
      ApproxPercentileCombine(args(0), a, k)
    },
    fd("approx_percentile_estimate",
      "_FUNC_(sketch, percentage) - percentile(s) from a serialized quantile sketch",
      Seq(2)) { args =>
      val (a, k) = QuantileParams.resolveDefault()
      ApproxPercentileEstimate(args(0), args(1), a, k)
    },
    fd("approx_pmf_estimate",
      "_FUNC_(sketch[, numSplits]) - PMF over numSplits equi-width buckets from a " +
        "serialized quantile sketch", Seq(1, 2)) { args =>
      val (a, k) = QuantileParams.resolveDefault()
      val numSplits = if (args.length == 2) args(1) else Literal(9)
      ApproxPmfEstimate(args(0), numSplits, a, k)
    },
    // --- frequent items ------------------------------------------------
    fd("approx_freqitems",
      "_FUNC_(col) - approximate heavy hitters of a string/integral col as " +
        "array<struct<item, estimated>>", Seq(1)) { args =>
      ApproxFreqItemsAgg(args(0), FreqParams.resolveMaxMapSize())
    },
    fd("approx_freqitems_accumulate",
      "_FUNC_(col) - aggregate string col into a serialized freq-items sketch (binary)",
      Seq(1)) { args =>
      ApproxFreqItemsAccumulate(args(0), FreqParams.resolveMaxMapSize())
    },
    fd("approx_freqitems_combine",
      "_FUNC_(sketch) - merge serialized freq-items sketches into one (binary)", Seq(1)) { args =>
      ApproxFreqItemsCombine(args(0), FreqParams.resolveMaxMapSize())
    },
    fd("approx_freqitems_estimate",
      "_FUNC_(sketch) - frequent items from a serialized freq-items sketch", Seq(1)) { args =>
      ApproxFreqItemsEstimate(args(0))
    },
    // --- distinct counts -----------------------------------------------
    fd("approx_count_distinct_ex",
      "_FUNC_(col) - approximate distinct count of a string/integral col; algorithm " +
        "from spark.sql.dataSketches.distinctCnt.sketchImpl", Seq(1)) { args =>
      val (a, lgK) = DistinctParams.resolveDefault()
      ApproxCountDistinctAgg(args(0), a, lgK, "approx_count_distinct_ex")
    },
    fd("approx_count_distinct_cpc",
      "_FUNC_(col) - approximate distinct count via CPC sketch", Seq(1)) { args =>
      val (a, lgK) = DistinctParams.resolve("CPC")
      ApproxCountDistinctAgg(args(0), a, lgK, "approx_count_distinct_cpc")
    },
    fd("approx_count_distinct_hll",
      "_FUNC_(col) - approximate distinct count via HLL sketch", Seq(1)) { args =>
      val (a, lgK) = DistinctParams.resolve("HLL")
      ApproxCountDistinctAgg(args(0), a, lgK, "approx_count_distinct_hll")
    },
    fd("approx_count_distinct_accumulate",
      "_FUNC_(col) - aggregate string col into a serialized distinct-count sketch (binary)",
      Seq(1)) { args =>
      val (a, lgK) = DistinctParams.resolveDefault()
      ApproxCountDistinctAccumulate(args(0), a, lgK)
    },
    fd("approx_count_distinct_combine",
      "_FUNC_(sketch) - merge serialized distinct-count sketches into one (binary)",
      Seq(1)) { args =>
      val (a, lgK) = DistinctParams.resolveDefault()
      ApproxCountDistinctCombine(args(0), a, lgK)
    },
    fd("approx_count_distinct_estimate",
      "_FUNC_(sketch) - distinct count from a serialized distinct-count sketch", Seq(1)) { args =>
      val (a, lgK) = DistinctParams.resolveDefault()
      ApproxCountDistinctEstimate(args(0), a, lgK)
    },
    // --- text pipeline ---------------------------------------------------
    fd("graft_simhash",
      "_FUNC_(text) - 64-bit SimHash fingerprint of the text as 16 hex chars", Seq(1)) { args =>
      SimHash64(args(0))
    },
    fd("graft_hamming_hex",
      "_FUNC_(a, b) - bitwise hamming distance between two hex fingerprints", Seq(2)) { args =>
      HammingHex(args(0), args(1))
    },
    fd("graft_dot",
      "_FUNC_(a, b) - dot product of two array<double> columns (primitive loop)", Seq(2)) { args =>
      DotProduct(args(0), args(1))
    },
    fd("graft_minhash",
      "_FUNC_(shingles, numHashes) - minhash signature (array<long>) of an " +
        "array<string> shingle set; one double-hash pass per shingle", Seq(2)) { args =>
      MinHashSignature(args(0), intLiteral("graft_minhash", "numHashes", args(1)))
    },
    fd("graft_winnow",
      "_FUNC_(text, k, w) - winnowing fingerprints (array<long>): rolling-hash " +
        "char k-grams, min per sliding window of w, deduplicated", Seq(3)) { args =>
      WinnowFingerprints(args(0),
        intLiteral("graft_winnow", "k", args(1)),
        intLiteral("graft_winnow", "w", args(2)))
    }
  )

  /** Require a foldable integer literal argument (mirrors the quantile
   *  functions' constant-literal validation). */
  private def intLiteral(fn: String, param: String, e: Expression): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"Function $fn requires $param to be a constant integer literal, got ${e.sql}")
  }

  /** Imperatively register all functions into a live session's registry. */
  def install(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    expressions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
