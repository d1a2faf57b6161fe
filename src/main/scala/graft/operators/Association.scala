package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket association rules over (basket, item) pairs — the
 * classic co-occurrence miner, which in a training-data pipeline powers
 * "documents citing X also cite Y" link suggestions and template
 * detection (a rule with near-1.0 confidence between unrelated tokens
 * is boilerplate). Restricted to 2-itemset rules a→b: exactly the
 * support/confidence/lift core of Apriori, without the exponential
 * candidate lattice nobody mines at 100 TB anyway.
 *
 * All scores are integer fixed point (1e4): support = P(a,b),
 * confidence = P(b|a), lift = P(a,b)/(P(a)P(b)) — computed with DIV
 * over exact counts, so ranking and ties replay identically in any
 * engine.
 *
 * Scale shape: one distinct (basket, item) pass feeds item counts AND
 * the pair self-join; pairs group with map-side combine; item counts
 * broadcast back (items << baskets); `minPairCount` prunes the rule
 * stream before scoring. The basket self-join is the one superlinear
 * stage — its cost is Σ C(basket_size, 2), bounded by basket size, not
 * corpus size.
 */
object Association {

  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long,
      topN: Int): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct().cache()
    val nBaskets = broadcast(bi.agg(countDistinct(col("b")).as("n_baskets")))
    val itemCnt = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("c"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= minPairCount)
    // each unordered pair yields BOTH rules a→b and b→a (same support
    // and lift, different confidence)
    val rules = pairs.select(col("a").as("ant"), col("c").as("cons"), col("w"))
      .unionAll(pairs.select(col("c").as("ant"), col("a").as("cons"), col("w")))
    rules
      .join(broadcast(itemCnt.select(col("i").as("ant"), col("n_i").as("n_ant"))), Seq("ant"))
      .join(broadcast(itemCnt.select(col("i").as("cons"), col("n_i").as("n_cons"))), Seq("cons"))
      .crossJoin(nBaskets)
      .select(
        col("ant"), col("cons"), col("w"),
        expr("(w * 10000L) DIV n_baskets").as("support_fp"),
        expr("(w * 10000L) DIV n_ant").as("confidence_fp"),
        expr("(w * n_baskets * 10000L) DIV (n_ant * n_cons)").as("lift_fp"))
      .orderBy(col("confidence_fp").desc, col("lift_fp").desc,
        col("ant"), col("cons"))
      .limit(topN)
  }
}
