/**
 * Automatic summary-table rewrite for sketch aggregates.
 *
 * The accumulate/combine/estimate lifecycle lets users materialize
 * per-bucket sketches once and answer arbitrary-subset queries later —
 * but in the reference this pre-aggregation is entirely manual
 * (SURVEY.md §4: "the engine itself performs no automatic query rewrite").
 * This rule closes that gap: register a summary table for a base table,
 * and one-shot sketch aggregates over the base are rewritten to
 * combine+estimate over the (much smaller) summary whenever the query's
 * grouping is a coarsening of the summary's keys — the sketch-native
 * analogue of materialized-view rewriting.
 *
 * Opt-in via `spark.sql.graft.summaryRewrite.enabled` (results are
 * approximate either way, but the merge tree differs, so estimates may
 * differ within the sketch's error bounds — same caveat as any
 * materialized sketch rollup). The rewrite only fires when the one-shot's
 * frozen sketch parameters match the summary's, and when the value
 * column's hash domain matches what `_accumulate` stored (STRING for
 * distinct-count, any numeric narrowed to float for quantiles).
 */
package org.apache.spark.sql.graft

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DoubleType, StringType}

/** What a registered summary provides for one base table. */
case class SummarySpec(
    basePath: String,
    keyCols: Seq[String],
    valueCol: String,
    sketchCol: String,
    kind: String, // "distinct" | "quantile"
    algoName: String,
    param: Int,
    summaryPlan: LogicalPlan)

object SummaryCatalog {
  private val specs = new ConcurrentHashMap[String, SummarySpec]()

  val ENABLED_KEY = "spark.sql.graft.summaryRewrite.enabled"

  /**
   * Register `summary` (keys + one sketch column built by `*_accumulate`
   * over `valueCol` of the base parquet table at `basePath`) for rewriting.
   * Sketch algorithm/parameters are captured from the current session conf,
   * matching what `_accumulate` froze into the summary.
   */
  def registerDistinctSummary(
      basePath: String,
      summary: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      sketchCol: String): Unit = {
    val (algo, lgK) = DistinctParams.resolveDefault()
    val plan = summary.queryExecution.analyzed
    specs.put(normalize(basePath),
      SummarySpec(normalize(basePath), keyCols, valueCol, sketchCol, "distinct", algo, lgK, plan))
  }

  def registerQuantileSummary(
      basePath: String,
      summary: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      sketchCol: String): Unit = {
    val (algo, k) = QuantileParams.resolveDefault()
    val plan = summary.queryExecution.analyzed
    specs.put(normalize(basePath),
      SummarySpec(normalize(basePath), keyCols, valueCol, sketchCol, "quantile", algo, k, plan))
  }

  def unregister(basePath: String): Unit = specs.remove(normalize(basePath))
  def clear(): Unit = specs.clear()
  def get(path: String): Option[SummarySpec] = Option(specs.get(normalize(path)))
  def isEmpty: Boolean = specs.isEmpty

  private def normalize(p: String): String = p.stripSuffix("/").replaceFirst("^file:", "")
}

case class SummaryRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SummaryCatalog.isEmpty ||
      !spark.conf.get(SummaryCatalog.ENABLED_KEY, "false").toBoolean) {
      return plan
    }
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        tryRewrite(agg, groupings, aggExprs, child).getOrElse(agg)
    }
  }

  /** Strip attribute-only Projects / key-only Filters down to the base relation. */
  private def findBase(plan: LogicalPlan): Option[(SummarySpec, Option[Expression])] =
    plan match {
      case LogicalRelation(rel: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        rel.location.rootPaths.headOption
          .flatMap(p => SummaryCatalog.get(p.toString))
          .map(s => (s, None))
      case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        findBase(child)
      case Filter(cond, child) =>
        findBase(child).flatMap { case (s, existing) =>
          // only key-referencing filters can move onto the summary
          if (cond.references.forall(a => s.keyCols.contains(a.name)) && existing.isEmpty) {
            Some((s, Some(cond)))
          } else None
        }
      case _ => None
    }

  private def tryRewrite(
      agg: Aggregate,
      groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val based = findBase(child)
    if (based.isEmpty) return None
    val (spec, filterCond) = based.get

    // groupings must be plain key attributes (a coarsening of the summary keys)
    val groupAttrs = groupings.map {
      case a: AttributeReference if spec.keyCols.contains(a.name) => a
      case _ => return None
    }

    val summaryOut = spec.summaryPlan.output
    def summaryAttr(name: String): Option[Attribute] = summaryOut.find(_.name == name)
    val sketchAttr = summaryAttr(spec.sketchCol).getOrElse(return None)

    // every output is either a group key or a rewritable one-shot sketch agg
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if spec.keyCols.contains(a.name) =>
        val repl = summaryAttr(a.name).getOrElse(return None)
        Alias(repl, a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(fn, Complete, false, _, _), name) =>
        val rewritten = rewriteFunction(fn, spec, sketchAttr).getOrElse(return None)
        Alias(rewritten, name)(exprId = al.exprId)
      case _ => return None
    }

    val newGroupings = groupAttrs.map(a => summaryAttr(a.name).getOrElse(return None))
    val filtered = filterCond match {
      case Some(cond) =>
        val remapped = cond.transform {
          case a: AttributeReference => summaryAttr(a.name).getOrElse(return None)
        }
        Filter(remapped, spec.summaryPlan)
      case None => spec.summaryPlan
    }
    logInfo(s"graft summary rewrite: aggregate over ${spec.basePath} now reads the " +
      s"registered ${spec.kind} summary")
    Some(Aggregate(newGroupings, newAggExprs, filtered, None))
  }

  /** One-shot agg -> estimate(combine(sketch)), iff params + domain line up. */
  private def rewriteFunction(
      fn: Expression,
      spec: SummarySpec,
      sketchAttr: Attribute): Option[Expression] = fn match {
    case ApproxCountDistinctAgg(childAttr: AttributeReference, algo, lgK, _, _, _)
        if spec.kind == "distinct" && childAttr.name == spec.valueCol &&
          childAttr.dataType == StringType &&
          algo == spec.algoName && lgK == spec.param =>
      val combine = AggregateExpression(
        ApproxCountDistinctCombine(sketchAttr, algo, lgK), Complete, isDistinct = false)
      Some(ApproxCountDistinctEstimate(combine, algo, lgK))
    case ApproxPercentileAgg(childAttr: AttributeReference, pct, algo, k, _, _, _)
        if spec.kind == "quantile" && childAttr.name == spec.valueCol &&
          childAttr.dataType == DoubleType && // estimate returns double: domains align
          algo == spec.algoName && k == spec.param =>
      val combine = AggregateExpression(
        ApproxPercentileCombine(sketchAttr, algo, k), Complete, isDistinct = false)
      Some(ApproxPercentileEstimate(combine, pct, algo, k))
    case _ => None
  }
}
