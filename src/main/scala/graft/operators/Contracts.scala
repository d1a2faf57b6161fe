package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-contract validation: the admission gate a training
 * corpus runs before a snapshot is allowed into the pipeline (null-free
 * keys, unique ids, in-range monetary values, enum domains, referential
 * integrity against dimension tables). One call validates a whole rule
 * set and returns an auditable per-rule report instead of scattering
 * ad-hoc `count(CASE WHEN ...)` queries across jobs.
 *
 * Scale shape: every row-level rule folds into ONE aggregate over a
 * single scan of `df` (Catalyst plans a single partial+final agg —
 * adding a rule adds a sum, not a pass). `Unique` adds one hash
 * aggregate on its key columns; `InDim` adds one left-anti join whose
 * dimension side is `select(key).distinct` — broadcast-sized for real
 * dimension tables. No collects; the report is itself a DataFrame.
 */
object Contracts {

  /** One contract rule; `name` keys the report row. */
  sealed trait Rule { def name: String }

  /** `col` must never be null. */
  final case class NotNull(col: String) extends Rule {
    def name: String = s"not_null:$col"
  }

  /** Non-null values of `col` must lie in [lo, hi]. Pair with [[NotNull]]
   *  when nulls should also fail — range and presence are distinct
   *  contract clauses with distinct owners. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name: String = s"in_range:$col"
  }

  /** Non-null values of `col` must match `regex` (full-string anchor is
   *  the caller's choice — the pattern is passed to `rlike` verbatim). */
  final case class Matches(col: String, regex: String) extends Rule {
    def name: String = s"matches:$col"
  }

  /** Non-null values of `col` must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name: String = s"in_set:$col"
  }

  /** The tuple `cols` must be unique across `df`; violations = number of
   *  EXTRA rows (a key seen 3 times contributes 2). */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name: String = s"unique:${cols.mkString(",")}"
  }

  /** Non-null values of `col` must exist in `dim.dimCol` (referential
   *  integrity; the orphan count is the violation count). */
  final case class InDim(col: String, dim: DataFrame, dimCol: String) extends Rule {
    def name: String = s"in_dim:$col"
  }

  private def rowPredicate(r: Rule): Option[Column] = r match {
    case NotNull(c) => Some(col(c).isNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNotNull && (col(c) < lit(lo) || col(c) > lit(hi)))
    case Matches(c, re) => Some(col(c).isNotNull && !col(c).rlike(re))
    case InSet(c, vs) => Some(col(c).isNotNull && !col(c).isin(vs: _*))
    case _ => None
  }

  /**
   * Validate `rules` against `df`. Returns one row per rule:
   * (rule, violations, n_rows, pass) ordered by rule name — counts are
   * exact longs, so the report is byte-stable across engines and
   * retries (the property a contract gate signs off on).
   */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Contracts.check: empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      s"Contracts.check: duplicate rule names in ${rules.map(_.name)}")
    val rowRules = rules.flatMap(r => rowPredicate(r).map(p => (r.name, p)))
    // one scan: n_rows + every row-level violation count in a single agg
    val aggCols = count(lit(1)).as("n_rows") +:
      rowRules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"v$i")
      }
    // the single agg row is collected to driver literals: every rule's
    // report line and the n_rows column become constants, so the report
    // assembly below adds zero extra scans (and no lingering cache)
    val one = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val nRows = one.getLong(0)
    val spark = df.sparkSession
    def oneRowDf(name: String, violations: Long): DataFrame =
      spark.range(1).select(lit(name).as("rule"), lit(violations).as("violations"))
    val rowReport = rowRules.zipWithIndex.map { case ((name, _), i) =>
      oneRowDf(name, if (one.isNullAt(i + 1)) 0L else one.getLong(i + 1))
    }
    val otherReport = rules.collect {
      case u @ Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(col("c") - lit(1L)), lit(0L)).as("violations"))
          .select(lit(u.name).as("rule"), col("violations"))
      case r @ InDim(c, dim, dimCol) =>
        df.select(col(c).as("k")).where(col("k").isNotNull)
          .join(dim.select(col(dimCol).as("k")).distinct(), Seq("k"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
    }
    (rowReport ++ otherReport)
      .reduce(_.unionAll(_))
      .select(col("rule"), col("violations"), lit(nRows).as("n_rows"),
        (col("violations") === 0L).as("pass"))
      .orderBy("rule")
  }
}
