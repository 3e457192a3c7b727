package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared expression builders (reference: SURVEY §2.1).
  *
  * Every transformer keeps non-target columns untouched and replaces target
  * columns in place under the same name via a full projection — the universal
  * reference idiom (src/transformers/imputation.rs:61-78). Catalyst's
  * CollapseProject merges stacked projections from chained transformers, so
  * an N-step pipeline still runs as a single fused pass.
  */
object Exprs {

  /** Full projection replacing selected columns in place, preserving schema
    * order (reference: src/transformers/imputation.rs:53-79). */
  def replaceInPlace(df: DataFrame, replacements: Map[String, Column]): DataFrame =
    df.select(df.columns.map { c =>
      replacements.get(c).map(_.as(c)).getOrElse(col(c))
    }.toSeq: _*)

  /** Append new named columns after the existing ones (feature-creation idiom,
    * reference: src/transformers/feature_creation.rs:44-50). */
  def appendColumns(df: DataFrame, newCols: Seq[(String, Column)]): DataFrame =
    df.select(df.columns.map(col).toSeq ++ newCols.map { case (n, e) => e.as(n) }: _*)

  /** Bin label with the reference's exact Rust `format!("[{:.2}, {:.2})")`
    * formatting (src/transformers/discretization.rs:267). */
  def binLabel(lo: Double, hi: Double): String = f"[$lo%.2f, $hi%.2f)"

  /** Interval CASE: half-open [lo, hi) for all bins except the last, which is
    * closed [lo, hi]; no match → NULL string
    * (reference: src/transformers/discretization.rs:45-68). */
  def intervalCase(c: Column, intervals: Seq[(Double, Double, String)]): Column = {
    val n = intervals.size
    val branches = intervals.zipWithIndex.map { case ((lo, hi, label), i) =>
      val cond =
        if (i == n - 1) c >= lit(lo) && c <= lit(hi)
        else c >= lit(lo) && c < lit(hi)
      (cond, lit(label))
    }
    branches
      .foldLeft(Option.empty[Column]) {
        case (None, (cond, v)) => Some(when(cond, v))
        case (Some(acc), (cond, v)) => Some(acc.when(cond, v))
      }
      .map(_.otherwise(lit(null: String)))
      .getOrElse(lit(null: String))
  }

  /** Cap at optional lower/upper bounds
    * (reference: src/transformers/outliers.rs:31-54). */
  def capExpr(c: Column, lower: Option[Double], upper: Option[Double]): Column = {
    val low = lower.map(l => when(c < lit(l), lit(l)))
    val both = (low, upper) match {
      case (Some(w), Some(u)) => w.when(c > lit(u), lit(u))
      case (Some(w), None) => w
      case (None, Some(u)) => when(c > lit(u), lit(u))
      case (None, None) => return c
    }
    both.otherwise(c)
  }

  /** Literal dictionary CASE: `WHEN c = 'cat' THEN v … ELSE default`
    * (reference: src/transformers/categorical.rs:73-92). Caller is
    * responsible for switching to a broadcast-join above a cardinality
    * threshold (SURVEY §7.4 item 7).
    */
  def dictCase[V](c: Column, mapping: Seq[(String, V)], default: Column): Column =
    mapping
      .foldLeft(Option.empty[Column]) {
        case (None, (k, v)) => Some(when(c === lit(k), lit(v)))
        case (Some(acc), (k, v)) => Some(acc.when(c === lit(k), lit(v)))
      }
      .map(_.otherwise(default))
      .getOrElse(default)

  /** One-hot column-name sanitizer: non-alphanumeric → '_'
    * (reference: src/transformers/categorical.rs:65-67). */
  def sanitizeCategory(cat: String): String =
    cat.map(ch => if (ch.isLetterOrDigit) ch else '_')
}
