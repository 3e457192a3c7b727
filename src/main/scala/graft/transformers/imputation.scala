package graft.transformers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core._
import graft.errors.FeatureFactoryException._

/** Imputation transformers (reference: src/transformers/imputation.rs, SURVEY §2.2). */

/** Replaces nulls with the per-column mean or median
  * (reference: imputation.rs:82-160).
  *
  * The reference's Median strategy is `NotImplemented` (imputation.rs:134-138);
  * we implement it as a documented extension via exact/approx percentile.
  */
class MeanMedianImputer(
    val columns: Seq[String],
    val strategy: String = "mean",
    val exact: Boolean = false,
) extends StatefulTransformer {
  var imputeValues: Map[String, Double] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(
      strategy == "mean" || strategy == "median",
      s"strategy must be 'mean' or 'median', got '$strategy'")
    Validators.requireNumeric(df, columns)
    imputeValues = strategy match {
      case "mean" => Stats.means(df, columns)
      case "median" =>
        Stats.quantiles(df, columns, Seq(0.5), exact).map { case (c, v) => c -> v.head }
    }
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    Exprs.replaceInPlace(df, columns.map(c => c -> coalesce(col(c), lit(imputeValues(c)))).toMap)
  }
}

/** Replaces nulls with a user-given finite number
  * (reference: imputation.rs:163-194). Stateless. */
class ArbitraryNumberImputer(val columns: Seq[String], val number: Double)
    extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    Validators.requireParam(
      java.lang.Double.isFinite(number),
      s"Imputation number must be finite, got $number")
    Validators.requireNumeric(df, columns)
    Exprs.replaceInPlace(df, columns.map(c => c -> coalesce(col(c), lit(number))).toMap)
  }
}

/** Replaces nulls with a learned tail percentile (reference: imputation.rs:197-270).
  * All columns' percentiles come from ONE job (the reference runs one per column). */
class EndTailImputer(
    val columns: Seq[String],
    val percentile: Double = 0.75,
    val exact: Boolean = false,
) extends StatefulTransformer {
  var imputeValues: Map[String, Double] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(
      percentile >= 0.0 && percentile <= 1.0,
      s"Percentile $percentile must be in [0, 1]")
    Validators.requireNumeric(df, columns)
    imputeValues =
      Stats.quantiles(df, columns, Seq(percentile), exact).map { case (c, v) => c -> v.head }
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    Exprs.replaceInPlace(df, columns.map(c => c -> coalesce(col(c), lit(imputeValues(c)))).toMap)
  }
}

/** Replaces nulls in string columns with a user default or the learned mode
  * (reference: imputation.rs:273-348). Mode ties break to the smallest value
  * for determinism. */
class CategoricalImputer(val columns: Seq[String], val default: Option[String] = None)
    extends StatefulTransformer {
  var imputeValues: Map[String, String] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireString(df, columns)
    imputeValues = default match {
      case Some(d) => columns.map(_ -> d).toMap
      case None =>
        // every column's mode from ONE melt+count job (not one per column);
        // ties break to the smallest value, matching Stats.stringMode
        val counts = Stats.groupedBy(df, columns, Seq(count(lit(1)).as("cnt")))
        columns.map { c =>
          val rows = counts(c)
          if (rows.isEmpty)
            throw InvalidParameter(s"Column '$c' has no non-null values; cannot learn a mode")
          c -> rows.minBy(r => (-r.getLong(2), r.getString(1))).getString(1)
        }.toMap
    }
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    Exprs.replaceInPlace(df, columns.map(c => c -> coalesce(col(c), lit(imputeValues(c)))).toMap)
  }
}

/** Appends a boolean `<col><suffix>` null-indicator per target column
  * (reference: imputation.rs:351-391). Stateless. */
class AddMissingIndicator(val columns: Seq[String], val suffix: String = "_missing")
    extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    Validators.requireColumns(df, columns)
    Exprs.appendColumns(df, columns.map(c => s"$c$suffix" -> col(c).isNull))
  }
}

/** Drops rows with nulls in the given columns (all columns when empty)
  * (reference: imputation.rs:394-449). Stateless; the filter is a plain
  * Catalyst predicate, so it pushes down to the parquet scan.
  *
  * Deliberately NOT `df.na.drop`: that also drops NaN in double/float
  * columns, while the reference filters on `is_not_null()` only
  * (imputation.rs:417-437) — NaN rows must survive. */
class DropMissingData(val columns: Seq[String] = Seq.empty) extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    val target = if (columns.isEmpty) df.columns.toSeq else columns
    Validators.requireColumns(df, target)
    df.filter(target.map(c => col(c).isNotNull).reduce(_ && _))
  }
}
