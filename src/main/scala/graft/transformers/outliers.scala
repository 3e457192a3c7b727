package graft.transformers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core._

/** Outlier handling (reference: src/transformers/outliers.rs, SURVEY §2.5). */

/** Caps at user-given bounds; either side optional
  * (reference: outliers.rs:164-213). Stateless. */
class ArbitraryOutlierCapper(
    val bounds: Map[String, (Option[Double], Option[Double])]
) extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    Validators.requireNumeric(df, bounds.keys.toSeq)
    bounds.foreach { case (c, (lo, hi)) =>
      for (l <- lo; h <- hi)
        Validators.requireParam(l <= h, s"Lower bound $l must be <= upper bound $h for '$c'")
    }
    Exprs.replaceInPlace(
      df,
      bounds.map { case (c, (lo, hi)) => c -> Exprs.capExpr(col(c), lo, hi) })
  }
}

/** Caps at learned lower/upper percentiles (reference: outliers.rs:216-300).
  * One quantile job covers every column and both tails. */
class Winsorizer(
    val columns: Seq[String],
    val lowerPercentile: Double = 0.05,
    val upperPercentile: Double = 0.95,
    val exact: Boolean = false,
) extends StatefulTransformer {
  var boundsLearned: Map[String, (Double, Double)] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(
      lowerPercentile >= 0.0 && lowerPercentile <= 1.0 &&
        upperPercentile >= 0.0 && upperPercentile <= 1.0,
      "Percentiles must be in [0, 1]")
    Validators.requireParam(
      lowerPercentile < upperPercentile,
      s"Lower percentile $lowerPercentile must be < upper $upperPercentile")
    Validators.requireNumeric(df, columns)
    val qs = Stats.quantiles(df, columns, Seq(lowerPercentile, upperPercentile), exact)
    boundsLearned = qs.map { case (c, v) => c -> (v(0), v(1)) }
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    Exprs.replaceInPlace(
      df,
      columns.map { c =>
        val (lo, hi) = boundsLearned(c)
        c -> Exprs.capExpr(col(c), Some(lo), Some(hi))
      }.toMap)
  }
}

/** Filters rows outside learned percentile bounds; NULL rows drop too
  * (comparison semantics — reference: outliers.rs:303-398). The predicate is
  * a plain conjunction, so it pushes down to the scan. */
class OutlierTrimmer(
    val columns: Seq[String],
    val lowerPercentile: Double = 0.05,
    val upperPercentile: Double = 0.95,
    val exact: Boolean = false,
) extends StatefulTransformer {
  var boundsLearned: Map[String, (Double, Double)] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(
      lowerPercentile >= 0.0 && lowerPercentile <= 1.0 &&
        upperPercentile >= 0.0 && upperPercentile <= 1.0,
      "Percentiles must be in [0, 1]")
    Validators.requireParam(
      lowerPercentile < upperPercentile,
      s"Lower percentile $lowerPercentile must be < upper $upperPercentile")
    Validators.requireNumeric(df, columns)
    val qs = Stats.quantiles(df, columns, Seq(lowerPercentile, upperPercentile), exact)
    boundsLearned = qs.map { case (c, v) => c -> (v(0), v(1)) }
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    val preds = columns.map { c =>
      val (lo, hi) = boundsLearned(c)
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }
    if (preds.isEmpty) df else df.filter(preds.reduce(_ && _))
  }
}
