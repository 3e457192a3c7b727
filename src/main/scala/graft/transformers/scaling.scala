package graft.transformers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Feature scaling (extension beyond the reference surface — Feature-engine
  * delegates scaling to scikit-learn, so the reference has no scalers; any
  * user switching from it needs these for the same pipelines).
  *
  * Conventions follow scikit-learn: StandardScaler uses the POPULATION
  * standard deviation (ddof=0) and maps zero-variance columns with scale 1
  * (values become exactly 0 after centering); MinMaxScaler maps
  * zero-range columns to 0. Both fit with ONE aggregate job for all
  * columns; transforms are in-place single projections. */
private[transformers] object ScalingUtil {
  def fitStats(
      df: DataFrame, columns: Seq[String],
      lo: String => Column, hi: String => Column): Map[String, (Double, Double)] = {
    Validators.requireNumeric(df, columns)
    val aggs = columns.flatMap(c => Seq(lo(c), hi(c)))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    columns.zipWithIndex.map { case (c, i) =>
      val a = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val b = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      c -> (a, b)
    }.toMap
  }

  def applyInPlace(
      df: DataFrame, columns: Set[String], f: String => Column): DataFrame =
    df.select(df.columns.map(c => if (columns(c)) f(c).as(c) else col(c)).toSeq: _*)
}

/** z = (x − μ) / σ_pop; σ = 0 → scale 1 (sklearn convention). */
class StandardScaler(val columns: Seq[String]) extends StatefulTransformer {
  var stats: Map[String, (Double, Double)] = Map.empty // col -> (mean, std_pop)

  override def fit(df: DataFrame): this.type = {
    stats = ScalingUtil.fitStats(df, columns,
      c => avg(col(c).cast("double")), c => stddev_pop(col(c).cast("double")))
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    ScalingUtil.applyInPlace(df, columns.toSet, { c =>
      val (mean, std) = stats(c)
      val scale = if (std == 0.0) 1.0 else std
      (col(c).cast("double") - lit(mean)) / lit(scale)
    })
  }
}

/** x' = (x − median) / IQR (q75 − q25); zero IQR → scale 1 (sklearn
  * convention) — the outlier-robust scaler. Quantiles via [[Stats.quantiles]]
  * (one job for all columns; `exact = true` matches DuckDB quantile_cont for
  * oracle parity, approximate by default for scale). */
class RobustScaler(val columns: Seq[String], val exact: Boolean = false)
    extends StatefulTransformer {
  var stats: Map[String, (Double, Double, Double)] = Map.empty // (q25, median, q75)

  override def fit(df: DataFrame): this.type = {
    Validators.requireNumeric(df, columns)
    stats = Stats.quantiles(df, columns, Seq(0.25, 0.5, 0.75), exact)
      .map { case (c, qs) => c -> (qs(0), qs(1), qs(2)) }
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    ScalingUtil.applyInPlace(df, columns.toSet, { c =>
      val (q25, med, q75) = stats(c)
      val iqr = q75 - q25
      val scale = if (iqr == 0.0) 1.0 else iqr
      (col(c).cast("double") - lit(med)) / lit(scale)
    })
  }
}

/** x' = (x − min) / (max − min); zero range → 0 (sklearn convention). */
class MinMaxScaler(val columns: Seq[String]) extends StatefulTransformer {
  var stats: Map[String, (Double, Double)] = Map.empty // col -> (min, max)

  override def fit(df: DataFrame): this.type = {
    stats = ScalingUtil.fitStats(df, columns,
      c => min(col(c).cast("double")).cast("double"),
      c => max(col(c).cast("double")).cast("double"))
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    ScalingUtil.applyInPlace(df, columns.toSet, { c =>
      val (lo, hi) = stats(c)
      val range = hi - lo
      if (range == 0.0) lit(0.0)
      else (col(c).cast("double") - lit(lo)) / lit(range)
    })
  }
}
