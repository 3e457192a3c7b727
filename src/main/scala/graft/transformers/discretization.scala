package graft.transformers

import org.apache.spark.sql.DataFrame
import graft.core._
import graft.errors.FeatureFactoryException._

/** Discretizers (reference: src/transformers/discretization.rs, SURVEY §2.4).
  *
  * All emit STRING bin labels formatted exactly like the reference's Rust
  * `format!("[{:.2}, {:.2})")` (discretization.rs:267); bins are half-open
  * [lo, hi) except the last, which is closed [lo, hi]; out-of-range → NULL.
  */

/** User-supplied (lower, upper, label) intervals (reference:
  * discretization.rs:160-198). Stateless. */
class ArbitraryDiscretizer(val intervals: Map[String, Seq[(Double, Double, String)]])
    extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    intervals.foreach { case (c, ivs) =>
      ivs.foreach { case (lo, hi, _) =>
        Validators.requireParam(lo < hi, s"Interval lower $lo must be < upper $hi for '$c'")
      }
    }
    Validators.requireNumeric(df, intervals.keys.toSeq)
    Exprs.replaceInPlace(
      df,
      intervals.map { case (c, ivs) => c -> Exprs.intervalCase(df(c), ivs) })
  }
}

/** Quantile (equal-frequency) bins (reference: discretization.rs:201-289).
  *
  * The reference runs bins+1 separate approx-percentile jobs PER COLUMN
  * (:227-253); we compute every boundary for every column in one job
  * (approxQuantile batched, or one exact-percentile agg when exact=true).
  */
class EqualFrequencyDiscretizer(
    val columns: Seq[String],
    val bins: Int,
    val exact: Boolean = false,
) extends StatefulTransformer {
  var mapping: Map[String, Seq[(Double, Double, String)]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(bins >= 1, s"bins must be >= 1, got $bins")
    Validators.requireNumeric(df, columns)
    val probs = (0 to bins).map(_.toDouble / bins)
    val qs = Stats.quantiles(df, columns, probs, exact)
    mapping = columns.map { c =>
      val boundaries = qs(c)
      Validators.requireParam(
        math.abs(boundaries.head - boundaries.last) >= 1e-6,
        s"Column $c appears to be constant; cannot discretize into equal-frequency bins")
      c -> boundaries.sliding(2).map { pair =>
        (pair(0), pair(1), Exprs.binLabel(pair(0), pair(1)))
      }.toSeq
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    Exprs.replaceInPlace(df, mapping.map { case (c, ivs) => c -> Exprs.intervalCase(df(c), ivs) })
  }
}

/** Equal-width bins from exact min/max (reference: discretization.rs:292-356;
  * its approx-min/max twin jobs become one exact agg — strictly better). */
class EqualWidthDiscretizer(val columns: Seq[String], val bins: Int)
    extends StatefulTransformer {
  var mapping: Map[String, Seq[(Double, Double, String)]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(bins >= 1, s"bins must be >= 1, got $bins")
    Validators.requireNumeric(df, columns)
    val mm = Stats.minMax(df, columns)
    mapping = columns.map { c =>
      val (lo, hi) = mm(c)
      Validators.requireParam(
        math.abs(hi - lo) >= 1e-6,
        s"Column $c appears to be constant; cannot discretize into equal-width bins")
      val width = (hi - lo) / bins
      c -> (0 until bins).map { i =>
        val l = lo + i * width
        val u = if (i == bins - 1) hi else lo + (i + 1) * width
        (l, u, Exprs.binLabel(l, u))
      }
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    Exprs.replaceInPlace(df, mapping.map { case (c, ivs) => c -> Exprs.intervalCase(df(c), ivs) })
  }
}

/** Geometric-progression bins; requires min > 0
  * (reference: discretization.rs:359-426). */
class GeometricWidthDiscretizer(val columns: Seq[String], val bins: Int)
    extends StatefulTransformer {
  var mapping: Map[String, Seq[(Double, Double, String)]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(bins >= 1, s"bins must be >= 1, got $bins")
    Validators.requireNumeric(df, columns)
    val mm = Stats.minMax(df, columns)
    mapping = columns.map { c =>
      val (lo, hi) = mm(c)
      Validators.requireParam(
        lo > 0.0,
        s"Column $c must be strictly positive for geometric binning (min = $lo)")
      Validators.requireParam(
        math.abs(hi - lo) >= 1e-6,
        s"Column $c appears to be constant; cannot discretize into geometric bins")
      val ratio = math.pow(hi / lo, 1.0 / bins)
      c -> (0 until bins).map { i =>
        val l = lo * math.pow(ratio, i)
        val u = if (i == bins - 1) hi else lo * math.pow(ratio, i + 1)
        (l, u, Exprs.binLabel(l, u))
      }
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    Exprs.replaceInPlace(df, mapping.map { case (c, ivs) => c -> Exprs.intervalCase(df(c), ivs) })
  }
}
