package graft.transformers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Feature creation (reference: src/transformers/feature_creation.rs, SURVEY §2.7).
  * All stateless, all APPEND new named columns. */

/** Appends arbitrary user-supplied (name, Column) expressions — the
  * reference's entire "UDF surface": users pass engine-native expressions,
  * never lambdas (reference: feature_creation.rs:23-56). */
class MathFeatures(val features: Seq[(String, Column)]) extends Transformer {
  features.foreach { case (name, _) =>
    Validators.requireParam(name.nonEmpty, "Feature name must not be empty")
  }
  override def fit(df: DataFrame): this.type = this
  override def transform(df: DataFrame): DataFrame = Exprs.appendColumns(df, features)
}

object RelativeOp extends Enumeration {
  val Ratio, Difference, PercentChange = Value
}

/** Appends target-vs-reference arithmetic: ratio t/r, difference t−r,
  * percent change (t−r)/r (reference: feature_creation.rs:68-128). */
class RelativeFeatures(
    val features: Seq[(String, String, String, RelativeOp.Value)] // (new, target, ref, op)
) extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    val needed = features.flatMap { case (_, t, r, _) => Seq(t, r) }.distinct
    Validators.requireNumeric(df, needed)
    Exprs.appendColumns(
      df,
      features.map { case (name, t, r, op) =>
        val (tc, rc) = (col(t).cast("double"), col(r).cast("double"))
        name -> (op match {
          case RelativeOp.Ratio => tc / rc
          case RelativeOp.Difference => tc - rc
          case RelativeOp.PercentChange => (tc - rc) / rc
        })
      })
  }
}

object CyclicalFn extends Enumeration { val Sin, Cos = Value }

/** Appends sin/cos(2πx / period) (reference: feature_creation.rs:139-202). */
class CyclicalFeatures(
    val features: Seq[(String, String, Double, CyclicalFn.Value)] // (new, src, period, fn)
) extends Transformer {
  features.foreach { case (_, src, period, _) =>
    Validators.requireParam(period > 0.0, s"Period for '$src' must be positive, got $period")
  }
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    Validators.requireNumeric(df, features.map(_._2).distinct)
    Exprs.appendColumns(
      df,
      features.map { case (name, src, period, fn) =>
        val angle = lit(2.0 * math.Pi) * col(src).cast("double") / lit(period)
        name -> (fn match {
          case CyclicalFn.Sin => sin(angle)
          case CyclicalFn.Cos => cos(angle)
        })
      })
  }
}
