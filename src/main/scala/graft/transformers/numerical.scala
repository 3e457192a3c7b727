package graft.transformers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Numerical transforms (reference: src/transformers/numerical.rs, SURVEY §2.6).
  *
  * All stateless, all replace in place. The reference runs eager
  * data-dependent validation INSIDE transform (block_on(compute_min/max),
  * numerical.rs:136 etc.); we keep that failure timing but batch all columns'
  * min/max into ONE aggregate job instead of one per column per side.
  */
abstract class NumericalTransformer(columns: Seq[String]) extends Transformer {
  protected def expr(c: Column): Column
  /** (needsMin, needsMax) → validate(col, min, max); default no-op. */
  protected def validate(c: String, lo: Double, hi: Double): Unit = ()
  protected def needsValidation: Boolean = true

  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    Validators.requireNumeric(df, columns)
    if (needsValidation) {
      val mm = Stats.minMax(df, columns)
      columns.foreach { c => val (lo, hi) = mm(c); validate(c, lo, hi) }
    }
    Exprs.replaceInPlace(df, columns.map(c => c -> expr(col(c).cast("double"))).toMap)
  }
}

/** ln(x); requires min > 0 (reference: numerical.rs:109-168). */
class LogTransformer(val columns: Seq[String]) extends NumericalTransformer(columns) {
  protected def expr(c: Column): Column = log(c)
  override protected def validate(col: String, lo: Double, hi: Double): Unit =
    Validators.requireParam(lo > 0.0, s"Column '$col' must be strictly positive for log (min=$lo)")
}

/** ln(x + C); requires min + C > 0 (reference: numerical.rs:172-231). */
class LogCpTransformer(val columns: Seq[String], val c: Double)
    extends NumericalTransformer(columns) {
  protected def expr(e: Column): Column = log(e + lit(c))
  override protected def validate(col: String, lo: Double, hi: Double): Unit =
    Validators.requireParam(
      lo + c > 0.0,
      s"Column '$col' min + C must be positive for log (min=$lo, C=$c)")
}

/** 1/x; the value range must not straddle zero (reference: numerical.rs:235-294). */
class ReciprocalTransformer(val columns: Seq[String])
    extends NumericalTransformer(columns) {
  protected def expr(c: Column): Column = lit(1.0) / c
  override protected def validate(col: String, lo: Double, hi: Double): Unit =
    Validators.requireParam(
      !(lo <= 0.0 && hi >= 0.0),
      s"Column '$col' range [$lo, $hi] must not contain zero for reciprocal")
}

/** x^p; only existence validated (reference: numerical.rs:297-343). */
class PowerTransformer(val columns: Seq[String], val power: Double)
    extends NumericalTransformer(columns) {
  protected def expr(c: Column): Column = pow(c, lit(power))
  override protected def needsValidation: Boolean = false
}

/** Box-Cox with user-supplied λ (NOT estimated): (x^λ − 1)/λ, or ln(x) when
  * |λ| ≤ 1e-6; requires min > 0 (reference: numerical.rs:348-414). */
class BoxCoxTransformer(val columns: Seq[String], val lambda: Double)
    extends NumericalTransformer(columns) {
  protected def expr(c: Column): Column =
    if (math.abs(lambda) > 1e-6) (pow(c, lit(lambda)) - lit(1.0)) / lit(lambda)
    else log(c)
  override protected def validate(col: String, lo: Double, hi: Double): Unit =
    Validators.requireParam(
      lo > 0.0,
      s"Column '$col' must be strictly positive for Box-Cox (min=$lo)")
}

/** Yeo-Johnson with user-supplied λ (reference: numerical.rs:419-488). */
class YeoJohnsonTransformer(val columns: Seq[String], val lambda: Double)
    extends NumericalTransformer(columns) {
  protected def expr(c: Column): Column = {
    val pos =
      if (math.abs(lambda) > 1e-6) (pow(c + lit(1.0), lit(lambda)) - lit(1.0)) / lit(lambda)
      else log(c + lit(1.0))
    val neg =
      if (math.abs(lambda - 2.0) > 1e-6)
        -(pow(lit(1.0) - c, lit(2.0 - lambda)) - lit(1.0)) / lit(2.0 - lambda)
      else -log(lit(1.0) - c)
    when(c >= lit(0.0), pos).otherwise(neg)
  }
  override protected def needsValidation: Boolean = false
}

/** asin(sqrt(x)); requires 0 ≤ x ≤ 1 (reference: numerical.rs:492-551). */
class ArcsinTransformer(val columns: Seq[String]) extends NumericalTransformer(columns) {
  protected def expr(c: Column): Column = asin(sqrt(c))
  override protected def validate(col: String, lo: Double, hi: Double): Unit =
    Validators.requireParam(
      lo >= 0.0 && hi <= 1.0,
      s"Column '$col' values must be within [0, 1] for arcsin (range [$lo, $hi])")
}
