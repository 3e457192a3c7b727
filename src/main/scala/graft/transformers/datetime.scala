package graft.transformers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core._
import graft.errors.FeatureFactoryException._

/** Datetime features (reference: src/transformers/datetime.rs, SURVEY §2.8).
  * Both stateless, both append columns. */

/** Appends `_year/_month/_day/_hour/_minute/_second/_weekday` per datetime
  * column (reference: datetime.rs:39-102).
  *
  * Weekday parity: the reference uses Postgres `dow` (0=Sunday..6=Saturday,
  * datetime.rs:83-85); Spark's `dayofweek` is 1=Sunday..7, so we emit
  * `dayofweek(c) - 1`.
  */
class DatetimeFeatures(val columns: Seq[String]) extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    Validators.requireDatetime(df, columns)
    Exprs.appendColumns(
      df,
      columns.flatMap { c =>
        Seq(
          s"${c}_year" -> year(col(c)),
          s"${c}_month" -> month(col(c)),
          s"${c}_day" -> dayofmonth(col(c)),
          s"${c}_hour" -> hour(col(c)),
          s"${c}_minute" -> minute(col(c)),
          s"${c}_second" -> second(col(c)),
          s"${c}_weekday" -> (dayofweek(col(c)) - lit(1)),
        )
      })
  }
}

object TimeUnit extends Enumeration {
  val Second, Minute, Hour, Day = Value
  def divisor(u: Value): Double = u match {
    case Second => 1.0
    case Minute => 60.0
    case Hour => 3600.0
    case Day => 86400.0
  }
}

/** Appends fractional datetime differences `(left - right)` in the given
  * unit: epoch-second difference then float division
  * (reference: datetime.rs:105-137 — `to_unixtime` truncates sub-second
  * precision, as does Spark's `unix_timestamp`; behaviors match). */
class DatetimeSubtraction(
    val features: Seq[(String, String, String, TimeUnit.Value)] // (new, left, right, unit)
) extends Transformer {
  override def fit(df: DataFrame): this.type = this

  override def transform(df: DataFrame): DataFrame = {
    val needed = features.flatMap { case (_, l, r, _) => Seq(l, r) }.distinct
    Validators.requireDatetime(df, needed)
    Exprs.appendColumns(
      df,
      features.map { case (name, l, r, unit) =>
        name -> ((unix_timestamp(col(l)) - unix_timestamp(col(r))).cast("double") /
          lit(TimeUnit.divisor(unit)))
      })
  }

  locally {
    features.foreach { case (name, _, _, _) =>
      if (name.isEmpty) throw InvalidParameter("Feature name must not be empty")
    }
  }
}
