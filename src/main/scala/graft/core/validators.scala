package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.errors.FeatureFactoryException._

/** Schema validators (reference: src/transformers/imputation.rs:27-38,
  * categorical.rs:27-61, discretization.rs:24-36, datetime.rs:22-33).
  *
  * The reference's "numeric" means exactly Float64/Int64; we relax to all
  * Spark NumericType (documented deviation, SURVEY §1) — the reference types
  * remain a strict subset.
  */
object Validators {

  def requireColumns(df: DataFrame, cols: Seq[String]): Unit = {
    val have = df.columns.toSet
    val missing = cols.filterNot(have)
    if (missing.nonEmpty)
      throw MissingColumn(s"Missing column(s): ${missing.mkString(", ")}")
  }

  private def fieldType(df: DataFrame, c: String): DataType = {
    requireColumns(df, Seq(c))
    df.schema(c).dataType
  }

  def requireNumeric(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      fieldType(df, c) match {
        case _: NumericType => ()
        case t => throw MissingColumn(s"Column '$c' must be numeric, got $t")
      }
    }

  def requireDouble(df: DataFrame, cols: Seq[String]): Unit = requireNumeric(df, cols)

  def requireString(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      fieldType(df, c) match {
        case StringType => ()
        case t => throw MissingColumn(s"Column '$c' must be string, got $t")
      }
    }

  def requireDatetime(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      fieldType(df, c) match {
        case TimestampType | DateType | TimestampNTZType => ()
        case t => throw MissingColumn(s"Column '$c' must be timestamp/date, got $t")
      }
    }

  def requireParam(cond: Boolean, msg: => String): Unit =
    if (!cond) throw InvalidParameter(msg)

  /** Guard for operators that APPEND output columns: silently clobbering a
    * pre-existing column of the same name (e.g. re-chunking already-chunked
    * rows, re-packing a frame that already carries `bucket`) corrupts data
    * with no error — reject loudly instead. */
  def requireColumnsAbsent(df: DataFrame, cols: Seq[String], op: String): Unit = {
    val have = df.columns.toSet
    val clash = cols.filter(have)
    if (clash.nonEmpty)
      throw InvalidParameter(
        s"$op output column(s) ${clash.mkString(", ")} already exist in the " +
          "input (rename or drop them first — silently overwriting would " +
          "corrupt prior results)")
  }
}
