package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.errors.FeatureFactoryException.InvalidParameter

/** Batched driver-side statistics.
  *
  * The reference runs one query per column per statistic (e.g. bins+1
  * separate jobs per column, src/transformers/discretization.rs:228-253; two
  * jobs for min+max, :100-157). At 100 TB each extra job is a full scan, so
  * every helper here folds ALL requested statistics for ALL columns into ONE
  * aggregate job — same learned values, one pass (SURVEY §4).
  */
object Stats {

  /** Evaluate arbitrary per-column aggregate expressions in one job.
    * Returns column name → value. */
  private def aggRow(df: DataFrame, aggs: Seq[Column]): Row = {
    require(aggs.nonEmpty)
    df.agg(aggs.head, aggs.tail: _*).head()
  }

  /** An all-null/empty column makes an aggregate return SQL NULL; surface
    * that as the library's typed error instead of an opaque NPE from
    * Row.getDouble (the reference raises FeatureFactoryError here too). */
  private def checkedDouble(row: Row, i: Int, c: String): Double = {
    if (row.isNullAt(i))
      throw InvalidParameter(s"Column '$c' has no non-null values")
    row.getDouble(i)
  }

  /** Per-column global mean, one job (reference: imputation.rs:110-133 runs
    * one job per column). */
  def means(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    val row = aggRow(df, cols.map(c => avg(col(c))))
    cols.zipWithIndex.map { case (c, i) => c -> checkedDouble(row, i, c) }.toMap
  }

  /** Exact min/max for all columns, one job. Strictly better than the
    * reference's approx-percentile p=0/p=1 twin jobs
    * (discretization.rs:100-157). */
  def minMax(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = aggRow(df, aggs)
    cols.zipWithIndex.map { case (c, i) =>
      c -> (checkedDouble(row, 2 * i, c), checkedDouble(row, 2 * i + 1, c))
    }.toMap
  }

  /** Per-column quantiles at the given probabilities.
    *
    * exact=false (default, the 100-TB path): Greenwald-Khanna
    * `approxQuantile` — one job for all columns.
    * exact=true (small data / oracle parity): sort-based `percentile`,
    * linear interpolation identical to DuckDB's quantile_cont — one agg job
    * for all columns.
    */
  def quantiles(
      df: DataFrame,
      cols: Seq[String],
      probs: Seq[Double],
      exact: Boolean = false,
      relativeError: Double = 1e-4,
  ): Map[String, Seq[Double]] = {
    if (exact) {
      val probsArr = array(probs.map(lit): _*)
      val aggs = cols.map(c => percentile(col(c).cast("double"), probsArr))
      val row = aggRow(df, aggs)
      cols.zipWithIndex.map { case (c, i) =>
        if (row.isNullAt(i))
          throw InvalidParameter(s"Column '$c' has no non-null values")
        c -> row.getSeq[Double](i)
      }.toMap
    } else {
      val res = df.stat.approxQuantile(cols.toArray, probs.toArray, relativeError)
      cols.zip(res.map(_.toSeq)).map { case (c, qs) =>
        if (qs.isEmpty)
          throw InvalidParameter(s"Column '$c' has no non-null values")
        c -> qs
      }.toMap
    }
  }

  /** Deterministic mode: highest count, ties broken by smallest value
    * (reference: imputation.rs:298-305 is sort-by-count-desc + limit 1, which
    * leaves ties engine-ordered; we pin the tie-break for reproducibility). */
  def stringMode(df: DataFrame, c: String): Option[String] = {
    val rows = df
      .filter(col(c).isNotNull)
      .groupBy(col(c))
      .count()
      .orderBy(col("count").desc, col(c).asc)
      .limit(1)
      .collect()
    rows.headOption.map(_.getString(0))
  }

  /** Distinct non-null string values of a column, sorted (reference:
    * categorical.rs:95-124 + the OrdinalEncoder's alphabetical sort). */
  def distinctSorted(df: DataFrame, c: String): Seq[String] =
    df.select(col(c))
      .filter(col(c).isNotNull)
      .distinct()
      .orderBy(col(c))
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Category → count map (reference: categorical.rs:127-164). */
  def countMap(df: DataFrame, c: String): Map[String, Long] =
    df.filter(col(c).isNotNull)
      .groupBy(col(c))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  /** Per-column category aggregates from ONE melt job: melt the string
    * columns to (column-name, value) rows, aggregate per (column, value),
    * return each column's per-category rows (value at index 1, agg results
    * from index 2), nulls excluded. The reference runs one query per column
    * (categorical.rs:95-164) — at 100 TB each extra job is a full scan;
    * map-side partial aggregation collapses the explode before the shuffle,
    * so the shuffle carries one row per (column, category), not per input
    * row. `aggs` may reference extra carried columns listed in `carry`. */
  def groupedBy(
      df: DataFrame,
      cols: Seq[String],
      aggs: Seq[Column],
      carry: Seq[String] = Seq.empty): Map[String, Seq[Row]] = {
    val kv = explode(array(
      cols.map(c => struct(lit(c).as("c"), col(c).as("v"))): _*))
    val melted = df
      .select(kv.as("kv") +: carry.map(col): _*)
      .select(col("kv.c").as("c") +: col("kv.v").as("v") +: carry.map(col): _*)
    val rows = melted
      .filter(col("v").isNotNull)
      .groupBy(col("c"), col("v"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val grouped = rows.groupBy(_.getString(0))
    cols.map(c => c -> grouped.getOrElse(c, Array.empty[Row]).toSeq).toMap
  }
}
