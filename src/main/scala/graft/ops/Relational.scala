package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators a training-data pipeline needs beyond the reference
  * surface (SURVEY §2.11): as-of joins (point-in-time enrichment) and
  * grouped top-k selection.
  */
object Relational {

  /** As-of join: for every left row, the single latest right row of the same
    * key with `right.tsCol <= left.tsCol` (NULL payload when none precede).
    *
    * Spark-first formulation: tag the two inputs, union them, and carry the
    * right payload forward with a running `last(ignoreNulls)` window ordered
    * by (ts, side) — right rows sort before left rows at equal timestamps,
    * which is what gives the ≤ semantics. ONE hash shuffle on the key (the
    * window), no range join, no per-row probe — the plan a range-condition
    * join would need Catalyst can only execute as a broadcast-nested-loop,
    * which is off the table at 100 TB; this runs as sort-within-partitions
    * at any scale.
    *
    * Right rows must be unique per (key, ts) — pre-aggregate otherwise
    * (ties at identical timestamps would make "the" latest row ambiguous on
    * any engine).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      suffix: String = "_right",
  ): DataFrame = {
    graft.core.Validators.requireColumns(left, keyCols :+ tsCol)
    graft.core.Validators.requireColumns(right, (keyCols :+ tsCol) ++ payloadCols)
    val payloadOut = payloadCols.map(_ + suffix)
    val l = left.select(
      left.columns.map(col).toSeq ++
        Seq(lit(1).as("__side")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c + suffix)): _*)
    val leftOnly = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(tsCol), lit(0).as("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(c + suffix)): _*)
    val unioned = l.unionByName(r.select(l.columns.map(col).toSeq: _*))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadOut.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** The k rows with the highest `order` per key — the "best documents per
    * language/source" selection step. One hash shuffle + sort; include a
    * unique id in `order` for deterministic results. */
  def topKPerGroup(
      df: DataFrame,
      keyCols: Seq[String],
      order: Seq[Column],
      k: Int,
  ): DataFrame = {
    require(k > 0, "k must be positive")
    graft.core.Validators.requireColumns(df, keyCols)
    df.withColumn("__graft_rn",
      row_number().over(Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }
}
