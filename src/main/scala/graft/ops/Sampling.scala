package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines
  * (extension beyond the reference surface, SURVEY §2.11).
  *
  * Reproducible sampling must hash the RECORD ID, not draw from an RNG:
  * re-runs, backfills, and audits then select exactly the same rows, and any
  * engine (Spark here, DuckDB in the driver's oracle, anything else
  * downstream) can recompute membership. The hash is two rounds of the
  * Lehmer/MINSTD multiplicative congruence — every intermediate stays under
  * 2⁴⁷, so the arithmetic is exact 64-bit integer math everywhere (no
  * overflow even under ANSI mode, no engine-specific hash function).
  */
object Sampling {

  private val M = 2147483647L // 2^31 − 1 (prime)
  private val A = 48271L      // MINSTD multiplier

  /** Two MINSTD rounds of a non-negative id: uniform-ish value in [0, M). */
  def minstdHash(id: Column): Column = {
    val x = pmod(id.cast("long"), lit(M))
    val h1 = pmod(x * A, lit(M))
    pmod(h1 * A, lit(M))
  }

  /** Keep ~`percent`% of rows, chosen by id hash — stable across runs,
    * engines, and partitionings; a pure narrow filter (no shuffle, pushes
    * past column pruning). */
  def hashSample(df: DataFrame, idCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    graft.core.Validators.requireColumns(df, Seq(idCol))
    df.filter(pmod(minstdHash(col(idCol)), lit(100L)) < percent)
  }

  /** Deterministic train/test assignment: adds a `split` column
    * ("train"/"test") from the id hash — the same id lands in the same
    * split on every run, engine, and partitioning, so re-runs and backfills
    * never leak test rows into training. Pure narrow projection. */
  def trainTestSplit(df: DataFrame, idCol: String, trainPercent: Int): DataFrame = {
    require(trainPercent >= 0 && trainPercent <= 100,
      "trainPercent must be in [0, 100]")
    graft.core.Validators.requireColumns(df, Seq(idCol))
    df.withColumn("split",
      when(pmod(minstdHash(col(idCol)), lit(100L)) < trainPercent, lit("train"))
        .otherwise(lit("test")))
  }

  /** Exactly `perKey` rows per stratum, chosen by id hash (fewer when the
    * stratum is smaller): deterministic stratified sampling. One hash
    * shuffle on the stratum key. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, idCol: String, perKey: Int): DataFrame = {
    require(perKey > 0, "perKey must be positive")
    graft.core.Validators.requireColumns(df, Seq(keyCol, idCol))
    df.withColumn("__graft_rn",
      row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(minstdHash(col(idCol)).asc, col(idCol).asc)))
      .filter(col("__graft_rn") <= perKey)
      .drop("__graft_rn")
  }
}
