package graft.transformers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._
import graft.errors.FeatureFactoryException._

/** Categorical encoders (reference: src/transformers/categorical.rs, SURVEY §2.3).
  *
  * The reference always bakes the learned dictionary into a literal CASE
  * chain (categorical.rs:73-92) — fine at test cardinality, quadratic-ish
  * pain at 100 TB with 100k categories. Above [[CategoricalEncoding.MaxCaseBranches]]
  * distinct values we switch to a broadcast hash join against a tiny mapping
  * DataFrame: identical semantics (unseen/null → default), no giant
  * expression tree, still zero shuffles on the fact table.
  */
object CategoricalEncoding {
  /** Dictionary size above which transform uses broadcast-join instead of a
    * literal CASE chain (SURVEY §7.4 item 7). */
  var MaxCaseBranches: Int = 64

  /** In-place replacement honoring the CASE-vs-join threshold. `V` must be a
    * Spark-literal-compatible type (Int/Long/Double/String). */
  private[transformers] def encodeInPlace[V](
      df: DataFrame,
      cols: Seq[String],
      mappings: Map[String, Seq[(String, V)]],
      defaultFor: String => Column,
  ): DataFrame = {
    val (small, large) = cols.partition(c => mappings(c).size <= MaxCaseBranches)
    val caseReplaced =
      if (small.isEmpty) df
      else
        Exprs.replaceInPlace(
          df,
          small.map(c => c -> Exprs.dictCase(df(c), mappings(c), defaultFor(c))).toMap)
    large.foldLeft(caseReplaced) { (cur, c) =>
      val spark = cur.sparkSession
      import spark.implicits._
      val keyCol = s"__graft_key_$c"
      val valCol = s"__graft_val_$c"
      val mapDf = spark.createDataFrame(
        spark.sparkContext.parallelize(mappings(c).map { case (k, v) =>
          org.apache.spark.sql.Row(k, v)
        }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(keyCol,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField(valCol, mappings(c).headOption.map(_._2) match {
            case Some(_: java.lang.Integer) | Some(_: Int) => org.apache.spark.sql.types.IntegerType
            case Some(_: java.lang.Long) | Some(_: Long) => org.apache.spark.sql.types.LongType
            case Some(_: java.lang.Double) | Some(_: Double) => org.apache.spark.sql.types.DoubleType
            case _ => org.apache.spark.sql.types.StringType
          }),
        )))
      val joined = cur.join(broadcast(mapDf), cur(c) === mapDf(keyCol), "left")
      Exprs
        .replaceInPlace(joined, Map(c -> coalesce(col(valCol), defaultFor(c))))
        .drop(keyCol, valCol)
    }
  }
}

/** One-hot: keeps the original column and appends one 0/1 Int column per
  * learned category, named `<col>_<sanitized-category>`
  * (reference: categorical.rs:197-259). Categories sorted for determinism.
  * NOT MLlib's OneHotEncoder (no vectors, no drop-last; nulls → all zeros). */
class OneHotEncoder(val columns: Seq[String]) extends StatefulTransformer {
  var categories: Map[String, Seq[String]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireString(df, columns)
    // all columns' dictionaries from ONE melt job (reference: one
    // SELECT DISTINCT per column, categorical.rs:215-223)
    val d = Stats.groupedBy(df, columns, Seq(count(lit(1))))
    categories = columns.map(c => c -> d(c).map(_.getString(1)).sorted).toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    val newCols = columns.flatMap { c =>
      categories(c).map { cat =>
        s"${c}_${Exprs.sanitizeCategory(cat)}" ->
          when(col(c) === lit(cat), lit(1)).otherwise(lit(0))
      }
    }
    Exprs.appendColumns(df, newCols)
  }
}

/** Replaces each category with its raw occurrence count (Int64 — the name
  * says frequency but the reference stores counts); unseen/null → 0
  * (reference: categorical.rs:262-313). */
class CountFrequencyEncoder(val columns: Seq[String]) extends StatefulTransformer {
  var countMaps: Map[String, Map[String, Long]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireString(df, columns)
    val d = Stats.groupedBy(df, columns, Seq(count(lit(1))))
    countMaps = columns.map { c =>
      c -> d(c).map(r => r.getString(1) -> r.getLong(2)).toMap
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    CategoricalEncoding.encodeInPlace[Long](
      df,
      columns,
      countMaps.map { case (c, m) => c -> m.toSeq.sortBy(_._1) },
      _ => lit(0L))
  }
}

/** Replaces each category with its alphabetical ordinal 0..n-1; unseen → 0,
  * which collides with the first category — exact reference behavior,
  * preserved for parity (categorical.rs:317-374). NOT MLlib StringIndexer
  * (that one is frequency-ordered). */
class OrdinalEncoder(val columns: Seq[String]) extends StatefulTransformer {
  var ordinals: Map[String, Seq[(String, Long)]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireString(df, columns)
    val d = Stats.groupedBy(df, columns, Seq(count(lit(1))))
    ordinals = columns.map { c =>
      c -> d(c).map(_.getString(1)).sorted.zipWithIndex.map { case (v, i) => (v, i.toLong) }
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    CategoricalEncoding.encodeInPlace[Long](df, columns, ordinals, _ => lit(0L))
  }
}

/** Replaces each category with the mean of a numeric target over that
  * category; unseen/null → 0.0 (reference: categorical.rs:377-469). */
class MeanEncoder(val columns: Seq[String], val target: String)
    extends StatefulTransformer {
  var meanMaps: Map[String, Seq[(String, Double)]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireString(df, columns)
    Validators.requireNumeric(df, Seq(target))
    // one melt job for every column's per-category target means
    val d = Stats.groupedBy(
      df, columns, Seq(avg(col(target)).as("__graft_mean")), carry = Seq(target))
    meanMaps = columns.map { c =>
      c -> d(c).map(r => r.getString(1) -> r.getDouble(2)).sortBy(_._1)
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    CategoricalEncoding.encodeInPlace[Double](df, columns, meanMaps, _ => lit(0.0))
  }
}

/** Weight-of-evidence with the reference's exact (non-standard) formula:
  * `woe = ln((good + 1e-6) / (bad + 1e-6))` over RAW per-category counts —
  * NOT normalized by class totals (the reference computes the total and then
  * never uses it, categorical.rs:496-580). good = rows with target == 1,
  * bad = target == 0 (target read as integer). Unseen/null → 0.0.
  * Deliberately NOT textbook WoE — parity with the reference.
  *
  * Bad = every row whose target is NOT 1 (2, −1, null — anything landing in
  * the reference's else branch, categorical.rs:563-575), not just target==0:
  * for non-binary targets the two definitions diverge. */
class WoEEncoder(val columns: Seq[String], val target: String)
    extends StatefulTransformer {
  var woeMaps: Map[String, Seq[(String, Double)]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireString(df, columns)
    Validators.requireNumeric(df, Seq(target))
    val isGood = col(target).cast("long") === 1L // null/≠1 → else branch = bad
    // one melt job for every column's per-category good/bad counts
    val d = Stats.groupedBy(
      df, columns,
      Seq(
        sum(when(isGood, 1L).otherwise(0L)).as("good"),
        sum(when(isGood, 0L).otherwise(1L)).as("bad")),
      carry = Seq(target))
    woeMaps = columns.map { c =>
      c -> d(c).map { r =>
        val good = r.getLong(2).toDouble
        val bad = r.getLong(3).toDouble
        r.getString(1) -> math.log((good + 1e-6) / (bad + 1e-6))
      }.sortBy(_._1)
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    CategoricalEncoding.encodeInPlace[Double](df, columns, woeMaps, _ => lit(0.0))
  }
}

/** Categories with frequency < threshold collapse to "rare"; everything else
  * (including unseen values at transform time) passes through unchanged
  * (reference: categorical.rs:613-738). */
class RareLabelEncoder(
    val columns: Seq[String],
    val threshold: Double,
    val rareLabel: String = "rare",
) extends StatefulTransformer {
  var rareCategories: Map[String, Set[String]] = Map.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireParam(
      threshold >= 0.0 && threshold <= 1.0,
      s"Threshold $threshold must be between 0 and 1")
    Validators.requireString(df, columns)
    // ONE job for everything: melt to (column, value) rows and count — the
    // per-category counts for every column AND the total row count (the sum
    // of one column's counts, nulls included) come from a single aggregate
    // instead of df.count() + one groupBy per column. Map-side partial
    // aggregation collapses the explode before the shuffle.
    val kv = explode(array(
      columns.map(c => struct(lit(c).as("c"), col(c).as("v"))): _*))
    val counts = df
      .select(kv.as("kv"))
      .select(col("kv.c").as("c"), col("kv.v").as("v"))
      .groupBy("c", "v")
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val total = counts.iterator
      .filter(_.getString(0) == columns.head).map(_.getLong(2)).sum.toDouble
    rareCategories = columns.map { c =>
      c -> counts.iterator
        .filter(r => r.getString(0) == c && !r.isNullAt(1))
        .collect { case r if r.getLong(2) / total < threshold => r.getString(1) }
        .toSet
    }.toMap
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    Validators.requireColumns(df, columns)
    val replacements = columns.collect {
      case c if rareCategories(c).nonEmpty =>
        c -> when(col(c).isin(rareCategories(c).toSeq: _*), lit(rareLabel)).otherwise(col(c))
    }.toMap
    if (replacements.isEmpty) df else Exprs.replaceInPlace(df, replacements)
  }
}
