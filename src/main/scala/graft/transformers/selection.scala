package graft.transformers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._
import graft.errors.FeatureFactoryException._

/** Feature selection (reference: src/transformers/feature_selection.rs, SURVEY §2.9).
  *
  * The reference materializes the whole DataFrame and does driver-side math on
  * the FIRST record batch only (:110, :215, :289 …). Our versions compute the
  * same statistics as distributed aggregates over ALL rows — identical on
  * single-batch test data, correct (and feasible) at 100 TB: only scalars ever
  * reach the driver.
  *
  * "Numeric" in the reference's selection module means exactly Float64
  * (feature_selection.rs:38-40); we mirror that as Double/Float columns.
  */
private[graft] object SelectionUtil {
  def isNumericField(f: StructField): Boolean = f.dataType match {
    case DoubleType | FloatType => true
    case _ => false
  }

  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.filter(isNumericField).map(_.name).toSeq

  /** Distinct-value cap for the histogram fast path of [[nearestRankAll]]:
    * up to this many (column, value) rows are collected per column. */
  var MaxHistogramValues: Int = 100000

  /** Nearest-rank values (`sorted[round((n-1)*f)]`) for MANY columns and
    * fractions from ONE Spark job: melt the columns to (feature, value)
    * rows, aggregate per-value counts, and walk the cumulative counts on
    * the driver — exact, and cheap whenever the value distribution is
    * compressible (the common case for bounded/discretized features).
    * Columns whose distinct-value count exceeds [[MaxHistogramValues]] fall
    * back to the distributed sort path of [[nearestRank]] (a window caps
    * what can reach the driver, so oversized histograms never collect). */
  def nearestRankAll(
      df: DataFrame, cols: Seq[String], fractions: Seq[Double]): Map[String, Seq[Double]] = {
    if (cols.isEmpty) return Map.empty
    import org.apache.spark.sql.expressions.Window
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("f"), col(c).cast("double").as("v"))): _*)).as("fv"))
      .select(col("fv.f").as("f"), col("fv.v").as("v"))
      .filter(col("v").isNotNull)
    val hist = melted.groupBy("f", "v").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.partitionBy("f").orderBy("v")))
      .filter(col("rk") <= MaxHistogramValues + 1)
      .collect()
      .groupBy(_.getString(0))
    cols.flatMap { c =>
      hist.get(c) match {
        case None => Some(c -> Seq.empty[Double]) // all-null / empty column
        case Some(rows) if rows.length > MaxHistogramValues =>
          Some(c -> nearestRank(df, c, fractions))
        case Some(rows) =>
          val byValue = rows.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
          val n = byValue.map(_._2).sum
          val values = fractions.map { f =>
            val target = math.round((n - 1).toDouble * f) // 0-based rank
            var cum = 0L
            var i = 0
            while (cum + byValue(i)._2 <= target) { cum += byValue(i)._2; i += 1 }
            byValue(i)._1
          }
          Some(c -> values)
      }
    }.toMap
  }

  /** Values at nearest-rank indices of the sorted non-null column — the
    * reference's `sorted[round((n-1)*i/k)]` decile/median idiom
    * (feature_selection.rs:548-554, :866-871). Exact, distributed, and
    * pure-DataFrame (no RDD conversion): per-value counts are
    * range-partitioned by value, cumulated within each range chunk (a
    * window keyed by partition id — many independent groups, never a
    * single-partition window), the small per-chunk totals turn the local
    * cumsums into global ranks, and only the handful of rows whose rank
    * span covers a requested index is collected. */
  def nearestRank(
      df: DataFrame, c: String, fractions: Seq[Double],
      knownN: Option[Long] = None): Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val parts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .map(_.toInt).getOrElse(spark.sparkContext.defaultParallelism)
    // one row per distinct value → range partitioning over DISTINCT values
    // stays balanced even when one value holds most of the mass
    // pid is materialized as a COLUMN directly over the cached range
    // partitioning: every later operator (the totals aggregate, the window
    // and its exchange) must see the range-chunk id, not whatever physical
    // partition it happens to run in afterwards
    val hist = df.select(col(c).cast("double").as("v")).na.drop()
      .groupBy("v").agg(count(lit(1)).as("n"))
      .repartitionByRange(parts, col("v"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val totals = hist.groupBy("pid")
        .agg(sum("n").as("t")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // callers that already know the non-null count (from a batched agg)
      // pass it in; it must equal the histogram mass
      val n = knownN.getOrElse(totals.values.sum)
      if (n == 0) return Seq.empty
      val maxPid = if (totals.isEmpty) -1 else totals.keys.max
      // offsets(p) = total mass in range chunks before p
      val offsets = (0 to maxPid).scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
      val idx = fractions.map(f => math.round((n - 1).toDouble * f))
      val tgt = typedLit(idx.distinct)
      val wP = Window.partitionBy(col("pid"))
        .orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // gend = exclusive global end-rank of each value's run; the value at
      // 0-based rank t is the one with gend - n <= t < gend
      val hits = hist
        .withColumn("gend",
          sum(col("n")).over(wP) +
            element_at(typedLit(offsets.toSeq), col("pid") + 1))
        .filter(exists(tgt, t => t >= col("gend") - col("n") && t < col("gend")))
        .select(col("v"), col("n"), col("gend"))
        .collect()
      val found = idx.distinct.map { t =>
        t -> hits.find(r => t >= r.getLong(2) - r.getLong(1) && t < r.getLong(2))
          .getOrElse(throw new IllegalStateException(
            s"nearestRank: no histogram row covers rank $t of $n"))
          .getDouble(0)
      }.toMap
      idx.map(found)
    } finally hist.unpersist()
  }

  /** One-job Pearson correlation for many column pairs over pairwise-complete
    * rows (sample moments — the n-1 factors cancel exactly as in the
    * reference's cov/sqrt(varx*vary)).
    *
    * Built from covar_samp + conditional stddev_samp instead of Spark's
    * `corr`, because under ANSI mode (Spark 4 default) `corr` raises
    * DIVIDE_BY_ZERO for zero-variance columns; the reference silently skips
    * those pairs (feature_selection.rs:322-324), so we must too — the
    * division happens driver-side where we can check the denominator.
    * Zero-variance pairs → NaN. */
  def corrPairs(df: DataFrame, pairs: Seq[(String, String)]): Map[(String, String), Double] = {
    if (pairs.isEmpty) return Map.empty
    val aggs = pairs.flatMap { case (a, b) =>
      val (x, y) = (col(a).cast("double"), col(b).cast("double"))
      // pairwise-complete masks: stddev_samp already ignores nulls of its
      // own input, so masking each side by the OTHER side's presence is
      // enough — one comparison per row instead of two
      Seq(
        covar_samp(x, y),
        stddev_samp(when(y.isNotNull, x)),
        stddev_samp(when(x.isNotNull, y)))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    pairs.zipWithIndex.map { case (p, i) =>
      val c =
        if (row.isNullAt(3 * i) || row.isNullAt(3 * i + 1) || row.isNullAt(3 * i + 2))
          Double.NaN
        else {
          val (cov, sx, sy) = (row.getDouble(3 * i), row.getDouble(3 * i + 1),
            row.getDouble(3 * i + 2))
          if (sx == 0.0 || sy == 0.0) Double.NaN else cov / (sx * sy)
        }
      p -> c
    }.toMap
  }

  def keepInSchemaOrder(df: DataFrame, keep: String => Boolean, errMsg: String): DataFrame = {
    val cols = df.columns.filter(keep)
    if (cols.isEmpty) throw InvalidParameter(errMsg)
    df.select(cols.map(col).toSeq: _*)
  }
}

/** Projects away the listed features; error if nothing remains
  * (reference: feature_selection.rs:43-82). Stateless. */
class DropFeatures(val features: Seq[String]) extends Transformer {
  override def fit(df: DataFrame): this.type = this
  override def transform(df: DataFrame): DataFrame = {
    Validators.requireColumns(df, features)
    val drop = features.toSet
    SelectionUtil.keepInSchemaOrder(df, c => !drop(c),
      "Dropping these features would leave an empty DataFrame")
  }
}

/** Drops numeric columns with population variance < numericThreshold and
  * other columns with ≤ categoricalThreshold distinct values
  * (reference: feature_selection.rs:85-186). One aggregate job for all
  * statistics of all columns. */
class DropConstantFeatures(
    val numericThreshold: Double,
    val categoricalThreshold: Long,
) extends StatefulTransformer {
  var dropColumns: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.map { f =>
      if (SelectionUtil.isNumericField(f)) var_pop(col(f.name).cast("double"))
      else countDistinct(col(f.name)).cast("double")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    dropColumns = fields.zipWithIndex.collect {
      case (f, i) if SelectionUtil.isNumericField(f) &&
        !row.isNullAt(i) && row.getDouble(i) < numericThreshold => f.name
      case (f, i) if !SelectionUtil.isNumericField(f) &&
        !row.isNullAt(i) && row.getDouble(i) <= categoricalThreshold => f.name
    }.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    SelectionUtil.keepInSchemaOrder(df, c => !dropColumns(c),
      "All features dropped by DropConstantFeatures.")
  }
}

/** Drops later columns whose full content equals an earlier column
  * (reference: feature_selection.rs:189-264 compares whole arrays pairwise).
  * Distributed: one fingerprint job (count + content hash per column), then
  * an exact null-safe-equality check only for fingerprint-colliding pairs. */
class DropDuplicateFeatures() extends StatefulTransformer {
  var dropColumns: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    val cols = df.columns.toSeq
    // decimal(38,0) sum: a plain long sum of 64-bit hashes overflows under
    // ANSI mode (Spark 4 default)
    val aggs = cols.flatMap(c =>
      Seq(count(col(c)).cast("long"), sum(xxhash64(col(c)).cast("decimal(38,0)"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val fp = cols.zipWithIndex.map { case (c, i) =>
      c -> (df.schema(c).dataType.simpleString,
        row.getLong(2 * i),
        if (row.isNullAt(2 * i + 1)) BigDecimal(0) else BigDecimal(row.getDecimal(2 * i + 1)))
    }.toMap
    val dropped = scala.collection.mutable.Set[String]()
    for (i <- cols.indices; j <- (i + 1) until cols.size) {
      val (a, b) = (cols(i), cols(j))
      if (!dropped(a) && !dropped(b) && fp(a) == fp(b)) {
        val differs = df.filter(!(col(a) <=> col(b))).limit(1).count() > 0
        if (!differs) dropped += b
      }
    }
    dropColumns = dropped.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    SelectionUtil.keepInSchemaOrder(df, c => !dropColumns(c),
      "All features dropped by DropDuplicateFeatures.")
  }
}

/** Drops the lower-variance member of every numeric pair with
  * |corr| > threshold (reference: feature_selection.rs:267-367). The
  * reference's pair order comes from HashMap iteration (nondeterministic);
  * we use schema order — deterministic, observable only on tied correlations.
  * Correlations for ALL pairs + variances come from one aggregate job. */
class DropCorrelatedFeatures(val threshold: Double) extends StatefulTransformer {
  var dropColumns: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    val names = SelectionUtil.numericCols(df)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    if (names.isEmpty) { fitted = true; return this }
    val varAggs = names.map(c => var_pop(col(c).cast("double")))
    val varRow = df.agg(varAggs.head, varAggs.tail: _*).head()
    val variance = names.zipWithIndex.map { case (c, i) =>
      c -> (if (varRow.isNullAt(i)) 0.0 else varRow.getDouble(i))
    }.toMap
    val corrs = SelectionUtil.corrPairs(df, pairs)
    val toDrop = scala.collection.mutable.Set[String]()
    pairs.foreach { case (a, b) =>
      val c = corrs((a, b))
      if (!c.isNaN && math.abs(c) > threshold) {
        if (variance(a) < variance(b)) toDrop += a else toDrop += b
      }
    }
    dropColumns = toDrop.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    SelectionUtil.keepInSchemaOrder(df, c => !dropColumns(c),
      "All features were dropped by DropCorrelatedFeatures.")
  }
}

/** Like DropCorrelatedFeatures but keeps a candidate set: from each
  * correlated pair (both still candidates) the lower-variance member is
  * removed; transform keeps surviving numerics plus ALL non-numeric columns
  * (reference: feature_selection.rs:370-482). */
class SmartCorrelatedSelection(val threshold: Double) extends StatefulTransformer {
  var selectedFeatures: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    val names = SelectionUtil.numericCols(df)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    if (names.isEmpty) { selectedFeatures = Set.empty; fitted = true; return this }
    val varAggs = names.map(c => var_pop(col(c).cast("double")))
    val varRow = df.agg(varAggs.head, varAggs.tail: _*).head()
    val variance = names.zipWithIndex.map { case (c, i) =>
      c -> (if (varRow.isNullAt(i)) 0.0 else varRow.getDouble(i))
    }.toMap
    val corrs = SelectionUtil.corrPairs(df, pairs)
    val candidates = scala.collection.mutable.Set[String](names: _*)
    pairs.foreach { case (a, b) =>
      if (candidates(a) && candidates(b)) {
        val c = corrs((a, b))
        if (!c.isNaN && math.abs(c) > threshold) {
          if (variance(a) < variance(b)) candidates -= a else candidates -= b
        }
      }
    }
    selectedFeatures = candidates.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    SelectionUtil.keepInSchemaOrder(
      df,
      c => !SelectionUtil.isNumericField(df.schema(c)) || selectedFeatures(c),
      "No features selected by SmartCorrelatedSelection.")
  }
}

/** Population-stability-index drop against a reference DataFrame.
  * Bins = nearest-rank deciles of the REFERENCE values; every bin is
  * half-open [lo, hi) — including the last, exactly like the reference
  * (feature_selection.rs:502-558). Bin counts for all columns come from one
  * aggregate job per frame. */
class DropHighPSIFeatures(val reference: DataFrame, val psiThreshold: Double)
    extends StatefulTransformer {
  var dropColumns: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    val cols = SelectionUtil.numericCols(df)
    if (cols.isEmpty) { fitted = true; return this }
    // every column's decile boundaries from ONE histogram job on the
    // reference frame
    val binsByCol = SelectionUtil
      .nearestRankAll(reference, cols, (0 to 10).map(_ / 10.0))
      .filter(_._2.nonEmpty)
    // ONE aggregate job for BOTH frames: tag-union reference and current,
    // compute side-conditional bin counts + non-null totals together
    val perCol = binsByCol.toSeq
    val binCols = perCol.map(_._1)
    def tagged(d: DataFrame, s: Int) =
      d.select(lit(s).as("__graft_side") +: binCols.map(col(_).cast("double")): _*)
    val u = tagged(reference, 0).unionByName(tagged(df, 1))
    def sideAggs(side: Int): Seq[Column] = perCol.flatMap { case (c, bins) =>
      count(when(col("__graft_side") === side, col(c))).cast("long") +:
        bins.sliding(2).map { pair =>
          sum(when(col("__graft_side") === side &&
            col(c) >= lit(pair(0)) && col(c) < lit(pair(1)), 1L).otherwise(0L))
        }.toSeq
    }
    val aggs = sideAggs(0) ++ sideAggs(1)
    val row = u.agg(aggs.head, aggs.tail: _*).head()
    def unpack(base: Int): (Map[String, Seq[Double]], Map[String, Double]) = {
      var i = base - 1
      val pairs = perCol.map { case (c, bins) =>
        i += 1
        val total = row.getLong(i).toDouble
        val counts = bins.sliding(2).map { _ => i += 1; row.getLong(i).toDouble }.toSeq
        (c -> counts, c -> total)
      }
      (pairs.map(_._1).toMap, pairs.map(_._2).toMap)
    }
    val (refCounts, refTotals) = unpack(0)
    val (curCounts, curTotals) = unpack(sideAggs(0).length)
    dropColumns = binsByCol.keys.filter { c =>
      val psi = refCounts(c).zip(curCounts(c)).map { case (rc, cc) =>
        val pctRef = math.max(rc / refTotals(c), 0.0001)
        val pctCur = math.max(cc / curTotals(c), 0.0001)
        (pctRef - pctCur) * math.log(pctRef / pctCur)
      }.sum
      psi > psiThreshold
    }.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    SelectionUtil.keepInSchemaOrder(df, c => !dropColumns(c),
      "All features dropped by DropHighPSIFeatures.")
  }
}

/** Information-value selection against a binary (1.0/0.0) target.
  * Numeric features: nearest-rank decile bins of the CURRENT values, all
  * half-open; per-bin good/bad counts normalized by class totals (this one IS
  * normalized, unlike WoEEncoder), clamped at 0.0001; keep when
  * IV ≥ threshold. String features: per-category counts. Target always kept.
  * (reference: feature_selection.rs:595-736.) */
class SelectByInformationValue(val target: String, val ivThreshold: Double)
    extends StatefulTransformer {
  var selectedFeatures: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireColumns(df, Seq(target))
    val t = col(target).cast("double")
    val totRow = df.agg(
      sum(when(t === 1.0, 1L).otherwise(0L)),
      sum(when(t =!= 1.0, 1L).otherwise(0L))).head()
    val totalGood = totRow.getLong(0).toDouble
    val totalBad = totRow.getLong(1).toDouble

    def ivOf(good: Double, bad: Double): Double = {
      val pctGood = math.max(good / totalGood, 0.0001)
      val pctBad = math.max(bad / totalBad, 0.0001)
      (pctGood - pctBad) * math.log(pctGood / pctBad)
    }

    val sel = scala.collection.mutable.Set[String]()
    val numeric = df.schema.fields.filter(f =>
      f.name != target && SelectionUtil.isNumericField(f)).map(_.name).toSeq
    val categorical = df.schema.fields.filter(f =>
      f.name != target && f.dataType == StringType).map(_.name).toSeq

    if (numeric.nonEmpty) {
      val binsByCol = SelectionUtil
        .nearestRankAll(df, numeric, (0 to 10).map(_ / 10.0))
        .filter(_._2.nonEmpty)
      val aggs = binsByCol.toSeq.flatMap { case (c, bins) =>
        bins.sliding(2).flatMap { pair =>
          val inBin = col(c) >= lit(pair(0)) && col(c) < lit(pair(1))
          Seq(
            sum(when(inBin && t === 1.0, 1L).otherwise(0L)),
            sum(when(inBin && t =!= 1.0, 1L).otherwise(0L)))
        }
      }
      if (aggs.nonEmpty) {
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        var i = -1
        binsByCol.foreach { case (c, bins) =>
          val iv = bins.sliding(2).map { _ =>
            i += 1; val good = row.getLong(i).toDouble
            i += 1; val bad = row.getLong(i).toDouble
            ivOf(good, bad)
          }.sum
          if (iv >= ivThreshold) sel += c
        }
      }
    }
    categorical.foreach { c =>
      val counts = df
        .filter(col(c).isNotNull)
        .groupBy(col(c))
        .agg(
          sum(when(t === 1.0, 1L).otherwise(0L)).as("good"),
          sum(when(t =!= 1.0, 1L).otherwise(0L)).as("bad"))
        .collect()
      val iv = counts.map(r => ivOf(r.getLong(1).toDouble, r.getLong(2).toDouble)).sum
      if (iv >= ivThreshold) sel += c
    }
    selectedFeatures = sel.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    val keep = df.columns.filter(c => c == target || selectedFeatures(c))
    if (keep.isEmpty) throw InvalidParameter("No features selected by information value.")
    // target first, then selected features in schema order (reference
    // transform order, feature_selection.rs:717-719)
    val ordered = Seq(target) ++ df.columns.filter(c => c != target && selectedFeatures(c))
    df.select(ordered.map(col): _*)
  }
}

/** Keeps numeric features with |corr(feature, target)| ≥ threshold
  * (reference: feature_selection.rs:740-826). All correlations in one job.
  * Transform projects target first, then survivors in schema order. */
class SelectBySingleFeaturePerformance(val target: String, val correlationThreshold: Double)
    extends StatefulTransformer {
  var selectedFeatures: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireColumns(df, Seq(target))
    val feats = df.schema.fields
      .filter(f => f.name != target && SelectionUtil.isNumericField(f)).map(_.name).toSeq
    val corrs = SelectionUtil.corrPairs(df, feats.map(f => (f, target)))
    selectedFeatures = feats.filter { f =>
      val c = corrs((f, target)); !c.isNaN && math.abs(c) >= correlationThreshold
    }.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    val ordered = Seq(target) ++ df.columns.filter(c => c != target && selectedFeatures(c))
    df.select(ordered.map(col): _*)
  }
}

/** Median-split target-mean selection: split each feature at its nearest-rank
  * median (sorted[n/2]); keep when |mean(target | x < m) − mean(target | x ≥ m)|
  * ≥ threshold (reference: feature_selection.rs:829-923). Means for all
  * columns come from one aggregate job. */
class SelectByTargetMeanPerformance(val target: String, val meanDiffThreshold: Double)
    extends StatefulTransformer {
  var selectedFeatures: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireColumns(df, Seq(target))
    val t = col(target).cast("double")
    val feats = df.schema.fields
      .filter(f => f.name != target && SelectionUtil.isNumericField(f)).map(_.name).toSeq
    val medians = SelectionUtil.nearestRankAll(df, feats, Seq(0.5))
      .flatMap { case (c, vs) => vs.headOption.map(c -> _) }
    val present = feats.filter(medians.contains)
    if (present.nonEmpty) {
      val aggs = present.flatMap { c =>
        val m = medians(c)
        Seq(
          avg(when(col(c) < lit(m), t)),
          avg(when(col(c) >= lit(m), t)))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      selectedFeatures = present.zipWithIndex.filter { case (c, i) =>
        val mean1 = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
        val mean2 = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
        math.abs(mean1 - mean2) >= meanDiffThreshold
      }.map(_._1).toSet
    }
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    val ordered = Seq(target) ++ df.columns.filter(c => c != target && selectedFeatures(c))
    df.select(ordered.map(col): _*)
  }
}

/** Max-relevance-min-redundancy greedy selection
  * (reference: feature_selection.rs:926-1051): candidates with
  * |corr(f, target)| ≥ relevanceThreshold, sorted by relevance descending
  * (ties broken by name for determinism), greedily accepted unless
  * |corr(f, already-selected)| > redundancyThreshold. The full correlation
  * matrix (features × features ∪ target) is computed in ONE job; the greedy
  * loop is driver-side arithmetic on scalars. */
class MRMR(
    val target: String,
    val relevanceThreshold: Double,
    val redundancyThreshold: Double,
) extends StatefulTransformer {
  var selectedFeatures: Set[String] = Set.empty

  override def fit(df: DataFrame): this.type = {
    Validators.requireColumns(df, Seq(target))
    val feats = df.schema.fields
      .filter(f => f.name != target && SelectionUtil.isNumericField(f)).map(_.name).toSeq
    val relPairs = feats.map(f => (f, target))
    val redPairs = for {
      i <- feats.indices; j <- (i + 1) until feats.size
    } yield (feats(i), feats(j))
    val corrs = SelectionUtil.corrPairs(df, relPairs ++ redPairs)
    def corrOf(a: String, b: String): Double =
      corrs.getOrElse((a, b), corrs.getOrElse((b, a), Double.NaN))
    val candidates = feats
      .map(f => f -> corrs((f, target)))
      .filter { case (_, c) => !c.isNaN && math.abs(c) >= relevanceThreshold }
      .map { case (f, c) => (f, math.abs(c)) }
      .sortBy { case (f, c) => (-c, f) }
    val selected = scala.collection.mutable.ArrayBuffer[String]()
    candidates.foreach { case (f, _) =>
      val redundant = selected.exists { s =>
        val c = corrOf(f, s); !c.isNaN && math.abs(c) > redundancyThreshold
      }
      if (!redundant) selected += f
    }
    selectedFeatures = selected.toSet
    fitted = true
    this
  }

  override def transform(df: DataFrame): DataFrame = {
    requireFitted()
    val ordered = Seq(target) ++ df.columns.filter(c => c != target && selectedFeatures(c))
    df.select(ordered.map(col): _*)
  }
}
