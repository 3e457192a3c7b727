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

  /** [[minstdHash]]'s modulus (2^31 − 1, prime): hash values live in
    * [0, HashM). Shared with the sink-side layout in
    * [[graft.sources.Writer]]. */
  private[graft] val HashM = 2147483647L
  private val M = HashM
  private val A = 48271L      // MINSTD multiplier

  /** Driver half of the two-level rank/offset pattern shared by
    * [[sampleTokenBudget]], [[interleaveSources]], and
    * [[graft.sources.Writer.shardAssignments]]: collected
    * `(part, bucket, value)` triples → `(part, bucket, exclusive prefix
    * sum of value over the part's buckets in ascending order)` — each
    * part's bucket start offsets. */
  private[graft] def exclusivePrefixByPart[K](
      rows: Seq[(K, Long, Long)]): Seq[(K, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      var acc = 0L
      rs.sortBy(_._2).map { case (_, b, n) => val s = (k, b, acc); acc += n; s }
    }

  /** A small driver-built frame (all columns non-nullable), UNhinted — for
    * fitted tables that are stored/projected and only sometimes joined
    * (join sites add their own `broadcast()`; a constructor hint that never
    * reaches a join logs an analyzer warning per query). */
  private[graft] def localFrame(
      spark: org.apache.spark.sql.SparkSession,
      fields: Seq[(String, org.apache.spark.sql.types.DataType)],
      rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(fields.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, t, nullable = false) })
    spark.createDataFrame(rows.asJava, schema)
  }

  /** The broadcast side of the same pattern: a small driver-built frame
    * (all columns non-nullable) marked for broadcast join. */
  private[graft] def broadcastFrame(
      spark: org.apache.spark.sql.SparkSession,
      fields: Seq[(String, org.apache.spark.sql.types.DataType)],
      rows: Seq[org.apache.spark.sql.Row]): DataFrame =
    broadcast(localFrame(spark, fields, rows))

  /** Two MINSTD rounds of a non-negative id: uniform-ish value in [0, M). */
  def minstdHash(id: Column): Column = {
    val x = pmod(id.cast("long"), lit(M))
    val h1 = pmod(x * A, lit(M))
    pmod(h1 * A, lit(M))
  }

  /** The seed-derived MULTIPLIER of [[epochHash]], computed driver-side
    * (the seed is a plan-time constant): two MINSTD rounds of the seed,
    * then mapped into [1, M−1] so it is invertible mod M (never ≡ 0).
    * Exposed for the oracle-SQL replay. */
  private[graft] def epochMultiplier(seed: Long): Long = {
    val s = ((seed % M) + M) % M
    val h = (((s * A) % M) * A) % M
    h % (M - 1) + 1
  }

  /** Seeded variant of [[minstdHash]] — the per-epoch corpus-shuffle hash.
    *
    * The seed must NOT fold in additively: [[minstdHash]] is pure
    * multiplication mod M, so `minstdHash(K + id)` is an AFFINE shift of
    * `minstdHash(id)` — a cut-and-rotate of the epoch-0 order (shard
    * assignment becomes a near-relabeling, within-shard order is
    * preserved), silently defeating the per-epoch shuffle. Instead the
    * seed becomes a MULTIPLIER in [1, M−1] applied between hash rounds:
    * `h = minstdHash(minstdHash(id) · mult(seed) mod M)`. Multiplication
    * mod M wraps ~mult times across [0, M), so both co-shard membership
    * and within-shard relative order genuinely re-permute per seed.
    * Every operand stays < 2³¹ and the one wide product < 2⁶² — exact
    * 64-bit integer math that any engine replays bit-for-bit (an
    * xxhash64-style native hash would be Spark-only).
    * `epochHash(id, 0) == minstdHash(id)` exactly (seed 0 short-circuits
    * to the unseeded hash), so unseeded layouts are the seed-0 member of
    * the family. */
  def epochHash(id: Column, seed: Long): Column =
    if (seed == 0L) minstdHash(id)
    else minstdHash(pmod(minstdHash(id) * lit(epochMultiplier(seed)), lit(M)))

  /** Keep ~`percent`% of rows, chosen by id hash — stable across runs,
    * engines, and partitionings; a pure narrow filter (no shuffle, pushes
    * past column pruning). */
  def hashSample(df: DataFrame, idCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    graft.core.Validators.requireColumns(df, Seq(idCol))
    df.filter(pmod(minstdHash(col(idCol)), lit(100L)) < percent)
  }

  /** [[hashSample]] with a ROW CAP instead of a rate: keep roughly (never
    * deliberately more than) `maxRows` rows, chosen by id hash — the
    * enforcement half of a "bounded sample at corpus scale" contract.
    * FULLY LAZY: the frame is sized by a single-row `count(*)` aggregate
    * broadcast-cross-joined into the filter (no eager driver job —
    * merely BUILDING a plan on this result never triggers Spark work;
    * round 12 shipped an eager `df.count()` here, which made plan
    * construction an action). PLAN-SHAPE NOTE: this is a
    * BroadcastNestedLoopJoin whose build side is EXACTLY ONE ROW — cost-
    * identical to a broadcast hash join (there is no key to hash on; a
    * constant join key gets folded away by Catalyst, degrading right
    * back to BNLJ — tried and reverted in round 13). The smoke audit's
    * BNLJ ban exists for unbounded fan-outs; queries whose visible plan
    * carries this single-row fan-in belong on its allow-list with a
    * size note (PlanSpec pins the shape). At or
    * under the cap every row passes the filter UNTOUCHED
    * (small inputs are exact, which keeps sf-scale oracles byte-stable);
    * over it the kept set is exactly the old
    * `hash < max(1, floor(maxRows·1e6/total))` ppm rule, expressed
    * division-free as `hash == 0 OR (hash+1)·total ≤ maxRows·1e6` (the two
    * are ⟺ for ints; the product comparison runs in decimal(38,0) so no
    * Long overflow at any realistic total). Expected sample ≤ maxRows;
    * hash unevenness can overshoot by O(√maxRows), and a total beyond
    * 1e6 × maxRows keeps the 1-ppm floor — both noted rather than hidden.
    * NULL ids cannot be hashed and are kept DETERMINISTICALLY on both
    * sides of the cap (round 12 kept them under the cap but silently
    * dropped them over it — inconsistent). Deterministic: the same ids
    * survive on every run, engine, and partitioning. */
  def hashSampleAtMost(df: DataFrame, idCol: String, maxRows: Long): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    require(maxRows <= Long.MaxValue / 1000000L,
      s"maxRows=$maxRows overflows the ppm math (max ${Long.MaxValue / 1000000L})")
    graft.core.Validators.requireColumns(df, Seq(idCol))
    graft.core.Validators.requireColumnsAbsent(
      df, Seq("__hsam_h", "__hsam_total"), "hashSampleAtMost")
    val totalRow = broadcast(df.agg(count(lit(1)).as("__hsam_total")))
    val dec = "decimal(20,0)"
    df.withColumn("__hsam_h",
        when(col(idCol).isNotNull, pmod(minstdHash(col(idCol)), lit(1000000L))))
      .crossJoin(totalRow)
      .filter(
        col("__hsam_total") <= maxRows ||
          col("__hsam_h").isNull || // NULL id: kept, cap or no cap
          col("__hsam_h") === 0L ||
          (col("__hsam_h") + 1L).cast(dec) * col("__hsam_total").cast(dec) <=
            lit(maxRows).cast(dec) * lit(1000000L).cast(dec))
      .drop("__hsam_h", "__hsam_total")
  }

  /** The shared split decision of [[trainTestSplit]] and
    * [[leakageSafeSplit]]: "train" iff the id's hash bucket is below the
    * percent, "test" otherwise (including a NULL id — the hash comparison
    * is NULL and the otherwise-branch wins). One definition so the two
    * ops can never diverge on the rule. */
  private def splitDecision(idExpr: Column, trainPercent: Int): Column =
    when(pmod(minstdHash(idExpr), lit(100L)) < trainPercent, lit("train"))
      .otherwise(lit("test"))

  /** Deterministic train/test assignment: adds a `split` column
    * ("train"/"test") from the id hash — the same id lands in the same
    * split on every run, engine, and partitioning, so re-runs and backfills
    * never leak test rows into training. Pure narrow projection. */
  def trainTestSplit(df: DataFrame, idCol: String, trainPercent: Int): DataFrame = {
    require(trainPercent >= 0 && trainPercent <= 100,
      "trainPercent must be in [0, 100]")
    graft.core.Validators.requireColumns(df, Seq(idCol))
    graft.core.Validators.requireColumnsAbsent(df, Seq("split"), "trainTestSplit")
    df.withColumn("split", splitDecision(col(idCol), trainPercent))
  }

  /** Keep the best `fraction` of rows by `scoreCol` — the quantile-threshold
    * curation cut ("train on the top 30% by quality score"): the
    * (1 − fraction) quantile is computed once, then applied as a pure
    * narrow `score ≥ threshold` filter. Ties AT the threshold are all
    * kept (the cut can only err toward keeping slightly more than the
    * requested fraction, never silently less); NULL scores drop (no
    * evidence of quality ≠ top-tier quality). `exact = true` uses the
    * interpolated `percentile` aggregate (DuckDB `quantile_cont`
    * semantics — oracle-replayable; buffers the column per group);
    * `exact = false` switches to `approx_percentile` (t-digest, bounded
    * memory) — the 100 TB form, where a hair of threshold noise is
    * irrelevant against score noise. One aggregate job + one narrow
    * filter; the data itself never shuffles or sorts. */
  def keepTopFraction(
      df: DataFrame,
      scoreCol: String,
      fraction: Double,
      exact: Boolean = true): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, "fraction must be in (0, 1]")
    graft.core.Validators.requireColumns(df, Seq(scoreCol))
    if (fraction == 1.0) return df.filter(col(scoreCol).isNotNull)
    val p = lit(1.0 - fraction)
    val thrCol =
      if (exact) percentile(col(scoreCol), p)
      else approx_percentile(col(scoreCol), p, lit(10000)).cast("double")
    val thr = df.agg(thrCol.cast("double")).head().getDouble(0)
    df.filter(col(scoreCol) >= thr)
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

  /** Per-group quota by QUALITY: keep the `perGroup` best-scoring rows of
    * every group (CCNet's per-domain cap — "at most n pages per domain,
    * prefer the highest-quality ones"). Where [[stratifiedSample]] picks a
    * hash-uniform subset, this op picks the TOP of the group's score order;
    * NULL scores rank last (no evidence of quality ≠ quality), ties break
    * by id so reruns keep the same rows.
    *
    * One hash shuffle on the group key; the rank window is a top-k per
    * group, which Spark's WindowGroupLimit prunes to `perGroup` rows per
    * partition map-side BEFORE the shuffle — a million-domain corpus moves
    * ≈ domains·perGroup rows, not the corpus. */
  def capPerGroup(
      df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, perGroup: Int): DataFrame = {
    require(perGroup > 0, "perGroup must be positive")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol, scoreCol))
    df.withColumn("__graft_rn",
      row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)))
      .filter(col("__graft_rn") <= perGroup)
      .drop("__graft_rn")
  }

  /** Rebalance the group mix by deterministic downsampling: every group is
    * thinned to ≈ the size of the smallest group, so downstream training
    * sees a uniform group distribution (the standard language/domain
    * rebalancing step in corpus curation). Keep decisions use the same
    * portable id-hash rule as [[hashSample]] with an integer per-group
    * threshold `minCount·denom/count` — all exact 64-bit integer math, so
    * any engine replays membership bit-for-bit.
    *
    * Fit: one groupBy-count, collected (group cardinality is dictionary-
    * sized, like any categorical fit). Transform: for up to
    * [[graft.transformers.CategoricalEncoding.MaxCaseBranches]] groups the
    * thresholds inline as a when-chain — a pure NARROW filter, no shuffle
    * at any corpus size; above that, a broadcast join against the tiny
    * threshold table. */
  def balanceGroups(
      df: DataFrame, groupCol: String, idCol: String,
      denom: Long = 1000000L): DataFrame = {
    require(denom >= 1, "denom must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n")).collect()
    if (counts.isEmpty) return df
    val minCount = counts.map(_.getLong(1)).min
    val thresholds: Seq[(Any, Long)] =
      counts.map(r => (r.get(0), minCount * denom / r.getLong(1))).toSeq
    thresholdFilter(df, groupCol, idCol, thresholds, denom)
  }

  /** The per-group keep-threshold filter shared by [[balanceGroups]] and
    * [[mixGroups]]: a row survives iff `idHash mod denom < threshold(group)`.
    * Up to [[graft.transformers.CategoricalEncoding.MaxCaseBranches]] groups
    * the thresholds inline as a when-chain — a pure NARROW filter, no
    * shuffle at any corpus size; above that, a broadcast join against the
    * tiny threshold table. Groups absent from `thresholds` get threshold 0
    * (dropped) on both branches — the when-chain default and the inner
    * join agree. */
  private def thresholdFilter(
      df: DataFrame, groupCol: String, idCol: String,
      thresholds: Seq[(Any, Long)], denom: Long): DataFrame = {
    val h = pmod(minstdHash(col(idCol)), lit(denom))
    if (thresholds.size <= graft.transformers.CategoricalEncoding.MaxCaseBranches) {
      val thrCol = thresholds.foldLeft(lit(0L)) { case (acc, (g, t)) =>
        if (g == null) when(col(groupCol).isNull, lit(t)).otherwise(acc)
        else when(col(groupCol) === lit(g), lit(t)).otherwise(acc)
      }
      df.filter(h < thrCol)
    } else {
      import scala.jdk.CollectionConverters._
      val spark = df.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        df.schema(groupCol).copy(name = "__graft_g"),
        org.apache.spark.sql.types.StructField(
          "__graft_thr", org.apache.spark.sql.types.LongType, nullable = false)))
      val rows = thresholds.map { case (g, t) =>
        org.apache.spark.sql.Row(g, t)
      }.asJava
      val thrDf = broadcast(spark.createDataFrame(rows, schema))
      df.join(thrDf, col(groupCol) <=> col("__graft_g"))
        .filter(h < col("__graft_thr"))
        .drop("__graft_g", "__graft_thr")
    }
  }

  /** Reweight the corpus to caller-specified RELATIVE group weights by
    * deterministic downsampling — the "mixture weights" step of pretraining
    * data assembly (web : code : books = 5 : 2 : 1 and so on), where
    * [[balanceGroups]] is the special case of all-equal weights.
    *
    * Downsample-only: each weighted group g keeps ≈ `weights(g) × K` rows,
    * with the rows-per-part K maximized subject to every weighted group
    * having enough rows (`weights(g) × K ≤ count(g)`) — the most
    * constrained group is kept (almost) whole and every other group thins
    * to match the requested proportions. Groups absent from `weights`
    * (including NULL) are dropped: the result IS the requested mixture,
    * not the input plus corrections. Throws [[graft.errors.FeatureFactoryException.InvalidParameter]]
    * when a weighted group cannot supply even one part (K = 0) — a silent
    * empty result would read as "no data", the misread the LSH bucket caps
    * guard against; and when a weighted group is entirely absent.
    *
    * Fit: one groupBy-count (group cardinality is dictionary-sized).
    * Transform: the same pure-NARROW exact-integer hash filter as
    * [[hashSample]]/[[balanceGroups]] — membership replays bit-for-bit on
    * any engine, and re-runs keep the same rows. */
  def mixGroups(
      df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Long],
      denom: Long = 1000000L): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    weights.foreach { case (g, w) =>
      require(w >= 1, s"weight for group '$g' must be >= 1 (got $w)") }
    require(denom >= 1, "denom must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol))
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__graft_g"))
      .agg(count(lit(1)).as("__graft_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.keys.filterNot(counts.contains)
    if (missing.nonEmpty)
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"mixGroups: weighted group(s) absent from the data: ${missing.mkString(", ")}")
    val k = weights.map { case (g, w) => counts(g) / w }.min
    if (k < 1) {
      val (wg, ww) = weights.minBy { case (g, w) => counts(g).toDouble / w }
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"mixGroups: group '$wg' has ${counts(wg)} rows — fewer than its weight " +
          s"$ww, so no mixture multiple fits; lower the weights or supply more data")
    }
    val thresholds: Seq[(Any, Long)] = weights.toSeq.map { case (g, w) =>
      (g: Any, (w * k) * denom / counts(g))
    }
    // the weights (and so the thresholds) are keyed by the group's STRING
    // form — filter on an explicit string cast so both thresholdFilter
    // branches type-agree with the keys whatever the column's native type
    thresholdFilter(
      df.withColumn("__graft_mix_g", col(groupCol).cast("string")),
      "__graft_mix_g", idCol, thresholds, denom)
      .drop("__graft_mix_g")
  }

  /** Temperature-based mixture reweighting (the multilingual-pretraining
    * standard — Conneau & Lample 2019's `p_g ∝ n_g^α`): group weights are
    * `n_g^alpha` scaled to integers (largest group = `weightScale`, every
    * group ≥ 1), then [[mixGroups]] downsamples to those proportions.
    * `alpha = 1` reproduces the natural distribution (weights ∝ counts);
    * `alpha = 0` is [[balanceGroups]]' uniform mix; in between, head
    * groups are tempered and tail groups (low-resource languages) keep
    * proportionally more of their data.
    *
    * The pow lives DRIVER-side in the integer weight table (exported
    * alongside results for replay — floating pow differs across engines in
    * the last ulp, so it must not sit inside row-level membership
    * arithmetic); membership itself is [[mixGroups]]' exact-integer hash
    * threshold, bit-replayable from the weight table by any engine.
    * Returns (mixed frame, the weight table used). Same scale shape as
    * [[mixGroups]]: one groupBy-count fit + a pure narrow filter. */
  def mixGroupsTemperature(
      df: DataFrame, groupCol: String, idCol: String,
      alpha: Double,
      weightScale: Long = 1000L): (DataFrame, Map[String, Long]) = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    require(weightScale >= 1, "weightScale must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol))
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__graft_g"))
      .agg(count(lit(1)).as("__graft_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty)
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        "mixGroupsTemperature: no non-NULL groups to mix")
    val raw = counts.map { case (g, n) => g -> math.pow(n.toDouble, alpha) }
    val maxW = raw.values.max
    // feasibility cap: mixGroups needs weight(g) <= count(g) for every
    // group (K >= 1), so the integer scale is bounded by the tightest
    // group — weight granularity is then limited by the smallest group's
    // size, which is exactly the resolution the data can express anyway
    val effScale = math.min(weightScale,
      raw.map { case (g, w) => math.floor(counts(g) * maxW / w).toLong }.min)
    val weights = raw.map { case (g, w) =>
      g -> math.max(1L, math.round(effScale * w / maxW))
    }
    (mixGroups(df, groupCol, idCol, weights), weights)
  }

  /** Upsample (or thin) groups by a REAL-valued factor — the "books × 3
    * epochs, code × 1.5, web × 1" replication step of pretraining-mix
    * assembly, the direction [[mixGroups]] (downsample-only) cannot go.
    * Every row in group g is emitted `⌊f⌋` times, plus one more iff the
    * row's id-hash bucket falls under the fractional part — so the group's
    * output mass is ≈ `f × count(g)` and which rows carry the extra epoch
    * is deterministic, engine-replayable [[minstdHash]] arithmetic (the
    * fractional thresholds are integerized ONCE driver-side; no per-row
    * float compare). Factors < 1 thin the group the same way ([[hashSample]]
    * semantics); groups absent from `factors` keep exactly 1 copy — this op
    * ADDS epochs to a corpus, it does not select a mixture (that is
    * [[mixGroups]]' contract). A 0-copy row is dropped before the
    * generator, so no empty-sequence edge exists.
    *
    * Output appends an `epoch` column (0-based copy index) — downstream
    * shuffling/sharding then treats each (row, epoch) as a distinct
    * training example, and a loader that wants epoch boundaries can
    * partition on it. Scale shape: one narrow projection + generator
    * (explode of a ≤⌈f⌉-element sequence) — no shuffle, no fit job, output
    * rows ≈ Σ f_g·n_g. */
  def upsampleGroups(
      df: DataFrame, groupCol: String, idCol: String,
      factors: Map[String, Double],
      denom: Long = 1000000L): DataFrame = {
    require(factors.nonEmpty, "factors must be non-empty")
    factors.foreach { case (g, f) =>
      require(f >= 0.0 && f.isFinite, s"factor for group '$g' must be finite and >= 0 (got $f)") }
    require(denom >= 1, "denom must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol))
    graft.core.Validators.requireColumnsAbsent(df, Seq("epoch"), "upsampleGroups")
    // integerize once, driver-side: whole copies + the fractional-part hash
    // threshold in [0, denom] — identical literals land in the oracle SQL
    val table: Seq[(String, Long, Long)] = factors.toSeq.map { case (g, f) =>
      val whole = math.floor(f).toLong
      (g, whole, math.round((f - whole) * denom))
    }
    val gStr = col(groupCol).cast("string")
    val whole = table.foldLeft(lit(1L)) { case (acc, (g, w, _)) =>
      when(gStr === lit(g), lit(w)).otherwise(acc) }
    val fracThr = table.foldLeft(lit(0L)) { case (acc, (g, _, t)) =>
      when(gStr === lit(g), lit(t)).otherwise(acc) }
    val copies = (whole +
      when(pmod(minstdHash(col(idCol)), lit(denom)) < fracThr, lit(1L))
        .otherwise(lit(0L))).as("__graft_copies")
    df.withColumn("__graft_copies", copies)
      .filter(col("__graft_copies") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(0), (col("__graft_copies") - 1).cast("int"))))
      .drop("__graft_copies")
  }

  /** Greedy token-budget sequence packing for pretraining batches: orders
    * documents deterministically (id hash), streams them into bins of
    * `capacity` tokens, and emits `(bucket, bin, start_offset)` so a
    * downstream tokenizer can concatenate each bin into one training
    * sequence. A document lands in the bin where its running total ENDS
    * (documents are not split), so bins hold ≈capacity tokens; rows with a
    * non-positive token count are dropped (nothing to pack).
    *
    * Scale shape: a single global ordering would serialize into one task,
    * so packing is two-level — documents hash into `numBuckets` independent
    * streams, and the running sum windows WITHIN each bucket (one shuffle
    * on `bucket`, `numBuckets`-way parallel). Bin ids are deterministic
    * integer math over the portable hash order, replayable by any engine. */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      capacity: Long, numBuckets: Int = 1024): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    require(numBuckets >= 1, "numBuckets must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(idCol, tokenCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("bucket", "bin", "start_offset"), "packSequences")
    // explicit ROWS frame: the default RANGE frame gives order-peer rows
    // (duplicate ids) one shared running total, diverging from the
    // one-row-at-a-time semantics the oracle replays
    val w = Window.partitionBy(col("bucket"))
      .orderBy(minstdHash(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(tokenCol) > 0)
      .withColumn("bucket", pmod(minstdHash(col(idCol)), lit(numBuckets.toLong)))
      .withColumn("__graft_cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("bin", expr(s"(__graft_cum - 1) DIV ${capacity}L"))
      .withColumn("start_offset", col("__graft_cum") - col(tokenCol).cast("long"))
      .drop("__graft_cum")
  }

  /** The last mile after [[packSequences]]: turn the (bucket, bin)
    * assignments into actual trainer-ready rows — one row per bin with the
    * member texts concatenated IN PACK ORDER plus the bin's document and
    * token totals. `start_offset` is strictly increasing in pack order
    * within a bin (token counts are positive), so the in-bin order needs
    * no re-derivation of the hash ordering — sort the collected members by
    * it and join. Write the result with
    * [[graft.sources.Writer.save]]`(…, "out.jsonl.gz")` and a data loader
    * streams finished sequences.
    *
    * Scale shape: ONE hash aggregate on (bucket, bin) — bins hold
    * ≈capacity tokens, so a group buffers one training sequence's text,
    * never a partition's. No window, no sort beyond the per-bin
    * array_sort. */
  def materializeSequences(
      packed: DataFrame,
      textCol: String,
      tokenCol: String,
      joiner: String = " "): DataFrame = {
    graft.core.Validators.requireColumns(packed,
      Seq(textCol, tokenCol, "bucket", "bin", "start_offset"))
    packed.groupBy(col("bucket"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              col("start_offset").as("o"), col(textCol).as("t")))),
            s => s("t")),
          joiner).as("seq_text"))
  }

  /** Deterministic token-budget sampling: keep documents, in the portable
    * two-level hash order, until the running token total reaches `budget`
    * — "train on the first N tokens of this corpus", the token-count
    * sibling of [[hashSample]]'s row-percent rule. A document is kept iff
    * its running total ENDS at or below the budget (documents are not
    * split); rows with a non-positive token count are dropped (nothing to
    * count), as in [[packSequences]].
    *
    * The order is bucket-major (bucket, id-hash, id): documents hash into
    * `numBuckets` independent streams — pseudorandom, so the kept slice is
    * an unbiased cross-section of the corpus — each bucket's token total
    * aggregates first, the driver prefix-sums the `numBuckets` totals into
    * per-bucket starting offsets (dictionary-sized collect, like every fit
    * in this file), and the within-bucket running sum plus the bucket
    * offset decides membership. One aggregate plus one shuffle on the
    * bucket, `numBuckets`-way parallel — no global sort, no serialized
    * running sum — and all exact 64-bit integer math over the portable
    * hash, so membership replays bit-for-bit on any engine and re-runs
    * keep exactly the same slice. */
  def sampleTokenBudget(
      df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numBuckets: Int = 1024): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    require(numBuckets >= 1, "numBuckets must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(idCol, tokenCol))
    withTokensBefore(df, idCol, tokenCol, numBuckets, checkpoint = true)
      .filter(col("__graft_before") + col(tokenCol).cast("long") <= budget)
      .drop("__graft_before")
  }

  /** Packing-efficiency report over a [[packSequences]] layout: sequences
    * (distinct (bucket, bin)), docs and token mass packed, and the mean
    * fill fraction against `capacity` — the "how much context window am I
    * wasting" gauge a trainer checks before committing a packing. Fill =
    * tokens / (sequences · capacity): EVERY bin is priced at capacity,
    * including each bucket's partially-filled last bin, so the metric is
    * exactly the fraction of reserved context-window slots that carry
    * tokens. Exact integer sums, one aggregate pass, a single-row
    * result. */
  def packingReport(
      packed: DataFrame, tokenCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    graft.core.Validators.requireColumns(packed,
      Seq("bucket", "bin", tokenCol))
    packed.agg(
      countDistinct(col("bucket"), col("bin")).as("n_sequences"),
      count(lit(1)).as("n_docs"),
      sum(col(tokenCol).cast("long")).as("n_tokens"))
      .select(
        col("n_sequences"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("n_tokens"), lit(0L)).cast("double") /
          (col("n_sequences") * lit(capacity)).cast("double"), 9).as("fill"))
  }

  /** Per-group token budgets — the pretraining mixture stated the way
    * trainers actually state it ("100 B tokens of web, 20 B of code, 5 B
    * of books"): within every budgeted group, keep documents in the
    * portable two-level hash order until the group's running token total
    * reaches its budget. [[sampleTokenBudget]]'s rule, one budget per
    * group; groups absent from `budgets` (including NULL) are dropped —
    * the result IS the requested mixture ([[mixGroups]]' rule). Budgets
    * key the group's STRING form, like every group-keyed fit here.
    *
    * Scale shape: the same bucket-major prefix machinery with the group
    * joining the part key — one (group, bucket) totals aggregate
    * (groups × numBuckets rows collected, dictionary-sized × 1024), driver
    * prefix offsets WITHIN each group, one shuffle on (group, bucket) for
    * the running sum, and the keep filter compares against the broadcast
    * per-group budget row. No global sort, exact 64-bit integer math,
    * bit-replayable membership. */
  def sampleTokenBudgetPerGroup(
      df: DataFrame, groupCol: String, idCol: String, tokenCol: String,
      budgets: Map[String, Long], numBuckets: Int = 1024): DataFrame = {
    budgets.foreach { case (g, bud) =>
      require(bud >= 0, s"budget for group '$g' must be >= 0 (got $bud)") }
    require(numBuckets >= 1, "numBuckets must be >= 1")
    require(budgets.nonEmpty, "budgets must name at least one group")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol, tokenCol))
    import org.apache.spark.sql.types.{LongType, StringType}
    val spark = df.sparkSession
    val keyDf = broadcastFrame(spark,
      Seq("__graft_g" -> StringType, "__graft_budget" -> LongType),
      budgets.toSeq.map { case (g, bud) => org.apache.spark.sql.Row(g, bud) })
    val filtered = df
      .withColumn("__graft_g", col(groupCol).cast("string"))
      .filter(col(tokenCol) > 0 && col(idCol).isNotNull)
      .join(keyDf, Seq("__graft_g")) // broadcast: scopes to budgeted groups
      .withColumn("__graft_bkt", pmod(minstdHash(col(idCol)), lit(numBuckets.toLong)))
    val positive = Dedup.materializeLazy(filtered)
    val totals = positive.groupBy(col("__graft_g"), col("__graft_bkt"))
      .agg(sum(col(tokenCol).cast("long")).as("__graft_tot"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val offDf = broadcastFrame(spark,
      Seq("__graft_g" -> StringType, "__graft_bkt" -> LongType,
        "__graft_off" -> LongType),
      exclusivePrefixByPart(totals.toSeq).map { case (g, b, o) =>
        org.apache.spark.sql.Row(g, b, o) })
    val w = Window.partitionBy(col("__graft_g"), col("__graft_bkt"))
      .orderBy(minstdHash(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positive
      .withColumn("__graft_cum", sum(col(tokenCol).cast("long")).over(w))
      .join(offDf, Seq("__graft_g", "__graft_bkt"))
      .filter(col("__graft_off") + col("__graft_cum") <= col("__graft_budget"))
      .drop("__graft_g", "__graft_bkt", "__graft_cum", "__graft_off", "__graft_budget")
  }

  /** Shared scaffold of the token-running-sum layouts ([[sampleTokenBudget]],
    * [[graft.sources.Writer.shardByTokenBudget]]): keeps rows with a
    * positive token count and a non-NULL id (no hash position in the order
    * otherwise) and appends `__graft_before` = the exact token total
    * strictly BEFORE the row in the bucket-major portable hash order
    * (bucket, id-hash, id). One per-bucket totals aggregate
    * (numBuckets-sized collect), driver prefix offsets
    * ([[exclusivePrefixByPart]]), one bucket shuffle for the running sum —
    * with an explicit ROWS frame, as in [[packSequences]]: the default
    * RANGE frame gives order-peer rows (duplicate ids) one shared running
    * total, diverging from the one-row-at-a-time rule the oracles replay.
    *
    * `checkpoint` lazily materializes the filtered input so the totals
    * pass and the window pass share one upstream computation — the
    * [[sampleTokenBudget]] trade, whose token column is typically a
    * computed tokenize that a narrow re-read would recompute. Pass false
    * when a pruned re-read is cheaper than caching the full-width corpus
    * (the Writer layout trade). */
  private[graft] def withTokensBefore(
      df: DataFrame, idCol: String, tokenCol: String,
      numBuckets: Int, checkpoint: Boolean): DataFrame = {
    val filtered = df.filter(col(tokenCol) > 0 && col(idCol).isNotNull)
      .withColumn("__graft_bkt", pmod(minstdHash(col(idCol)), lit(numBuckets.toLong)))
    val positive = if (checkpoint) Dedup.materializeLazy(filtered) else filtered
    val totals = positive.groupBy(col("__graft_bkt"))
      .agg(sum(col(tokenCol).cast("long")).as("__graft_tot"))
      .collect().map(r => ((), r.getLong(0), r.getLong(1)))
    import org.apache.spark.sql.types.LongType
    val offDf = broadcastFrame(df.sparkSession,
      Seq("__graft_bkt" -> LongType, "__graft_off" -> LongType),
      exclusivePrefixByPart(totals.toSeq).map { case (_, b, o) =>
        org.apache.spark.sql.Row(b, o) })
    val w = Window.partitionBy(col("__graft_bkt"))
      .orderBy(minstdHash(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positive
      .withColumn("__graft_cum", sum(col(tokenCol).cast("long")).over(w))
      .join(offDf, "__graft_bkt")
      .withColumn("__graft_before",
        col("__graft_off") + col("__graft_cum") - col(tokenCol).cast("long"))
      .drop("__graft_bkt", "__graft_cum", "__graft_off")
  }

  /** Leakage-safe train/test assignment: like [[trainTestSplit]], but every
    * row sharing `groupCol` (a content digest, an exact-dup cluster key, a
    * url host…) lands in the SAME split — the split decision hashes the
    * group's representative id (its minimum `idCol`), not the row's own id.
    * Plain id-hash splitting puts two copies of one document on both sides
    * of the train/test fence, which reads as generalization but is
    * memorization; grouping the split by content key is the standard
    * defense.
    *
    * Scale shape: one groupBy(min) whose shuffle carries only
    * `(group, id)` pairs after map-side partial aggregation, then one
    * shuffle join back on the group key (no sort, unlike a window min).
    * The representative-id choice (min) is deterministic under any
    * partitioning, so membership replays bit-for-bit on any engine.
    *
    * NULL handling follows [[trainTestSplit]]: `min` skips NULL ids, so a
    * row with a NULL id inherits its group's non-NULL representative; a
    * group whose ids are ALL NULL has a NULL rep and lands in "test"
    * (exactly where trainTestSplit puts a NULL id). NULL groups are one
    * group (null-safe join). */
  def leakageSafeSplit(
      df: DataFrame, groupCol: String, idCol: String,
      trainPercent: Int): DataFrame = {
    require(trainPercent >= 0 && trainPercent <= 100,
      "trainPercent must be in [0, 100]")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol))
    graft.core.Validators.requireColumnsAbsent(df, Seq("split"), "leakageSafeSplit")
    val reps = df.groupBy(col(groupCol).as("__graft_lsg"))
      .agg(min(col(idCol)).as("__graft_rep"))
    df.join(reps, col(groupCol) <=> col("__graft_lsg"))
      .withColumn("split", splitDecision(col("__graft_rep"), trainPercent))
      .drop("__graft_lsg", "__graft_rep")
  }

  /** Deterministic weighted round-robin training order: assigns every row
    * an `order_key` such that reading the corpus in `order_key` order
    * interleaves the groups at the requested rates — weights
    * `web:code:books = 5:2:1` yield cycles of 5 web docs, 2 code docs,
    * 1 book doc, repeating. This is the "epoch schedule" step of
    * pretraining assembly: [[mixGroups]] decides WHAT survives the
    * mixture, this decides the ORDER it is consumed in.
    *
    * Within each group, documents take the bucket-major portable hash
    * order of [[sampleTokenBudget]] (pseudorandom, engine-replayable);
    * the k-th document of group g (0-based) gets
    * `order_key = (k div w_g)·W + offset_g + (k mod w_g)` with
    * `W = Σ weights` and `offset_g` the cycle offset of g's slot block
    * (groups in sorted name order) — exact integer math, unique across
    * the corpus, monotone in k within each group. Keys stay DENSE while
    * all groups last; once a group exhausts, later cycles keep their
    * gaps (order_key is a SORT key, not a row number). Groups absent
    * from `weights` (including NULL) are dropped, as in [[mixGroups]].
    *
    * Scale shape: the per-group rank is two-level like
    * [[sampleTokenBudget]] — rank within (group, bucket) plus
    * driver-prefix-summed per-(group, bucket) counts — so a group is
    * `numBuckets` window partitions, not one giant sorted task; one
    * count aggregate (dictionary-sized collect: groups × buckets) and
    * one shuffle on (group, bucket). EAGER, like every fit in this
    * file: the counts aggregate runs at call time. */
  def interleaveSources(
      df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Long], numBuckets: Int = 1024): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    weights.foreach { case (g, w) =>
      require(w >= 1, s"weight for group '$g' must be >= 1 (got $w)") }
    require(numBuckets >= 1, "numBuckets must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(groupCol, idCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("order_key"), "interleaveSources")
    val W = weights.values.sum
    val names = weights.keys.toSeq.sorted
    val cycleOffsets: Map[String, Long] =
      names.zip(names.scanLeft(0L)(_ + weights(_)).init).toMap
    val gs = col(groupCol).cast("string")
    // NULL ids are dropped (as hashSample's filter does implicitly): a
    // null id has no hash position in the order
    val base = df.filter(gs.isin(names: _*) && col(idCol).isNotNull)
      .withColumn("__graft_bkt", pmod(minstdHash(col(idCol)), lit(numBuckets.toLong)))
    // per-(group, bucket) counts → driver prefix offsets, so the global
    // per-group rank is bucket rank + bucket start (dictionary-sized
    // collect: |groups| × numBuckets, the same budget as sampleTokenBudget).
    // This fit pass re-reads the upstream with columns pruned to
    // (group, id) — deliberately NOT checkpointed: caching the full-width
    // corpus to make a two-column aggregate cheaper is the wrong trade at
    // scale (callers with an expensive narrow upstream can checkpoint it
    // themselves before calling)
    val counts = base.groupBy(gs.as("__g"), col("__graft_bkt"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a weighted group with zero surviving rows is usually a typo'd name —
    // fail loudly, as mixGroups does, rather than silently skip its slots
    val present = counts.map(_._1).toSet
    val absent = names.filterNot(present)
    if (absent.nonEmpty)
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"interleaveSources: weighted group(s) absent from the data " +
          s"(or with all-NULL ids): ${absent.mkString(", ")}")
    import org.apache.spark.sql.types.{LongType, StringType}
    val startDf = broadcastFrame(df.sparkSession,
      Seq("__graft_sg" -> StringType, "__graft_sbkt" -> LongType,
        "__graft_start" -> LongType),
      exclusivePrefixByPart(counts.toSeq).map { case (g, b, s) =>
        org.apache.spark.sql.Row(g, b, s) })
    val rankW = Window.partitionBy(gs, col("__graft_bkt"))
      .orderBy(minstdHash(col(idCol)).asc, col(idCol).asc)
    // dictionary-sized when-chains (like thresholdFilter's narrow branch)
    val wCol = names.foldLeft(lit(0L)) { (acc, g) =>
      when(gs === lit(g), lit(weights(g))).otherwise(acc) }
    val offCol = names.foldLeft(lit(0L)) { (acc, g) =>
      when(gs === lit(g), lit(cycleOffsets(g))).otherwise(acc) }
    base
      .withColumn("__graft_rb", row_number().over(rankW).cast("long") - 1L)
      .join(startDf,
        gs === col("__graft_sg") && col("__graft_bkt") === col("__graft_sbkt"))
      .drop("__graft_sg", "__graft_sbkt")
      .withColumn("__graft_k", col("__graft_start") + col("__graft_rb"))
      .withColumn("__graft_w", wCol)
      .withColumn("__graft_cyc_off", offCol)
      // SQL DIV (IntegralDivide), not `/` (Divide→double): exact long math
      // at any corpus size; k ≥ 0 and w ≥ 1 so % matches pmod here
      .withColumn("order_key", expr(
        s"(__graft_k DIV __graft_w) * ${W}L + __graft_cyc_off + (__graft_k % __graft_w)"))
      .drop("__graft_bkt", "__graft_rb", "__graft_start",
        "__graft_k", "__graft_w", "__graft_cyc_off")
  }
}
