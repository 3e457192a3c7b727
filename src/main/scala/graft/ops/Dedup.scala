package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Extension beyond the reference surface (SURVEY §2.11): the reference has
  * no dedup of any kind. Everything here is built from Catalyst expressions
  * (higher-order array functions + xxhash64, plus the native tile-pair
  * expressions of graft.functions when GraftExtensions is installed) — no
  * UDFs, and no driver-side data state, so each operator is a fixed number
  * of shuffles regardless of data size.
  *
  * Scale design rules shared by every operator below:
  *  - expensive per-row expressions (shingling, signatures) are computed in
  *    exactly ONE operator and only compact attributes ride through shuffles;
  *  - candidate pairs come from grouping by a bucket key (LSH band / bit
  *    chunk / rare shingle) and expanding each bucket with the similarity
  *    predicate applied INLINE — never from an unbucketed self-join, and
  *    non-matching pairs are never materialized;
  *  - exact verification is adaptive: corpora whose shingle vocabulary is
  *    small (≤ [[MaxBitmapVocab]] distinct shingles — common for synthetic
  *    or highly templated text) use global-dictionary bitmaps (V/64 longs
  *    per doc, exact Jaccard in ~V/32 bit ops per pair); everything else
  *    uses a minhash-estimate prefilter plus hashed-shingle intersection on
  *    the surviving candidates only.
  */
object Dedup {

  /** Distinct-shingle vocabulary size up to which exact Jaccard runs on
    * global-dictionary bitmaps. 4096 → at most 64 longs (512 B) per doc in
    * the bucket shuffle, same payload class as a minhash signature. */
  var MaxBitmapVocab: Int = 4096

  /** Test hook: force the pure-Column fallback formulations even when the
    * native kernels are registered on the session (lets one session
    * cross-check both variants). */
  var ForceFallback: Boolean = false

  /** Exact dedup: one surviving row per distinct value of `keyCols`, keeping
    * the row with the smallest `tieBreak` (deterministic, unlike
    * `dropDuplicates`, which keeps an arbitrary row per key).
    *
    * Scale: single hash-shuffle on the key columns with map-side partial
    * aggregation; no skew risk beyond genuinely hot keys.
    */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    val row = struct(df.columns.map(col).toSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(row, col(tieBreak)).as("__graft_row"))
      .select(col("__graft_row.*"))
  }

  /** Distinct character shingles (n-grams) of `text`, empty when the text is
    * shorter than `shingleSize`. Pure expression (sequence + substr). */
  def shingles(text: Column, shingleSize: Int): Column = {
    val n = length(text) - shingleSize + 1
    when(
      n >= 1,
      array_distinct(
        transform(sequence(lit(1), n), i => text.substr(i, lit(shingleSize)))))
      .otherwise(lit(Array.empty[String]))
  }

  /** Each distinct shingle hashed once to a long — the single place where
    * string hashing happens; every downstream hash/compare is long-typed.
    * (Jaccard over hashed shingles equals Jaccard over the string sets
    * unless xxhash64 collides within one corpus vocabulary — negligible.) */
  def shingleHashes(text: Column, shingleSize: Int): Column =
    transform(shingles(text, shingleSize), s => xxhash64(s))

  // ───────────────────────── shared internals ─────────────────────────

  private def nativeFnsAvailable(df: DataFrame): Boolean =
    !ForceFallback &&
      df.sparkSession.catalog.functionExists(graft.functions.TilePairs.ShingleName)

  /** [[shingleHashes]] through the native kernel (bit-identical, ~10× less
    * per-row overhead) when GraftExtensions is installed on the session. */
  private def shingleHashesFor(df: DataFrame, text: Column, shingleSize: Int): Column =
    if (nativeFnsAvailable(df))
      call_function(graft.functions.TilePairs.ShingleName, text, lit(shingleSize))
    else shingleHashes(text, shingleSize)

  /** (id, h) rows: one row per distinct shingle hash per doc. Docs shorter
    * than the shingle size vanish here (no shingles → no candidates). */
  private def explodedHashes(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol).as("id"),
      explode(shingleHashesFor(df, col(textCol), n)).as("h"))

  /** Side length of a pair-expansion tile (members per side). */
  private val BlockSize = 512

  /** All (x ∈ left, y ∈ right) pairs satisfying `keep` — left members all
    * precede right members in the bucket's sort order, so pair order holds. */
  private def crossPairs(
      l: Column, r: Column,
      keep: (Column, Column) => Column,
      emit: (Column, Column) => Column): Column =
    flatten(transform(l, x => transform(filter(r, y => keep(x, y)), y => emit(x, y))))

  /** Jaccard length filter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a pair
    * can only reach `threshold` if the smaller set is at least threshold ×
    * the larger. Two comparisons — used to short-circuit the bitmap fold. */
  private def lengthCompatible(x: Column, y: Column, threshold: Double): Column =
    least(x("sz"), y("sz")).cast("double") >=
      greatest(x("sz"), y("sz")).cast("double") * threshold

  /** Expand a bucket array `xs` (sorted array<struct>, first field the id)
    * into the pairs (x, y), x before y, that satisfy `keep` — evaluated as
    * ONE expression per bucket row, so non-matching pairs are filtered
    * during evaluation and never materialized into the output array. */
  private def expandBucket(
      xs: Column,
      keep: (Column, Column) => Column,
      emit: (Column, Column) => Column): Column =
    flatten(transform(xs, (x, i) =>
      transform(
        filter(slice(xs, i + lit(2), size(xs)), y => keep(x, y)),
        y => emit(x, y))))

  /** Blocked, cluster-spread bucket expansion. A bucket's expansion cost is
    * quadratic in member count, so (a) AQE's byte-based partition coalescing
    * misjudges it, and (b) one giant bucket (skewed key — e.g. thousands of
    * near-identical docs sharing a band hash) would pin its whole O(k²)
    * evaluation on a single core. Split each bucket's pair space into
    * (block i ≤ block j) tiles of at most [[BlockSize]] members per side,
    * repartition the TILES across 2× the configured parallelism (explicit
    * numPartitions so AQE cannot re-coalesce), then evaluate each tile —
    * diagonal tiles as ordered pairs, off-diagonal as full crosses. `buckets`
    * must have the sorted member array in column `xs`; returns one column
    * `p` per surviving pair. */
  private def tileBuckets(buckets: DataFrame, keys: Seq[Column]): DataFrame = {
    val g = ceil(size(col("xs")).cast("double") / BlockSize).cast("int")
    val blockPairs = flatten(transform(sequence(lit(0), g - 1), bi =>
      transform(sequence(bi, g - 1), bj => struct(bi.as("bi"), bj.as("bj")))))
    val parts = buckets.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions").map(_.toInt)
      .getOrElse(buckets.sparkSession.sparkContext.defaultParallelism) * 2
    buckets
      .select(keys :+ col("xs") :+ explode(blockPairs).as("b"): _*)
      .select(
        keys ++ Seq(
          col("b.bi").as("bi"), col("b.bj").as("bj"),
          slice(col("xs"), col("b.bi") * BlockSize + 1, lit(BlockSize)).as("l"),
          slice(col("xs"), col("b.bj") * BlockSize + 1, lit(BlockSize)).as("r")): _*)
      .repartition(parts, keys ++ Seq(col("bi"), col("bj")): _*)
  }

  private def expandBuckets(
      buckets: DataFrame,
      keys: Seq[Column],
      keep: (Column, Column) => Column,
      emit: (Column, Column) => Column): DataFrame =
    tileBuckets(buckets, keys)
      .select(explode(
        when(col("bi") === col("bj"), expandBucket(col("l"), keep, emit))
          .otherwise(crossPairs(col("l"), col("r"), keep, emit))).as("p"))

  /** Two-sided bucket tiling for ASYMMETRIC joins: buckets have separate
    * left (`lxs`) and right (`rxs`) member arrays; every (left block ×
    * right block) tile of at most [[BlockSize]] members per side is spread
    * across the cluster and evaluated as a full cross (no diagonal) — the
    * degenerate-bucket protection of [[tileBuckets]] for band joins where a
    * hot band hash would otherwise materialize millions of joined rows. */
  private def tileBucketsCross(buckets: DataFrame, keys: Seq[Column]): DataFrame = {
    val gl = ceil(size(col("lxs")).cast("double") / BlockSize).cast("int")
    val gr = ceil(size(col("rxs")).cast("double") / BlockSize).cast("int")
    val blockPairs = flatten(transform(sequence(lit(0), gl - 1), bi =>
      transform(sequence(lit(0), gr - 1), bj => struct(bi.as("bi"), bj.as("bj")))))
    val parts = buckets.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions").map(_.toInt)
      .getOrElse(buckets.sparkSession.sparkContext.defaultParallelism) * 2
    buckets
      .select(keys ++ Seq(col("lxs"), col("rxs")) :+ explode(blockPairs).as("b"): _*)
      .select(
        keys ++ Seq(
          col("b.bi").as("bi"), col("b.bj").as("bj"),
          slice(col("lxs"), col("b.bi") * BlockSize + 1, lit(BlockSize)).as("l"),
          slice(col("rxs"), col("b.bj") * BlockSize + 1, lit(BlockSize)).as("r")): _*)
      .repartition(parts, keys ++ Seq(col("bi"), col("bj")): _*)
  }

  /** Expand cross-side bucket pairs: native tile kernel when available
    * (diagonal=false → full left×right cross), HOF crossPairs fallback. */
  private def expandCrossBuckets(
      buckets: DataFrame,
      keys: Seq[Column],
      fnName: String,
      arg: Column,
      keep: (Column, Column) => Column,
      emit: (Column, Column) => Column): DataFrame = {
    val tiles = tileBucketsCross(buckets, keys)
    if (nativeTilePairsAvailable(buckets))
      tiles.select(explode(call_function(
        fnName, col("l"), col("r"), lit(false), arg)).as("p"))
    else
      tiles.select(explode(crossPairs(col("l"), col("r"), keep, emit)).as("p"))
  }

  /** Tile expansion through a native Catalyst expression (one tight eval
    * per tile — see graft.functions.TilePairs) when [[GraftExtensions]] is
    * installed on the session; callers fall back to [[expandBuckets]]'s
    * higher-order-function formulation otherwise. */
  private def expandBucketsNative(
      buckets: DataFrame,
      keys: Seq[Column],
      fnName: String,
      args: Column*): DataFrame =
    tileBuckets(buckets, keys)
      .select(explode(call_function(
        fnName, Seq(col("l"), col("r"), col("bi") === col("bj")) ++ args: _*)).as("p"))

  /** Symmetric bucket expansion with native/HOF dispatch — the
    * [[minhashCandidates]] idiom packaged for sibling ops (Similarity's
    * embedding near-dup runs on the same tiling machinery). `buckets` must
    * carry the sorted member array in `xs`; returns one `p` struct column
    * per surviving pair. */
  private[ops] def expandSymmetricBuckets(
      buckets: DataFrame,
      keys: Seq[Column],
      fnName: String,
      arg: Column,
      keep: (Column, Column) => Column,
      emit: (Column, Column) => Column): DataFrame =
    if (nativeTilePairsAvailable(buckets))
      expandBucketsNative(buckets, keys, fnName, arg)
    else
      expandBuckets(buckets, keys, keep, emit)

  /** Materialize an intermediate that later stages read several times.
    * Uses RELIABLE checkpointing (survives executor loss — the right choice
    * for long cluster jobs) when the session has a checkpoint dir
    * configured, else `localCheckpoint` (executor-local blocks: faster, but
    * an executor death forces recompute — acceptable in local mode and
    * short jobs). */
  private[ops] def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** [[materialize]] without the eager job: the checkpoint materializes on
    * FIRST ACTION instead of at DataFrame-construction time. Use at
    * public-API construction sites — a caller that builds the frame but
    * never executes it (explain, conditional pipelines) shouldn't pay the
    * upstream computation. */
  private[ops] def materializeLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  private def nativeTilePairsAvailable(df: DataFrame): Boolean =
    !ForceFallback &&
      df.sparkSession.catalog.functionExists(graft.functions.TilePairs.JaccardName)

  /** Σ bit_count(a[i] & b[i]) — exact intersection size of two bitmap
    * arrays (same global dictionary). */
  private def bitmapCommon(a: Column, b: Column, words: Int): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
      lit(0L),
      (acc, v) => acc + v)

  /** Exact Jaccard from bitmaps + set sizes: |A∩B| / (|A|+|B|−|A∩B|). */
  private def bitmapJaccard(x: Column, y: Column, words: Int): Column = {
    val common = bitmapCommon(x("bm"), y("bm"), words)
    common.cast("double") / (x("sz") + y("sz") - common).cast("double")
  }

  /** OR-aggregate building a V-bit bitmap as `words` longs from a 0-based
    * dictionary index column. Each (doc, shingle) row sets exactly one bit,
    * and rows are distinct per doc, so SUM of the one-hot words is the OR. */
  private def bitmapAggs(idx: Column, words: Int): Seq[Column] =
    (0 until words).map { w =>
      sum(
        when(
          (idx / 64).cast("int") === w,
          call_function("shiftleft", lit(1L), (idx % 64).cast("int")))
          .otherwise(lit(0L))).as(s"bm$w")
    }

  /** ONE probe job deciding the verification strategy: collect the distinct
    * shingle hashes AND their document frequencies when there are at most
    * [[MaxBitmapVocab]] of them (partial agg + limit MaxBitmapVocab+1 — the
    * limit caps what can ever reach the driver), else None → general path.
    * The driver-side frequencies also replace the freq-join + per-doc window
    * the prefix filter otherwise needs. */
  private def smallVocabFreq(hashed: DataFrame): Option[Array[(Long, Long)]] = {
    val probe = hashed
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"))
      .limit(MaxBitmapVocab + 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (probe.length <= MaxBitmapVocab) Some(probe) else None
  }

  private def smallVocab(hashed: DataFrame): Option[Array[Long]] =
    smallVocabFreq(hashed).map(_.map(_._1).sorted)

  /** Driver-side dictionary over a small vocabulary: hashes sorted by value
    * (for binary search), each position's bit RANK in global rarity order
    * (freq asc, hash asc), and the per-rank frequency. Bit r of a bitmap =
    * "doc contains the r-th rarest shingle", so a prefix filter is just the
    * first k set bits. */
  private case class RarityDict(
      vocabSorted: Array[Long], rankOf: Array[Int], freqByRank: Array[Long]) {
    def words: Int = (vocabSorted.length + 63) / 64
  }

  private def rarityDict(entries: Array[(Long, Long)]): RarityDict = {
    val byRarity = entries.sortBy { case (h, n) => (n, h) }
    val rankIndex = byRarity.iterator.zipWithIndex
      .map { case ((h, _), r) => h -> r }.toMap
    val vocabSorted = entries.map(_._1).sorted
    RarityDict(vocabSorted, vocabSorted.map(rankIndex), byRarity.map(_._2))
  }

  /** Per-doc (id, sz, bm) through the native kernels: one narrow projection,
    * no join, no shuffle. Docs with no shingles are dropped (as in the
    * exploded formulation, where they produce no rows). */
  private def nativeFeatures(
      df: DataFrame, idCol: String, textCol: String, n: Int, d: RarityDict): DataFrame =
    df.select(
      col(idCol).as("id"),
      shingleHashesFor(df, col(textCol), n).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(
        col("id"),
        size(col("gs")).cast("int").as("sz"),
        call_function(graft.functions.TilePairs.BitmapName, col("gs"),
          typedLit(d.vocabSorted.toSeq), typedLit(d.rankOf.toSeq)).as("bm"),
        col("gs"))

  /** Tiny (h → 0-based idx) dictionary DataFrame from the collected
    * vocabulary — broadcast into the feature join. */
  private def dictionaryDf(df: DataFrame, vocab: Array[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    vocab.zipWithIndex.toSeq.toDF("h", "idx")
  }

  /** (id, sz, bm): per-doc distinct-shingle count and dictionary bitmap,
    * one join + one aggregate job. */
  private def bitmapFeatures(hashed: DataFrame, dict: DataFrame, words: Int): DataFrame = {
    val aggs = count(lit(1)).cast("int").as("sz") +: bitmapAggs(col("idx"), words)
    hashed
      .join(broadcast(dict), "h")
      .groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), col("sz"), array((0 until words).map(w => col(s"bm$w")): _*).as("bm"))
  }

  /** Exact-duplicate groups: (text, sorted member ids). Near-dup pipelines
    * run on one REPRESENTATIVE per distinct text — on dup-heavy corpora
    * (the common case for web-scale training data) this shrinks the LSH
    * problem by the duplication factor AND keeps identical-doc clusters
    * from blowing buckets toward maxBucketSize, where their pairs would be
    * dropped. Within-group pairs are emitted directly with Jaccard 1.0;
    * representative pairs are expanded back over the group members. */
  private def dupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).as("text"))
      .groupBy("text")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      // materialized once (executor-local storage, disk-spillable): the
      // pipelines read this 3-4× (probe, features, within-group pairs,
      // member re-expansion) and would otherwise repeat the text shuffle
      // each time
      .transform(materialize)

  /** All pairs inside each exact-duplicate group: identical texts have
    * Jaccard exactly 1.0 (skipped for texts too short to have shingles —
    * their Jaccard is undefined, matching the pipelines). Tiled like every
    * other quadratic expansion. */
  private def withinGroupPairs(groups: DataFrame, n: Int): DataFrame =
    expandBuckets(
      groups
        .filter(size(col("ids")) > 1 && length(col("text")) >= n)
        .select(xxhash64(col("text")).as("gk"), col("ids").as("xs")),
      Seq(col("gk")),
      (_, _) => lit(true),
      (x, y) => struct(x.as("a"), y.as("b"), lit(1.0).as("j")))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"), col("p.j").as("jaccard"))

  /** Expand representative pairs over their groups' members; pair order is
    * restored with least/greatest (members of different groups have no
    * inherent order). */
  private def crossGroupPairs(repPairs: DataFrame, groups: DataFrame): DataFrame = {
    val gmap = groups.select(col("ids").getItem(0).as("rep"), col("ids"))
    repPairs
      .join(
        gmap.select(col("rep").as("rep_a"), col("ids").as("ids_a")),
        col("id_a") === col("rep_a"))
      .join(
        gmap.select(col("rep").as("rep_b"), col("ids").as("ids_b")),
        col("id_b") === col("rep_b"))
      .select(explode(col("ids_a")).as("xa"), col("ids_b"), col("jaccard"))
      .select(col("xa"), explode(col("ids_b")).as("xb"), col("jaccard"))
      .select(
        least(col("xa"), col("xb")).as("id_a"),
        greatest(col("xa"), col("xb")).as("id_b"),
        col("jaccard"))
  }

  /** Exact n-gram Jaccard verification of candidate pairs only (the general
    * path, vocabulary too large for bitmaps).
    *
    * Hashed shingle sets are recomputed just for docs that appear in some
    * candidate pair (broadcast semijoin prune), so the verify cost is
    * O(#candidates), not O(corpus). Output: (id_a, id_b, jaccard) with
    * jaccard ≥ threshold. */
  private def verifiedJaccardPairs(
      df: DataFrame,
      cands: DataFrame, // columns: id_a, id_b
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
  ): DataFrame = {
    val needed = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    // No broadcast hint: the candidate-doc id set is data-dependent and can
    // reach millions of rows at corpus scale — a forced broadcast would OOM
    // the driver. AQE picks broadcast when the set is actually small.
    val sets = df
      .select(col(idCol).as("id"), shingleHashesFor(df, col(textCol), n).as("gs"))
      .join(needed, "id")
    val a = sets.select(col("id").as("id_a"), col("gs").as("gs_a"))
    val b = sets.select(col("id").as("id_b"), col("gs").as("gs_b"))
    cands
      .join(a, "id_a")
      .join(b, "id_b")
      .withColumn("common", size(array_intersect(col("gs_a"), col("gs_b"))))
      .withColumn(
        "jaccard",
        col("common").cast("double") /
          (size(col("gs_a")) + size(col("gs_b")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ───────────────────────── MinHash LSH ─────────────────────────

  /** (id, sig): all `numHashes` minhashes per doc. Native path: one narrow
    * projection through graft_minhash_sig — no explode, no aggregate, no
    * shuffle. Fallback: explode + `min(xxhash64(h, k))` aggregates (long
    * arithmetic only — the expensive string hashing happened once in
    * [[shingleHashes]]). Bit-identical results. */
  private def docSignatures(
      df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int): DataFrame =
    if (nativeFnsAvailable(df))
      df.select(col(idCol).as("id"), shingleHashesFor(df, col(textCol), n).as("gs"))
        .filter(size(col("gs")) > 0)
        .select(col("id"),
          call_function(graft.functions.TilePairs.MinhashName,
            col("gs"), lit(numHashes)).as("sig"))
    else {
      val hashed = explodedHashes(df, idCol, textCol, n)
      val minAggs =
        (0 until numHashes).map(k => min(xxhash64(col("h"), lit(k))).as(s"m$k"))
      hashed.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*)
        .select(col("id"),
          array((0 until numHashes).map(k => col(s"m$k")): _*).as("sig"))
    }

  /** Minhash signature from an already-computed shingle-hash array — the
    * HOF fallback twin of the native Minhash kernel. Bit-identical to the
    * exploded `min(xxhash64(h, k))` aggregate formulation (same hashes,
    * same min), but a pure narrow projection over `gs`. */
  private def sigFromGs(gs: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(gs, h => xxhash64(h, k))))

  /** Per-doc LSH features computed ONCE: (id, gs, sz, sig) — the shingle
    * hash array, its size, and the minhash signature. Every downstream
    * stage (vocabulary probe, banding, bitmap build, exact verify) derives
    * from these columns instead of re-shingling the text, so the expensive
    * per-character work happens exactly once per document however many
    * passes consume it. Docs with no shingles are dropped (as everywhere
    * in the minhash machinery). */
  private def distinctFeats(reps: DataFrame, n: Int, numHashes: Int): DataFrame = {
    val withGs = reps
      .select(col("id"), shingleHashesFor(reps, col("text"), n).as("gs"))
      .filter(size(col("gs")) > 0)
    withGs.select(
      col("id"), col("gs"), size(col("gs")).cast("int").as("sz"),
      (if (nativeFnsAvailable(reps))
         call_function(graft.functions.TilePairs.MinhashName, col("gs"), lit(numHashes))
       else sigFromGs(col("gs"), numHashes)).as("sig"))
  }

  /** Adds a minhash signature column for banded consumers outside this file
    * (the streaming near-dup ingest dedup): NULL for docs with no shingles —
    * callers route those to a per-doc unique key. Native kernel when
    * installed, HOF fallback otherwise; bit-identical either way.
    *
    * DataFrame-in/DataFrame-out (not a bare Column) so the shingle-hash
    * array lands in its OWN projection first: the signature expression
    * references `gs` twice (size guard + per-hash min), and in the HOF
    * fallback it sits inside a ×numHashes lambda — an un-materialized `gs`
    * would re-shingle the full text per hash. CollapseProject keeps the
    * split because the array is non-cheap and multiply-referenced (the same
    * guarantee [[distinctFeats]] builds on). */
  private[graft] def withMinhashSig(
      df: DataFrame, text: Column, n: Int, numHashes: Int, outCol: String): DataFrame = {
    val gsCol = "__graft_sig_gs"
    val withGs = df.withColumn(gsCol, shingleHashesFor(df, text, n))
    val sig =
      if (nativeFnsAvailable(df))
        call_function(graft.functions.TilePairs.MinhashName, col(gsCol), lit(numHashes))
      else sigFromGs(col(gsCol), numHashes)
    withGs
      .withColumn(outCol, when(size(col(gsCol)) > 0, sig))
      .drop(gsCol)
  }

  /** (band, band_hash) structs from a MATERIALIZED signature column —
    * xxhash64-chained exactly like [[bandedSignatures]], so keys agree
    * with every batch LSH path in this file. */
  private[graft] def bandKeyStructs(sig: Column, numHashes: Int, bands: Int): Column = {
    val rowsPerBand = numHashes / bands
    array((0 until bands).map { b =>
      val members = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(k => element_at(sig, k + 1))
      struct(lit(b).as("band"), xxhash64(members: _*).as("band_hash"))
    }: _*)
  }

  /** Exact-dup groups + once-computed rep features for one corpus side.
    * `feats` is lazily checkpointed: both the cross-corpus filter and the
    * intra-batch clustering of [[dedupAgainstCorpus]] (and the multiple
    * reads within a single pass) then reuse the stored arrays instead of
    * recomputing shingles and signatures. */
  private case class RepLsh(groups: DataFrame, feats: DataFrame)

  private def repLshFeatures(
      df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int): RepLsh = {
    val groups = dupGroups(df, idCol, textCol)
    val reps = groups.select(col("ids").getItem(0).as("id"), col("text"))
    RepLsh(groups, materializeLazy(distinctFeats(reps, n, numHashes)))
  }

  /** Explode a (id, sig, <payload…>) frame into one row per LSH band:
    * (id, <payload…>, band, band_hash); the band hash chains xxhash64 over
    * the band's signature rows exactly like the aggregate formulation did. */
  private def bandedSignatures(
      sigDf: DataFrame,
      numHashes: Int,
      bands: Int,
      payload: Seq[String]): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      val members = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(k => element_at(col("sig"), k + 1))
      struct(lit(b).as("band"), xxhash64(members: _*).as("band_hash"))
    }
    sigDf
      .select((col("id") +: payload.map(col)) :+
        explode(array(bandStructs: _*)).as("bh"): _*)
      .select((col("id") +: payload.map(col)) ++
        Seq(col("bh.band").as("band"), col("bh.band_hash").as("band_hash")): _*)
  }

  /** MinHash + LSH banding near-duplicate candidate pairs (ids only) — the
    * general-vocabulary path. Buckets carry (id, sig); expansion applies the
    * minhash Jaccard estimate inline (≥ `estThreshold`), so the flood of
    * sub-threshold band collisions is filtered during bucket evaluation and
    * never shuffled. With 64 hashes the estimate's σ at J=0.8 is ~0.05, so
    * the default 0.5625 (36/64) cut rejects a true-0.8 pair with p≈1e-6.
    *
    * Buckets larger than `maxBucketSize` are dropped: they are degenerate
    * (thousands of identical docs — the job of [[exact]] dedup), and they
    * cost O(k²) inside one task. Drops are counted and WARNed (see
    * [[BucketCap]]); strict mode throws instead.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 32,
      shingleSize: Int = 3,
      estThreshold: Double = DefaultEstThreshold,
      maxBucketSize: Int = 100000,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val sigDf = docSignatures(df, idCol, textCol, shingleSize, numHashes)
    estCandidatePairs(sigDf, numHashes, bands, estThreshold, maxBucketSize,
      "minhashCandidates")
  }

  /** Default inline-estimate cut for LSH candidate generation: 36/64 —
    * rejects a true-0.8 pair with p ≈ 1e-6 at 64 hashes (σ ≈ 0.05). */
  val DefaultEstThreshold: Double = 0.5625

  /** Default enforced sample cap for [[minhashCalibration]]: 100k docs is
    * ~5 × 10⁹ potential pairs BEFORE the inverted-index prefix filter —
    * ample statistics for a banding curve, bounded even on a corpus
    * whose truth grading would otherwise go quadratic. */
  val DefaultCalibrationSampleRows: Long = 100000L

  /** THRESHOLD CALIBRATION for the MinHash-LSH near-dup pipeline — the
    * dedup-side sibling of `sim_recall`: grade the candidate stage
    * ([[minhashCandidates]]' banding + inline-estimate filter, the exact
    * configuration production [[minhashDedupPairs]] verifies from)
    * against TRUE n-gram Jaccard, per threshold of `thresholds`. At
    * 100 TB an uncalibrated (bands, rows, threshold) silently over- or
    * under-deletes; this report is the evidence the chosen point does
    * neither.
    *
    * One row per threshold t:
    *  - `n_true` — pairs with exact Jaccard ≥ t ([[ngramJaccardPairs]]
    *    at the grid minimum: exact for everything the grid grades);
    *  - `n_candidates` — the candidate set size (constant across rows:
    *    candidates are generated once, thresholds only re-grade them);
    *  - `tp` / `fp` / `fn`, `precision` = tp/n_candidates (the fraction
    *    of exact-verify work that pays off at t), `recall` = tp/n_true;
    *  - `expected_recall` — the pure-banding bound 1 − (1 − t^r)^b
    *    (r = numHashes/bands). Measured recall sits UNDER the bound at
    *    low t when the estimate filter (`estThreshold`) already cuts
    *    there — exactly the effect the report exists to expose.
    *
    * Calibration runs on one representative per distinct text (the same
    * collapse [[minhashDedupPairs]] applies, via min id): the banding
    * never sees exact duplicates, so grading it on representatives
    * grades what it actually does. Truth is an inverted-index exact
    * join (pairs sharing ≥1 shingle), never all-pairs; the
    * bounded-sample-at-corpus-scale contract is ENFORCED, not advisory:
    * inputs beyond `maxSampleRows` (default
    * [[DefaultCalibrationSampleRows]]) are cut to a deterministic
    * id-hash sample via [[Sampling.hashSampleAtMost]] BEFORE any wide
    * op, so the truth grading can never silently go quadratic on a
    * template-heavy corpus — the report is configuration evidence, not
    * a per-document operator. Inputs at or under the cap are exact and
    * untouched. Every threshold always yields a row — a corpus with
    * zero candidate AND zero truth pairs reports all-zero counts per
    * threshold ("zero recall evidence"), never an empty frame ("no
    * evidence").
    *
    * Returns the report; [[calibrationCandidatePairs]] exposes the raw
    * candidate pair frame it grades (the driver oracle's aux dump). */
  def minhashCalibration(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9),
      estThreshold: Double = DefaultEstThreshold,
      maxBucketSize: Int = 100000,
      maxSampleRows: Long = DefaultCalibrationSampleRows,
  ): DataFrame = {
    require(thresholds.nonEmpty, "minhashCalibration: empty threshold grid")
    require(thresholds.forall(t => t > 0.0 && t <= 1.0),
      "minhashCalibration: thresholds must be in (0, 1]")
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val minT = thresholds.min
    val groups = dupGroups(
      Sampling.hashSampleAtMost(df, idCol, maxSampleRows), idCol, textCol)
    val reps = groups.select(col("ids").getItem(0).as("id"), col("text"))
    val truth = ngramJaccardPairsDistinct(reps, n, minT, maxShingleFreq = 1000000L)
    val cands = calibrationCandidates(
      reps, n, numHashes, bands, estThreshold, maxBucketSize)
    val joined = cands.withColumn("__c", lit(true))
      .join(truth, Seq("id_a", "id_b"), "full")
      .select(coalesce(col("__c"), lit(false)).as("is_cand"),
        coalesce(col("jaccard"), lit(0.0)).as("j"))
    val r = numHashes / bands
    // the grid rides as a literal-array explode (a 5× narrow fan-out),
    // NOT a cross join — a BroadcastNestedLoopJoin for a 5-row grid is
    // plan noise the smoke spec rightly bans
    val counts = joined
      .withColumn("threshold", explode(typedLit(thresholds.sorted)))
      .groupBy("threshold")
      .agg(
        sum(when(col("j") >= col("threshold"), 1L).otherwise(0L)).as("n_true"),
        sum(when(col("is_cand"), 1L).otherwise(0L)).as("n_candidates"),
        sum(when(col("is_cand") && col("j") >= col("threshold"), 1L)
          .otherwise(0L)).as("tp"))
    // the grid rides as driver-built ALL-ZERO rows UNIONED into the
    // counts and re-aggregated: a corpus with zero candidate AND zero
    // truth pairs still yields one all-zero row per threshold — "zero
    // recall", distinct from "no evidence". A union+aggregate (not a
    // unique-key left join) deliberately: Catalyst ELIMINATES a left
    // join whose build side has provably-unique keys under a count-only
    // consumer, which silently skips the whole calibration pipeline in
    // count()-style harnesses — an aggregate final op always executes.
    val zeros = Sampling.localFrame(df.sparkSession,
      Seq("threshold" -> org.apache.spark.sql.types.DoubleType,
        "n_true" -> org.apache.spark.sql.types.LongType,
        "n_candidates" -> org.apache.spark.sql.types.LongType,
        "tp" -> org.apache.spark.sql.types.LongType),
      thresholds.sorted.map(t => org.apache.spark.sql.Row(t, 0L, 0L, 0L)))
    counts.unionByName(zeros)
      .groupBy("threshold")
      .agg(sum("n_true").as("n_true"),
        sum("n_candidates").as("n_candidates"),
        sum("tp").as("tp"))
      .withColumn("fp", col("n_candidates") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("precision",
        when(col("n_candidates") > 0,
          round(col("tp").cast("double") / col("n_candidates"), 9)))
      .withColumn("recall",
        when(col("n_true") > 0,
          round(col("tp").cast("double") / col("n_true"), 9)))
      .withColumn("expected_recall",
        round(lit(1.0) - pow(lit(1.0) - pow(col("threshold"), lit(r.toDouble)),
          lit(bands.toDouble)), 9))
  }

  /** The candidate-pair frame [[minhashCalibration]] grades — exposed so
    * the calibration query can export it (the oracle recomputes the
    * report from these pairs + its own exact-Jaccard replay). Same
    * representative collapse as the calibration itself. */
  def calibrationCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      estThreshold: Double = DefaultEstThreshold,
      maxBucketSize: Int = 100000,
      maxSampleRows: Long = DefaultCalibrationSampleRows,
  ): DataFrame = {
    val groups = dupGroups(
      Sampling.hashSampleAtMost(df, idCol, maxSampleRows), idCol, textCol)
    val reps = groups.select(col("ids").getItem(0).as("id"), col("text"))
    calibrationCandidates(reps, n, numHashes, bands, estThreshold, maxBucketSize)
  }

  private def calibrationCandidates(
      reps: DataFrame,
      n: Int,
      numHashes: Int,
      bands: Int,
      estThreshold: Double,
      maxBucketSize: Int,
  ): DataFrame =
    estCandidatePairs(
      docSignatures(reps, "id", "text", n, numHashes),
      numHashes, bands, estThreshold, maxBucketSize, "minhashCalibration")

  /** The est-filtered LSH candidate pipeline shared by [[minhashCandidates]]
    * and [[minhashDedupPairs]]' general-vocabulary path: band a (id, sig)
    * frame, cap buckets (counted/WARNed under `opName` — the op the USER
    * called, so [[BucketCap.drops]] polled by that name sees the drops
    * whichever internal path ran), expand with the inline minhash Jaccard
    * estimate, emit distinct (id_a, id_b). */
  private def estCandidatePairs(
      sigDf: DataFrame,
      numHashes: Int,
      bands: Int,
      estThreshold: Double,
      maxBucketSize: Int,
      opName: String,
  ): DataFrame = {
    val banded = bandedSignatures(sigDf, numHashes, bands, Seq("sig"))
    val estMin = math.ceil(estThreshold * numHashes).toInt
    val est: (Column, Column) => Column = (x, y) =>
      aggregate(
        zip_with(x("sig"), y("sig"), (a, b) => (a === b).cast("int")),
        lit(0),
        (acc, v) => acc + v)
    val buckets = BucketCap.capped(
      banded
        .groupBy("band", "band_hash")
        .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("xs")),
      maxBucketSize, opName)
    val keys = Seq(col("band"), col("band_hash"))
    // canonical-band kernel: each candidate pair is emitted exactly once —
    // from the FIRST band whose hashes agree — so the distinct pair set
    // falls out of the expansion itself and the dropDuplicates shuffle of
    // one row per (pair × shared band) disappears (optimization guide
    // §2.4; equivalence + cap note at SigEstCanonicalPairs' scaladoc). The
    // HOF fallback keeps the per-band emission + dropDuplicates.
    if (nativeTilePairsAvailable(sigDf))
      expandBucketsNative(
        buckets, keys, graft.functions.TilePairs.SigEstCanonicalName,
        lit(estMin), col("band"), lit(numHashes / bands))
        .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
    else
      expandBuckets(
        buckets, keys,
        (x, y) => est(x, y) >= estMin,
        (x, y) => struct(x("id").as("a"), y("id").as("b")))
        .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
        .dropDuplicates("id_a", "id_b")
  }

  /** Production near-dup pattern: MinHash-LSH candidate generation + EXACT
    * n-gram Jaccard verification, adaptive to the corpus vocabulary:
    *
    *  - small vocabulary (≤ [[MaxBitmapVocab]] distinct shingles): buckets
    *    carry dictionary bitmaps and the EXACT Jaccard predicate runs inline
    *    during bucket expansion — every band collision is verified exactly
    *    at ~V/32 bit-ops per pair, nothing probabilistic survives;
    *  - general vocabulary: [[minhashCandidates]] (est-filtered) + hashed
    *    shingle intersection on the candidates only.
    *
    * Both paths emit exactly "pairs with true n-gram Jaccard ≥ threshold"
    * as long as LSH banding recalls them (bands=32 × rows-per-band=2: a
    * true-0.8 pair is missed with p ≈ 6e-15).
    *
    * Exact text duplicates are collapsed FIRST ([[dupGroups]]): LSH runs on
    * one representative per distinct text, within-group pairs are emitted
    * directly at Jaccard 1.0 (never missed, never bucket-capped), and
    * representative pairs are expanded back over group members — on
    * dup-heavy corpora this shrinks the LSH problem by the duplication
    * factor.
    */
  def minhashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8,
      maxBucketSize: Int = 100000,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val groups = dupGroups(df, idCol, textCol)
    val reps = groups.select(col("ids").getItem(0).as("id"), col("text"))
    val repPairs = minhashDedupPairsDistinct(
      reps, n, numHashes, bands, threshold, maxBucketSize)
    withinGroupPairs(groups, n).unionByName(crossGroupPairs(repPairs, groups))
  }

  /** [[minhashDedupPairs]] over already-distinct texts (columns id, text). */
  private def minhashDedupPairsDistinct(
      df: DataFrame,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      maxBucketSize: Int,
  ): DataFrame =
    minhashDedupPairsLsh(distinctFeats(df, n, numHashes), numHashes, bands,
      threshold, maxBucketSize)

  /** [[minhashDedupPairsDistinct]] from once-computed [[distinctFeats]]
    * columns — no text access: the vocabulary probe explodes `gs`, the
    * bitmap/band build projects it, and the general-path exact verify
    * intersects it. */
  private def minhashDedupPairsLsh(
      feats: DataFrame,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      maxBucketSize: Int,
  ): DataFrame = {
    val hashed = feats.select(col("id"), explode(col("gs")).as("h"))
    smallVocabFreq(hashed) match { case Some(entries) =>
      // (id, sz, bm, sig): native path is ONE narrow projection over the
      // stored arrays (bitmap kernel over gs, signature already computed);
      // fallback joins the dictionary-aggregated bitmaps onto the stored
      // signatures.
      val d = rarityDict(entries)
      val words = d.words
      val sigd =
        if (nativeFnsAvailable(feats))
          feats.select(col("id"), col("sz"),
            call_function(graft.functions.TilePairs.BitmapName, col("gs"),
              typedLit(d.vocabSorted.toSeq), typedLit(d.rankOf.toSeq)).as("bm"),
            col("sig"))
        else
          bitmapFeatures(hashed, dictionaryDf(feats, entries.map(_._1).sorted), words)
            .join(feats.select(col("id"), col("sig")), "id")
      val banded = bandedSignatures(sigd, numHashes, bands, Seq("sz", "bm"))
      val buckets = BucketCap.capped(
        banded
          .groupBy("band", "band_hash")
          .agg(sort_array(collect_list(struct(col("id"), col("sz"), col("bm")))).as("xs")),
        maxBucketSize, "minhashDedupPairs")
      val keys = Seq(col("band"), col("band_hash"))
      val expanded =
        if (nativeTilePairsAvailable(feats))
          expandBucketsNative(
            buckets, keys, graft.functions.TilePairs.JaccardName, lit(threshold))
        else
          expandBuckets(
            buckets, keys,
            (x, y) => lengthCompatible(x, y, threshold) &&
              bitmapJaccard(x, y, words) >= threshold,
            (x, y) => struct(
              x("id").as("a"), y("id").as("b"), bitmapJaccard(x, y, words).as("j")))
      expanded
        .select(col("p.a").as("id_a"), col("p.b").as("id_b"), col("p.j").as("jaccard"))
        .dropDuplicates("id_a", "id_b")
    case None =>
      // est-filtered candidates from the stored signatures (the shared
      // [[estCandidatePairs]] pipeline — drop counters under THIS op's
      // name), then exact verify over the stored shingle arrays
      val cands = estCandidatePairs(feats.select(col("id"), col("sig")),
        numHashes, bands, DefaultEstThreshold, maxBucketSize, "minhashDedupPairs")
      val needed = cands
        .select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .distinct()
      val sets = feats.select(col("id"), col("gs")).join(needed, "id")
      val a = sets.select(col("id").as("id_a"), col("gs").as("gs_a"))
      val b = sets.select(col("id").as("id_b"), col("gs").as("gs_b"))
      cands
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn("common", size(array_intersect(col("gs_a"), col("gs_b"))))
        .withColumn(
          "jaccard",
          col("common").cast("double") /
            (size(col("gs_a")) + size(col("gs_b")) - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    }
  }

  // ───────────────────── duplicate-cluster assignment ─────────────────────

  /** Iteration cap for [[duplicateClusters]] — pointer jumping halves the
    * forest depth each round, so 50 covers any graph that fits on disk. */
  var MaxClusterIters: Int = 50

  /** Connected components over a duplicate-pair graph: one row per id of
    * `df` with `cluster_id` = the smallest id in its component (singletons
    * cluster to themselves) — the step that turns pairwise near-dup output
    * into "keep one representative per duplicate cluster".
    *
    * Pregel-style label propagation: each round takes the min label over
    * graph neighbors (one join + partial-agg groupBy) and then POINTER-JUMPS
    * (label := label of label, one self-join) so chains collapse in
    * O(log diameter) rounds instead of O(diameter). Every round materializes
    * via `localCheckpoint` — truncated lineage, each label table used twice
    * without recomputation; only the per-round change COUNT reaches the
    * driver. Duplicate graphs are near-cliques, so this converges in 2-3
    * rounds in practice.
    */
  def duplicateClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .transform(materialize)
    var labels = df.select(col(idCol).as("id"), col(idCol).as("cluster_id"))
      .transform(materialize)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < MaxClusterIters) {
      iter += 1
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster_id").as("dl")), "dst")
        .groupBy(col("src"))
        .agg(min(col("dl")).as("nl"))
      val stepped = labels
        .join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nl"), col("cluster_id"))).as("cluster_id"),
          col("cluster_id").as("prev"))
      val ptr = stepped.select(col("id").as("jid"), col("cluster_id").as("jl"))
      val jumped = stepped
        .join(ptr, col("cluster_id") === col("jid"))
        .select(col("id"), col("jl").as("cluster_id"), col("prev"))
        .transform(materialize)
      changed = jumped.filter(col("cluster_id") =!= col("prev")).count()
      labels = jumped.select("id", "cluster_id")
    }
    labels
  }

  /** Cross-corpus contamination pairs: documents of `right` (e.g. a held-out
    * benchmark) whose n-gram Jaccard against some document of `left` (e.g.
    * the training corpus) reaches `threshold` — the standard
    * benchmark-contamination check for training data. Output:
    * (left_id, right_id, jaccard).
    *
    * ASYMMETRIC by design: the left corpus is usually orders of magnitude
    * larger than the benchmark, so running ordinary self-join LSH over the
    * union would spend almost all its time on useless left-left pairs.
    * Instead each side's exact duplicates are collapsed, both sides get
    * minhash band hashes from the shared machinery, and the candidate pairs
    * come from an equi-JOIN of left bands against right bands — only
    * cross-side collisions ever materialize; the exact Jaccard check runs
    * on the joined rows. Identical cross-side texts have identical
    * signatures, so they collide in every band (recall 1 for exact leaks).
    * One shuffle on (band, band_hash); a hot band (templated corpora) is
    * AQE-skew-splittable like any join key. */
  def crossDupPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8,
  ): DataFrame =
    crossDupPairsLsh(
      repLshFeatures(left, idCol, textCol, n, numHashes),
      repLshFeatures(right, idCol, textCol, n, numHashes),
      numHashes, bands, threshold)

  /** [[crossDupPairs]] from once-computed per-side [[RepLsh]] features —
    * lets [[dedupAgainstCorpus]] share the incoming batch's groups and
    * signatures with the intra-batch clustering pass. */
  private def crossDupPairsLsh(
      l: RepLsh,
      r: RepLsh,
      numHashes: Int,
      bands: Int,
      threshold: Double,
  ): DataFrame = {
    val lGroups = l.groups
    val rGroups = r.groups
    // shared vocabulary decision over BOTH sides (bitmaps must agree)
    val hashedUnion = l.feats.select(col("id"), explode(col("gs")).as("h"))
      .unionByName(r.feats.select(col("id"), explode(col("gs")).as("h")))
    val repPairs = smallVocabFreq(hashedUnion) match {
      case Some(entries) =>
        val d = rarityDict(entries)
        val words = d.words
        def sided(feats: DataFrame, p: String): DataFrame = {
          val sigd =
            if (nativeFnsAvailable(feats))
              feats.select(col("id"), col("sz"),
                call_function(graft.functions.TilePairs.BitmapName, col("gs"),
                  typedLit(d.vocabSorted.toSeq), typedLit(d.rankOf.toSeq)).as("bm"),
                col("sig"))
            else {
              val hashed = feats.select(col("id"), explode(col("gs")).as("h"))
              val bf = bitmapFeatures(hashed, dictionaryDf(feats, entries.map(_._1).sorted), words)
              feats.select(col("id"), col("sig")).join(bf, "id")
            }
          bandedSignatures(sigd, numHashes, bands, Seq("sz", "bm"))
            .select(col("id").as(s"${p}id"), col("sz").as(s"${p}sz"),
              col("bm").as(s"${p}bm"), col("band"), col("band_hash"))
        }
        // bucket each side per (band, band_hash), inner-join buckets (only
        // hashes present on BOTH sides survive), tile the cross space
        def bucketize(df: DataFrame, out: String): DataFrame = df
          .groupBy("band", "band_hash")
          .agg(collect_list(struct(
            col(s"${out.head}id").as("id"), col(s"${out.head}sz").as("sz"),
            col(s"${out.head}bm").as("bm"))).as(out))
        val buckets = bucketize(sided(l.feats, "l"), "lxs")
          .join(bucketize(sided(r.feats, "r"), "rxs"), Seq("band", "band_hash"))
        expandCrossBuckets(
          buckets, Seq(col("band"), col("band_hash")),
          graft.functions.TilePairs.JaccardName, lit(threshold),
          (x, y) => lengthCompatible(x, y, threshold) &&
            bitmapJaccard(x, y, words) >= threshold,
          (x, y) => struct(
            x("id").as("a"), y("id").as("b"), bitmapJaccard(x, y, words).as("j")))
          .select(col("p.a").as("left_id"), col("p.b").as("right_id"),
            col("p.j").as("jaccard"))
          .dropDuplicates("left_id", "right_id")
      case None =>
        // general vocabulary: band-join on (band, band_hash) carrying sigs,
        // est-filter inline, then exact hashed-shingle verify of survivors
        def sidedSig(feats: DataFrame, p: String): DataFrame =
          bandedSignatures(
            feats.select(col("id"), col("sig")), numHashes, bands, Seq("sig"))
            .select(col("id").as(s"${p}id"), col("sig").as(s"${p}sig"),
              col("band"), col("band_hash"))
        val estMin = math.ceil(0.5625 * numHashes).toInt
        def bucketizeSig(df: DataFrame, out: String): DataFrame = df
          .groupBy("band", "band_hash")
          .agg(collect_list(struct(
            col(s"${out.head}id").as("id"), col(s"${out.head}sig").as("sig"))).as(out))
        val sigBuckets = bucketizeSig(sidedSig(l.feats, "l"), "lxs")
          .join(bucketizeSig(sidedSig(r.feats, "r"), "rxs"), Seq("band", "band_hash"))
        val est: (Column, Column) => Column = (x, y) =>
          aggregate(
            zip_with(x("sig"), y("sig"), (a, b) => (a === b).cast("int")),
            lit(0), (acc, v) => acc + v)
        val cands = expandCrossBuckets(
          sigBuckets, Seq(col("band"), col("band_hash")),
          graft.functions.TilePairs.SigEstName, lit(estMin),
          (x, y) => est(x, y) >= estMin,
          (x, y) => struct(x("id").as("a"), y("id").as("b")))
          .select(col("p.a").as("left_id"), col("p.b").as("right_id"))
          .dropDuplicates("left_id", "right_id")
        // un-hinted semijoin prune (see verifiedJaccardPairs): candidate
        // sets are unbounded, so AQE decides broadcast vs shuffle
        val needL = cands.select(col("left_id").as("id")).distinct()
        val needR = cands.select(col("right_id").as("id")).distinct()
        val setsL = l.feats
          .select(col("id").as("left_id"), col("gs").as("gs_l"))
          .join(needL.select(col("id").as("left_id")), "left_id")
        val setsR = r.feats
          .select(col("id").as("right_id"), col("gs").as("gs_r"))
          .join(needR.select(col("id").as("right_id")), "right_id")
        cands
          .join(setsL, "left_id")
          .join(setsR, "right_id")
          .withColumn("common", size(array_intersect(col("gs_l"), col("gs_r"))))
          .withColumn("jaccard",
            col("common").cast("double") /
              (size(col("gs_l")) + size(col("gs_r")) - col("common")).cast("double"))
          .filter(col("jaccard") >= threshold)
          .select("left_id", "right_id", "jaccard")
    }
    // expand representative pairs over both sides' exact-duplicate groups
    val lMembers = lGroups.select(col("ids").getItem(0).as("left_id"),
      explode(col("ids")).as("lm"))
    val rMembers = rGroups.select(col("ids").getItem(0).as("right_id"),
      explode(col("ids")).as("rm"))
    repPairs
      .join(lMembers, "left_id")
      .join(rMembers, "right_id")
      .select(col("lm").as("left_id"), col("rm").as("right_id"), col("jaccard"))
  }

  /** End-to-end near-dup clustering from text: collapse exact duplicates
    * first ([[dupGroups]]), run MinHash pair generation + connected
    * components over one REPRESENTATIVE per distinct text, then assign every
    * group member its representative's cluster. Equivalent to
    * `duplicateClusters(df, id, minhashDedupPairs(df, …))` — identical texts
    * are connected through their representative, and each group's
    * representative is its min id, so the component minimum is unchanged —
    * but the pair expansion back over group members and the k² within-group
    * pairs never happen, and the CC graph shrinks by the duplication factor
    * (the dominant cost on dup-heavy corpora). */
  def duplicateClustersByText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8,
      maxBucketSize: Int = 100000,
  ): DataFrame = {
    val groups = dupGroups(df, idCol, textCol)
    val reps = groups.select(col("ids").getItem(0).as("id"), col("text"))
    val repPairs = minhashDedupPairsDistinct(
      reps, n, numHashes, bands, threshold, maxBucketSize)
      .select("id_a", "id_b")
    val repLabels = duplicateClusters(reps.select("id"), "id", repPairs)
      .select(col("id").as("__graft_rep"), col("cluster_id"))
    groups
      .select(col("ids").getItem(0).as("__graft_rep"), explode(col("ids")).as(idCol))
      .join(repLabels, "__graft_rep")
      .select(col(idCol), col("cluster_id"))
  }

  /** The user-facing dedup endpoint: the corpus with near-duplicates
    * REMOVED — one representative (the cluster's smallest id) per duplicate
    * cluster, all columns preserved. Composes [[duplicateClustersByText]]
    * with a semi-join filter; singletons pass through untouched. */
  def dedupCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8,
  ): DataFrame = {
    val keep = duplicateClustersByText(df, idCol, textCol, n, numHashes, bands, threshold)
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** C4-STYLE GLOBAL PARAGRAPH DEDUP (Raffel et al. 2020 deduplicate
    * repeated spans; FineWeb/RefinedWeb dedup repeated lines): each
    * distinct non-empty paragraph survives only at its FIRST occurrence
    * in the corpus — min `(idCol, position)`, a total order, so the
    * survivor is deterministic whatever the partitioning — and is
    * dropped everywhere else, INCLUDING later repeats inside the same
    * document. Documents reassemble from their kept paragraphs in
    * original order; a document whose every paragraph was seen before
    * drops entirely (the C4 behavior — what remains would be nothing).
    *
    * This is the boilerplate killer near-dup document dedup cannot be:
    * cookie banners, nav footers, and subscribe blocks repeat across
    * MILLIONS of otherwise-distinct pages, poisoning the training
    * distribution without ever tripping a document-level Jaccard
    * threshold. Distinct from its two siblings:
    * [[graft.ops.TextOps.removeCommonLines]] deletes segments whose doc
    * frequency exceeds a threshold (from EVERY doc — nothing survives),
    * and [[graft.ops.TextOps.dedupLinesWithinDoc]] dedups only inside
    * each document; this op keeps exactly ONE global copy.
    *
    * Normalization (documented, the C4 convention): paragraphs are the
    * `sepRegex` splits of the text with leading/trailing whitespace
    * trimmed; whitespace-only segments are not paragraphs (they neither
    * dedup nor reassemble) and the output joins kept paragraphs with a
    * single `\n`.
    *
    * Output: `idCol`, `outCol` (the deduped text), `n_kept`,
    * `n_dropped` — per-document accounting, because a pipeline MUST be
    * able to report how much text this stage deleted. Note the scope: a
    * document that vanishes entirely takes its accounting with it (its
    * row no longer exists) — corpus-level deletion totals come from
    * diffing against the input's document set, and the global invariant
    * is `sum(n_kept) = |distinct paragraphs|` (PropertySpec pins it).
    *
    * Scale shape: explode to (id, pos, paragraph), ONE shuffle keyed on
    * the paragraph string for the min-(id, pos) window, one shuffle back
    * onto the id for reassembly — both corpus-linear in total paragraph
    * bytes, no driver state, no all-pairs anything. Skew note: a
    * pathological paragraph repeated billions of times lands one window
    * partition with billions of rows but the window computes only a
    * running min — no buffering (Spark's min-over-entire-partition frame
    * is O(1) memory); AQE skew splitting does not apply to windows, so
    * at the extreme pre-aggregate with a groupBy min instead — the
    * [[exact]]-dedup-first convention covers the common case already. */
  def dedupParagraphsExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String = "\\n+",
      outCol: String = "text_dedup",
  ): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(idCol, textCol))
    graft.core.Validators.requireColumnsAbsent(
      df, Seq(outCol, "n_kept", "n_dropped"), "dedupParagraphsExact")
    val paras = df
      .select(col(idCol), posexplode(split(coalesce(col(textCol), lit("")),
        sepRegex)).as(Seq("__graft_pos", "__graft_p")))
      // full-whitespace trim (not trim()'s space-only), regex-replayable
      .withColumn("__graft_p",
        regexp_replace(col("__graft_p"), "^\\s+|\\s+$", ""))
      .filter(col("__graft_p") =!= "")
    val w = Window.partitionBy(col("__graft_p"))
    val kept = paras
      .withColumn("__graft_first",
        min(struct(col(idCol), col("__graft_pos"))).over(w))
      .withColumn("__graft_keep",
        col("__graft_first") === struct(col(idCol), col("__graft_pos")))
      .drop("__graft_first")
    kept
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__graft_keep"),
              struct(col("__graft_pos"), col("__graft_p"))))),
            s => s.getField("__graft_p")),
          "\n").as(outCol),
        sum(when(col("__graft_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("__graft_keep"), 1L).otherwise(0L)).as("n_dropped"))
      .filter(col("n_kept") > 0)
  }

  /** [[dedupCorpus]] with a QUALITY keep rule: per duplicate cluster the
    * survivor is the member with the LARGEST `scoreCol` (ties → smallest
    * id), not the smallest id. Production pipelines keep the best page of
    * a mirror set — the longest extraction, the highest classifier score —
    * because near-duplicate clusters mix a clean original with truncated /
    * boilerplate-wrapped copies, and min-id keeps whichever happened to be
    * crawled first. NULL scores order LAST (a scoreless copy never beats a
    * scored one); clustering itself is [[duplicateClustersByText]]
    * unchanged, so the surviving CLUSTERS are identical to
    * [[dedupCorpus]]'s — only the representative within each changes.
    *
    * Scale shape: adds exactly one shuffle over dedupCorpus — a
    * (cluster_id)-partitioned rank window on the (id, score, cluster) frame,
    * which is id-table-sized, never corpus-row-sized text. The final
    * keep-filter stays a left-semi hash join on the id. */
  def dedupCorpusBy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      scoreCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8,
  ): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(idCol, textCol, scoreCol))
    import org.apache.spark.sql.expressions.Window
    val labels = duplicateClustersByText(df, idCol, textCol, n, numHashes, bands, threshold)
    val keep = df.select(col(idCol), col(scoreCol).as("__graft_score"))
      .join(labels, idCol)
      .withColumn("__graft_rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("__graft_score").desc_nulls_last, col(idCol).asc)))
      .filter(col("__graft_rn") === 1)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Incremental-ingest dedup: the rows of `incoming` that survive against
    * an EXISTING corpus — drop every incoming doc with a near-duplicate
    * already in `corpus` (asymmetric [[crossDupPairs]] check — the corpus
    * itself is never rewritten), then [[dedupCorpus]] the survivors so the
    * batch is also internally deduplicated. The daily-batch counterpart of
    * the one-shot [[dedupCorpus]]: run per ingest, append the result to the
    * corpus, and the corpus stays near-dup-free without ever re-clustering
    * the historical data.
    *
    * Scale shape: both stages are the already-bucketed LSH paths, and the
    * incoming batch's exact-dup groups and minhash/shingle features are
    * computed ONCE ([[RepLsh]], lazily checkpointed) and shared by the
    * cross filter and the intra-batch clustering — the second pass never
    * re-shingles. The only other addition is one distinct + left-anti join
    * on the incoming ids. Sharing is sound because exact-dup groups are
    * hit ATOMICALLY (identical texts have identical signatures, and cross
    * hits are expanded over all group members), so the surviving groups
    * are exactly the incoming groups whose representative was not hit. */
  def dedupAgainstCorpus(
      incoming: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.8,
  ): DataFrame = {
    val in = repLshFeatures(incoming, idCol, textCol, n, numHashes)
    val corp = repLshFeatures(corpus, idCol, textCol, n, numHashes)
    dedupAgainstFeatures(incoming, idCol, in, corp, numHashes, bands, threshold)
  }

  /** [[dedupAgainstCorpus]] body from per-side features — shared with the
    * index-backed [[nearDupIndexApply]], whose corpus side comes off disk
    * instead of being recomputed. */
  private def dedupAgainstFeatures(
      incoming: DataFrame,
      idCol: String,
      in: RepLsh,
      corp: RepLsh,
      numHashes: Int,
      bands: Int,
      threshold: Double,
  ): DataFrame = {
    // materialized once (on first action): read by the row-level anti-join
    // AND the group/feature anti-joins below — without it each read would
    // re-run the whole cross-LSH filter
    val hits = materializeLazy(
      crossDupPairsLsh(in, corp, numHashes, bands, threshold)
        .select(col("left_id").as("__graft_hit")).distinct())
    val clean = incoming.join(hits, col(idCol) === col("__graft_hit"), "left_anti")
    val cleanGroups = in.groups
      .join(hits, col("ids").getItem(0) === col("__graft_hit"), "left_anti")
    val cleanFeats = in.feats
      .join(cleanGroups.select(col("ids").getItem(0).as("id")), Seq("id"), "left_semi")
    dedupCorpusLsh(clean, idCol, cleanGroups, cleanFeats, numHashes, bands, threshold)
  }

  /** [[dedupCorpus]] body from precomputed groups + features: intra-batch
    * rep pairs → connected components → keep each cluster's smallest id. */
  private def dedupCorpusLsh(
      df: DataFrame,
      idCol: String,
      groups: DataFrame,
      feats: DataFrame,
      numHashes: Int,
      bands: Int,
      threshold: Double,
  ): DataFrame = {
    val repPairs = minhashDedupPairsLsh(feats, numHashes, bands, threshold,
      maxBucketSize = 100000).select("id_a", "id_b")
    val reps = groups.select(col("ids").getItem(0).as("id"))
    val repLabels = duplicateClusters(reps, "id", repPairs)
      .select(col("id").as("__graft_rep"), col("cluster_id"))
    val keep = groups
      .select(col("ids").getItem(0).as("__graft_rep"), explode(col("ids")).as(idCol))
      .join(repLabels, "__graft_rep")
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ───────────────────────── SimHash ─────────────────────────

  /** 64-bit SimHash over whitespace tokens: per bit, tokens vote +1/−1 by
    * their xxhash64 bit; the sign of the vote becomes the bit.
    *
    * ONE fold over the token-hash array carries all 64 vote counters in an
    * array accumulator (the naive form — 64 separate folds — re-evaluates
    * the tokenization per bit and is 64× the work). Pure expression, no
    * shuffle. */
  /** [[simhash]] through the native kernel (bit-identical) when
    * GraftExtensions is installed on the session. */
  def simhashFor(df: DataFrame, text: Column): Column =
    if (nativeFnsAvailable(df))
      call_function(graft.functions.TilePairs.SimhashName, text)
    else simhash(text)

  def simhash(text: Column): Column = {
    val hashes = transform(
      filter(split(lower(text), "\\s+"), t => t =!= ""),
      t => xxhash64(t))
    val bitIdx = sequence(lit(0), lit(63)) // foldable → constant array
    val votes = aggregate(
      hashes,
      transform(bitIdx, _ => lit(0)),
      (acc, h) =>
        zip_with(acc, bitIdx, (a, b) =>
          a + when(
            call_function("shiftrightunsigned", h, b).bitwiseAND(lit(1L)) === 1L,
            lit(1)).otherwise(lit(-1))))
    aggregate(
      zip_with(votes, bitIdx, (v, b) =>
        when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x)
  }

  /** SimHash near-duplicate pairs with Hamming distance ≤ `maxHamming`.
    *
    * Candidate generation: split the 64-bit simhash into 4 16-bit chunks;
    * any pair with Hamming distance ≤ 3 shares at least one chunk
    * (pigeonhole); for larger `maxHamming` this is a recall-bounded
    * approximation, the standard scale trade-off. The signature is computed
    * once per doc; buckets come from a (chunk, chunk_val) group-by (8-byte
    * payload per row, no self-join), and the exact `bit_count(xor)` check
    * runs inline during bucket expansion, so non-matching pairs are never
    * materialized.
    */
  def simhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 100000,
  ): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhashFor(df, col(textCol)).as("sh"))
    val hamming: (Column, Column) => Column =
      (x, y) => bit_count(x("sh").bitwiseXOR(y("sh")))
    val buckets = sh
      .select(col("id"), col("sh"), explode(sequence(lit(0), lit(3))).as("chunk"))
      .select(
        col("chunk"),
        call_function("shiftrightunsigned", col("sh"), col("chunk") * 16)
          .bitwiseAND(lit(0xFFFFL)).as("chunk_val"),
        struct(col("id"), col("sh")).as("row"))
      .groupBy("chunk", "chunk_val")
      .agg(sort_array(collect_list(col("row"))).as("xs"))
    val cappedBuckets = BucketCap.capped(buckets, maxBucketSize, "simhashCandidates")
    val keys = Seq(col("chunk"), col("chunk_val"))
    val expanded =
      if (nativeTilePairsAvailable(df))
        expandBucketsNative(
          cappedBuckets, keys, graft.functions.TilePairs.HammingName, lit(maxHamming))
      else
        expandBuckets(
          cappedBuckets, keys,
          (x, y) => hamming(x, y) <= maxHamming,
          (x, y) => struct(x("id").as("a"), y("id").as("b"), hamming(x, y).as("h")))
    expanded
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"), col("p.h").as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  // ───────────────────────── Exact n-gram Jaccard ─────────────────────────

  /** Exact n-gram Jaccard similarity pairs (similarity ≥ `threshold`),
    * via the classic prefix-filtered set-similarity join:
    *
    *   1. shingle document frequencies from one `groupBy(h).count` —
    *      defines a global rarity order (freq asc, hash asc);
    *   2. PREFIX FILTER (exact): a pair with Jaccard ≥ t must share at
    *      least one shingle among each side's `sz − ⌈t·sz⌉ + 1` globally
    *      RAREST shingles, so only those are indexed — ultra-common
    *      shingles (huge posting lists, ~n² pairs) sort last and rarely
    *      make a prefix;
    *   3. LENGTH FILTER (exact): Jaccard ≤ min(sz)/max(sz), so require
    *      min(sz) ≥ t·max(sz);
    *   4. exact verification — inline bitmap Jaccard during posting-list
    *      expansion when the vocabulary is small (see [[minhashDedupPairs]]),
    *      otherwise hashed-shingle intersection of surviving candidates.
    *
    * `maxShingleFreq` additionally hard-drops shingles above a document
    * frequency (stop-gram cap; recall loss only when it triggers).
    *
    * Exact text duplicates are collapsed first, exactly as in
    * [[minhashDedupPairs]] — here the collapse additionally keeps identical
    * docs from inflating every posting list they appear in.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleFreq: Long = 1000000L,
  ): DataFrame = {
    val groups = dupGroups(df, idCol, textCol)
    val reps = groups.select(col("ids").getItem(0).as("id"), col("text"))
    val repPairs = ngramJaccardPairsDistinct(reps, n, threshold, maxShingleFreq)
    withinGroupPairs(groups, n).unionByName(crossGroupPairs(repPairs, groups))
  }

  /** [[ngramJaccardPairs]] over already-distinct texts (columns id, text). */
  private def ngramJaccardPairsDistinct(
      df: DataFrame,
      n: Int,
      threshold: Double,
      maxShingleFreq: Long,
  ): DataFrame = {
    val (idCol, textCol) = ("id", "text")
    val hashed = explodedHashes(df, idCol, textCol, n)
    // the general-vocabulary prefix frame: rarest `sz − ⌈t·sz⌉ + 1` shingles
    // per doc via a freq join + per-doc window (only evaluated on that path)
    def prefix = {
      val freq = hashed.groupBy("h").agg(count(lit(1)).as("gfreq"))
      val byDoc = Window.partitionBy(col("id"))
      hashed
        .join(freq, "h")
        .filter(col("gfreq") <= maxShingleFreq)
        .withColumn("sz", count(lit(1)).over(byDoc).cast("int"))
        .withColumn("rn", row_number().over(byDoc.orderBy(col("gfreq").asc, col("h").asc)))
        .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
        .select("id", "sz", "h")
    }
    smallVocabFreq(hashed) match { case Some(entries) =>
      val d = rarityDict(entries)
      val words = d.words
      if (nativeFnsAvailable(df)) {
        // Small-vocab native path: the vocabulary AND its frequencies are on
        // the driver, so the prefix filter needs no freq join and no per-doc
        // window — bit r of a doc's bitmap is its r-th rarest shingle, so
        // the prefix is just the first k set bits (restricted to ranks under
        // the stop-gram cap). One projection + one groupBy.
        val eligible = d.freqByRank.count(_ <= maxShingleFreq)
        if (eligible == 0)
          return df.select(col("id").as("id_a"), col("id").as("id_b"),
            lit(0.0).as("jaccard")).limit(0)
        val feats = nativeFeatures(df, idCol, textCol, n, d).drop("gs")
        val isSet = (i: Column) =>
          call_function("shiftrightunsigned",
            element_at(col("bm"), call_function("shiftright", i, lit(6)) + 1),
            i.bitwiseAND(lit(63))).bitwiseAND(lit(1L)) === 1L
        val kPrefix = (col("sz") - ceil(col("sz") * threshold).cast("int") + 1)
        val buckets = feats
          .withColumn("pid",
            explode(slice(filter(sequence(lit(0), lit(eligible - 1)), isSet),
              lit(1), kPrefix)))
          .groupBy("pid")
          .agg(sort_array(collect_list(struct(col("id"), col("sz"), col("bm")))).as("xs"))
          .filter(size(col("xs")) > 1)
        // canonical-bucket kernel: every qualifying pair is emitted exactly
        // once — from its smallest common prefix shingle's bucket — so the
        // result IS the distinct pair set and the dropDuplicates shuffle
        // (1.9 GB written + 1.9 GB spilled on the r15 calibration corpus)
        // does not exist (optimization guide §2.4 "remove shuffles
        // outright"; equivalence argument at JaccardPrefixPairs' scaladoc)
        expandBucketsNative(
          buckets, Seq(col("pid")), graft.functions.TilePairs.JaccardPfxName,
          lit(threshold), col("pid"), lit(eligible))
          .select(col("p.a").as("id_a"), col("p.b").as("id_b"), col("p.j").as("jaccard"))
      } else {
        val dict = dictionaryDf(df, entries.map(_._1).sorted)
        val feats = bitmapFeatures(hashed, dict, words)
        // true set size (and bitmap) from feats — the prefix frame's sz is the
        // POST-stop-gram-cap posting count, fine for the prefix-length bound
        // but not for the Jaccard denominator when the cap triggers
        val buckets = prefix
          .select("id", "h")
          .join(feats.select(col("id"), col("sz"), col("bm")), "id")
          .groupBy("h")
          .agg(sort_array(collect_list(struct(col("id"), col("sz"), col("bm")))).as("xs"))
          .filter(size(col("xs")) > 1)
        expandBuckets(
          buckets, Seq(col("h")),
          (x, y) => lengthCompatible(x, y, threshold) &&
            bitmapJaccard(x, y, words) >= threshold,
          (x, y) => struct(
            x("id").as("a"), y("id").as("b"), bitmapJaccard(x, y, words).as("j")))
          .select(col("p.a").as("id_a"), col("p.b").as("id_b"), col("p.j").as("jaccard"))
          .dropDuplicates("id_a", "id_b")
      }
    case None =>
      val a = prefix.select(col("id").as("id_a"), col("sz").as("sz_a"), col("h"))
      val b = prefix.select(col("id").as("id_b"), col("sz").as("sz_b"), col("h"))
      val cands = a
        .join(b, "h")
        .filter(
          col("id_a") < col("id_b") &&
            least(col("sz_a"), col("sz_b")).cast("double") >=
            greatest(col("sz_a"), col("sz_b")).cast("double") * threshold)
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      verifiedJaccardPairs(df, cands, idCol, textCol, n, threshold)
    }
  }

  /** Distinct lowercased whitespace-token n-grams of a text column, hashed
    * with Spark's xxhash64 — the overlap unit for exact decontamination.
    * The native kernel does one buffer pass per doc; the Column fallback is
    * bit-identical but interpreted (and re-evaluated per consuming subtree,
    * since Catalyst does no CSE across them). */
  private def tokenNgramHashes(textCol: Column, n: Int, native: Boolean): Column =
    if (native)
      call_function(graft.functions.TilePairs.TokenNgramName, textCol, lit(n))
    else {
      val toks = graft.ops.TextOps.tokens(lower(textCol))
      when(size(toks) >= n,
        array_distinct(transform(sequence(lit(0), size(toks) - n),
          i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(n)))))))
        .otherwise(array().cast("array<bigint>"))
    }

  /** Exact token-n-gram decontamination (the "shared 13-gram" rule used to
    * scrub pretraining corpora against evaluation benchmarks): for each
    * corpus document, the number of its distinct token n-grams that appear
    * anywhere in the benchmark corpus; only documents with at least
    * `minOverlap` shared n-grams survive the filter. Unlike the estimated
    * [[crossDupPairs]] path this is exact containment, not similarity —
    * one leaked benchmark sentence in a 10k-token document flags it.
    *
    * Scale shape: the benchmark side (small — eval sets, not the corpus)
    * reduces to one distinct-hash table plus, when the native bloom kernel
    * is registered, a single bloom-filter binary (~`bloomBitsPerKey` bits
    * per key) built by one aggregate and broadcast as a one-row constant.
    * The 100-TB corpus side then drops non-candidate n-grams in a NARROW
    * filter before anything shuffles; only bloom survivors (true overlaps
    * plus ~0.1% false positives) reach the exact-verify hash join, so the
    * result is identical with the prefilter on or off. */
  def ngramOverlapContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      minOverlap: Int = 1,
      bloomBitsPerKey: Int = 16,
      bloomHashes: Int = 5,
      useBloom: Boolean = true): DataFrame = {
    // validate EVERYTHING before the fit: contaminationFit runs eager jobs
    // (checkpoint, count, bloom build) — a bad corpus argument must fail
    // instantly, not after minutes of benchmark aggregation
    require(minOverlap >= 1, "minOverlap must be >= 1")
    graft.core.Validators.requireColumns(corpus, Seq(idCol, textCol))
    contaminationApply(corpus, idCol, textCol,
      contaminationFit(benchmark, textCol, n, bloomBitsPerKey, bloomHashes, useBloom),
      minOverlap)
  }

  // ──────────────── Persistable near-dup signature index ────────────────

  /** Persistable near-duplicate SIGNATURE index: the corpus side of
    * [[dedupAgainstCorpus]] — exact-dup groups (representative = ids[0])
    * plus the per-representative (gs, sz, sig) MinHash/LSH features —
    * fit once ([[nearDupIndexFit]]), saved, and probed by every nightly
    * ingest batch with ZERO corpus recompute: without it,
    * `dedupAgainstCorpus` re-shingles and re-signs the WHOLE historical
    * corpus on every batch, the one cost that grows with corpus age
    * instead of batch size. With it, nightly cost ∝ batch: the probe
    * band-joins the batch's signatures against the stored table (read
    * straight off parquet) and only candidate buckets expand.
    *
    * On-disk layout is GENERATIONAL and append-only, the [[graft.ops.
    * Retrieval.Bm25Index]] conventions exactly: `gen-NNNNN/{groups,feats}`
    * parquet per fit/append batch, `params.json` (atomically replaced via
    * temp-file rename) as the single commit record naming the live
    * generations. A crash mid-append leaves an orphan generation no
    * params.json names — ignored by load, never a torn index — and a
    * retried append commits exactly once. SINGLE WRITER: append does an
    * unlocked read-modify-write of params.json, so serialize writers;
    * readers are unrestricted. */
  final case class NearDupIndex(
      n: Int,
      numHashes: Int,
      groups: DataFrame,  // (ids): exact-dup groups, representative = ids[0]
      feats: DataFrame) { // (id, gs, sz, sig) per representative

    /** Persists as a fresh single-generation directory. */
    def save(dir: String): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val gen = NearDupIndex.genName(0)
      NearDupIndex.writeGeneration(this, dir, gen)
      NearDupIndex.commitParams(dir, n, numHashes, Seq(gen))
    }
  }

  object NearDupIndex {
    private[Dedup] def genName(i: Int): String = f"gen-$i%05d"

    private[Dedup] def writeGeneration(
        idx: NearDupIndex, dir: String, gen: String): Unit = {
      val p = java.nio.file.Paths.get(dir).resolve(gen)
      idx.groups.write.mode("overwrite").parquet(p.resolve("groups").toString)
      idx.feats.write.mode("overwrite").parquet(p.resolve("feats").toString)
    }

    /** The COMMIT: params.json names the live generations; temp-file +
      * atomic move, so readers see the previous index or the new one,
      * never a torn state. */
    private[Dedup] def commitParams(
        dir: String, n: Int, numHashes: Int, generations: Seq[String]): Unit = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir)
      val json = JsonMethods.compact(JsonMethods.render(JObject(
        "version" -> JInt(1),
        "n" -> JInt(n),
        "numHashes" -> JInt(numHashes),
        "generations" -> JArray(generations.map(JString(_)).toList))))
      val tmp = p.resolve("params.json.tmp")
      java.nio.file.Files.writeString(tmp, json)
      java.nio.file.Files.move(tmp, p.resolve("params.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    private[Dedup] def readParams(dir: String): (Int, Int, Seq[String]) = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val o = JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir).resolve("params.json")))
      val gens = (o \ "generations") match {
        case JArray(xs) if xs.nonEmpty => xs.collect { case JString(s) => s }
        case _ => throw graft.errors.FeatureFactoryException.InvalidParameter(
          s"$dir/params.json names no generations — not a (healthy) near-dup index")
      }
      (graft.core.ModelIO.dbl(o \ "n").toInt,
        graft.core.ModelIO.dbl(o \ "numHashes").toInt,
        gens)
    }

    def load(spark: SparkSession, dir: String): NearDupIndex = {
      val (n, numHashes, gens) = readParams(dir)
      val p = java.nio.file.Paths.get(dir)
      NearDupIndex(n, numHashes,
        spark.read.parquet(gens.map(g => p.resolve(g).resolve("groups").toString): _*),
        spark.read.parquet(gens.map(g => p.resolve(g).resolve("feats").toString): _*))
    }
  }

  /** Build a [[NearDupIndex]] over a corpus: the exact same exact-dup
    * grouping + per-representative shingle/minhash features the direct
    * [[dedupAgainstCorpus]] computes — done ONCE here instead of per
    * probe. `n` (shingle size) and `numHashes` are fit-time parameters
    * (they shape the stored features); the LSH band count and Jaccard
    * threshold stay probe-time knobs. */
  def nearDupIndexFit(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64): NearDupIndex = {
    require(n >= 1, "n must be >= 1")
    require(numHashes >= 1, "numHashes must be >= 1")
    graft.core.Validators.requireColumns(corpus, Seq(idCol, textCol))
    val r = repLshFeatures(corpus, idCol, textCol, n, numHashes)
    NearDupIndex(n, numHashes, r.groups.select("ids"), r.feats)
  }

  /** The rows of `incoming` that survive against the indexed corpus —
    * [[dedupAgainstCorpus]] semantics EXACTLY (cross filter, then
    * intra-batch dedup of the survivors), with the corpus side read from
    * the index instead of recomputed: the corpus is never re-shingled,
    * re-hashed, or even scanned beyond the stored feature tables. */
  def nearDupIndexApply(
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      index: NearDupIndex,
      bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(bands >= 1 && index.numHashes % bands == 0,
      s"bands must divide the index's numHashes=${index.numHashes}")
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    graft.core.Validators.requireColumns(incoming, Seq(idCol, textCol))
    val in = repLshFeatures(incoming, idCol, textCol, index.n, index.numHashes)
    dedupAgainstFeatures(incoming, idCol, in,
      RepLsh(index.groups, index.feats), index.numHashes, bands, threshold)
  }

  /** Append a batch to an on-disk [[NearDupIndex]] without rebuilding it:
    * the batch's groups+features become their own generation, committed
    * by the atomic params.json rename. Cost ∝ batch — existing
    * generations are never read, let alone rewritten.
    *
    * The batch must be the SURVIVORS of [[nearDupIndexApply]] against
    * this same index (the nightly-ingest loop: probe → keep survivors →
    * append them). That precondition is what makes append ≡ rebuild for
    * every future probe: survivors near-match nothing indexed (a ≥
    * threshold match — exact texts included — would have dropped them),
    * so the appended representatives are genuinely new and the union of
    * generations carries the same feature set a from-scratch fit of the
    * grown corpus would. */
  def appendToNearDupIndex(
      survivors: DataFrame, idCol: String, textCol: String, dir: String): Unit = {
    graft.core.Validators.requireColumns(survivors, Seq(idCol, textCol))
    val (n, numHashes, gens) = NearDupIndex.readParams(dir)
    val r = repLshFeatures(survivors, idCol, textCol, n, numHashes)
    // empty batch → true no-op (no junk generation in every future probe)
    if (r.groups.isEmpty) return
    val maxGen = gens.map(_.stripPrefix("gen-").toInt).max
    val gen = NearDupIndex.genName(maxGen + 1)
    NearDupIndex.writeGeneration(
      NearDupIndex(n, numHashes, r.groups.select("ids"), r.feats), dir, gen)
    NearDupIndex.commitParams(dir, n, numHashes, gens :+ gen)
  }

  /** Fitted decontamination index — the benchmark side of
    * [[ngramOverlapContamination]] reduced to what the probe needs: the
    * distinct token-n-gram hash table (exact verify) and, when the native
    * bloom kernel built it, the sized bloom prefilter bytes. Fit ONCE on
    * the benchmark suite ([[contaminationFit]]), [[save]] it, and
    * [[ContaminationIndex.load]]+[[contaminationApply]] at every ingest
    * point — the benchmarks are never re-tokenized per batch.
    *
    * Persists as a DIRECTORY: `params.json` (n, bloom hashes, bloom bytes
    * base64) plus `hashes.parquet` (the exact hash table) — the hash table
    * is data, not metadata, so it rides the columnar format like the
    * oracle aux dumps do, not a JSON string. Save a LOADED index only to a
    * NEW directory: its `hashes` frame lazily reads the directory it was
    * loaded from, and Spark rejects overwriting a path that is also being
    * read (re-fitting is the refresh path, not load-edit-save-in-place). */
  final case class ContaminationIndex(
      n: Int,
      bloomHashes: Int,
      bloom: Option[Array[Byte]],
      hashes: DataFrame) {
    def save(dir: String): Unit = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      hashes.write.mode("overwrite").parquet(p.resolve("hashes.parquet").toString)
      val json = JsonMethods.compact(JsonMethods.render(JObject(
        "version" -> JInt(1),
        "n" -> JInt(n),
        "bloomHashes" -> JInt(bloomHashes),
        "bloom" -> bloom.map(b =>
          JString(java.util.Base64.getEncoder.encodeToString(b)): JValue)
          .getOrElse(JNull))))
      java.nio.file.Files.writeString(p.resolve("params.json"), json)
    }
  }

  object ContaminationIndex {
    def load(spark: SparkSession, dir: String): ContaminationIndex = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir)
      val o = JsonMethods.parse(java.nio.file.Files.readString(p.resolve("params.json")))
      val bloom = (o \ "bloom") match {
        case JString(s) => Some(java.util.Base64.getDecoder.decode(s))
        case _ => None
      }
      ContaminationIndex(
        n = graft.core.ModelIO.dbl(o \ "n").toInt,
        bloomHashes = graft.core.ModelIO.dbl(o \ "bloomHashes").toInt,
        bloom = bloom,
        hashes = spark.read.parquet(p.resolve("hashes.parquet").toString))
    }
  }

  /** Persistable seen-key index: the distinct key strings of an ingested
    * corpus plus (native sessions) a bloom filter over their xxhash64 —
    * the CCNet-style "have we crawled this URL before?" structure.
    * Fit once per corpus drop ([[keyIndexFit]]), save, and probe every
    * incoming batch ([[keyIndexApply]]) without ever touching the corpus
    * rows again. The key table holds RAW strings, so the verify join is
    * collision-free exact and the index replays on any engine; the bloom
    * is pure pruning (false positives die in the verify join, negatives
    * are certain by construction). */
  final case class KeyIndex(
      bloomHashes: Int,
      bloom: Option[Array[Byte]],
      keys: DataFrame) {
    def save(dir: String): Unit = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      keys.write.mode("overwrite").parquet(p.resolve("keys.parquet").toString)
      val json = JsonMethods.compact(JsonMethods.render(JObject(
        "version" -> JInt(1),
        "bloomHashes" -> JInt(bloomHashes),
        "bloom" -> bloom.map(b =>
          JString(java.util.Base64.getEncoder.encodeToString(b)): JValue)
          .getOrElse(JNull))))
      java.nio.file.Files.writeString(p.resolve("params.json"), json)
    }
  }

  object KeyIndex {
    def load(spark: SparkSession, dir: String): KeyIndex = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir)
      val o = JsonMethods.parse(java.nio.file.Files.readString(p.resolve("params.json")))
      val bloom = (o \ "bloom") match {
        case JString(s) => Some(java.util.Base64.getDecoder.decode(s))
        case _ => None
      }
      KeyIndex(
        bloomHashes = graft.core.ModelIO.dbl(o \ "bloomHashes").toInt,
        bloom = bloom,
        keys = spark.read.parquet(p.resolve("keys.parquet").toString))
    }
  }

  /** Build a [[KeyIndex]] over `corpus`'s `keyCol` (cast to string; NULL
    * keys carry no identity and are not indexed): one distinct aggregate
    * + one count to size the bloom + one bloom-build aggregate. The
    * distinct key table is materialized so the count, the bloom build,
    * and every later probe reuse it. */
  def keyIndexFit(
      corpus: DataFrame,
      keyCol: String,
      bloomBitsPerKey: Int = 16,
      bloomHashes: Int = 5,
      useBloom: Boolean = true): KeyIndex = {
    require(bloomBitsPerKey >= 1, "bloomBitsPerKey must be >= 1")
    require(bloomHashes >= 1 && bloomHashes <= 32, "bloomHashes must be in [1, 32]")
    graft.core.Validators.requireColumns(corpus, Seq(keyCol))
    val spark = corpus.sparkSession
    val keys = materialize(corpus
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__graft_key"))
      .distinct())
    val bloomOk = !ForceFallback && useBloom &&
      spark.catalog.functionExists(graft.functions.TilePairs.BloomAggName)
    val bloom =
      if (bloomOk) {
        val n = keys.count()
        val bits = math.max(64L,
          math.min(n * bloomBitsPerKey, Int.MaxValue.toLong - 63))
        Some(keys.agg(
          call_function(graft.functions.TilePairs.BloomAggName,
            xxhash64(col("__graft_key")), lit(bits), lit(bloomHashes)).as("__graft_bf"))
          .head().getAs[Array[Byte]](0))
      } else None
    KeyIndex(bloomHashes, bloom, keys)
  }

  /** The rows of `incoming` whose key is NOT in the index — URL-level (or
    * content-hash-level) ingest dedup against an already-crawled corpus.
    * NULL keys always survive (no identity, nothing to match), mirroring
    * the exact join's NULL semantics on both paths.
    *
    * Scale shape: with the bloom installed, the unseen MAJORITY of a
    * typical crawl batch passes through a pure NARROW filter (one plan-
    * literal bloom probe per row — the ngramOverlapContamination
    * convention) and never shuffles; only bloom-positive rows (true hits
    * + the ~0.04%-at-16-bits false positives) enter the exact LEFT ANTI
    * verify join against the key table. The batch side is read twice, but
    * an ingest batch is daily-sized next to the corpus the index replaced
    * — the corpus itself is never scanned at probe time at all. Without
    * the kernel, the whole batch takes the one anti join.
    *
    * STREAMING: works unchanged on a streaming `incoming` — the bloom leg
    * is a stateless narrow filter and the verify leg is a stream-static
    * LEFT ANTI join against the loaded key table (both supported, no
    * state store), so the same call filters a live ingest stream against
    * last night's index (StreamingSpec proves batch/stream parity). */
  def keyIndexApply(
      incoming: DataFrame,
      keyCol: String,
      index: KeyIndex): DataFrame = {
    graft.core.Validators.requireColumns(incoming, Seq(keyCol))
    val spark = incoming.sparkSession
    val bloomOk = !ForceFallback && index.bloom.isDefined &&
      spark.catalog.functionExists(graft.functions.TilePairs.BloomContainsName)
    val k = col(keyCol).cast("string")
    def verified(df: DataFrame): DataFrame =
      df.join(index.keys, k === col("__graft_key"), "left_anti")
    if (bloomOk) {
      val hit = call_function(graft.functions.TilePairs.BloomContainsName,
        lit(index.bloom.get), xxhash64(k), lit(index.bloomHashes))
      // The two legs fork the SAME input. Left unmaterialized, Catalyst
      // pushes each leg's bloom predicate below any upstream aggregate
      // (the hit test is a function of the key column), which makes the
      // two subtrees non-identical and defeats exchange reuse — the whole
      // upstream pipeline executes TWICE (measured on the crawl-frontier
      // queries: the WARC-scan → link-extract → canonicalize → distinct →
      // robots chain ran once per leg, the single most expensive stage of
      // warc_frontier_schedule). A lazy local checkpoint evaluates the
      // batch once and both legs read the materialized rows (guide §2.4
      // common-subexpression / §5 caching-for-reuse: the batch is
      // daily-ingest-sized by contract, and it was already being fully
      // computed — twice). Streaming inputs cannot checkpoint; they keep
      // the recompute-per-leg shape (both legs are stateless there).
      val once = if (incoming.isStreaming) incoming else materializeLazy(incoming)
      once.filter(k.isNull || !hit)
        .unionByName(verified(once.filter(k.isNotNull && hit)))
    } else verified(incoming)
  }

  /** Build a [[ContaminationIndex]] from a benchmark corpus: one distinct
    * aggregate over the exploded token-n-gram hashes, one count to size
    * the bloom filter, one bloom-build aggregate (native kernel only —
    * vanilla sessions get an exact-join-only index). The hash table is
    * materialized so the count, bloom build, and every later probe reuse
    * it instead of re-tokenizing the benchmarks. */
  def contaminationFit(
      benchmark: DataFrame,
      textCol: String,
      n: Int = 13,
      bloomBitsPerKey: Int = 16,
      bloomHashes: Int = 5,
      useBloom: Boolean = true): ContaminationIndex = {
    require(n >= 1, "n must be >= 1")
    require(bloomBitsPerKey >= 1, "bloomBitsPerKey must be >= 1")
    require(bloomHashes >= 1 && bloomHashes <= 32, "bloomHashes must be in [1, 32]")
    graft.core.Validators.requireColumns(benchmark, Seq(textCol))
    val spark = benchmark.sparkSession
    val native = !ForceFallback &&
      spark.catalog.functionExists(graft.functions.TilePairs.TokenNgramName)
    val benchHashes = materialize(benchmark
      .select(explode(tokenNgramHashes(col(textCol), n, native)).as("__graft_h"))
      .distinct())
    val bloomOk = !ForceFallback && useBloom &&
      spark.catalog.functionExists(graft.functions.TilePairs.BloomAggName)
    val bloom =
      if (bloomOk) {
        // fit-time count sizes the filter; the cap (256 MB) is BloomBuildAgg's
        val keys = benchHashes.count()
        val bits = math.max(64L,
          math.min(keys * bloomBitsPerKey, Int.MaxValue.toLong - 63))
        Some(benchHashes.agg(
          call_function(graft.functions.TilePairs.BloomAggName,
            col("__graft_h"), lit(bits), lit(bloomHashes)).as("__graft_bf"))
          .head().getAs[Array[Byte]](0))
      } else None
    ContaminationIndex(n, bloomHashes, bloom, benchHashes)
  }

  /** The probe side of [[ngramOverlapContamination]] against a fitted (or
    * loaded) [[ContaminationIndex]]: per corpus document, the number of its
    * distinct token n-grams present in the index; documents below
    * `minOverlap` are dropped. The token hashing is bit-identical between
    * the native kernel and the Column fallback, so an index fit on one
    * session probes correctly on the other. */
  def contaminationApply(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      index: ContaminationIndex,
      minOverlap: Int = 1): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    graft.core.Validators.requireColumns(corpus, Seq(idCol, textCol))
    val spark = corpus.sparkSession
    val native = !ForceFallback &&
      spark.catalog.functionExists(graft.functions.TilePairs.TokenNgramName)
    val corpusGrams = corpus
      .select(col(idCol).as("__graft_id"),
        explode(tokenNgramHashes(col(textCol), index.n, native)).as("__graft_h"))
    val bloomOk = !ForceFallback && index.bloom.isDefined &&
      spark.catalog.functionExists(graft.functions.TilePairs.BloomContainsName)
    val candidates =
      if (bloomOk) {
        // The filter bytes ride as ONE plan literal (like Spark's own
        // runtime bloom join filters): shipped once per stage in the task
        // binary and referenced in place. A one-row cross join instead
        // would copy the binary into EVERY joined gram row before the
        // probe could drop it — measured 5× the whole query's cost.
        corpusGrams.filter(call_function(graft.functions.TilePairs.BloomContainsName,
          lit(index.bloom.get), col("__graft_h"), lit(index.bloomHashes)))
      } else corpusGrams
    candidates
      .join(index.hashes, "__graft_h") // exact verify: bloom false positives die here
      .groupBy("__graft_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
      .select(col("__graft_id").as(idCol), col("n_shared"))
  }
}
