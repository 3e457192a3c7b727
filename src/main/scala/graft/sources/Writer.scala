package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.errors.FeatureFactoryException.UnsupportedFormat
import graft.ops.Sampling
import graft.ops.Sampling.minstdHash

/** Sink-side counterpart of [[Loader]] (the reference has NO sinks — callers
  * `collect()`; at 100 TB the result must be written distributed, so this is
  * a required extension, SURVEY §1 "Sinks: None").
  *
  * Two scale levers beyond a flat write:
  *
  *  - `partitionBy`: hive-style directory partitioning — downstream reads
  *    with a filter on the partition column scan only matching directories
  *    (partition pruning, visible as `PartitionFilters` in explain);
  *  - [[writeBucketed]]: bucket + sort by the join/aggregation key — two
  *    tables bucketed the same way join with ZERO exchanges (the classic
  *    co-located join), the single biggest shuffle saver for repeatedly
  *    joined 100-TB tables.
  */
object Writer {

  /** Extension-dispatched write, mirroring [[Loader.load]]'s full
    * csv/parquet/jsonl/txt surface (+ `UnsupportedFormat` on anything
    * else), with [[Loader.load]]'s compression-suffix routing
    * (`out.jsonl.gz` writes gzip'd line-delimited JSON — the common
    * trainer-ingest format). `txt` requires exactly one string column
    * (the shape [[Loader.load]] produces for it) and says so loudly. */
  def save(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    def ext(s: String): (String, String) = s.lastIndexOf('.') match {
      case -1 => (s, "")
      case i => (s.substring(0, i), s.substring(i + 1).toLowerCase)
    }
    val (base, last) = ext(path)
    // EXACTLY Loader.load's strip set (gz|bz2|zst|snappy|deflate) — a
    // writable suffix Loader can't re-route (or vice versa) breaks the
    // save→load round trip this surface promises
    val compression = last match {
      case "gz" => Some("gzip")
      case "bz2" => Some("bzip2")
      case "zst" => Some("zstd")
      case "snappy" => Some("snappy")
      case "deflate" => Some("deflate")
      case _ => None
    }
    val fmt = if (compression.isDefined) ext(base)._2 else last
    val w0 = df.write.mode("overwrite").partitionBy(partitionBy: _*)
    val w = compression.fold(w0)(c => w0.option("compression", c))
    fmt match {
      case "parquet" => w.parquet(path)
      case "orc" => w.orc(path)
      case "csv" => w.option("header", "true").csv(path)
      case "json" | "jsonl" => w.json(path)
      case "txt" =>
        val ok = df.schema.fields.length == 1 &&
          df.schema.fields.head.dataType ==
            org.apache.spark.sql.types.StringType
        if (!ok)
          throw UnsupportedFormat(
            "txt output requires exactly one string column; " +
              s"got ${df.schema.simpleString}")
        w.text(path)
      case "cdxj" =>
        // partitionBy would be silently discarded below (the line writer
        // and the graft-warc DSV2 sink have no hive-layout path) — reject
        // loudly rather than hand back an unpartitioned output
        if (partitionBy.nonEmpty)
          throw UnsupportedFormat(
            "cdxj output does not support partitionBy (a CDX index is " +
              "urlkey-sorted, not hive-partitioned) — use writeCdxjSorted")
        val lw0 = cdxjLines(df).write.mode("overwrite")
        compression.fold(lw0)(c => lw0.option("compression", c)).text(path)
      case "warc" | "wet" =>
        if (partitionBy.nonEmpty)
          throw UnsupportedFormat(
            "WARC/WET output does not support partitionBy — archives land " +
              "one file per input partition; repartition by the key instead")
        // the graft-warc DSV2 write path (one archive file per input
        // partition, executor-side; see WarcWriteSupport for the column
        // contract). `.warc.gz` writes MEMBER-PER-RECORD gzip (the
        // Common Crawl framing) and `.warc.zst` FRAME-PER-RECORD zstd
        // (the newer tooling convention) — both stay random-accessible,
        // each with a sibling offsets.jsonl per archive carrying the
        // members' compressed coordinates; other codecs have no WARC
        // convention.
        compression match {
          case Some("gzip") =>
            df.write.format("graft-warc").option("codec", "gzip-member")
              .mode("overwrite").save(path)
          case Some("zstd") =>
            df.write.format("graft-warc").option("codec", "zstd-member")
              .mode("overwrite").save(path)
          case Some(c) =>
            throw UnsupportedFormat(
              s"graft-warc write: codec '$c' has no WARC framing — " +
                "use .warc (plain), .warc.gz (member-per-record gzip), " +
                "or .warc.zst (frame-per-record zstd)")
          case None =>
            df.write.format("graft-warc").mode("overwrite").save(path)
        }
      case _ =>
        throw UnsupportedFormat(
          "Unsupported file format. Please provide a CSV, Parquet, ORC, JSONL, " +
            "TXT, CDXJ, or WARC/WET file.")
    }
  }

  /** The SORTED CDX-J export — the layout cc-index actually ships:
    * range-partitioned by (urlkey, cdx_ts) and sorted within each file,
    * so part files in name order form ONE globally ordered index and a
    * domain lookup is a contiguous range over few files (the
    * [[graft.ops.Url.surtKey]] design point). ONE range-exchange + local
    * sort at any scale — the sort never funnels through a single task.
    * `numPartitions` sizes the output files (a 100 TB crawl's ~100 GB
    * index at ~1 GB/file → ~100). */
  def writeCdxjSorted(df: DataFrame, path: String, numPartitions: Int): Unit = {
    require(numPartitions > 0, "writeCdxjSorted: numPartitions must be > 0")
    cdxjLines(df
      .repartitionByRange(numPartitions, col("urlkey"), col("cdx_ts"))
      .sortWithinPartitions("urlkey", "cdx_ts"))
      .write.mode("overwrite").text(path)
  }

  /** [[graft.sources.Loader.loadCdxj]]'s write mirror: serializes the
    * reader's column contract (urlkey, cdx_ts, url, mime, status, digest,
    * length, offset, filename) back to `urlkey ts {json}` lines — numbers
    * as strings and NULL status as `-`, the pywb field conventions, so
    * load(save(x)) is identity on the contract columns. NULL urlkey /
    * cdx_ts serialize as `-` (a CDX line cannot omit its sort key);
    * to_json drops other NULL fields and the reader re-NULLs them. */
  private def cdxjLines(df: DataFrame): DataFrame = {
    graft.core.Validators.requireColumns(df,
      Seq("urlkey", "cdx_ts", "url", "mime", "status", "digest",
        "length", "offset", "filename"))
    df.select(concat_ws(" ",
      coalesce(col("urlkey"), lit("-")),
      coalesce(col("cdx_ts").cast("string"), lit("-")),
      to_json(struct(
        col("url"), col("mime"),
        coalesce(col("status").cast("string"), lit("-")).as("status"),
        col("digest"),
        col("length").cast("string").as("length"),
        col("offset").cast("string").as("offset"),
        col("filename")))).as("value"))
  }

  /** Bucketed + sorted managed table: `numBuckets` hash buckets on
    * `bucketCols`, each bucket sorted by `sortCols` (default: the bucket
    * columns). Joins/aggregations keyed on the bucket columns then plan
    * without a shuffle on the bucketed side(s). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None, // external table location; default = warehouse
  ): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    val w = df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** The deterministic shard layout behind [[writeTrainingShards]], exposed
    * so callers (and the driver's oracle) can audit it without writing:
    * adds `shard` = id-hash mod `numShards` and `shard_pos` = the row's
    * 0-based rank within its shard under the portable (id-hash, id) order.
    * Re-runs, engines, and physical layouts all agree on both columns, so
    * a training job reading shard k row j sees the same document every
    * time — the reproducibility contract a pretraining sink must offer.
    * Rows with a NULL id are dropped (no hash position in the order).
    *
    * Scale shape: a plain per-shard rank window would serialize a whole
    * shard (corpus/numShards rows) into ONE task's sort, so the rank is
    * two-level: the hash is RANGE-bucketed (`hash DIV ceil(M/numSub)` is
    * monotone in the hash, so bucket-major order IS (hash, id) order —
    * the rank rule is unchanged), ranked within (shard, bucket), and the
    * per-(shard, bucket) counts prefix-sum on the driver into bucket
    * start offsets — one dictionary-sized collect (numShards × numSub),
    * one shuffle, and a shard is numSub sort tasks, not one. The hash
    * order within a shard is pseudorandom, so shards are unbiased
    * cross-sections of the corpus, pre-shuffled for training (no
    * separate global-shuffle pass). EAGER: the counts aggregate runs at
    * call time, like the fits in [[graft.ops.Sampling]].
    *
    * `seed` re-keys the hash through [[graft.ops.Sampling.epochHash]] —
    * the deterministic per-EPOCH corpus shuffle a trainer export wants:
    * each seed induces an independent pseudorandom permutation (shard
    * membership AND within-shard order both move), every epoch's layout
    * is re-materializable bit-identically from (seed, ids) alone, and
    * seed 0 is exactly the unseeded layout (epochHash's identity). */
  def shardAssignments(
      df: DataFrame, idCol: String, numShards: Int,
      numSubBuckets: Int = 64, seed: Long = 0L): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    require(numSubBuckets >= 1, "numSubBuckets must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(idCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("shard", "shard_pos"), "shardAssignments")
    val subWidth = (Sampling.HashM + numSubBuckets - 1) / numSubBuckets
    // NULL ids are dropped (no hash position in the order). NOT
    // checkpointed: the counts pass re-reads the upstream with columns
    // pruned to the id alone — cheaper at any scale than caching the
    // full-width corpus (see interleaveSources for the same trade)
    val base = df.filter(col(idCol).isNotNull)
      .withColumn("__graft_hh", Sampling.epochHash(col(idCol), seed))
      .withColumn("shard", pmod(col("__graft_hh"), lit(numShards.toLong)))
      // SQL DIV (IntegralDivide) for exact long range-bucketing
      .withColumn("__graft_sub", expr(s"__graft_hh DIV ${subWidth}L"))
    val counts = base.groupBy(col("shard"), col("__graft_sub"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    import org.apache.spark.sql.types.LongType
    val startDf = Sampling.broadcastFrame(df.sparkSession,
      Seq("__graft_ssh" -> LongType, "__graft_ssub" -> LongType,
        "__graft_start" -> LongType),
      Sampling.exclusivePrefixByPart(counts.toSeq).map { case (sh, b, s) =>
        org.apache.spark.sql.Row(sh, b, s) })
    val w = Window.partitionBy(col("shard"), col("__graft_sub"))
      .orderBy(col("__graft_hh").asc, col(idCol).asc)
    base
      .withColumn("__graft_rb", row_number().over(w).cast("long") - 1L)
      .join(startDf,
        col("shard") === col("__graft_ssh") && col("__graft_sub") === col("__graft_ssub"))
      .withColumn("shard_pos", col("__graft_start") + col("__graft_rb"))
      .drop("__graft_hh", "__graft_sub", "__graft_rb", "__graft_start",
        "__graft_ssh", "__graft_ssub")
  }

  /** Token-budget shard layout: the TOKEN-count sibling of
    * [[shardAssignments]] — shard `k` holds the documents whose preceding
    * token total, in the portable bucket-major hash order of
    * [[graft.ops.Sampling.sampleTokenBudget]], lands in
    * `[k·tokensPerShard, (k+1)·tokensPerShard)`. Training sinks want
    * "~1B tokens per shard", not "~N docs per shard": doc-count shards
    * skew by document length, token-budget shards are uniform work.
    * Appends
    *   shard          0-based shard index (a doc is assigned where it
    *                  STARTS — documents are never split, so a shard can
    *                  overflow by at most one document's tokens);
    *   shard_tok_pos  the doc's starting token offset within its shard
    *                  (strictly increasing along the shard's order — the
    *                  stable within-shard sort key).
    * Rows with a NULL id or a non-positive token count are dropped, as in
    * `sampleTokenBudget`.
    *
    * Scale shape: one per-bucket totals aggregate (pruned to
    * `(id, tokenCol)` — deliberately NOT checkpointed, the
    * [[shardAssignments]] trade; callers with an expensive tokenize
    * upstream should checkpoint it themselves), driver prefix offsets over
    * `numBuckets` totals, one shuffle on the bucket for the running-sum
    * window, and exact 64-bit integer math throughout (SQL DIV) — so the
    * layout replays bit-for-bit on any engine and any partitioning. The
    * order (hence the layout) is parameterized by `numBuckets`, as in
    * `sampleTokenBudget` — re-materializing a shard requires the same
    * value. */
  def shardByTokenBudget(
      df: DataFrame, idCol: String, tokenCol: String,
      tokensPerShard: Long, numBuckets: Int = 1024): DataFrame = {
    require(tokensPerShard >= 1, "tokensPerShard must be >= 1")
    require(numBuckets >= 1, "numBuckets must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(idCol, tokenCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("shard", "shard_tok_pos"), "shardByTokenBudget")
    Sampling.withTokensBefore(df, idCol, tokenCol, numBuckets,
      checkpoint = false)
      // SQL DIV (IntegralDivide) for exact long math above 2^53
      .withColumn("shard", expr(s"__graft_before DIV ${tokensPerShard}L"))
      .withColumn("shard_tok_pos",
        col("__graft_before") - col("shard") * tokensPerShard)
      .drop("__graft_before")
  }

  /** [[shardByTokenBudget]] exported hive-partitioned, like
    * [[writeTrainingShards]]: one directory per token-budget shard, rows
    * ordered by their stable `shard_tok_pos`. Shard count is data-derived
    * (ceil(total tokens / tokensPerShard)), so the clustering uses AQE's
    * partitioning on the shard column rather than a fixed width. */
  def writeTokenBudgetShards(
      df: DataFrame, path: String, idCol: String, tokenCol: String,
      tokensPerShard: Long, numBuckets: Int = 1024): Unit =
    shardByTokenBudget(df, idCol, tokenCol, tokensPerShard, numBuckets)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_tok_pos"))
      .write.mode("overwrite")
      // a re-export must replace the whole layout (see writeIvfIndex)
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(path)

  /** Deterministic training-shard export: hive-partitions the corpus into
    * up to `numShards` directories (`shard=0` … `shard=N-1`; a shard with
    * no rows writes NO directory — readers should list the actual dirs,
    * not enumerate 0..N-1) with each shard's rows carrying their stable
    * `shard_pos` rank from [[shardAssignments]].
    * A 1000-executor training job then reads shard directories
    * independently (partition pruning per reader), and any shard can be
    * re-materialized bit-identically after a lost-worker retry or a
    * backfill — membership and order are pure functions of the id.
    *
    * Rows are clustered so each shard's data lands in one task
    * (`repartition` on the shard column) and sorted within partitions so
    * per-file row order follows `shard_pos`.
    *
    * `seed` is the [[shardAssignments]] epoch shuffle: export epoch e with
    * `seed = e` and the trainer reads a fresh deterministic permutation of
    * the corpus each epoch — no separate global-shuffle job, and any
    * epoch's shards re-materialize bit-identically for a backfill. */
  def writeTrainingShards(
      df: DataFrame, path: String, idCol: String, numShards: Int,
      seed: Long = 0L): Unit =
    shardAssignments(df, idCol, numShards, seed = seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite")
      // a re-export must replace the whole layout (see writeIvfIndex)
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(path)

  /** Materializes an IVF-SQ8 index on disk: the [[graft.ops.Similarity.ivfPqEncode]]
    * code table written hive-partitioned by `cell` (one directory per coarse
    * cell) next to the coarse quantizer's JSON (`<path>/ivf.json`,
    * codes under `<path>/codes/cell=K/`). This is the layout
    * [[graft.ops.Similarity.ivfPqTopK]]'s scaladoc promises: its
    * `cell IN (probed…)` predicate becomes a PARTITION filter on the read,
    * so a probe lists and scans only `nprobe` of `nlist` directories —
    * on a 100 TB corpus the search touches nprobe/nlist of the (already
    * 4×-compressed) bytes, and never the float embeddings. Rows are
    * clustered per cell before the write so each cell lands in its own
    * file set rather than one fragment per upstream task. */
  /** Writes `content` through the path's Hadoop filesystem — local, HDFS,
    * or object store alike (java.nio would break on any non-local URI). */
  private def writeFsString(
      spark: org.apache.spark.sql.SparkSession,
      path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def readFsString(
      spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def writeIvfIndex(
      codes: DataFrame,
      model: graft.ops.Similarity.IvfModel,
      path: String): Unit = {
    // the layout cares only about (id, cell) — the payload may be SQ8
    // residuals (res_scale, res_q → ivfPqTopK) or product codewords
    // (codes → ivfPqTopKProduct); each probe validates its own columns
    graft.core.Validators.requireColumns(codes, Seq("id", "cell"))
    codes
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("id"))
      .write.mode("overwrite")
      // a re-index must replace the WHOLE layout: under inherited dynamic
      // partition overwrite, a refit that leaves a coarse cell empty would
      // keep the old cell=K directory and probes would mix codes encoded
      // against two different centroid sets
      .option("partitionOverwriteMode", "static")
      .partitionBy("cell").parquet(s"$path/codes")
    writeFsString(codes.sparkSession, s"$path/ivf.json", model.toJsonString)
  }

  /** Appends a NEW batch's codes to an existing [[writeIvfIndex]] layout —
    * the incremental-ingest path: encode tonight's documents against the
    * index's OWN quantizer (loaded from `<path>/ivf.json`, never refit —
    * codes from two centroid sets must not mix, which is also why this
    * takes raw (id, embedding) rows rather than pre-encoded codes) and
    * append them into the per-cell directories. Probes see old + new rows
    * through the same partition-pruned read; no existing file is
    * rewritten, so append cost is proportional to the BATCH, not the
    * index. Re-quantization (drifted centroids, unbalanced cells) is a
    * deliberate full [[writeIvfIndex]] rebuild. Returns the quantizer so
    * callers can chain probes without re-reading the JSON. */
  def appendToIvfIndex(
      batch: DataFrame,
      idCol: String,
      embCol: String,
      path: String): graft.ops.Similarity.IvfModel = {
    val spark = batch.sparkSession
    val model = graft.ops.Similarity.IvfModel.fromJsonString(
      readFsString(spark, s"$path/ivf.json"))
    graft.ops.Similarity.ivfPqEncode(batch, idCol, embCol, model)
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("id"))
      .write.mode("append")
      .partitionBy("cell").parquet(s"$path/codes")
    model
  }

  /** Compact an on-disk IVF index after a run of [[appendToIvfIndex]]
    * calls — the [[graft.ops.Retrieval.compactBm25Index]] of the dense
    * side: every append adds one file set per touched cell directory, so a
    * long-lived index fragments each cell across many small parquet files,
    * degrading the probe's directory listing and per-file footer costs.
    * Compaction rewrites the WHOLE code table clustered one-task-per-cell
    * (exactly [[writeIvfIndex]]'s layout — one data file per cell) and
    * swaps it in: the new layout materializes NEXT TO the live one
    * (`codes.compact.tmp`), then two directory renames (live → `codes.old`,
    * tmp → live) publish it and the old layout is reaped. Codes are
    * unchanged — only file layout moves, so probes before and after return
    * identical rows.
    *
    * Same single-writer contract as the BM25 index: don't run concurrently
    * with an append, and re-read in-flight readers afterwards. A crash
    * between the two renames leaves no live `codes` dir — recover by
    * renaming `codes.old` back (the layout is intact; nothing was deleted
    * before the new layout was fully written). */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val (codes, _) = loadIvfIndex(spark, path)
    val tmp = s"$path/codes.compact.tmp"
    codes
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("cell").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/codes")
    val old = new org.apache.hadoop.fs.Path(s"$path/codes.old")
    fs.delete(old, true) // leftover from a previously crashed compact
    if (!fs.rename(live, old))
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"compactIvfIndex: cannot move $live aside — is another writer active?")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), live)) {
      fs.rename(old, live) // roll back to the intact previous layout
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"compactIvfIndex: cannot publish $tmp — compaction rolled back")
    }
    fs.delete(old, true)
  }

  /** Loads a [[writeIvfIndex]] directory back as (code table, coarse
    * quantizer) — feed both straight into
    * [[graft.ops.Similarity.ivfPqTopK]]. The `cell` column comes back as a
    * partition column, so probe filters on it prune directories instead of
    * scanning them (CoreExtrasSpec pins the `PartitionFilters` in the plan). */
  def loadIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, graft.ops.Similarity.IvfModel) =
    (spark.read.parquet(s"$path/codes"),
      graft.ops.Similarity.IvfModel.fromJsonString(
        readFsString(spark, s"$path/ivf.json")))

  /** Curriculum shard layout: shard `k` holds the rows whose `scoreCol`
    * falls in the k-th exact score quantile, ordered (score, id) within the
    * shard — the "easy→hard" export for curriculum training schedules
    * (difficulty = the score; shard index = the curriculum stage). Appends
    *   shard      0-based quantile index: #{exact quantile boundaries
    *              i/numShards (i=1..numShards−1) ≤ score} — ties with a
    *              boundary go UP (a row equal to boundary i starts stage i);
    *   shard_pos  the row's 0-based rank within its shard under the
    *              (score asc, id asc) order.
    * Rows with a NULL id or score are dropped (no defined position).
    *
    * Scale shape: the [[shardAssignments]] two-level rank, with quantile
    * sub-buckets in place of hash range-buckets — a per-shard rank window
    * would serialize corpus/numShards rows into ONE task's sort, so rows
    * are bucketed by `numShards·numSubBuckets` FINE quantiles (fine DIV
    * numSubBuckets = the shard, because the fine boundary list contains
    * every coarse boundary at the multiples of numSubBuckets), ranked
    * within (shard, fine bucket) — fine buckets are monotone in the score,
    * so bucket-major (score, id) order IS the shard's (score, id) order —
    * and the per-bucket counts prefix-sum on the driver into start
    * offsets. One percentile aggregate (a numShards·numSubBuckets-double
    * driver value), one dictionary-sized counts collect, one shuffle.
    * Keep numShards·numSubBuckets a power of two and scores
    * integer-valued for bit-exact cross-engine replay (binary fractions +
    * integer interpolation endpoints make the boundary doubles exact). */
  def shardByScoreQuantile(
      df: DataFrame, idCol: String, scoreCol: String, numShards: Int,
      numSubBuckets: Int = 8): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    require(numSubBuckets >= 1, "numSubBuckets must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(idCol, scoreCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("shard", "shard_pos"), "shardByScoreQuantile")
    val base0 = df.filter(col(idCol).isNotNull && col(scoreCol).isNotNull)
    val nFine = numShards * numSubBuckets
    // exact fine-quantile boundaries; the counts pass below re-reads the
    // upstream pruned to (id, score) — the shardAssignments no-checkpoint
    // trade
    // percentile over ZERO rows aggregates to one row holding NULL —
    // Option-wrap so an empty slice yields an empty layout, not an NPE
    val bounds: Seq[Double] =
      if (nFine == 1) Nil
      else Option(base0
        .agg(percentile(col(scoreCol).cast("double"),
          lit((1 until nFine).map(_.toDouble / nFine).toArray)))
        .head().getSeq[Double](0)).getOrElse(Nil)
    // fine bucket = #{boundaries ≤ score}: one array-literal fold, not a
    // nFine-branch when-chain
    val fine =
      if (bounds.isEmpty) lit(0)
      else aggregate(
        lit(bounds.toArray),
        lit(0),
        (acc, b) => acc + when(col(scoreCol).cast("double") >= b, 1).otherwise(0))
    val base = base0
      .withColumn("__graft_fine", fine.cast("long"))
      .withColumn("shard", expr(s"__graft_fine DIV ${numSubBuckets}L"))
    val counts = base.groupBy(col("shard"), col("__graft_fine"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    import org.apache.spark.sql.types.LongType
    val startDf = Sampling.broadcastFrame(df.sparkSession,
      Seq("__graft_ssh" -> LongType, "__graft_sfine" -> LongType,
        "__graft_start" -> LongType),
      Sampling.exclusivePrefixByPart(counts.toSeq).map { case (sh, b, s) =>
        org.apache.spark.sql.Row(sh, b, s) })
    val w = Window.partitionBy(col("shard"), col("__graft_fine"))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    base
      .withColumn("__graft_rb", row_number().over(w).cast("long") - 1L)
      .join(startDf,
        col("shard") === col("__graft_ssh") &&
          col("__graft_fine") === col("__graft_sfine"))
      .withColumn("shard_pos", col("__graft_start") + col("__graft_rb"))
      .drop("__graft_fine", "__graft_rb", "__graft_start",
        "__graft_ssh", "__graft_sfine")
  }

  /** Deterministic corpus manifest: per `groupCols` group, the row count,
    * an optional token total, and an ORDER-FREE 60-bit content checksum —
    * the audit record a data release ships next to its shards, so any
    * engine can re-verify "these exact bytes, this exact count" without
    * re-reading row order. Appended columns:
    *   n_rows         BIGINT row count;
    *   n_tokens       BIGINT Σ tokenCol (only when `tokenCol` is set);
    *   content_hash   BIGINT XOR of per-row md5-prefix hashes;
    *   distinct_hash  BIGINT XOR over the DISTINCT per-row hashes.
    *
    * The per-row hash is the first 15 hex digits of md5 over the
    * `contentCols` values joined with the 0x1F unit separator (chosen over
    * xxhash64 because every engine has md5; 15 digits = 60 bits keeps the
    * value inside a signed 64-bit int in engines without unsigned types).
    * XOR is the combine — commutative and associative, so the checksum is
    * independent of row order, partitioning, and engine. A multiset XOR
    * alone is blind to even-multiplicity changes (a row duplicated twice
    * cancels itself), which is why `distinct_hash` rides next to it: a
    * substitution must then preserve the row count, the multiset PARITY
    * of every hash, and the distinct hash SET simultaneously — e.g.
    * {A,A,B} vs {C,C,B} agree on content_hash and n_rows but split on
    * distinct_hash. (Residual blind class: permuting odd multiplicities
    * among the same distinct rows, {A,A,A,B} vs {A,B,B,B} — carry
    * n_tokens for a length-sensitive third witness.) NULL content
    * values are skipped by concat_ws on every engine (documented
    * asymmetry: ('a', NULL) and (NULL, 'a') hash alike — include an id
    * column in `contentCols` when that distinction matters). Plan: one
    * narrow hash projection + one aggregation on the group keys (the
    * DISTINCT leg partial-aggregates on (group, hash) before the final
    * combine); no sort, no window. */
  def manifest(
      df: DataFrame,
      groupCols: Seq[String],
      contentCols: Seq[String],
      tokenCol: Option[String] = None,
  ): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    graft.core.Validators.requireColumns(df,
      groupCols ++ contentCols ++ tokenCol.toSeq)
    val rowHash = conv(
      substring(md5(concat_ws("\u001f",
        contentCols.map(c => col(c).cast("string")): _*).cast("binary")), 1, 15),
      16, 10).cast("long")
    val hashed = df.withColumn("__graft_ch", rowHash)
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
        tokenCol.map(t => sum(col(t)).cast("long").as("n_tokens")).toSeq ++
        Seq(expr("bit_xor(__graft_ch)").as("content_hash"),
          expr("bit_xor(DISTINCT __graft_ch)").as("distinct_hash"))
    if (groupCols.isEmpty) hashed.agg(aggs.head, aggs.tail: _*)
    else hashed.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Release-audit diff of two [[manifest]] tables (e.g. the previous and
    * the current corpus drop): one row per group whose content CHANGED —
    * status ∈ {'added' (group only in `current`), 'removed' (only in
    * `previous`), 'changed' (present in both, but row count or order-free
    * content checksum differs)}; identical groups don't appear. Output:
    * group cols, status, then previous/current n_rows. Because the
    * manifest checksum is order-free, a re-materialized but bit-identical
    * group never shows up — the diff reports real content movement only.
    *
    * Scale shape: manifests are group-cardinality-sized (dictionary
    * tables), so this is one small full-outer hash join — run it against
    * 100 TB by diffing the manifests, never the data. */
  def manifestDiff(
      previous: DataFrame,
      current: DataFrame,
      groupCols: Seq[String],
  ): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    graft.core.Validators.requireColumns(previous,
      groupCols ++ Seq("n_rows", "content_hash"))
    graft.core.Validators.requireColumns(current,
      groupCols ++ Seq("n_rows", "content_hash"))
    val p = previous.select(
      groupCols.map(col) ++ Seq(col("n_rows").as("__graft_pn"),
        col("content_hash").as("__graft_ph"), lit(1).as("__graft_pp")): _*)
    val c = current.select(
      groupCols.map(col) ++ Seq(col("n_rows").as("__graft_cn"),
        col("content_hash").as("__graft_cc"), lit(1).as("__graft_cp")): _*)
    p.join(c, groupCols, "full_outer")
      .withColumn("status",
        when(col("__graft_pp").isNull, lit("added"))
          .when(col("__graft_cp").isNull, lit("removed"))
          .when(col("__graft_pn") =!= col("__graft_cn") ||
            col("__graft_ph") =!= col("__graft_cc"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(groupCols.map(col) ++ Seq(col("status"),
        col("__graft_pn").as("prev_rows"), col("__graft_cn").as("curr_rows")): _*)
  }
}
