package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming-native event operators (extension beyond the
  * reference surface — the reference has no streaming of any kind,
  * SURVEY §1 "Streams: None").
  *
  * Every operator here is written against the unified DataFrame API, so the
  * SAME code runs in batch (driver correctness oracle) and as an incremental
  * streaming query (`readStream` → op → `writeStream`) — the Spark-native
  * way to get streaming for free. Watermark handling is conditional on
  * `df.isStreaming`: batch runs ignore it (a no-op there), streaming runs
  * get bounded state.
  *
  * At 100 TB / unbounded input: every aggregation below keys its state by
  * (window × key) or id, so state size is bounded by the watermark horizon,
  * not the stream length; shuffles are the single hash partition per
  * aggregate that Catalyst plans anyway.
  */
object StreamingOps {

  /** Tumbling-window counts + sums per key.
    * Output: window_start, window_end, <keys...>, n_events, sum_value.
    * In streaming mode, set `watermark` (e.g. "1 hour") for append-mode
    * emission and bounded state. */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      windowLength: String,
      watermark: Option[String] = None,
      slide: Option[String] = None, // sliding windows when shorter than length
  ): DataFrame = {
    val in = watermark match {
      case Some(w) if df.isStreaming => df.withWatermark(tsCol, w)
      case _ => df
    }
    val w = slide match {
      case Some(s) => window(col(tsCol), windowLength, s)
      case None => window(col(tsCol), windowLength)
    }
    in.groupBy(w.as("w") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(
        Seq(col("w.start").as("window_start"), col("w.end").as("window_end")) ++
          keyCols.map(col) ++ Seq(col("n_events"), col("sum_value")): _*)
  }

  /** Windowed ingest-quality monitor — the live dashboard feed a streaming
    * curation pipeline watches: per (tumbling window × optional keys),
    * document count, total token mass, and how many docs FAIL the default
    * quality rules ([[graft.ops.TextOps.qualityFilter]]'s min-tokens /
    * max-punct thresholds). A crawler that starts emitting boilerplate or
    * truncated pages moves `n_fail_quality / n_docs` within one window —
    * hours before a nightly batch audit would notice. Aggregates are
    * exact-integer (count + two conditional sums), so the batch form is
    * engine-replayable and the streaming form needs only standard windowed
    * state (append mode with a watermark).
    *
    * Scale shape: one narrow quality-feature projection + one windowed
    * hash aggregate; output is (windows × keys)-sized. The same call runs
    * batch (backfill audit) and streaming (live monitor). */
  def qualityMonitor(
      df: DataFrame,
      tsCol: String,
      textCol: String,
      windowLength: String,
      keyCols: Seq[String] = Nil,
      watermark: Option[String] = None,
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.2,
  ): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(tsCol, textCol) ++ keyCols)
    // the feature appends REPLACE same-named columns — a keyCol (or tsCol)
    // named like one would silently group by the recomputed feature, so
    // reject the collision loudly (pruning only protects unused columns)
    val featureNames =
      Set("n_chars", "n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio")
    val clash = (keyCols :+ tsCol).filter(featureNames)
    if (clash.nonEmpty)
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"qualityMonitor: column(s) ${clash.mkString(", ")} collide with the " +
          "appended quality-feature names — rename them upstream")
    val scored = graft.ops.TextOps.qualityFeatures(
      df.select((Seq(tsCol, textCol) ++ keyCols).distinct.map(col): _*), textCol)
    // NULL text gives NULL features; a doc with no extractable text has
    // FAILED quality — coalesce so it can't score as a silent pass
    val fail = coalesce(col("n_tokens"), lit(0)) < minTokens ||
      col("punct_ratio") > maxPunctRatio
    val in = watermark match {
      case Some(w) if df.isStreaming => scored.withWatermark(tsCol, w)
      case _ => scored
    }
    in.groupBy(window(col(tsCol), windowLength).as("w") +: keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        sum(when(fail, 1L).otherwise(0L)).as("n_fail_quality"))
      .select(
        Seq(col("w.start").as("window_start"), col("w.end").as("window_end")) ++
          keyCols.map(col) ++
          Seq(col("n_docs"), col("total_tokens"), col("n_fail_quality")): _*)
  }

  /** Native session windows (gap-based): consecutive events of one key merge
    * while each arrives within `gap` of the previous; the session closes at
    * last_event + gap. Output: <key>, session_start, session_end, n_events.
    * Exactly Spark's `session_window`, so streaming mode gets incremental
    * session state management for free (watermark required for append). */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermark: Option[String] = None,
  ): DataFrame = {
    val in = watermark match {
      case Some(w) if df.isStreaming => df.withWatermark(tsCol, w)
      case _ => df
    }
    in.groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"))
  }

  /** Exactly-once event dedup by id columns. Batch: plain dropDuplicates
    * (one hash shuffle). Streaming: watermarked dropDuplicates — state holds
    * only ids newer than the watermark horizon, the standard unbounded-input
    * dedup pattern. */
  def dedupEvents(
      df: DataFrame,
      idCols: Seq[String],
      tsCol: String,
      watermark: String = "1 hour",
  ): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicates(idCols :+ tsCol)
    else df.dropDuplicates(idCols :+ tsCol)

  /** Content-keyed dedup for an INGEST stream: drops any document whose
    * dedup key (e.g. a [[graft.ops.TextOps.fingerprint]] column) was
    * already seen within the watermark horizon — the streaming half of
    * exact corpus dedup. Unlike [[dedupEvents]] the event-time column is
    * NOT part of the key (the same content at a different timestamp is
    * still a duplicate), so streaming uses
    * `dropDuplicatesWithinWatermark`: state holds one entry per distinct
    * key and expires by watermark instead of growing forever.
    *
    * Semantics note: streaming keeps the FIRST arrival of each key within
    * the horizon (arrival order — the only option on an unbounded input);
    * the batch path keeps the row with the smallest `tieCol` (Dedup.exact's
    * deterministic rule). Re-runs of the batch path are reproducible;
    * a replayed stream with different arrival interleaving may keep a
    * different representative of each duplicate class. */
  def dedupByContent(
      df: DataFrame,
      keyCols: Seq[String],
      tieCol: String,
      tsCol: String = "",
      watermark: String = "1 hour",
  ): DataFrame =
    if (df.isStreaming) {
      require(tsCol.nonEmpty,
        "dedupByContent on a stream needs tsCol (the watermark column)")
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)
    } else graft.ops.Dedup.exact(df, keyCols, tieCol)

  /** Near-duplicate ingest dedup — the MinHash-banded extension of
    * [[dedupByContent]]: a document is kept only when it is the FIRST
    * holder of EVERY one of its LSH band keys (numHashes/bands consecutive
    * minhashes per band, xxhash64-chained through Dedup's signature
    * kernels). An exact duplicate collides on all bands and is always
    * dropped; a near-duplicate at Jaccard J collides on a band with
    * probability 1 − (1 − J^(numHashes/bands))^bands (≈ 0.96 at J = 0.8
    * with the 64/8 defaults), and any collision drops it. Dropped
    * documents still REGISTER their remaining bands, so chains (C near-dup
    * of B, B near-dup of A) are cut conservatively. Documents with no
    * shingles get a per-doc unique key and pass through.
    *
    * Streaming: watermarked per-(band, hash) first-arrival state
    * (`dropDuplicatesWithinWatermark`) chained into a windowed per-doc
    * count — Spark's multi-stateful-operator append mode. A kept document
    * emits once its `emitWindow` closes under the watermark; state is one
    * entry per distinct band key within the horizon, plus one signature
    * key per distinct text (the exact-copy collapse below).
    *
    * EXACT copies are collapsed by a signature-keyed first-arrival pass
    * BEFORE banding, so however many copies of one text share a micro-batch,
    * exactly one reaches the band race — the common bursty-ingest case
    * cannot lose all copies. Residual caveat: two NEAR duplicates (same
    * bands, different texts) in the SAME micro-batch still race per band
    * (no intra-batch order) and can lose different bands and both drop;
    * at ingest granularity near-dups usually span batches, and the batch
    * path below is the deterministic form. For a stream with NO residual
    * race use [[dedupNearDupsDeterministic]] — its transformWithState
    * processor sees a batch's whole band group at once and picks the
    * min-tie winner (flatMapGroupsWithState could not precede stateful
    * operators in append mode; the Spark-4 processor API chains). This
    * op stays for deployments without the RocksDB state store; its
    * documented repair is [[reconcileNearDups]]: a nightly batch replay
    * over the day's raw ingest diffs the stream's output back to the
    * deterministic set.
    *
    * CHECKPOINT COMPATIBILITY: the exact-copy collapse added a stateful
    * operator to this op's plan. A streaming query restarted from a
    * checkpoint written by an earlier version fails Spark's state-metadata
    * validation (different operator count) — restart such queries with a
    * fresh checkpoint location.
    *
    * Batch: the exact replay — keep a doc iff it holds the minimal
    * `tieCol` on every one of its band keys (tie values should be unique
    * and non-null, as in [[graft.ops.Dedup.exact]]); arrival order becomes
    * tie order. A null tie sorts LAST: it loses any band where a non-null
    * tie exists (null-safe comparison — a null tie never silently survives
    * a collision), and an all-null band key keeps all its docs. */
  def dedupNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tieCol: String,
      tsCol: String = "",
      watermark: String = "1 hour",
      emitWindow: String = "1 minute",
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    import graft.ops.Dedup
    val payloadCols = df.columns.toSeq
    if (df.isStreaming) {
      require(tsCol.nonEmpty,
        "dedupNearDups on a stream needs tsCol (the watermark column)")
      val wm = df.withWatermark(tsCol, watermark)
      val withSig = Dedup.withMinhashSig(wm, col(textCol), n, numHashes, "__graft_sig")
      // Collapse EXACT copies first (signature-keyed first-arrival state):
      // two copies of one text in the SAME micro-batch would otherwise race
      // the per-band state below and could BOTH drop. After this pass
      // exactly one copy reaches banding, so the same-batch race is
      // confined to true NEAR duplicates. Identical signatures from
      // different texts would have landed in identical band buckets anyway
      // (same one-survivor outcome, decided earlier). Shingle-less docs get
      // per-doc unique keys here exactly as they do in the banding, so
      // their pass-through behavior is unchanged. The state key is the
      // 128-bit (xxhash64(sig), sig[0]) pair — 16 bytes/distinct doc in the
      // horizon instead of the 8×64-bit signature itself; a collision
      // (negligible at 128 bits) costs one doc, the same failure mode as
      // the op's banding hashes.
      // explicit isNotNull branch (not coalesce): xxhash64 is never NULL —
      // it skips NULL inputs and returns the seed — so a coalesce fallback
      // on it would be dead code and shingle-less docs would all share
      // fp1 = seed, resting their identity on fp2's 64 bits alone
      val collapsed = withSig
        .withColumn("__graft_fp1",
          when(col("__graft_sig").isNotNull, xxhash64(col("__graft_sig")))
            .otherwise(xxhash64(col(idCol))))
        .withColumn("__graft_fp2",
          coalesce(element_at(col("__graft_sig"), 1), xxhash64(col(idCol), lit(1))))
        .dropDuplicatesWithinWatermark("__graft_fp1", "__graft_fp2")
        .drop("__graft_fp1", "__graft_fp2")
      val keyArr = when(col("__graft_sig").isNotNull,
        Dedup.bandKeyStructs(col("__graft_sig"), numHashes, bands))
        .otherwise(array(struct(lit(-1).as("band"), xxhash64(col(idCol)).as("band_hash"))))
      val exploded = collapsed
        .withColumn("__graft_nb", size(keyArr))
        .select(col(tsCol), col(idCol).as("__graft_id"), col("__graft_nb"),
          explode(keyArr).as("__graft_bh"),
          struct(payloadCols.map(col): _*).as("__graft_row"))
        .select(col(tsCol), col("__graft_id"), col("__graft_nb"),
          col("__graft_bh.band").as("__graft_band"),
          col("__graft_bh.band_hash").as("__graft_hash"), col("__graft_row"))
      exploded
        .dropDuplicatesWithinWatermark("__graft_band", "__graft_hash")
        .groupBy(window(col(tsCol), emitWindow), col("__graft_id"))
        .agg(count(lit(1)).as("__graft_won"),
          first(col("__graft_nb")).as("__graft_nb"),
          first(col("__graft_row")).as("__graft_row"))
        .filter(col("__graft_won") === col("__graft_nb"))
        .select(col("__graft_row.*"))
    } else {
      val withSig = Dedup.withMinhashSig(df, col(textCol), n, numHashes, "__graft_sig")
      val keyed = withSig
        .filter(col("__graft_sig").isNotNull)
        .select(col(idCol).as("__graft_id"), col(tieCol).as("__graft_tie"),
          explode(Dedup.bandKeyStructs(col("__graft_sig"), numHashes, bands))
            .as("__graft_bh"))
        .select(col("__graft_id"), col("__graft_tie"),
          col("__graft_bh.band").as("__graft_band"),
          col("__graft_bh.band_hash").as("__graft_hash"))
      val firsts = keyed.groupBy("__graft_band", "__graft_hash")
        .agg(min(col("__graft_tie")).as("__graft_min"))
      // null-safe: tie = NULL must DROP against a non-null min (plain =!=
      // yields NULL and silently keeps the duplicate); min() ignores nulls,
      // so an all-null key leaves __graft_min null and <=> keeps every copy
      val dropped = keyed.join(firsts, Seq("__graft_band", "__graft_hash"))
        .filter(!(col("__graft_tie") <=> col("__graft_min")))
        .select("__graft_id").distinct()
      df.join(dropped, col(idCol) === col("__graft_id"), "left_anti")
    }
  }

  /** Day-end repair for [[dedupNearDups]]' documented same-batch race: two
    * TRUE near-duplicates (different texts, colliding bands) landing in one
    * micro-batch can split band wins and BOTH drop — and rows whose emit
    * window never closed before shutdown are missing from the stream's
    * output entirely. This op replays the DETERMINISTIC batch rule over the
    * period's archived raw ingest and diffs it against what the stream
    * actually emitted.
    *
    * Output: one row per disagreement — (<idCol>, action), action ∈
    * {'add' (the batch rule keeps this doc, the stream lost it — the
    * over-drop repair), 'remove' (the stream emitted a doc the batch rule
    * drops)}. Applying the delta to the streamed survivor set yields
    * EXACTLY the batch-deterministic set (StreamingSpec proves the
    * equality end-to-end through a MemoryStream run).
    *
    * Scale shape: one batch [[dedupNearDups]] over the period's raw slice
    * (a bounded daily log, not the whole corpus) plus two id anti-joins —
    * the standard lambda-architecture reconciliation cadence: stream for
    * latency, nightly batch replay for exactness. */
  def reconcileNearDups(
      raw: DataFrame,
      streamKept: DataFrame,
      idCol: String,
      textCol: String,
      tieCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
  ): DataFrame = {
    graft.core.Validators.requireColumns(raw, Seq(idCol, textCol, tieCol))
    graft.core.Validators.requireColumns(streamKept, Seq(idCol))
    val batchKept = dedupNearDups(raw, idCol, textCol, tieCol,
      n = n, numHashes = numHashes, bands = bands).select(col(idCol))
    val streamIds = streamKept.select(col(idCol))
    batchKept.join(streamIds, Seq(idCol), "left_anti")
      .withColumn("action", lit("add"))
      .unionByName(
        streamIds.join(batchKept, Seq(idCol), "left_anti")
          .withColumn("action", lit("remove")))
  }

  /** [[dedupNearDups]] WITHOUT the same-batch race: the per-band
    * first-arrival state is an Arbitrary-State processor
    * (`transformWithState`, Spark 4's stateful-processor API) keyed by
    * (band, band_hash) — ALL of a batch's rows for one band key arrive
    * in ONE `handleInputRows` call, so the winner is chosen by
    * DETERMINISTIC comparison (min `(tie, xxhash64(id))`), not by
    * intra-batch arrival order. Two true near-duplicates landing in the
    * same micro-batch — the case [[dedupNearDups]] documents as its
    * residual race (they could split band wins and BOTH drop) — now
    * resolve exactly like the batch replay: the min-tie doc wins every
    * shared band, the other drops, [[reconcileNearDups]] finds zero
    * disagreements (StreamingSpec proves the equality end to end).
    *
    * Batch mode applies the identical rule (keep a doc iff it holds the
    * minimal `(tie, xxhash64(id))` on every one of its band keys).
    * GUARANTEE SCOPE: stream ≡ batch whenever each band key's minimal
    * pair arrives in the band's FIRST micro-batch — always true when the
    * tie follows arrival order (tie = ingest sequence number, or event
    * time on an in-order stream). A LATE out-of-order row carrying a
    * smaller pair (possible within the watermark when the tie is event
    * time) was already beaten by an emitted winner — append mode cannot
    * retract it — so it loses in the stream but wins the batch replay:
    * the RESIDUAL fork. It is detected and COUNTED (`lateForkCounter`,
    * also surfaced in the Spark UI when named) so a deployment alarms
    * and runs [[reconcileNearDups]] instead of discovering divergence at
    * the nightly replay; StreamingSpec pins both the in-order equality
    * and the counted fork. `tieCol` must be LONG-typed (epoch millis, a
    * sequence number — any 64-bit priority); a NULL tie sorts LAST (it
    * loses any contested band), and the xxhash64(id) component breaks
    * exact tie collisions deterministically.
    *
    * Chaining: the processor emits with `eventTimeColumnName = tsCol`,
    * so the per-doc win-count aggregation chains downstream in append
    * mode (Spark's multi-stateful rule for transformWithState). State is
    * the winner's `(tie, tiebreak)` pair per distinct band key within
    * the horizon, expired by an event-time timer at
    * `first arrival + watermark` — the dropDuplicatesWithinWatermark
    * retention contract. REQUIRES the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider`) — Spark's HDFS-backed default
    * does not implement the processor state API.
    *
    * CHECKPOINT BREAK (round 11 → 12 of this library): the processor's
    * state changed name and type — `seen: ValueState[Boolean]` became
    * `winner: ValueState[(Long, Long)]` when fork DETECTION was added. A
    * streaming query restored from a checkpoint written by the
    * boolean-state build fails state-store schema validation (and must
    * not be force-migrated: a boolean cannot say WHICH pair won, so
    * late-fork counting would misfire on every pre-existing key).
    * Redeploying over an old checkpoint requires a NEW checkpoint
    * directory; run [[reconcileNearDups]] over the cutover window to
    * reconcile what the fresh state re-emits.
    *
    * Scale shape: identical to [[dedupNearDups]] — explode to
    * numHashes/bands keys per doc, ONE shuffle onto band keys, state
    * bounded by the watermark horizon, then the windowed win-count. */
  def dedupNearDupsDeterministic(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tieCol: String,
      tsCol: String = "",
      watermark: String = "1 hour",
      emitWindow: String = "1 minute",
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
      lateForkCounter: Option[org.apache.spark.util.LongAccumulator] = None,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    import graft.ops.Dedup
    graft.core.Validators.requireColumns(df,
      Seq(idCol, textCol, tieCol) ++ (if (df.isStreaming) Seq(tsCol) else Nil))
    require(df.schema(tieCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"dedupNearDupsDeterministic needs a LONG tie column, got " +
        s"${df.schema(tieCol).dataType.simpleString} for '$tieCol'")
    val payloadCols = df.columns.toSeq
    // NULL tie sorts LAST (loses any contested band); xxhash64(id) breaks
    // exact collisions — both engines of the pair (stream processor,
    // batch replay) compare the same two longs
    val tieKey = coalesce(col(tieCol), lit(Long.MaxValue))
    val tieBreak = xxhash64(col(idCol))
    if (df.isStreaming) {
      val delayMs = parseDurationMs(watermark)
      val wm = df.withWatermark(tsCol, watermark)
      val withSig = Dedup.withMinhashSig(wm, col(textCol), n, numHashes, "__graft_sig")
      val keyArr = when(col("__graft_sig").isNotNull,
        Dedup.bandKeyStructs(col("__graft_sig"), numHashes, bands))
        .otherwise(array(struct(lit(-1).as("band"), xxhash64(col(idCol)).as("band_hash"))))
      val exploded = withSig
        .withColumn("__graft_nb", size(keyArr))
        .select(col(tsCol), col(idCol).as("__graft_id"), col("__graft_nb"),
          explode(keyArr).as("__graft_bh"),
          tieKey.as("__graft_tie"), tieBreak.as("__graft_tb"),
          struct(payloadCols.map(col): _*).as("__graft_row"))
        .select(col(tsCol), col("__graft_id"), col("__graft_nb"),
          col("__graft_bh.band").as("__graft_band"),
          col("__graft_bh.band_hash").as("__graft_hash"),
          col("__graft_tie"), col("__graft_tb"), col("__graft_row"))
      val schema = exploded.schema
      val bandIdx = schema.fieldIndex("__graft_band")
      val hashIdx = schema.fieldIndex("__graft_hash")
      val tieIdx = schema.fieldIndex("__graft_tie")
      val tbIdx = schema.fieldIndex("__graft_tb")
      val tsIdx = schema.fieldIndex(tsCol)
      import org.apache.spark.sql.{Encoder, Encoders, Row}
      implicit val rowEnc: Encoder[Row] = Encoders.row(schema)
      val winners = exploded
        .groupByKey(r => (r.getInt(bandIdx), r.getLong(hashIdx)))(
          Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
        .transformWithState(
          new BandFirstArrival(tieIdx, tbIdx, tsIdx, delayMs, lateForkCounter),
          tsCol,
          org.apache.spark.sql.streaming.OutputMode.Append())
      winners
        .groupBy(window(col(tsCol), emitWindow), col("__graft_id"))
        .agg(count(lit(1)).as("__graft_won"),
          first(col("__graft_nb")).as("__graft_nb"),
          first(col("__graft_row")).as("__graft_row"))
        .filter(col("__graft_won") === col("__graft_nb"))
        .select(col("__graft_row.*"))
    } else {
      // the exact batch twin: keep a doc iff it holds the minimal
      // (tie, xxhash64(id)) pair on EVERY one of its band keys — struct
      // ordering gives the lexicographic comparison for free
      val withSig = Dedup.withMinhashSig(df, col(textCol), n, numHashes, "__graft_sig")
      val keyed = withSig
        .filter(col("__graft_sig").isNotNull)
        .select(col(idCol).as("__graft_id"),
          struct(tieKey.as("t"), tieBreak.as("b")).as("__graft_tie"),
          explode(Dedup.bandKeyStructs(col("__graft_sig"), numHashes, bands))
            .as("__graft_bh"))
        .select(col("__graft_id"), col("__graft_tie"),
          col("__graft_bh.band").as("__graft_band"),
          col("__graft_bh.band_hash").as("__graft_hash"))
      val firsts = keyed.groupBy("__graft_band", "__graft_hash")
        .agg(min(col("__graft_tie")).as("__graft_min"))
      val dropped = keyed.join(firsts, Seq("__graft_band", "__graft_hash"))
        .filter(col("__graft_tie") =!= col("__graft_min"))
        .select("__graft_id").distinct()
      df.join(dropped, col(idCol) === col("__graft_id"), "left_anti")
    }
  }

  /** "N second(s)|minute(s)|hour(s)|day(s)" → milliseconds — the
    * watermark-delay grammar this module's ops accept (the subset of
    * CalendarInterval the streaming examples use). */
  private[streaming] def parseDurationMs(s: String): Long = {
    val m = "^\\s*(\\d+)\\s*(millisecond|second|minute|hour|day)s?\\s*$".r
      .findFirstMatchIn(s.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse duration '$s' (expected 'N second|minute|hour|day')"))
    val unit = m.group(2) match {
      case "millisecond" => 1L
      case "second" => 1000L
      case "minute" => 60000L
      case "hour" => 3600000L
      case "day" => 86400000L
    }
    m.group(1).toLong * unit
  }

  /** The per-band first-arrival processor of
    * [[dedupNearDupsDeterministic]]: state = the winner's `(tie,
    * tiebreak)` pair per live band key (two longs — same footprint class
    * as the old boolean, and it buys fork DETECTION). First batch a key
    * appears, the minimal `(tie, tiebreak)` row wins the band (emitted)
    * and an event-time timer at `its event time + delayMs` bounds the
    * state exactly like dropDuplicatesWithinWatermark; every other
    * same-batch row and every later arrival loses. A LATER batch whose
    * minimal pair beats the stored winner is the residual stream/batch
    * fork (append mode cannot retract the emitted winner) — it is
    * COUNTED into `lateForks` so operators can alarm and trigger
    * [[StreamingOps.reconcileNearDups]] instead of discovering the
    * divergence at the nightly replay. */
  private class BandFirstArrival(
      tieIdx: Int, tbIdx: Int, tsIdx: Int, delayMs: Long,
      lateForks: Option[org.apache.spark.util.LongAccumulator] = None)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (Int, Long), org.apache.spark.sql.Row, org.apache.spark.sql.Row] {
    import org.apache.spark.sql.streaming.{TimeMode, OutputMode, TTLConfig, TimerValues, ValueState, ExpiredTimerInfo}
    import org.apache.spark.sql.{Encoders, Row}
    @transient private var winner: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      winner = getHandle.getValueState[(Long, Long)](
        "winner", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: (Int, Long), rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val best = rows.minBy(r => (r.getLong(tieIdx), r.getLong(tbIdx)))
      val bestPair = (best.getLong(tieIdx), best.getLong(tbIdx))
      if (winner.exists()) {
        // late arrival: the stored winner was already emitted. A smaller
        // late pair would have won the batch replay — the residual fork.
        if (Ordering[(Long, Long)].lt(bestPair, winner.get()))
          lateForks.foreach(_.add(1))
        Iterator.empty
      } else {
        winner.update(bestPair)
        getHandle.registerTimer(
          best.getTimestamp(tsIdx).getTime + delayMs)
        Iterator.single(best)
      }
    }

    override def handleExpiredTimer(
        key: (Int, Long), timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      winner.clear()
      Iterator.empty
    }
  }

  /** POLITE FETCH SCHEDULING over a frontier — warc_frontier_schedule's
    * per-host Crawl-delay arithmetic as a LIVE operator: each incoming
    * candidate URL is assigned the earliest fetch slot that respects its
    * host's crawl delay, `scheduled_at_ms = max(event time, host's next
    * free slot)`, and the host's next free slot advances to
    * `scheduled_at_ms + delay`. Appends `scheduled_at_ms` (epoch millis).
    *
    * Streaming: a `transformWithState` processor keyed by host
    * ([[BandFirstArrival]]'s sibling — state is ONE long per live host,
    * the next free slot). A micro-batch's whole host group arrives in one
    * call and is folded in `(event time, url)` order, so intra-batch
    * arrival order never matters. State expires LOSSLESSLY via an
    * event-time timer at `next free + watermark delay`: by firing time
    * the watermark has passed the slot, so every still-admissible future
    * row has event time ≥ the expired slot and schedules identically
    * with or without the state — eviction can never change a result
    * (the guard in the timer handler keeps a still-advancing host's
    * state alive). REQUIRES the RocksDB state store provider, like
    * [[dedupNearDupsDeterministic]].
    *
    * Batch mode is the exact twin in closed form: the recurrence
    * `s_i = max(t_i, s_{i−1} + d_{i−1})` unrolls to
    * `s_i = max_{j≤i}(t_j − P_{j−1}) + P_{i−1}` with `P` the per-host
    * running delay sum — two window passes over ONE (host) shuffle,
    * never a per-host collect. Stream ≡ batch whenever each host's rows
    * arrive across micro-batches in `(event time, url)` order (an
    * in-order stream); a LATE row inside the watermark is scheduled on
    * arrival instead of retroactively (append mode cannot retract
    * already-emitted slots) — the same documented residual fork as the
    * near-dup dedup, and the spec pins both sides of it.
    *
    * `delayCol` is the host's crawl delay in SECONDS (fractional ok,
    * [[graft.ops.Robots.crawlDelays]]' output; per-host constant — it
    * rides per row, and the closed form assumes rows of one host carry
    * one delay). NULL delay → 0 (no politeness declared). */
  def politenessSchedule(
      df: DataFrame,
      hostCol: String,
      urlCol: String,
      delayCol: String,
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(hostCol, urlCol, delayCol, tsCol))
    graft.core.Validators.requireColumnsAbsent(
      df, Seq("scheduled_at_ms"), "politenessSchedule")
    val payloadCols = df.columns.toSeq
    val tsMs = unix_millis(col(tsCol).cast("timestamp"))
    val delayMs = round(coalesce(col(delayCol), lit(0.0)) * 1000.0, 0).cast("long")
    if (df.isStreaming) {
      val wmDelayMs = parseDurationMs(watermark)
      val wm = df.withWatermark(tsCol, watermark)
      val prepped = wm.select(
        (payloadCols.map(col) :+ tsMs.as("__graft_ts_ms") :+
          delayMs.as("__graft_delay_ms")): _*)
      val schema = prepped.schema
      val hostIdx = schema.fieldIndex(hostCol)
      val urlIdx = schema.fieldIndex(urlCol)
      val tsMsIdx = schema.fieldIndex("__graft_ts_ms")
      val delayMsIdx = schema.fieldIndex("__graft_delay_ms")
      import org.apache.spark.sql.{Encoder, Encoders, Row}
      val outSchema = schema.add("scheduled_at_ms",
        org.apache.spark.sql.types.LongType, nullable = false)
      val outEnc: Encoder[Row] = Encoders.row(outSchema)
      prepped
        .groupByKey(r => r.getString(hostIdx))(Encoders.STRING)
        .transformWithState(
          new PolitenessScheduler(urlIdx, tsMsIdx, delayMsIdx, wmDelayMs),
          tsCol,
          org.apache.spark.sql.streaming.OutputMode.Append())(outEnc)
        .drop("__graft_ts_ms", "__graft_delay_ms")
    } else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(hostCol))
        .orderBy(col(tsCol).asc, col(urlCol).asc)
      val base = df
        .withColumn("__graft_ts_ms", tsMs)
        .withColumn("__graft_delay_ms", delayMs)
        .withColumn("__graft_pprev",
          coalesce(
            sum(col("__graft_delay_ms"))
              .over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
      base
        .withColumn("scheduled_at_ms",
          max(col("__graft_ts_ms") - col("__graft_pprev"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            + col("__graft_pprev"))
        .drop("__graft_ts_ms", "__graft_delay_ms", "__graft_pprev")
    }
  }

  /** The per-host slot fold of [[politenessSchedule]]: state = the next
    * free slot (one long). Rows of a batch fold in (event time, url)
    * order; the event-time timer at `next free + watermark delay` clears
    * state only once no admissible row can be affected (see the op's
    * scaladoc for the losslessness argument). */
  private class PolitenessScheduler(
      urlIdx: Int, tsMsIdx: Int, delayMsIdx: Int, wmDelayMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, org.apache.spark.sql.Row, org.apache.spark.sql.Row] {
    import org.apache.spark.sql.streaming.{TimeMode, OutputMode, TTLConfig, TimerValues, ValueState, ExpiredTimerInfo}
    import org.apache.spark.sql.{Encoders, Row}
    @transient private var nextFree: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      nextFree = getHandle.getValueState[Long](
        "nextFree", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val sorted = rows.toArray.sortBy(r =>
        (r.getLong(tsMsIdx), r.getString(urlIdx)))
      var nf = if (nextFree.exists()) nextFree.get() else Long.MinValue
      val out = sorted.map { r =>
        val sched = math.max(r.getLong(tsMsIdx), nf)
        nf = sched + r.getLong(delayMsIdx)
        Row.fromSeq(r.toSeq :+ sched)
      }
      nextFree.update(nf)
      getHandle.registerTimer(nf + wmDelayMs)
      out.iterator
    }

    override def handleExpiredTimer(
        key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      // a later batch may have advanced the slot past this (stale) timer:
      // only evict once the watermark has truly passed next free + delay —
      // then any admissible row has ts ≥ next free and the fold restarts
      // from max(ts, MinValue) = ts, identical with or without the state
      if (nextFree.exists() &&
        nextFree.get() + wmDelayMs <= timerValues.getCurrentWatermarkInMs())
        nextFree.clear()
      Iterator.empty
    }
  }

  /** LIVE ingest dedup against a PERSISTED near-dup index — the nightly
    * probe → keep survivors → append loop ([[graft.ops.Dedup]]'s
    * `nearDupIndexApply`/`appendToNearDupIndex`) run per micro-batch:
    * each batch is probed against the index AS OF the previous batch
    * (original corpus ∪ every earlier batch's survivors — the index is
    * reloaded per batch, so appended generations are visible), the
    * survivors go to `sink`, and they are appended as a new index
    * generation before the epoch commits. Semantics are therefore
    * EXACTLY the sequential batch loop's — a cross-batch duplicate of an
    * earlier survivor drops, two true near-dups inside ONE batch resolve
    * by the batch op's intra-batch rule — so the nightly replay and the
    * stream agree document for document (StreamingSpec pins it).
    *
    * `foreachBatch`, not a stateful operator, is the right shape here:
    * the state is the ON-DISK index (shared with the batch pipeline and
    * unbounded-corpus-sized — not state-store material), and the probe
    * is a stream-static join + the batch op's verify machinery, which
    * the micro-batch boundary already scopes. Failure note: foreachBatch
    * can re-run an epoch; [[graft.ops.Dedup.appendToNearDupIndex]]'s
    * atomic params.json commit keeps the index readable through a crash,
    * and a REPLAYED epoch re-probes against an index that may already
    * contain its own survivors — they then drop as self-matches, so the
    * sink may see an epoch's rows twice but the INDEX never double-grows
    * (at-least-once sink, idempotent index — state the guarantee, don't
    * hide it).
    *
    * Returns the started query; the caller owns its lifecycle. */
  def dedupStreamAgainstIndex(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      bands: Int = 32,
      threshold: Double = 0.8,
      queryName: String = "graft_stream_index_dedup",
  )(sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "dedupStreamAgainstIndex needs a streaming frame")
    graft.core.Validators.requireColumns(stream, Seq(idCol, textCol))
    import graft.ops.Dedup
    stream.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val idx = Dedup.NearDupIndex.load(batch.sparkSession, indexDir)
        val survivors = Dedup
          .nearDupIndexApply(batch.toDF(), idCol, textCol, idx, bands, threshold)
          .cache()
        try {
          sink(survivors)
          Dedup.appendToNearDupIndex(survivors, idCol, textCol, indexDir)
        } finally survivors.unpersist()
      }
      .start()
  }

  /** Typed JSON property extraction from a string payload column — the
    * enrichment step of an event pipeline (codegen'd get_json_object, no
    * UDF). */
  def jsonField(payload: Column, path: String): Column =
    get_json_object(payload, path)

  /** Per-user event row for the custom-state op. Timestamps travel as epoch
    * micros (plain longs): the Dataset encoder then moves primitives instead
    * of instantiating java.time objects per row — measurably cheaper on the
    * state operator's sort + ser/de path. Public visibility: encoder codegen
    * instantiates it. */
  case class UserEvent(user_id: Long, ts: Long, value: Double)

  /** The running state carried across micro-batches per user. */
  case class UserState(n: Long, sum: Double, first: Long, last: Long)

  /** Custom streaming state via `flatMapGroupsWithState`: per-user running
    * event statistics (count, value sum, first/last event time) that
    * ACCUMULATE across micro-batches — the pattern for state the built-in
    * windowed aggregates can't express. Update output mode. In batch mode
    * the state machine runs once per key over all rows, so the result is
    * the plain per-user aggregate — which is what the batch oracle checks.
    *
    * `idleTtl` (streaming only) bounds the state store: a user idle past
    * the TTL in EVENT time — no events while the watermark advances beyond
    * last_event + TTL — has its state evicted, so state size tracks the
    * ACTIVE key set, not every key ever seen. Unbounded keyed state is a
    * slow-motion OOM on a real stream; watermark-driven event-time timeout
    * keeps eviction deterministic (replayable, unlike wall-clock timeouts).
    * `watermarkDelay` is the out-of-orderness bound that drives eviction.
    * Output: user_id, n_events, sum_value, first_ts, last_ts. */
  def userEventStats(
      df: DataFrame,
      tsCol: String = "ts",
      idleTtl: Option[String] = None,
      watermarkDelay: String = "10 minutes",
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ttlMs = idleTtl.map(t => scala.concurrent.duration.Duration(t).toMillis)
    val useTtl = ttlMs.isDefined && df.isStreaming
    // timestamp_ntz → epoch micros anchored in the session timezone (UTC in
    // every graft main); the output converts back with the same anchor, so
    // the round trip is exact and min/max ordering is preserved
    val withTs = df.select(
      col("user_id"),
      col(tsCol).cast("timestamp_ntz").cast("timestamp").as("event_ts"),
      col("value").cast("double"))
    val bounded = if (useTtl) withTs.withWatermark("event_ts", watermarkDelay) else withTs
    // the TTL path must keep the watermark-tagged column visible to the
    // state operator or the event-time-timeout analysis check rejects it
    val cols =
      Seq(col("user_id"), unix_micros(col("event_ts")).as("ts"), col("value")) ++
        (if (useTtl) Seq(col("event_ts")) else Nil)
    val ds = bounded.select(cols: _*).as[UserEvent]
    val timeoutConf =
      if (useTtl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (user: Long, events: Iterator[UserEvent], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: evict; the user's stats were already
            // emitted with the last batch that touched them
            state.remove()
            Iterator.empty
          } else {
            var (n, sum, first, last) = state.getOption
              .map(s => (s.n, s.sum, s.first, s.last))
              .getOrElse((0L, 0.0, Long.MaxValue, Long.MinValue))
            events.foreach { e =>
              n += 1
              sum += e.value
              if (e.ts < first) first = e.ts
              if (e.ts > last) last = e.ts
            }
            state.update(UserState(n, sum, first, last))
            ttlMs.foreach(t => if (useTtl) state.setTimeoutTimestamp(last / 1000L + t))
            Iterator((user, n, sum, first, last))
          }
      }
      .toDF("user_id", "n_events", "sum_value", "first_us", "last_us")
      .select(
        col("user_id"), col("n_events"), col("sum_value"),
        timestamp_micros(col("first_us")).cast("timestamp_ntz").as("first_ts"),
        timestamp_micros(col("last_us")).cast("timestamp_ntz").as("last_ts"))
  }
}
