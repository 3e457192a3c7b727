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

  /** [[asofJoin]] with time-bucket salting for hot keys.
    *
    * The plain formulation puts each key's ENTIRE timeline in one window
    * partition — correct, but a key with a billion events becomes one
    * straggler task. This variant adds a coarse time bucket (`bucketOf`,
    * e.g. `t => date_trunc("day", t)`) to the partition key, turning a hot
    * key into (#buckets) parallel tasks, then repairs the carry across
    * bucket boundaries with a segmented scan:
    *
    *   1. within-bucket running `last(ignoreNulls)` — the salted window;
    *   2. per (key, bucket) the last non-null payload of that bucket (a
    *      tiny aggregate: one row per key × bucket), prefix-scanned over
    *      buckets per key to give each bucket its carry-in;
    *   3. stitch: a left row takes the within-bucket value, else the
    *      bucket's carry-in.
    *
    * Per-column semantics match [[asofJoin]] exactly: each payload column
    * independently carries its last non-null value. The extra cost is one
    * cheap distinct and a join against the small bucket table — worth it
    * only when keys are genuinely hot; prefer [[asofJoin]] otherwise.
    *
    * Limitation vs [[asofJoin]]: the per-bucket carry is a
    * `max(struct(ts, payload))` aggregate, so payload columns must be
    * ORDERABLE (no maps, no structs containing maps) — plain asofJoin's
    * `last()` window has no such constraint. Checked eagerly with a clear
    * error rather than Spark's analysis-time struct-ordering failure. */
  def asofJoinSalted(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      bucketOf: Column => Column,
      suffix: String = "_right",
  ): DataFrame = {
    graft.core.Validators.requireColumns(left, keyCols :+ tsCol)
    graft.core.Validators.requireColumns(right, (keyCols :+ tsCol) ++ payloadCols)
    payloadCols.foreach { c =>
      val dt = right.schema(c).dataType
      if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt))
        throw graft.errors.FeatureFactoryException.InvalidParameter(
          s"asofJoinSalted payload column '$c' has non-orderable type $dt " +
            "(the per-bucket carry aggregates max(struct(ts, payload))); " +
            "use asofJoin for map-typed payloads")
    }
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
      .withColumn("__bkt", bucketOf(col(tsCol)))
    val keyed = keyCols.map(col)
    // 1. salted window: (key, bucket) partitions
    val wB = Window
      .partitionBy(keyed :+ col("__bkt"): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadOut.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(wB))
    }
    // 2. carry-in: per payload column, value at the max ts among that
    //    bucket's non-null right rows, prefix-scanned over earlier buckets
    val perBucketAggs = payloadOut.map(c =>
      max(when(col(c).isNotNull, struct(col(tsCol).as("t"), col(c).as("v"))))
        .getField("v").as(c))
    val perBucket = unioned.filter(col("__side") === 0)
      .groupBy(keyed :+ col("__bkt"): _*)
      .agg(perBucketAggs.head, perBucketAggs.tail: _*)
    val allBuckets = unioned.select(keyed :+ col("__bkt"): _*).distinct()
      .join(perBucket, keyCols :+ "__bkt", "left")
    val wC = Window
      .partitionBy(keyed: _*)
      .orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = payloadOut.foldLeft(allBuckets) { (d, c) =>
      d.withColumn(c + "__carry", last(col(c), ignoreNulls = true).over(wC))
    }.select(keyed ++ Seq(col("__bkt")) ++ payloadOut.map(c => col(c + "__carry")): _*)
    // 3. stitch within-bucket values with the bucket's carry-in
    val stitched = payloadOut.foldLeft(filled.join(carry, keyCols :+ "__bkt", "left")) {
      (d, c) => d.withColumn(c, coalesce(col(c), col(c + "__carry")))
    }
    stitched.filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++ payloadOut.map(col): _*)
  }

  /** Range (interval-containment) join: every `points` row paired with every
    * `intervals` row of the same `keyCols` whose `[startCol, endCol]` contains
    * `pointCol` (`inclusiveEnd = false` gives half-open `[start, end)`).
    *
    * Catalyst can only execute a bare inequality join as a broadcast-nested-
    * loop — a full cross product per partition, off the table at 100 TB. This
    * formulation discretizes the join domain into fixed-width buckets:
    * points land in exactly ONE bucket (`floor(t / width)`), intervals are
    * exploded over every bucket they overlap, and the join becomes a plain
    * hash equi-join on (keys…, bucket) with the exact containment predicate
    * re-checked inline. Each (point, interval) match is found exactly once —
    * the point's bucket is unique — so no dedup pass is needed.
    *
    * Scale shape: one explode (fan-out = interval span / width, so pick
    * `bucketWidth` near the typical interval length — spans cost
    * span/width candidate rows each) + one hash shuffle. A long interval
    * fans out over many buckets, which is parallelism, not skew; a hot
    * BUCKET (many intervals overlapping one window) is bounded by the
    * bucket's interval count × its point count, tunable via `bucketWidth`.
    *
    * Timestamp point/bound columns are bucketed on `unix_micros`;
    * `bucketWidth` is then in MICROSECONDS (e.g. 3_600_000_000L = 1 h).
    * Numeric columns bucket on their own scale. Non-key column names must
    * be distinct across the two inputs (the containment predicate reads
    * them post-join). */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keyCols: Seq[String] = Nil,
      bucketWidth: Long = 3600000000L,
      inclusiveEnd: Boolean = true,
      maxBucketsPerInterval: Int = 100000,
  ): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    graft.core.Validators.requireColumns(points, keyCols :+ pointCol)
    graft.core.Validators.requireColumns(intervals, keyCols ++ Seq(startCol, endCol))
    // floor-division bucket ids (pmod-free: Spark's `div` truncates toward
    // zero, so shift via floor() on doubles). The long→double cast is exact
    // only below 2^53 (micros until year ~2255); above that it stays
    // MONOTONE, so bucket ids remain consistent between points and interval
    // bounds and the inline exact predicate keeps the join correct.
    def bucketOf(t: Column): Column = floor(t.cast("double") / bucketWidth.toDouble).cast("long")
    val p = points.withColumn("__graft_bkt", bucketOf(ticksOf(points, pointCol)))
    // a single interval spanning ≫ bucketWidth would silently explode into
    // span/width candidate rows — fail loudly instead and tell the caller
    // to widen the bucket (or pre-split the interval)
    val spanGuard = when(
      col("__graft_b1") - col("__graft_b0") >= lit(maxBucketsPerInterval.toLong),
      raise_error(concat(
        lit(s"rangeJoin: an interval spans more than $maxBucketsPerInterval buckets " +
          s"(bucketWidth=$bucketWidth); widen bucketWidth or pre-split intervals — span: "),
        (col("__graft_b1") - col("__graft_b0")).cast("string"))))
      .otherwise(sequence(col("__graft_b0"), col("__graft_b1")))
    val iv = intervals
      .withColumn("__graft_b0", bucketOf(ticksOf(intervals, startCol)))
      .withColumn("__graft_b1", bucketOf(ticksOf(intervals, endCol)))
      .filter(col("__graft_b1") >= col("__graft_b0")) // end < start: no match possible
      .withColumn("__graft_bkt", explode(spanGuard))
      .drop("__graft_b0", "__graft_b1")
    val endPred =
      if (inclusiveEnd) col(pointCol) <= col(endCol) else col(pointCol) < col(endCol)
    p.join(iv, keyCols :+ "__graft_bkt")
      .filter(col(pointCol) >= col(startCol) && endPred)
      .drop("__graft_bkt")
  }

  /** Timestamp column → epoch-micros ticks (numeric columns pass through as
    * long). NTZ/date go through the session-UTC timestamp cast — Verify/
    * Bench sessions pin spark.sql.session.timeZone=UTC, so it's a zone-free
    * relabel. */
  private def ticksOf(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
    case org.apache.spark.sql.types.TimestampNTZType | org.apache.spark.sql.types.DateType =>
      unix_micros(col(c).cast("timestamp"))
    case _ => col(c).cast("long")
  }

  /** Sessionization: assigns each row a per-key `session_id` (1-based) that
    * increments whenever the gap since the key's previous event exceeds
    * `maxGap` (micros for timestamp columns, own units for numeric). The
    * row-level counterpart of a session-window AGGREGATE — downstream
    * training features usually need the id on every event, not just the
    * session summary.
    *
    * One hash shuffle on the key (two window passes over the same sort —
    * Catalyst plans a single Exchange + Sort). Ties at identical timestamps
    * order by `tieCols` — pass a unique id there for deterministic output.
    * Hot-key caution as [[asofJoin]]: a key's whole timeline is one
    * partition. */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      maxGap: Long,
      tieCols: Seq[String] = Nil,
  ): DataFrame = {
    require(maxGap >= 0, "maxGap must be >= 0")
    graft.core.Validators.requireColumns(df, (keyCols :+ tsCol) ++ tieCols)
    graft.core.Validators.requireColumnsAbsent(df, Seq("session_id"), "sessionize")
    val ord = col("__graft_t").asc +: tieCols.map(col(_).asc)
    val wLag = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_t", ticksOf(df, tsCol))
      .withColumn("__graft_prev", lag(col("__graft_t"), 1).over(wLag))
      .withColumn("session_id",
        sum(when(col("__graft_prev").isNull ||
          col("__graft_t") - col("__graft_prev") > maxGap, 1L).otherwise(0L))
          .over(wRun))
      .drop("__graft_t", "__graft_prev")
  }

  /** [[sessionize]] with time-bucket salting for hot keys (same trade as
    * [[asofJoinSalted]]): the plain formulation puts a key's ENTIRE
    * timeline in one window partition — a bot user with a billion events
    * becomes one straggler task. Here rows window within (key, bucket)
    * to get a LOCAL session index, and a per-(key, bucket) summary table
    * (one row per present bucket — tiny) stitches the global numbering:
    *
    *   merge_k   = first event of bucket k is ≤ maxGap after the previous
    *               PRESENT bucket's last event (the boundary session
    *               continues);
    *   cum_k     = Σ_{j ≤ k} (localSessions_j − merge_j);
    *   global id = cum_{k−1} + local − merge_k.
    *
    * All exact integer math — output is identical to [[sessionize]] row
    * for row (guarded by OpsSpec on a skewed fixture). Costs one extra
    * tiny aggregate + join; prefer plain [[sessionize]] when keys are not
    * hot. `bucketOf` maps the RAW ts column to a coarse bucket and MUST be
    * monotone non-decreasing in it (e.g. `date_trunc("day", _)` — a
    * non-monotone bucketing would scramble the boundary stitch); pick
    * buckets ≫ maxGap so boundary merges stay rare. */
  def sessionizeSalted(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      maxGap: Long,
      bucketOf: Column => Column,
      tieCols: Seq[String] = Nil,
  ): DataFrame = {
    require(maxGap >= 0, "maxGap must be >= 0")
    graft.core.Validators.requireColumns(df, (keyCols :+ tsCol) ++ tieCols)
    graft.core.Validators.requireColumnsAbsent(df, Seq("session_id"), "sessionizeSalted")
    val keyed = keyCols.map(col)
    val ord = col("__graft_t").asc +: tieCols.map(col(_).asc)
    // 1. local session index within (key, bucket)
    val wLag = Window.partitionBy(keyed :+ col("__graft_bkt"): _*).orderBy(ord: _*)
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialized once (on first action): both the summary aggregate and
    // the final join read this windowed intermediate — without it the
    // heaviest stage (the per-(key, bucket) sort + lag + running sum)
    // executes twice
    val local = Dedup.materializeLazy(df
      .withColumn("__graft_t", ticksOf(df, tsCol))
      .withColumn("__graft_bkt", bucketOf(col(tsCol)))
      .withColumn("__graft_prev", lag(col("__graft_t"), 1).over(wLag))
      .withColumn("__graft_local",
        sum(when(col("__graft_prev").isNull ||
          col("__graft_t") - col("__graft_prev") > maxGap, 1L).otherwise(0L))
          .over(wRun)))
    // 2. per-(key, bucket) summary → merge flags and cumulative offsets
    //    (the summary is one row per present bucket; its window shuffle is
    //    negligible next to the data)
    val summary = local.groupBy(keyed :+ col("__graft_bkt"): _*)
      .agg(min(col("__graft_t")).as("__graft_first"),
        max(col("__graft_t")).as("__graft_last"),
        max(col("__graft_local")).as("__graft_n"))
    val wB = Window.partitionBy(keyed: _*).orderBy(col("__graft_bkt").asc)
    val stitched = summary
      .withColumn("__graft_prev_last", lag(col("__graft_last"), 1).over(wB))
      .withColumn("__graft_merge",
        when(col("__graft_prev_last").isNotNull &&
          col("__graft_first") - col("__graft_prev_last") <= maxGap, 1L).otherwise(0L))
      .withColumn("__graft_cum_prev",
        coalesce(sum(col("__graft_n") - col("__graft_merge"))
          .over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(keyed ++ Seq(col("__graft_bkt"), col("__graft_merge"),
        col("__graft_cum_prev")): _*)
    // 3. stitch: global = cum_prev + local − merge
    local.join(stitched, keyCols :+ "__graft_bkt")
      .withColumn("session_id",
        col("__graft_cum_prev") + col("__graft_local") - col("__graft_merge"))
      .drop("__graft_t", "__graft_bkt", "__graft_prev", "__graft_local",
        "__graft_merge", "__graft_cum_prev")
  }

  /** Rolling time-window features: for every row, the count and sum of
    * `valueCol` over this key's trailing `[ts − span, ts]` window, one
    * (count, sum) column pair per `(suffix, span)` entry (micros for
    * timestamp columns). The classic "events in the last hour / last day"
    * feature block.
    *
    * All windows share one partitioning + sort, so Catalyst plans a single
    * Exchange however many spans are asked for. For bit-exact replay on
    * other engines feed an INTEGER `valueCol` (e.g. cents instead of a
    * double amount): integer sums are association-free, double sums are
    * not ([[graft.ops.Sampling]] has the same portability note).
    * Hot-key caution as [[asofJoin]]/[[sessionize]]: a key's timeline is
    * one window partition — use [[rollingFeaturesSalted]] when keys are
    * hot. */
  def rollingFeatures(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      spans: Seq[(String, Long)],
  ): DataFrame = {
    require(spans.nonEmpty, "spans must be non-empty")
    spans.foreach { case (_, s) => require(s >= 0, "span must be >= 0") }
    graft.core.Validators.requireColumns(df, keyCols ++ Seq(tsCol, valueCol))
    graft.core.Validators.requireColumnsAbsent(df,
      spans.flatMap { case (sfx, _) => Seq(s"n_$sfx", s"sum_$sfx") }, "rollingFeatures")
    val base = df.withColumn("__graft_t", ticksOf(df, tsCol))
    val out = spans.foldLeft(base) { case (d, (sfx, span)) =>
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("__graft_t").asc)
        .rangeBetween(-span, 0)
      // count(*) row count ("events in the window"), not non-null values —
      // matching the documented semantics and the DuckDB oracle
      d.withColumn(s"n_$sfx", count(lit(1)).over(w))
        .withColumn(s"sum_$sfx", sum(col(valueCol)).over(w))
    }
    out.drop("__graft_t")
  }

  /** [[rollingFeatures]] with time-bucket salting for hot keys (same trade
    * as [[asofJoinSalted]]/[[sessionizeSalted]]): the plain formulation
    * puts a key's ENTIRE timeline in one window partition, so a key with a
    * billion events becomes one span-length sort+scan on one task.
    *
    * A trailing RANGE frame has no scalar segmented carry (a bucket's
    * carry-in is the previous bucket's span-length tail), so the salting
    * here is GHOST REPLICATION instead of summary-stitching: the timeline
    * is cut into `bucketWidth` buckets, and every event is additionally
    * copied into the ⌈maxSpan / bucketWidth⌉ successor buckets as a
    * non-output "ghost" contributor. Within each (key, bucket) partition
    * the usual RANGE `[t − span, t]` frame then sees exactly one copy of
    * every event it must aggregate — its own bucket's real rows plus the
    * earlier buckets' tails as ghosts — so the per-row (count, sum) values
    * are IDENTICAL to [[rollingFeatures]] (guarded row-for-row by OpsSpec
    * and the shared `events_rolling` oracle), while a hot key runs as
    * (#buckets) parallel tasks.
    *
    * Cost: the shuffle carries (1 + ⌈maxSpan/bucketWidth⌉)× the rows —
    * pick `bucketWidth ≥ maxSpan` (2× replication) unless skew is extreme;
    * a width below maxSpan/32 is rejected loudly rather than silently
    * multiplying the input. All spans still share one partitioning + sort
    * (a single Exchange). Prefer plain [[rollingFeatures]] when keys are
    * not hot. `bucketWidth` is in the same units as the spans (micros for
    * timestamp columns). */
  def rollingFeaturesSalted(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      spans: Seq[(String, Long)],
      bucketWidth: Long,
  ): DataFrame = {
    require(spans.nonEmpty, "spans must be non-empty")
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    spans.foreach { case (_, s) => require(s >= 0, "span must be >= 0") }
    val maxSpan = spans.map(_._2).max
    val ghosts = (maxSpan + bucketWidth - 1) / bucketWidth // successor buckets an event reaches
    require(ghosts <= 32,
      s"bucketWidth=$bucketWidth replicates every row ${ghosts + 1}x against the " +
        s"max span $maxSpan — pick bucketWidth >= maxSpan/32 (ideally >= maxSpan)")
    graft.core.Validators.requireColumns(df, keyCols ++ Seq(tsCol, valueCol))
    graft.core.Validators.requireColumnsAbsent(df,
      spans.flatMap { case (sfx, _) => Seq(s"n_$sfx", s"sum_$sfx") }, "rollingFeaturesSalted")
    // EXACT long floor-division bucket ids ((t − pmod(t, w)) div w — correct
    // for negative ticks too; `div` is IntegralDivide, so the arithmetic
    // never leaves LongType — Spark's `/` would cast to double and lose
    // exactness above 2^53). Unlike rangeJoin, nothing downstream re-checks
    // an exact predicate here — a misplaced ghost would silently
    // undercount — so the double-floor shortcut is not acceptable in this op.
    val exploded = df
      .withColumn("__graft_t", ticksOf(df, tsCol))
      .withColumn("__graft_off", explode(sequence(lit(0L), lit(ghosts))))
      .withColumn("__graft_bkt",
        expr(s"(__graft_t - pmod(__graft_t, ${bucketWidth}L)) div ${bucketWidth}L") +
          col("__graft_off"))
    val out = spans.foldLeft(exploded) { case (d, (sfx, span)) =>
      val w = Window.partitionBy(keyCols.map(col) :+ col("__graft_bkt"): _*)
        .orderBy(col("__graft_t").asc)
        .rangeBetween(-span, 0)
      d.withColumn(s"n_$sfx", count(lit(1)).over(w))
        .withColumn(s"sum_$sfx", sum(col(valueCol)).over(w))
    }
    // ghosts contributed to frames; only real rows are output
    out.filter(col("__graft_off") === 0L)
      .drop("__graft_t", "__graft_off", "__graft_bkt")
  }

  /** Leave-one-out target-mean encoding — the leakage-safe variant of the
    * reference's MeanEncoder (categorical.rs MeanEncoder learns plain
    * per-category means, which leak each row's own target into its feature):
    * each row gets the mean target of the OTHER rows in its category,
    * `(Σ target − own) / (n − 1)`; rows with a null target get the plain
    * category mean (they contribute nothing to leak); singleton categories
    * get NULL (no other rows to average).
    *
    * One hash shuffle on the category. Integer targets replay bit-for-bit
    * on any engine (exact sums, then one double division); double targets
    * carry the usual association caveat. */
  def looMeanEncode(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      outCol: String,
  ): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(catCol, targetCol))
    val w = Window.partitionBy(col(catCol))
    val s = sum(col(targetCol)).over(w)
    val n = count(col(targetCol)).over(w)
    df.withColumn(outCol,
      when(col(targetCol).isNull,
        when(n > 0, s.cast("double") / n.cast("double")))
        .otherwise(when(n > 1,
          (s - col(targetCol)).cast("double") / (n - 1).cast("double"))))
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
