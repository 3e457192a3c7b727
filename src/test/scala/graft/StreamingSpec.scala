package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** The streaming ops under actual Structured Streaming execution
  * (MemoryStream source → op → memory sink): proves the SAME DataFrame code
  * that passes the batch oracle also runs incrementally with state. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedAgg streaming (complete mode) matches the batch result") {
    val rows = Seq(
      (1L, ts(0), "click", 1.0),
      (2L, ts(5), "click", 2.0),
      (3L, ts(35), "view", 4.0),
      (4L, ts(40), "click", 8.0))
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(rows: _*)
    val stream = StreamingOps.windowedAgg(
      mem.toDF.toDF("event_id", "ts", "event_type", "value"),
      "ts", Seq("event_type"), "value", "30 minutes")
    val q = stream.writeStream.format("memory")
      .queryName("win_agg").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("win_agg")
      .select("event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // window [10:00,10:30): 2 clicks sum 3; [10:30,11:00): 1 view sum 4 + 1 click sum 8
    got shouldBe Set(("click", 2L, 3.0), ("view", 1L, 4.0), ("click", 1L, 8.0))

    val batch = StreamingOps.windowedAgg(
      rows.toDF("event_id", "ts", "event_type", "value"),
      "ts", Seq("event_type"), "value", "30 minutes")
      .select("event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    batch shouldBe got
  }

  test("windowedAgg sliding windows: each event lands in length/slide windows") {
    val rows = Seq(
      (1L, ts(0), "click", 1.0),  // 10:00
      (2L, ts(35), "click", 2.0)) // 10:35
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(rows: _*)
    val stream = StreamingOps.windowedAgg(
      mem.toDF.toDF("event_id", "ts", "event_type", "value"),
      "ts", Seq("event_type"), "value", "30 minutes", slide = Some("15 minutes"))
    val q = stream.writeStream.format("memory")
      .queryName("slide_agg").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("slide_agg").collect()
    got.length shouldBe 4 // 2 events × 2 windows each (30m/15m), no overlap here
    val batch = StreamingOps.windowedAgg(
      rows.toDF("event_id", "ts", "event_type", "value"),
      "ts", Seq("event_type"), "value", "30 minutes", slide = Some("15 minutes"))
    batch.count() shouldBe 4
  }

  test("dedupEvents streaming drops duplicate ids via watermarked state") {
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(0), 1.0))
    val stream = StreamingOps.dedupEvents(
      mem.toDF.toDF("event_id", "ts", "value"), Seq("event_id"), "ts")
    val q = stream.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData((2L, ts(1), 2.0), (3L, ts(2), 3.0)) // dup of 2 + a new event
      q.processAllAvailable()
    } finally q.stop()
    spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L, 3L)
  }

  test("sessionAgg streaming (complete mode) builds gap sessions incrementally") {
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData((7L, ts(0)), (7L, ts(10)))
    val stream = StreamingOps.sessionAgg(
      mem.toDF.toDF("user_id", "ts"), "ts", "user_id", "30 minutes")
    val q = stream.writeStream.format("memory")
      .queryName("sess_agg").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // 10:10 + 30min gap → an event at 10:50 starts a NEW session
      mem.addData((7L, ts(50)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_agg")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    got shouldBe Set(
      (7L, ts(0), Timestamp.valueOf("2024-01-01 10:40:00"), 2L),
      (7L, ts(50), Timestamp.valueOf("2024-01-01 11:20:00"), 1L))
  }

  test("userEventStats accumulates custom state across micro-batches") {
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData((7L, ts(0), 1.0), (7L, ts(5), 2.0), (9L, ts(1), 5.0))
    val stream = StreamingOps.userEventStats(
      mem.toDF.toDF("user_id", "ts", "value"))
    val q = stream.writeStream.format("memory")
      .queryName("user_stats").outputMode("update").start()
    try {
      q.processAllAvailable()
      mem.addData((7L, ts(10), 4.0)) // second micro-batch: state must carry over
      q.processAllAvailable()
    } finally q.stop()
    // update sink appends one row per key per batch — take the latest per key
    val latest = spark.table("user_stats")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) => u -> rows.maxBy(_.getLong(1)) }
    latest(7L).getLong(1) shouldBe 3L // 2 events batch 1 + 1 event batch 2
    latest(7L).getDouble(2) shouldBe 7.0
    latest(9L).getLong(1) shouldBe 1L
  }

  test("userEventStats idleTtl evicts an idle user's state via the watermark") {
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData((7L, ts(0), 1.0), (9L, ts(1), 5.0))
    val stream = StreamingOps.userEventStats(
      mem.toDF.toDF("user_id", "ts", "value"),
      idleTtl = Some("5 minutes"), watermarkDelay = "0 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("user_stats_ttl").outputMode("update").start()
    try {
      q.processAllAvailable() // batch 1: both users in state
      // user 9 stays active; the new event pushes the watermark to 10:30,
      // far past user 7's last event (10:00) + 5 min TTL
      mem.addData((9L, ts(30), 2.0))
      q.processAllAvailable() // batch 2: watermark advances AFTER this batch
      mem.addData((9L, ts(35), 3.0))
      q.processAllAvailable() // batch 3: timeout fires for user 7 → evicted
      val numKeys = q.lastProgress.stateOperators.head.numRowsTotal
      numKeys shouldBe 1L // only user 9 remains in the state store
    } finally q.stop()
    // user 7's accumulated stats were emitted before eviction
    val sevens = spark.table("user_stats_ttl").filter($"user_id" === 7L).collect()
    sevens.map(_.getLong(1)).max shouldBe 1L
  }

  test("jsonField extracts typed properties") {
    val df = Seq((1L, """{"k": 42}"""), (2L, """{"k": 7}"""), (3L, "{}"))
      .toDF("id", "props")
    val got = df.select($"id", StreamingOps.jsonField($"props", "$.k").cast("int").as("k"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    got shouldBe Map(1L -> Some(42), 2L -> Some(7), 3L -> None)
  }

  test("text hygiene ops run unchanged on a stream (narrow per-row projections)") {
    // the quality/repetition/PII/normalize stages are stateless narrow
    // projections, so the SAME calls compose onto readStream sources —
    // this is the streaming half of the ingest-time curation story
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "a perfectly reasonable document with plenty of distinct tokens here"),
      (2L, "spam spam spam spam spam spam"),
      (3L, "too short"))
    val cleaned = graft.ops.TextOps.repetitionFilter(
      graft.ops.TextOps.qualityFilter(
        graft.ops.TextOps.piiCounts(
          mem.toDF.toDF("doc_id", "text"), "text"),
        "text", minTokens = 5, maxPunctRatio = 0.2),
      "text", maxDupWordFrac = 0.3, maxTopWordFrac = 0.3, maxTopBigramFrac = 0.3)
    val q = cleaned.writeStream.format("memory")
      .queryName("stream_hygiene").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("stream_hygiene").collect()
    got.map(_.getLong(0)).toSet shouldBe Set(1L) // 2 repetition-cut, 3 length-cut
    got.head.getInt(got.head.fieldIndex("n_emails")) shouldBe 0
  }

  test("multimodal header kernels run unchanged on a stream (narrow per-row projections)") {
    // the whole ingest profile — sniff, dims, EXIF, durations, ID3 —
    // is stateless narrow projections, so the SAME chain composes onto
    // a readStream source: the streaming half of multimodal ingest
    def hx(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val jpeg = hx("FFD8" +
      "FFE1002E" + "457869660000" + "49492A00" + "08000000" + "0200" +
      "0001" + "0300" + "01000000" + "E7030000" +
      "1201" + "0300" + "01000000" + "06000000" + "00000000" +
      "FFC0000B08" + "0064" + "00C8" + "01011100")
    val mp3 = hx("FFFB9000") ++ Array.fill[Byte](996)(0xAA.toByte)
    def profile(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Multimodal.withMediaDuration(
        graft.ops.Multimodal.withExifOrientation(
          graft.ops.Multimodal.imageDims(
            graft.ops.Multimodal.withBinaryMeta(df, "payload"), "payload"),
          "payload"),
        "payload")
        .select("id", "format", "img_width", "img_orientation",
          "display_width", "media_dur_num")
    val mem = MemoryStream[(Int, Array[Byte])]
    mem.addData((1, jpeg), (2, mp3))
    val q = profile(mem.toDF.toDF("id", "payload"))
      .writeStream.format("memory").queryName("stream_mm_profile")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_mm_profile").collect()
      .map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    val batch = profile(Seq((1, jpeg), (2, mp3)).toDF("id", "payload"))
      .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    batch shouldBe streamed
    streamed(1) shouldBe Seq("jpeg", 200L, 6, 100L, null) // orientation 6 transposes
    streamed(2) shouldBe Seq("mp3", null, null, null, 1000L * 8)
  }

  test("WAT enrichment runs unchanged on a stream (narrow JSON projections)") {
    // watHeadMeta is per-row get_json_object/from_json — a live WAT
    // sidecar feed enriches without any batch detour
    val wat = """{"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {""" +
      """"Response-Message": {"Status": "200"}, """ +
      """"Headers": {"Content-Type": "text/html"}, """ +
      """"HTML-Metadata": {"Head": {"Title": "T", """ +
      """"Metas": [{"name": "description", "content": "D"}], """ +
      """"Link": [{"path": "LINK@/href", "url": "/c/1", "rel": "canonical"}]}}}}}}"""
    val mem = MemoryStream[(String, String)]
    mem.addData(("u1", wat), ("u2", "{}"))
    val q = graft.ops.LinkGraph.watHeadMeta(
      mem.toDF.toDF("url", "payload"), "payload")
      .select("url", "wat_title", "meta_description", "canonical_url",
        "content_type", "http_status")
      .writeStream.format("memory").queryName("stream_wat")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("stream_wat").collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    got("u1") shouldBe Seq("T", "D", "/c/1", "text/html", 200)
    got("u2") shouldBe Seq(null, null, null, null, null)
  }

  test("dedupByContent drops same-fingerprint docs across micro-batches") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    mem.addData(
      (1L, ts(10), "the exact same document"),
      (2L, ts(20), "a different document entirely"))
    val fp = graft.ops.TextOps.fingerprint(col("text"))
    val out = graft.streaming.StreamingOps.dedupByContent(
      mem.toDF.toDF("doc_id", "ts", "text").withColumn("fp", fp),
      Seq("fp"), "doc_id", tsCol = "ts", watermark = "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("stream_content_dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      // second batch: a re-send of doc 1's content (different id/ts, extra
      // whitespace — the fingerprint normalizes it) and one new doc
      mem.addData(
        (3L, ts(30), "the  exact   same document"),
        (4L, ts(40), "yet another novel document"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("stream_content_dedup").collect()
      .map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 4L)
    // batch path: deterministic smallest-tiebreak representative
    val batch = graft.streaming.StreamingOps.dedupByContent(
      Seq((9L, ts(1), "x y"), (3L, ts(2), "x  y"), (5L, ts(3), "other"))
        .toDF("doc_id", "ts", "text").withColumn("fp", fp),
      Seq("fp"), "doc_id")
    batch.collect().map(_.getLong(0)).toSet shouldBe Set(3L, 5L)
  }

  test("dedupNearDups drops banded near-dups across micro-batches; batch replay agrees") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val docA = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val docB = "completely unrelated text about distributed query engines and shuffles"
    // near-dup of A: one word changed — high character-3-gram Jaccard
    val docA2 = "the quick brown fox jumps over the lazy cat near the riverbank today"
    mem.addData((1L, ts(0), docA), (2L, ts(1), docB))
    val out = StreamingOps.dedupNearDups(
      mem.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "doc_id",
      tsCol = "ts", watermark = "5 minutes", emitWindow = "1 minute")
    val q = out.writeStream.format("memory")
      .queryName("stream_neardup").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: an exact re-send of A (all bands collide → always dropped),
      // the near-dup of A, and a fresh doc; later event times advance the
      // watermark so batch-1 windows finalize
      mem.addData((3L, ts(20), docA), (4L, ts(21), docA2),
        (5L, ts(22), "yet another entirely novel piece of text about volcanoes"))
      q.processAllAvailable()
      // batch 3: far-future heartbeat flushes the batch-2 windows
      mem.addData((99L, ts(59), "final heartbeat document to advance the watermark"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_neardup").collect().map(_.getLong(0)).toSet
    streamed should contain allOf (1L, 2L, 5L)
    streamed should not contain 3L // exact dup of doc 1
    // the batch replay over the same rows (tie = arrival order = doc_id)
    // must agree doc-for-doc, including the near-dup verdict on doc 4
    val allRows = Seq((1L, ts(0), docA), (2L, ts(1), docB), (3L, ts(20), docA),
      (4L, ts(21), docA2), (5L, ts(22), "yet another entirely novel piece of text about volcanoes"),
      (99L, ts(59), "final heartbeat document to advance the watermark"))
      .toDF("doc_id", "ts", "text")
    val batch = StreamingOps.dedupNearDups(
      allRows, "doc_id", "text", "doc_id").collect().map(_.getLong(0)).toSet
    // the heartbeat (99) is kept by the batch rule but its stream window
    // never closed — everything that did flush must agree doc-for-doc
    batch shouldBe streamed + 99L
    // a doc too short to shingle passes through (unique per-doc key)
    StreamingOps.dedupNearDups(
      Seq((1L, ts(0), "ab"), (2L, ts(1), "ab")).toDF("doc_id", "ts", "text"),
      "doc_id", "text", "doc_id").count() shouldBe 2L
  }

  test("dedupNearDups keeps exactly one of N exact copies sharing a micro-batch") {
    // without the signature-keyed collapse, same-batch exact copies race
    // the per-band state, can split band wins, and ALL drop — total data
    // loss; the collapse must leave exactly one survivor
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val docA = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val docB = "completely unrelated text about distributed query engines and shuffles"
    mem.addData((1L, ts(0), docA), (2L, ts(0), docA), (3L, ts(0), docA),
      (4L, ts(1), docB))
    val out = StreamingOps.dedupNearDups(
      mem.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "doc_id",
      tsCol = "ts", watermark = "5 minutes", emitWindow = "1 minute")
    val q = out.writeStream.format("memory")
      .queryName("stream_neardup_samebatch").outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData((99L, ts(59), "heartbeat to advance the watermark and flush"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_neardup_samebatch").collect()
      .map(_.getLong(0)).toSet
    streamed should contain(4L)
    (streamed & Set(1L, 2L, 3L)) should have size 1
  }

  test("streaming WARC sink: micro-batches land as epoch-named archives our reader ingests") {
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(Long, String)]
    val d = java.nio.file.Files.createTempDirectory("graft_warc_stream_w")
    val out = d.resolve("live.warc").toString
    val ckpt = d.resolve("ckpt").toString
    val recs = mem.toDF.toDF("id", "text").select(
      lit("conversion").as("warc_type"),
      concat(lit("<urn:s:"), col("id"), lit(">")).as("record_id"),
      concat(lit("https://ex.com/"), col("id")).as("target_uri"),
      lit("2026-03-01T00:00:00Z").as("warc_date"),
      lit("text/plain").as("content_type"),
      col("text").as("payload"))
    val q = recs.writeStream.format("graft-warc")
      .option("checkpointLocation", ckpt).outputMode("append").start(out)
    try {
      mem.addData((1L, "first doc"), (2L, "second doc"))
      q.processAllAvailable()
      mem.addData((3L, "third doc in a later batch"))
      q.processAllAvailable()
    } finally q.stop()
    // epoch-named archives, no task-id entropy (replay idempotence)
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.endsWith(".warc")).sorted
    all(files) should fullyMatch regex "part-\\d{5}-e\\d+\\.warc"
    val back = graft.sources.Loader.load(spark, out)
    back.count() shouldBe 3
    back.orderBy("record_id").collect().map(_.getAs[String]("payload")).toSeq shouldBe
      Seq("first doc", "second doc", "third doc in a later batch")
  }

  test("dedupNearDupsDeterministic: same-batch TRUE near-dups resolve like the batch rule") {
    // two different texts with IDENTICAL character-3-gram sets — identical
    // signatures, identical bands: the exact shape dedupNearDups documents
    // as its residual same-batch race (both could drop). The deterministic
    // processor must keep exactly the min-tie doc and match the batch twin.
    val t1 = "xyzxyzxyz"
    val t2 = "xyzxyzxyzxyz"
    val fresh = "completely unrelated text about distributed query engines"
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
      mem.addData((10L, ts(0), t1), (11L, ts(0), t2), (12L, ts(1), fresh))
      val out = StreamingOps.dedupNearDupsDeterministic(
        mem.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "doc_id",
        tsCol = "ts", watermark = "5 minutes", emitWindow = "1 minute")
      val q = out.writeStream.format("memory")
        .queryName("stream_neardup_det").outputMode("append").start()
      try {
        q.processAllAvailable()
        // a later exact resend of the winner still drops; heartbeats flush
        mem.addData((13L, ts(20), t1),
          (14L, ts(21), "yet another novel piece of text about volcanoes"))
        q.processAllAvailable()
        mem.addData((99L, ts(59), "final heartbeat to advance the watermark"))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("stream_neardup_det").collect()
        .map(_.getLong(0)).toSet
      streamed shouldBe Set(10L, 12L, 14L) // 11 lost the tie, 13 arrived later
      // the batch twin agrees doc-for-doc (heartbeat window never flushed)
      val allRows = Seq((10L, ts(0), t1), (11L, ts(0), t2), (12L, ts(1), fresh),
        (13L, ts(20), t1),
        (14L, ts(21), "yet another novel piece of text about volcanoes"),
        (99L, ts(59), "final heartbeat to advance the watermark"))
        .toDF("doc_id", "ts", "text")
      val batch = StreamingOps.dedupNearDupsDeterministic(
        allRows, "doc_id", "text", "doc_id").collect().map(_.getLong(0)).toSet
      batch shouldBe streamed + 99L
      // reconcileNearDups over the deterministic stream finds NOTHING but
      // the never-flushed heartbeat — the race repair is now a no-op
      val delta = StreamingOps.reconcileNearDups(
        allRows, spark.table("stream_neardup_det").select("doc_id"),
        "doc_id", "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      delta shouldBe Set((99L, "add"))
      // a LONG tie is required: the deterministic comparison is 64-bit
      an[IllegalArgumentException] should be thrownBy
        StreamingOps.dedupNearDupsDeterministic(
          allRows.withColumn("s", $"doc_id".cast("string")),
          "doc_id", "text", "s")
      // RESIDUAL FORK, pinned from both sides: a LATE out-of-order row
      // with a SMALLER tie (admissible — inside the watermark) arrives
      // after the band's winner was already emitted. The stream keeps
      // the emitted winner (append mode cannot retract), the batch
      // replay keeps the min-tie doc, reconcileNearDups reports exactly
      // that swap, and the fork counter records one hit per shared band
      // key so a deployment can alarm instead of diverging silently.
      val forks = spark.sparkContext.longAccumulator("graft.neardup.late_tie_forks")
      val mem2 = MemoryStream[(Long, java.sql.Timestamp, String)]
      mem2.addData((20L, ts(0), t1))
      val out2 = StreamingOps.dedupNearDupsDeterministic(
        mem2.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "doc_id",
        tsCol = "ts", watermark = "5 minutes", emitWindow = "1 minute",
        lateForkCounter = Some(forks))
      val q2 = out2.writeStream.format("memory")
        .queryName("stream_neardup_fork").outputMode("append").start()
      try {
        q2.processAllAvailable()
        mem2.addData((19L, ts(1), t2)) // same shingle set, SMALLER tie
        q2.processAllAvailable()
        mem2.addData((98L, ts(30), "flush heartbeat for the fork case"))
        q2.processAllAvailable()
      } finally q2.stop()
      val forkStream = spark.table("stream_neardup_fork").collect()
        .map(_.getLong(0)).toSet
      forkStream shouldBe Set(20L) // the late min-tie doc lost in the stream
      forks.value shouldBe 8L // one fork per shared band key (8 bands)
      val forkRows = Seq((20L, ts(0), t1), (19L, ts(1), t2),
        (98L, ts(30), "flush heartbeat for the fork case"))
        .toDF("doc_id", "ts", "text")
      StreamingOps.dedupNearDupsDeterministic(
        forkRows, "doc_id", "text", "doc_id")
        .collect().map(_.getLong(0)).toSet shouldBe Set(19L, 98L)
      val forkDelta = StreamingOps.reconcileNearDups(
        forkRows, spark.table("stream_neardup_fork").select("doc_id"),
        "doc_id", "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      forkDelta shouldBe Set((19L, "add"), (20L, "remove"), (98L, "add"))
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("politenessSchedule: stream ≡ batch on in-order arrivals; late rows schedule on arrival") {
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, java.sql.Timestamp, String, Double)]
      // batch 1: three a.com URLs, two at the SAME instant (url tiebreak),
      // plus one b.com URL with a different delay
      mem.addData(
        ("a.com", ts("10:00:00"), "u2", 1.0), // arrival order ≠ url order
        ("a.com", ts("10:00:00"), "u1", 1.0),
        ("a.com", ts("10:00:30"), "u3", 1.0),
        ("b.com", ts("10:00:00"), "v1", 2.5))
      val out = StreamingOps.politenessSchedule(
        mem.toDF.toDF("host", "ts", "url", "crawl_delay_sec"),
        "host", "url", "crawl_delay_sec", watermark = "10 minutes")
      val q = out.writeStream.format("memory")
        .queryName("stream_politeness").outputMode("append").start()
      try {
        q.processAllAvailable()
        // batch 2, in order: lands while a.com's slot chain is still live
        mem.addData(("a.com", ts("10:00:30"), "u4", 1.0))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("stream_politeness").collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Long]("scheduled_at_ms"))
        .toMap
      val base = 1704103200000L // 2024-01-01 10:00:00 UTC in epoch ms
      streamed("u1") shouldBe base // first slot at its own event time
      streamed("u2") shouldBe base + 1000 // url order, NOT arrival order
      streamed("u3") shouldBe base + 30000 // event time past the chain
      streamed("v1") shouldBe base // hosts are independent
      streamed("u4") shouldBe base + 31000 // cross-batch: slot chain held
      // the batch twin agrees slot for slot on the in-order history
      val allRows = Seq(
        ("a.com", ts("10:00:00"), "u2", 1.0),
        ("a.com", ts("10:00:00"), "u1", 1.0),
        ("a.com", ts("10:00:30"), "u3", 1.0),
        ("b.com", ts("10:00:00"), "v1", 2.5),
        ("a.com", ts("10:00:30"), "u4", 1.0))
        .toDF("host", "ts", "url", "crawl_delay_sec")
      val batch = StreamingOps.politenessSchedule(
        allRows, "host", "url", "crawl_delay_sec")
        .collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Long]("scheduled_at_ms"))
        .toMap
      batch shouldBe streamed
      // a LATE row (within the watermark, event time before already-
      // emitted slots) schedules ON ARRIVAL in the stream — append mode
      // cannot retract — while the batch twin re-orders it first: the
      // documented residual fork, pinned from both sides
      val mem2 = MemoryStream[(String, java.sql.Timestamp, String, Double)]
      mem2.addData(("c.com", ts("10:00:00"), "w2", 1.0))
      val out2 = StreamingOps.politenessSchedule(
        mem2.toDF.toDF("host", "ts", "url", "crawl_delay_sec"),
        "host", "url", "crawl_delay_sec", watermark = "10 minutes")
      val q2 = out2.writeStream.format("memory")
        .queryName("stream_politeness_late").outputMode("append").start()
      try {
        q2.processAllAvailable()
        mem2.addData(("c.com", ts("10:00:00"), "w1", 1.0)) // late, smaller url
        q2.processAllAvailable()
      } finally q2.stop()
      val late = spark.table("stream_politeness_late").collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Long]("scheduled_at_ms"))
        .toMap
      late("w2") shouldBe base
      late("w1") shouldBe base + 1000 // scheduled AFTER w2 (arrival order)
      val lateBatch = StreamingOps.politenessSchedule(
        Seq(("c.com", ts("10:00:00"), "w2", 1.0),
          ("c.com", ts("10:00:00"), "w1", 1.0))
          .toDF("host", "ts", "url", "crawl_delay_sec"),
        "host", "url", "crawl_delay_sec")
        .collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Long]("scheduled_at_ms"))
        .toMap
      lateBatch("w1") shouldBe base // the twin orders by (ts, url)
      lateBatch("w2") shouldBe base + 1000
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("live recrawl loop: cdx decisions → robots gate → politeness schedule, stream ≡ batch") {
    import graft.ops.{Robots, Url}
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // previous crawl's index: p/1 stale (refetch), p/2 fresh (skip),
      // x/9 stale but its host robots-denies /x/ (the decision to fetch
      // is not permission to fetch)
      val idx = Seq(
        ("https://site-a.com/p/1", "20260101000000"),
        ("https://site-a.com/p/2", "20260120000000"),
        ("https://new-b.org/x/9", "20260101000000"))
        .toDF("u", "last_capture")
        .select(Url.surtKey($"u").as("urlkey"), $"last_capture")
      val rules = Robots.robotsParse(Seq(
        ("site-a.com", "User-agent: *\nCrawl-delay: 2"),
        ("new-b.org", "User-agent: *\nDisallow: /x/"))
        .toDF("host", "content"), "host", "content")
      val delays = Robots.crawlDelays(rules, "graftbot")
      // the whole live loop — every URL-side step is a narrow projection
      // or a stream-static join, so the SAME composition runs in both
      // modes (the batch twin is warc_recrawl_plan's shape)
      def recrawlLoop(cands: org.apache.spark.sql.DataFrame) = {
        val due = cands
          .withColumn("urlkey", Url.surtKey(col("url")))
          .join(idx, Seq("urlkey"), "left")
          .withColumn("decision",
            when(col("last_capture").isNull, "fetch")
              .when(col("last_capture") >= "20260115000000", "skip_fresh")
              .otherwise("refetch"))
          .filter(col("decision") =!= "skip_fresh")
          .withColumn("host", Url.host(col("url")))
        val allowed = Robots.robotsAllowed(due, "url", rules, "graftbot")
          .filter(col("allowed")).drop("allowed")
        val planned = allowed
          .join(delays, Seq("host"), "left")
          .withColumn("crawl_delay_sec",
            coalesce(col("crawl_delay_sec"), lit(1.0)))
        StreamingOps.politenessSchedule(
          planned, "host", "url", "crawl_delay_sec", watermark = "10 minutes")
          .select("url", "decision", "scheduled_at_ms")
      }
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      mem.addData(
        ("https://site-a.com/p/1", ts("10:00:00")), // refetch
        ("https://site-a.com/p/2", ts("10:00:00")), // skip_fresh → dropped
        ("https://site-a.com/p/3", ts("10:00:00")), // fetch (same instant: url tiebreak)
        ("https://new-b.org/x/9", ts("10:00:00")), // refetch but robots-denied
        ("https://new-b.org/ok/1", ts("10:00:00"))) // fetch, default 1 s delay
      val q = recrawlLoop(mem.toDF.toDF("url", "ts"))
        .writeStream.format("memory").queryName("stream_recrawl")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // a later micro-batch, in order: site-a's slot chain is still live
        mem.addData(("https://site-a.com/p/4", ts("10:00:30")))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("stream_recrawl").collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val base = 1704103200000L // 2024-01-01 10:00:00 UTC
      streamed.keySet shouldBe Set(
        "https://site-a.com/p/1", "https://site-a.com/p/3",
        "https://site-a.com/p/4", "https://new-b.org/ok/1")
      streamed("https://site-a.com/p/1") shouldBe (("refetch", base))
      streamed("https://site-a.com/p/3") shouldBe (("fetch", base + 2000)) // 2 s delay
      streamed("https://site-a.com/p/4") shouldBe (("fetch", base + 30000))
      streamed("https://new-b.org/ok/1") shouldBe (("fetch", base))
      // the batch twin of the SAME composition agrees row for row
      val batch = recrawlLoop(Seq(
        ("https://site-a.com/p/1", ts("10:00:00")),
        ("https://site-a.com/p/2", ts("10:00:00")),
        ("https://site-a.com/p/3", ts("10:00:00")),
        ("https://new-b.org/x/9", ts("10:00:00")),
        ("https://new-b.org/ok/1", ts("10:00:00")),
        ("https://site-a.com/p/4", ts("10:00:30")))
        .toDF("url", "ts"))
        .collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
      batch shouldBe streamed
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("dedupStreamAgainstIndex: live probe-and-append loop equals the sequential batch loop") {
    import graft.ops.Dedup
    val docA = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val docA2 = "the quick brown fox jumps over the lazy cat near the riverbank today"
    val docC = "completely unrelated text about distributed query engines and shuffles"
    val docC2 = "completely unrelated text about distributed query engines and shuffled"
    val docE = "a third topic entirely: polite crawl scheduling with per host delays"
    val corpus = Seq((1L, docA), (2L, "some other indexed base document text"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_live_idx").toString
    Dedup.nearDupIndexFit(corpus, "doc_id", "text").save(dir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupStreamAgainstIndex(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", dir) { survivors =>
      seen.synchronized { seen ++= survivors.collect().map(_.getLong(0)) }
    }
    try {
      // batch 1: a near-dup of indexed A drops; novel C survives + appends
      mem.addData((10L, docA2), (11L, docC))
      q.processAllAvailable()
      // batch 2: a near-dup of batch-1 SURVIVOR C drops (the index grew);
      // novel E survives
      mem.addData((20L, docC2), (21L, docE))
      q.processAllAvailable()
    } finally q.stop()
    seen.sorted.toList shouldBe List(11L, 21L)
    // the sequential batch loop over a fresh index agrees doc for doc
    val dir2 = java.nio.file.Files.createTempDirectory("graft_live_idx2").toString
    Dedup.nearDupIndexFit(corpus, "doc_id", "text").save(dir2)
    val batches = Seq(
      Seq((10L, docA2), (11L, docC)), Seq((20L, docC2), (21L, docE)))
    val batchSurvivors = batches.flatMap { b =>
      val idx = Dedup.NearDupIndex.load(spark, dir2)
      val s = Dedup.nearDupIndexApply(
        b.toDF("doc_id", "text"), "doc_id", "text", idx)
      val kept = s.collect().map(_.getLong(0)).toList
      Dedup.appendToNearDupIndex(s, "doc_id", "text", dir2)
      kept
    }
    batchSurvivors.sorted shouldBe seen.sorted.toList
    // and the grown index now kills a re-send of every survivor
    val regrown = Dedup.NearDupIndex.load(spark, dir)
    Dedup.nearDupIndexApply(
      Seq((30L, docC), (31L, docE)).toDF("doc_id", "text"),
      "doc_id", "text", regrown).count() shouldBe 0L
  }

  test("reconcileNearDups repairs the stream to the batch-deterministic set") {
    // two TRUE near-duplicates share micro-batch 1 (the documented race:
    // they can split band wins and both drop), and the final heartbeat's
    // emit window never closes — both divergence modes repaired below
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val docA = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val docA2 = "the quick brown fox jumps over the lazy cat near the riverbank today"
    val docB = "completely unrelated text about distributed query engines and shuffles"
    mem.addData((1L, ts(0), docA), (2L, ts(0), docA2), (3L, ts(1), docB))
    val out = StreamingOps.dedupNearDups(
      mem.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "doc_id",
      tsCol = "ts", watermark = "5 minutes", emitWindow = "1 minute")
    val q = out.writeStream.format("memory")
      .queryName("stream_neardup_reconcile").outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData((99L, ts(59), "heartbeat to advance the watermark and flush"))
      q.processAllAvailable()
    } finally q.stop()
    val streamKept = spark.table("stream_neardup_reconcile")
    val streamed = streamKept.collect().map(_.getLong(0)).toSet
    val raw = Seq((1L, ts(0), docA), (2L, ts(0), docA2), (3L, ts(1), docB),
      (99L, ts(59), "heartbeat to advance the watermark and flush"))
      .toDF("doc_id", "ts", "text")
    val batchKept = StreamingOps.dedupNearDups(raw, "doc_id", "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    val delta = StreamingOps.reconcileNearDups(
      raw, streamKept, "doc_id", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // applying the delta to the streamed set reproduces the batch set
    val corrected = delta.foldLeft(streamed) {
      case (s, (id, "add")) => s + id
      case (s, (id, "remove")) => s - id
    }
    corrected shouldBe batchKept
    // the never-flushed heartbeat is always an 'add' — the delta is doing
    // real work even when the band race happens not to fire
    delta should contain(99L -> "add")
  }

  test("batch dedupNearDups drops a null-tie duplicate against a non-null min") {
    val docA = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val docB = "completely unrelated text about distributed query engines and shuffles"
    val rows = Seq(
      (1L, docA, Option(10L)),
      (2L, docA, None: Option[Long]), // null tie sorts LAST → dropped vs tie=10
      (3L, docB, None: Option[Long]), // all-null band keys: no winner, both kept
      (4L, docB, None: Option[Long]))
      .toDF("doc_id", "text", "tie")
    val kept = StreamingOps.dedupNearDups(rows, "doc_id", "text", "tie")
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 3L, 4L)
  }

  test("redactPii and chunkTokens compose onto a stream (narrow + generator)") {
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "contact me at alice@example.com " + (1 to 9).map(i => s"t$i").mkString(" ")),
      (2L, ""))
    val out = graft.ops.TextOps.chunkTokens(
      graft.ops.TextOps.redactPii(mem.toDF.toDF("doc_id", "text"), "text"),
      "text", chunkSize = 6, overlap = 2)
    val q = out.writeStream.format("memory")
      .queryName("stream_chunks").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("stream_chunks")
      .orderBy("doc_id", "chunk_id").collect()
    // doc 1: 13 tokens (redacted email is one token), stride 4 → 3 chunks;
    // doc 2 empty → none
    got.map(_.getLong(0)).toSeq shouldBe Seq(1L, 1L, 1L)
    got.head.getString(got.head.fieldIndex("chunk_text")) should
      startWith("contact me at <EMAIL>")
  }

  test("qualityMonitor streaming (append + watermark) matches the batch result") {
    val rows = Seq(
      (ts(0), "en", "plenty of good clean tokens right here"), // pass
      (ts(5), "en", "shrt txt"),                               // fail: < 5 tokens
      (ts(10), "de", "!!! ??? ***"),                           // fail: punct + tokens
      (ts(35), "en", "another window with enough words to pass easily"))
    val mem = MemoryStream[(Timestamp, String, String)]
    mem.addData(rows: _*)
    val stream = StreamingOps.qualityMonitor(
      mem.toDF.toDF("ts", "lang", "text"),
      "ts", "text", "30 minutes", keyCols = Seq("lang"),
      watermark = Some("10 minutes"))
    val q = stream.writeStream.format("memory")
      .queryName("qual_mon").outputMode("append").start()
    try { q.processAllAvailable(); mem.addData((ts(59), "en", "watermark push x y z w")); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("qual_mon")
      .select("lang", "n_docs", "total_tokens", "n_fail_quality")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // first 30m window closed under the watermark: en{pass+fail}, de{fail}
    got should contain(("en", 2L, 9L, 1L))
    got should contain(("de", 1L, 3L, 1L))
    // batch path over the same rows agrees on every closed window
    val batch = StreamingOps.qualityMonitor(
      rows.toDF("ts", "lang", "text"), "ts", "text", "30 minutes",
      keyCols = Seq("lang"))
      .select("lang", "n_docs", "total_tokens", "n_fail_quality")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    got.subsetOf(batch) shouldBe true
    // NULL text = extraction failure = a quality FAIL, never a silent pass
    val nulls = StreamingOps.qualityMonitor(
      Seq((ts(0), "en", null.asInstanceOf[String]), (ts(1), "en", "five good tokens right here"))
        .toDF("ts", "lang", "text"),
      "ts", "text", "30 minutes", keyCols = Seq("lang")).head()
    nulls.getAs[Long]("n_docs") shouldBe 2L
    nulls.getAs[Long]("n_fail_quality") shouldBe 1L
    // a keyCol named like an appended feature column is rejected loudly
    an[Exception] should be thrownBy StreamingOps.qualityMonitor(
      rows.toDF("ts", "n_tokens", "text"), "ts", "text", "30 minutes",
      keyCols = Seq("n_tokens"))
  }

  test("keyIndexApply filters a live stream against a static index, matching batch") {
    val corpus = Seq(Tuple1("u1"), Tuple1("u2")).toDF("k")
    val dir = java.nio.file.Files.createTempDirectory("graft_keyidx_s").toString
    graft.ops.Dedup.keyIndexFit(corpus, "k").save(dir)
    val idx = graft.ops.Dedup.KeyIndex.load(spark, dir)
    val rows = Seq((1L, "u1"), (2L, "u3"), (3L, "u2"), (4L, "u4"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    // stateless: narrow bloom leg + stream-static LEFT ANTI verify leg
    val out = graft.ops.Dedup.keyIndexApply(
      mem.toDF.toDF("id", "key"), "key", idx)
    val q = out.writeStream.format("memory")
      .queryName("stream_unseen").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_unseen").collect().map(_.getLong(0)).sorted.toSeq
    streamed shouldBe Seq(2L, 4L)
    // identical to the batch path over the same rows
    graft.ops.Dedup.keyIndexApply(rows.toDF("id", "key"), "key", idx)
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe streamed
  }
}
