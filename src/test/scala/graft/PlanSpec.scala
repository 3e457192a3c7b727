package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.transformers._

/** Physical-plan regression guards: the plan-shape properties the library
  * is designed around, asserted on explain output so a regression fails
  * sbt test instead of only showing up in a benchmark. */
class PlanSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out))(df.explain("formatted"))
    out.toString
  }

  test("a stateless multi-step pipeline collapses to one scan, no exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val pipe = Pipeline(
      "imp" -> new ArbitraryNumberImputer(Seq("l_quantity"), 0.0),
      "log" -> new LogCpTransformer(Seq("l_extendedprice"), 1.0),
      "cap" -> new ArbitraryOutlierCapper(Map("l_tax" -> (Some(0.01), Some(0.07)))),
      "cyc" -> new CyclicalFeatures(Seq(("q_sin", "l_quantity", 50.0, CyclicalFn.Sin))),
      "ind" -> new AddMissingIndicator(Seq("l_discount")))
    val out = pipe.fit(li)
    val exec = out.queryExecution.sparkPlan
    val scans = exec.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans should have size 1 // the stacked per-step projections fused into one pass
    val exchanges = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges shouldBe empty
    formatted(out) should include("[codegen id : 1]") // whole-stage codegen'd
  }

  test("trimming filters push down to the parquet scan") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val t = new OutlierTrimmer(Seq("l_quantity"), 0.05, 0.95, exact = true)
    val plan = formatted(t.fitTransform(li))
    plan should include("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_quantity,")
  }

  test("column pruning reaches the scan (ReadSchema carries only used columns)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = formatted(
      li.select(col("l_orderkey"), col("l_quantity"))
        .filter(col("l_quantity") > 10))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    readSchema should include("l_orderkey")
    readSchema should include("l_quantity")
    readSchema should not include "l_extendedprice"
  }

  test("large-nlist cell assignment is a broadcast join, not a giant literal") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = (0 until 256).map(i => (0 until 64).map(j => (i * 64 + j).toDouble))
    // forced broadcast path: centroid table join, never a nested-loop
    val out = graft.ops.Similarity.assignCells(e, "vec_id", "embedding", cents,
      forceBroadcast = true)
    val plan = formatted(out)
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // with the native argmin kernel installed, 256 × 64 defaults to ONE
    // narrow projection — no join, no shuffle at all
    val lit = formatted(
      graft.ops.Similarity.assignCells(e, "vec_id", "embedding", cents))
    lit should not include "Join"
    lit should not include "Exchange"
  }

  test("high-cardinality encode uses a broadcast hash join") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey"), concat(col("p_brand"), lit("_"), col("p_name")).as("bn"))
    val enc = new CountFrequencyEncoder(Seq("bn"))
    val plan = formatted(enc.fitTransform(part))
    plan should include("BroadcastHashJoin")
  }

  test("asofJoin plans as one key shuffle + window, filters pushed to both scans") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("event_id")) // any orderable column works
    val out = graft.ops.Relational.asofJoin(
      e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value"),
      e.filter(col("event_type") === "view").select("user_id", "ts", "value"),
      Seq("user_id"), "ts", Seq("value"), "_view")
    val plan = formatted(out)
    // the window's hash partition is the ONLY exchange — no range join
    "\\(\\d+\\) Exchange".r.findAllIn(plan).size shouldBe 1
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    plan should include("EqualTo(event_type,purchase)")
    plan should include("EqualTo(event_type,view)")
  }

  test("topKPerGroup prunes map-side before the shuffle (WindowGroupLimit)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val out = graft.ops.Relational.topKPerGroup(
      docs, Seq("lang"), Seq(col("n_chars").desc, col("doc_id").asc), 5)
    // partial + final WindowGroupLimit (one below the exchange) = each task
    // keeps only its local top-k before shuffling — the property that makes
    // grouped top-k scale
    val limits = out.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    limits should have size 2
  }

  test("cosineTopKBatch: broadcast fan-out, map-side top-k pruning, one shuffle") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.ops.Similarity.cosineTopKBatch(
      e, "vec_id", "embedding", e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
    val plan = formatted(out)
    // the cross product is INTENTIONAL (scoring = corpus × query batch) and
    // must ride a broadcast, never a shuffled cartesian
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
    // each task keeps only its local top-k per query before the one shuffle
    val limits = out.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    limits should have size 2
    "\\(\\d+\\) Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("ivfTopKBatch: broadcast CELL equi-join (no fan-out), map-side top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = graft.ops.Similarity.ivfFit(e, "embedding", nlist = 4)
    val out = graft.ops.Similarity.ivfTopKBatch(
      e, "vec_id", "embedding", e.filter(col("vec_id") < 3), "vec_id", "embedding",
      m, k = 5, nprobe = 2)
    val plan = formatted(out)
    // unlike cosineTopKBatch's intentional all-pairs fan-out, the candidate
    // join must HASH on the cell key: a corpus row meets only the queries
    // probing its cell
    plan should include("BroadcastHashJoin")
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // each task keeps only its local top-k per query before the shuffle
    val limits = out.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    limits should have size 2
  }

  test("hashSample is a pure narrow filter — no shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.ops.Sampling.hashSample(docs, "doc_id", 20)
    formatted(out) should not include "Exchange"
  }

  test("hashSampleAtMost: lazy single-row broadcast fan-in, documented shape") {
    // The lazy size check is a BroadcastNestedLoopJoin whose BUILD side
    // is exactly one row (the count(*) aggregate) — cost-identical to a
    // broadcast hash join; there is no key to hash on, and a constant
    // join key gets constant-folded away by Catalyst, degrading right
    // back to BNLJ (tried in round 13). This pin asserts (a) the shape —
    // the only BNLJ source besides cosineTopKBatch — and (b) LAZINESS:
    // building the frame runs zero Spark jobs (round 12's eager count()
    // made plan construction an action).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val out = graft.ops.Sampling.hashSampleAtMost(docs, "doc_id", 40L)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    after shouldBe before // no job ran at construction time
    val plan = formatted(out)
    plan should include("BroadcastNestedLoopJoin")
    // the build side is the single-row HashAggregate, nothing wider
    plan should include("HashAggregate")
  }

  test("balanceGroups transform is a pure narrow filter — no shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.ops.Sampling.balanceGroups(docs, "lang", "doc_id")
    // the fit collected counts; the returned TRANSFORM must not shuffle
    formatted(out) should not include "Exchange"
  }

  test("packSequences shuffles once, on the pack bucket") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), graft.ops.TextOps.tokenCount(col("text")).as("n_tokens"))
    val out = graft.ops.Sampling.packSequences(docs, "doc_id", "n_tokens",
      capacity = 512, numBuckets = 8)
    val plan = formatted(out)
    "\\(\\d+\\) Exchange".r.findAllIn(plan).size shouldBe 1
    plan should include("hashpartitioning(bucket")
  }

  test("rangeJoin buckets the inequality into a shuffled equi-join on (key, bucket)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("t", col("event_id"))
    val ivs = e.groupBy("event_type")
      .agg(min(col("t")).as("s"), (min(col("t")) + 1000L).as("w_end"))
    val out = graft.ops.Relational.rangeJoin(
      e.select("event_id", "t", "event_type"), ivs, "t", "s", "w_end",
      Seq("event_type"), bucketWidth = 100L)
    val plan = formatted(out)
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    plan should include("__graft_bkt") // the bucket key reaches the join
  }

  test("chunkTokens and redactPii are narrow — no shuffle at any corpus size") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    formatted(graft.ops.TextOps.chunkTokens(docs, "text", 40, 8)) should
      not include "Exchange"
    formatted(graft.ops.TextOps.redactPii(docs, "text")) should
      not include "Exchange"
  }

  test("ngramOverlapContamination: bloom prefilters the corpus side before the verify join") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.ops.Dedup.ngramOverlapContamination(
      d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", n = 4)
    val plan = formatted(out)
    // the bloom bytes are a single plan literal (shipped once per stage),
    // so the membership probe is a NARROW filter on the corpus n-grams —
    // no join of any kind carries the binary
    plan should include("graft_bloom_contains")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("dsirScore joins the weight table by broadcast, never a shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = graft.ops.Dsir.dsirFit(
      d.filter(col("lang") === "en"), d, "text", vocabSize = 1024)
    val plan = formatted(graft.ops.Dsir.dsirScore(d, "doc_id", "text", m))
    // the bounded vocab is always the build side: a gram-keyed shuffle of
    // the exploded corpus would dwarf the query at scale (the id-keyed
    // score join-back may legitimately sort-merge — ids are unbounded)
    plan should include("BroadcastHashJoin")
    plan should not include "hashpartitioning(gram"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("dsirResample semi-joins the small selected-id head by broadcast") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = graft.ops.Dsir.dsirFit(
      d.filter(col("lang") === "en"), d, "text", vocabSize = 1024)
    val plan = formatted(graft.ops.Dsir.dsirResample(d, "doc_id", "text", m, n = 10))
    // no hint in the op (n is unbounded — a forced broadcast would be a
    // driver cliff at millions); Catalyst's limit statistics must still
    // pick broadcast for a small head
    plan should include("LeftSemi")
    plan should not include "SortMergeJoin LeftSemi"
    plan should not include "ShuffledHashJoin LeftSemi"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("lmScore joins all three model tables by broadcast, never a token shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = graft.ops.LangModel.lmFit(
      d.filter(col("lang") === "en"), "text", vocabSize = 1024, bigramSize = 2048)
    val plan = formatted(graft.ops.LangModel.lmScore(d, "doc_id", "text", m))
    plan should include("BroadcastHashJoin")
    plan should not include "hashpartitioning(pa"
    plan should not include "hashpartitioning(pb"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("classifierScore joins the weight table by broadcast, never a gram shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = graft.ops.Classifier.classifierFit(
      d.filter(col("lang") === "en"), d.filter(col("lang") =!= "en"),
      "text", vocabSize = 1024)
    val plan = formatted(graft.ops.Classifier.classifierScore(d, "doc_id", "text", m))
    // same contract as dsirScore: the bounded weight table is always the
    // build side; only the id-keyed aggregate/join-back may shuffle
    plan should include("BroadcastHashJoin")
    plan should not include "hashpartitioning(gram"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("registeredDomainPsl is broadcast rule joins only — zero shuffles") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("h", concat(lit("www."), col("source"), lit(".co.uk")))
    val plan = formatted(graft.ops.Url.registeredDomainPsl(d, "h"))
    // every rule bucket is a broadcast build side over a narrow suffix
    // expression; the corpus never shuffles and nothing explodes
    plan should include("BroadcastHashJoin")
    plan should not include "Exchange hashpartitioning"
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("langIdScore joins the weight table by broadcast; argmax reuses the fold's doc key") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = graft.ops.LangId.langIdFit(d, "text", "lang", vocabSize = 256)
    val plan = formatted(graft.ops.LangId.langIdScore(d, "doc_id", "text", m))
    // the (vocab × langs)-sized weight table is always the build side; the
    // corpus gram stream must never shuffle on the gram
    plan should include("BroadcastHashJoin")
    plan should not include "hashpartitioning(gram"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("domainFilter is one broadcast anti join; urlFeatures is narrow") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("url", concat(lit("https://"), col("source"), lit(".example.com/a")))
    val featPlan = formatted(graft.ops.Url.urlFeatures(d, "url"))
    featPlan should not include "Exchange" // per-row extraction, no shuffle
    val filtPlan = formatted(
      graft.ops.Url.domainFilter(d, "url", Seq("src0.example.com")))
    // the dictionary-sized blocklist must be the build side of a broadcast
    // LEFT ANTI hash join — a domain-keyed shuffle of the corpus would
    // dominate the stage at scale
    filtPlan should include("BroadcastHashJoin LeftAnti")
    filtPlan should not include "SortMergeJoin"
    filtPlan should not include "CartesianProduct"
    filtPlan should not include "BroadcastNestedLoopJoin"
  }

  test("bpe tokenization is narrow — no shuffle, native kernel in the plan") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = graft.ops.Bpe.BpeModel(Seq("t" -> "h", "th" -> "e"))
    val plan = formatted(graft.ops.Bpe.tokenizeBpe(d, "text", m))
    plan should include("graft_bpe_encode")
    plan should not include "Exchange"
  }

  test("bm25TopK prunes postings against the broadcast query vocabulary before any shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = formatted(graft.ops.Retrieval.bm25TopK(
      d, "doc_id", "text", d.filter(col("doc_id") < 3), "doc_id", "text", k = 10))
    // the semi prune and the query-term attach are both broadcast builds:
    // the corpus postings must never shuffle on raw term before pruning
    plan should include("BroadcastHashJoin LeftSemi")
    plan should include("BroadcastHashJoin Inner")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("hashEmbed is a pure narrow per-row fold — no shuffle at any corpus size") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = formatted(graft.ops.Retrieval.hashEmbed(d, "text", dim = 16))
    plan should not include "Exchange"
  }

  test("bm25SearchIndex pushes the query vocabulary into the postings scan") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("bm25_plan_idx").toString
    graft.ops.Retrieval.bm25Fit(d, "doc_id", "text").save(dir)
    val idx = graft.ops.Retrieval.Bm25Index.load(spark, dir)
    val plan = formatted(graft.ops.Retrieval.bm25SearchIndex(
      idx, d.filter(col("doc_id") < 3), "doc_id", "text", k = 10))
    // small query batch → IN literal reaches the parquet reader as a
    // pushed filter, so a term-sorted index skips non-matching row groups
    plan should include("PushedFilters: [In(term")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("bm25Rerank broadcasts the shortlist — corpus embeddings never shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = formatted(graft.ops.Retrieval.bm25Rerank(
      d, "doc_id", "text", d.filter(col("doc_id") < 3), "doc_id", "text",
      e, "vec_id", "embedding",
      e.filter(col("vec_id") < 3), "vec_id", "embedding", kLex = 20, k = 5))
    // both rerank joins build on the bounded side
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
