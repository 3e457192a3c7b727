package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parallelism-invariance guards: on a real cluster the partition count is
  * whatever AQE / the data size dictates, so any operator whose OUTPUT
  * depends on partitioning or merge order is silently broken at scale.
  * Each test runs the same op under different shuffle-partition settings
  * and input partitionings and asserts bit-identical results. */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  /** Runs `body` under the given shuffle-partition count, restoring after. */
  private def withShufflePartitions[T](n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private lazy val docs = {
    val base = (1L to 300L).map { i =>
      val fam = i % 7
      (i, s"doc family $fam body " + (1 to (i % 11 + 3).toInt).map(j => s"w${(i + j) % 17}").mkString(" "))
    }
    base.toDF("doc_id", "text")
  }

  private lazy val embs = (1L to 200L).map { i =>
    (i, (0 until 8).map(j => ((i * 31 + j * 17) % 13).toFloat / 13.0f), (i % 5).toInt)
  }.toDF("vec_id", "embedding", "label")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("minhash dedup pairs are identical under 3 vs 17 shuffle partitions") {
    def run() = rows(graft.ops.Dedup.minhashDedupPairs(docs, "doc_id", "text", threshold = 0.5))
    val a = withShufflePartitions(3)(run())
    val b = withShufflePartitions(17)(run())
    a shouldBe b
    a should not be empty
  }

  test("dedupCorpus keeps the same representatives under repartitioned input") {
    def run(d: DataFrame) = rows(graft.ops.Dedup.dedupCorpus(d, "doc_id", "text"))
    val a = withShufflePartitions(5)(run(docs.repartition(3)))
    val b = withShufflePartitions(13)(run(docs.repartition(11, col("text"))))
    a shouldBe b
  }

  test("ivfCentroids and pcaFit are partitioning-independent") {
    val a = withShufflePartitions(3)(
      graft.ops.Similarity.ivfCentroids(embs.repartition(2), "embedding", 4))
    val b = withShufflePartitions(19)(
      graft.ops.Similarity.ivfCentroids(embs.repartition(9, col("vec_id")), "embedding", 4))
    a shouldBe b
    val pa = withShufflePartitions(3)(
      graft.ops.Similarity.pcaFit(embs.repartition(2), "embedding", 3))
    val pb = withShufflePartitions(19)(
      graft.ops.Similarity.pcaFit(embs.repartition(9, col("vec_id")), "embedding", 3))
    pa shouldBe pb
    // auto-sizing (nlist = 0) is COUNT-stable: the resolved nlist is pure
    // arithmetic on the corpus count, so the same corpus yields the same
    // model under any layout — and exactly the hand-passed √N model
    val aa = withShufflePartitions(3)(
      graft.ops.Similarity.ivfCentroids(embs.repartition(2), "embedding", 0))
    val ab = withShufflePartitions(19)(
      graft.ops.Similarity.ivfCentroids(embs.repartition(9, col("vec_id")), "embedding", 0))
    aa shouldBe ab
    // auto resolves to round(√200) = 14; this corpus has only 13 distinct
    // embeddings, so the init caps there — same as hand-passing 14
    aa.length shouldBe 13
    aa shouldBe graft.ops.Similarity.ivfCentroids(embs, "embedding", 14)
  }

  test("groupCentroids and packSequences are partitioning-independent") {
    def cents(d: DataFrame) =
      rows(graft.ops.Similarity.groupCentroids(d, "label", "embedding"))
    cents(embs.repartition(2)) shouldBe
      withShufflePartitions(17)(cents(embs.repartition(7, col("label"))))
    val toks = docs.select(col("doc_id"),
      graft.ops.TextOps.tokenCount(col("text")).as("n"))
    def pack(d: DataFrame) =
      rows(graft.ops.Sampling.packSequences(d, "doc_id", "n", capacity = 40, numBuckets = 4))
    withShufflePartitions(3)(pack(toks.repartition(2))) shouldBe
      withShufflePartitions(11)(pack(toks.repartition(6, col("doc_id"))))
  }

  test("removeRepeatedSpans output is identical under different partitionings") {
    def run(d: DataFrame) =
      rows(graft.ops.TextOps.removeRepeatedSpans(d, "doc_id", "text", n = 2, maxDocFreq = 3))
    withShufflePartitions(3)(run(docs.repartition(2))) shouldBe
      withShufflePartitions(13)(run(docs.repartition(9, col("doc_id"))))
  }

  test("balanceGroups and hashSample membership ignores physical layout") {
    val d = docs.withColumn("lang", (col("doc_id") % 3).cast("string"))
    def bal(x: DataFrame) = rows(graft.ops.Sampling.balanceGroups(x, "lang", "doc_id"))
    bal(d.repartition(1)) shouldBe bal(d.repartition(13, col("lang")))
    def samp(x: DataFrame) = rows(graft.ops.Sampling.hashSample(x, "doc_id", 37))
    samp(d.repartition(1)) shouldBe samp(d.repartition(8))
  }

  test("interleave order, leakage-safe split, and shard layout ignore physical layout") {
    val d = docs.withColumn("g", (col("doc_id") % 3).cast("string"))
    def ord(x: DataFrame) = rows(graft.ops.Sampling.interleaveSources(
      x, "g", "doc_id", Map("0" -> 3L, "1" -> 2L, "2" -> 1L), numBuckets = 4))
    withShufflePartitions(3)(ord(d.repartition(2))) shouldBe
      withShufflePartitions(11)(ord(d.repartition(7, col("g"))))
    def split(x: DataFrame) =
      rows(graft.ops.Sampling.leakageSafeSplit(x, "text", "doc_id", 70))
    withShufflePartitions(3)(split(d.repartition(2))) shouldBe
      withShufflePartitions(13)(split(d.repartition(9, col("text"))))
    def shards(x: DataFrame) =
      rows(graft.sources.Writer.shardAssignments(x, "doc_id", 8))
    withShufflePartitions(3)(shards(d.repartition(2))) shouldBe
      withShufflePartitions(11)(shards(d.repartition(6, col("doc_id"))))
    // the seeded epoch shuffle is equally layout-blind, seed 0 is exactly
    // the unseeded member, and a nonzero seed genuinely re-permutes
    def seeded(x: DataFrame, s: Long) =
      rows(graft.sources.Writer.shardAssignments(x, "doc_id", 8, seed = s))
    withShufflePartitions(3)(seeded(d.repartition(2), 7L)) shouldBe
      withShufflePartitions(11)(seeded(d.repartition(6, col("doc_id")), 7L))
    seeded(d, 0L) shouldBe shards(d)
    seeded(d, 7L) should not be shards(d)
    // structural re-permutation, not a shard RELABELING: an additive
    // (affine) seed fold would map each epoch-0 shard into <=2 seed-7
    // shards (only the mod-M wraparound splits it) and preserve
    // within-shard relative order. Assert the opposite on both axes.
    def layout(s: Long): Map[Long, (Long, Long)] =
      graft.sources.Writer.shardAssignments(d, "doc_id", 8, seed = s)
        .select("doc_id", "shard", "shard_pos").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val l0 = layout(0L); val l7 = layout(7L)
    val scatter = l0.groupBy { case (_, (sh, _)) => sh }
      .map { case (_, members) =>
        members.keys.map(id => l7(id)._1).toSet.size }
    all(scatter) should be >= 4    // every epoch-0 shard scatters widely
    // and within-shard ORDER re-permutes: among id pairs co-sharded in
    // both epochs, some pair's relative order flips across seeds
    val coPairs = for {
      (a, (sa0, pa0)) <- l0.toSeq; (b, (sb0, pb0)) <- l0.toSeq
      if a < b && sa0 == sb0 && l7(a)._1 == l7(b)._1
    } yield ((pa0 < pb0) != (l7(a)._2 < l7(b)._2))
    coPairs.count(identity) should be > 0
    coPairs.count(!_) should be > 0  // ...and some pair's order holds
  }

  test("curriculum shards, domain stats, and BPE fertility ignore physical layout") {
    val d = docs.withColumn("score", (col("doc_id") % 37).cast("double"))
      .withColumn("url",
        concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
          lit(".dom"), (col("doc_id") % 3).cast("string"), lit(".com/x")))
      .withColumn("tok", col("doc_id") % 11)
    // heavy score ties (37 values over 300 rows) stress the fine-bucket
    // boundaries: equal scores must land in one bucket on ANY layout
    def cur(x: DataFrame) = rows(graft.sources.Writer.shardByScoreQuantile(
      x.select("doc_id", "score"), "doc_id", "score", 8))
    withShufflePartitions(3)(cur(d.repartition(2))) shouldBe
      withShufflePartitions(11)(cur(d.repartition(7, col("doc_id"))))
    def dom(x: DataFrame) = rows(graft.ops.Url.domainStats(
      x.select("url", "tok"), "url", Some("tok")))
    withShufflePartitions(3)(dom(d.repartition(2))) shouldBe
      withShufflePartitions(11)(dom(d.repartition(5, col("url"))))
    val bpe = graft.ops.Bpe.BpeModel(Seq("w" -> "1", "d" -> "o", "do" -> "c"))
    def fert(x: DataFrame) = rows(graft.ops.Bpe.compressionStats(
      x.withColumn("g", (col("doc_id") % 3).cast("string")), "text", bpe, Seq("g")))
    withShufflePartitions(3)(fert(d.repartition(2))) shouldBe
      withShufflePartitions(11)(fert(d.repartition(6, col("doc_id"))))
  }

  test("DSIR and LM scores are bit-identical under any partitioning") {
    // the canonical ascending-value fold is the whole point: collect_list
    // order varies with partitioning, sort_array must erase that
    val target = docs.filter(col("doc_id") % 3 === 0)
    val dm = graft.ops.Dsir.dsirFit(target, docs, "text", vocabSize = 64)
    // the fit's vocab boundary (64 cuts into count ties) must break ties
    // by gram, not by partition arrival order
    val dm2 = withShufflePartitions(5)(graft.ops.Dsir.dsirFit(
      target.repartition(4), docs.repartition(7), "text", vocabSize = 64))
    rows(dm2.weights) shouldBe rows(dm.weights)
    def ds(x: DataFrame) = rows(graft.ops.Dsir
      .dsirScore(x, "doc_id", "text", dm).select("doc_id", "dsir_score"))
    withShufflePartitions(3)(ds(docs.repartition(2))) shouldBe
      withShufflePartitions(17)(ds(docs.repartition(9, col("doc_id"))))
    def dr(x: DataFrame) = rows(graft.ops.Dsir
      .dsirResample(x, "doc_id", "text", dm, n = 50).select("doc_id", "dsir_score"))
    withShufflePartitions(3)(dr(docs.repartition(2))) shouldBe
      withShufflePartitions(17)(dr(docs.repartition(9, col("doc_id"))))
    val lm = graft.ops.LangModel.lmFit(target, "text", vocabSize = 64, bigramSize = 128)
    def ls(x: DataFrame) = rows(graft.ops.LangModel
      .lmScore(x, "doc_id", "text", lm).select("doc_id", "lm_score"))
    withShufflePartitions(3)(ls(docs.repartition(2))) shouldBe
      withShufflePartitions(17)(ls(docs.repartition(9, col("doc_id"))))
  }

  test("round-6 fits and scores are partitioning-independent") {
    val target = docs.filter($"doc_id" % 3 === 0)
    val rest = docs.filter($"doc_id" % 3 =!= 0)
    // BPE fit: the pair-count argmax must break ties by pair, never by
    // partition arrival order
    val bm = withShufflePartitions(3)(
      graft.ops.Bpe.bpeFit(docs.repartition(2), "text", numMerges = 6))
    val bm2 = withShufflePartitions(17)(
      graft.ops.Bpe.bpeFit(docs.repartition(9, col("doc_id")), "text", numMerges = 6))
    bm2.merges shouldBe bm.merges
    // classifier fit (vocab-boundary ties) + score (fold order)
    val cm = withShufflePartitions(5)(graft.ops.Classifier.classifierFit(
      target.repartition(4), rest.repartition(7), "text", vocabSize = 64))
    val cm2 = withShufflePartitions(11)(graft.ops.Classifier.classifierFit(
      target.repartition(2), rest.repartition(3, col("doc_id")), "text", vocabSize = 64))
    cm2.bias shouldBe cm.bias
    rows(cm2.weights) shouldBe rows(cm.weights)
    def cs(x: DataFrame) = rows(graft.ops.Classifier
      .classifierScore(x, "doc_id", "text", cm).select("doc_id", "clf_score"))
    withShufflePartitions(3)(cs(docs.repartition(2))) shouldBe
      withShufflePartitions(17)(cs(docs.repartition(9, col("doc_id"))))
    // PQ fit + codes
    val pq = withShufflePartitions(3)(
      graft.ops.Similarity.pqFit(embs.repartition(2), "embedding", m = 4, k = 4))
    val pq2 = withShufflePartitions(19)(
      graft.ops.Similarity.pqFit(embs.repartition(9, col("vec_id")), "embedding", m = 4, k = 4))
    pq2 shouldBe pq
    def pc(x: DataFrame) = rows(
      graft.ops.Similarity.pqEncode(x, "vec_id", "embedding", pq))
    withShufflePartitions(3)(pc(embs.repartition(2))) shouldBe
      withShufflePartitions(17)(pc(embs.repartition(9, col("vec_id"))))
    // temperature mix: weight table AND membership
    def tm(x: DataFrame) = {
      val (mixed, w) = graft.ops.Sampling.mixGroupsTemperature(
        x, "label", "vec_id", alpha = 0.5)
      (rows(mixed), w)
    }
    val (ta, wa) = withShufflePartitions(3)(tm(embs.repartition(2)))
    val (tb, wb) = withShufflePartitions(17)(tm(embs.repartition(9, col("vec_id"))))
    wb shouldBe wa
    tb shouldBe ta
    // quantile cut: exact percentile is merge-order-independent
    def tf(x: DataFrame) = rows(
      graft.ops.Sampling.keepTopFraction(x.select($"vec_id", $"label".cast("double").as("s")), "s", 0.4))
    withShufflePartitions(3)(tf(embs.repartition(2))) shouldBe
      withShufflePartitions(17)(tf(embs.repartition(9, col("vec_id"))))
  }

  test("representative dedup, upsampling, prototypicality prune, drift PSI ignore layout") {
    // best-score representative: the cluster-rank window must order by
    // (score, id), never by arrival
    val scored = docs.withColumn("score", ($"doc_id" % 5).cast("double"))
    def db(x: DataFrame) = rows(
      graft.ops.Dedup.dedupCorpusBy(x, "doc_id", "text", "score", threshold = 0.5))
    withShufflePartitions(3)(db(scored.repartition(2))) shouldBe
      withShufflePartitions(17)(db(scored.repartition(9, col("text"))))
    // epoch replication: membership is id-hash math, narrow on any layout
    def up(x: DataFrame) = rows(graft.ops.Sampling.upsampleGroups(
      x.select($"vec_id", $"label"), "label", "vec_id",
      Map("0" -> 2.5, "1" -> 0.5)))
    withShufflePartitions(3)(up(embs.repartition(2))) shouldBe
      withShufflePartitions(17)(up(embs.repartition(9, col("vec_id"))))
    // per-cell prune: rank on (rounded proto, id) — merge-order-free
    val m = withShufflePartitions(3)(
      graft.ops.Similarity.ivfFit(embs.repartition(2), "embedding", 4))
    def pr(x: DataFrame) = rows(graft.ops.Similarity
      .pruneByPrototypicality(x, "vec_id", "embedding", m, 0.3))
    withShufflePartitions(3)(pr(embs.repartition(2))) shouldBe
      withShufflePartitions(17)(pr(embs.repartition(9, col("vec_id"))))
    // seen-key probe: set semantics on both bloom and fallback paths
    val idx = graft.ops.Dedup.keyIndexFit(
      docs.filter($"doc_id" % 3 === 0).withColumn("k", $"text"), "k")
    def ks(x: DataFrame) = rows(graft.ops.Dedup.keyIndexApply(
      x.withColumn("k", $"text"), "k", idx))
    withShufflePartitions(3)(ks(docs.filter($"doc_id" % 3 =!= 0).repartition(2))) shouldBe
      withShufflePartitions(17)(ks(docs.filter($"doc_id" % 3 =!= 0)
        .repartition(9, col("doc_id"))))
    // drift PSI: share division + ln must not depend on agg merge order
    def dp(r: DataFrame, c: DataFrame) = rows(
      graft.ops.Curation.categoryDriftPsi(r, c, "label"))
    withShufflePartitions(3)(
      dp(embs.repartition(2), embs.filter($"vec_id" % 2 === 0).repartition(3))) shouldBe
      withShufflePartitions(17)(
        dp(embs.repartition(9, col("vec_id")), embs.filter($"vec_id" % 2 === 0)))
  }

  test("frame pairs, diversity, corpus diff, drift stats ignore physical layout") {
    // frame-hash pairs: bucket membership and pair expansion are pure
    // functions of content; counts join back by key
    val payloads = docs.select($"doc_id", $"text".cast("binary").as("bin"))
    def fp(x: DataFrame) = rows(graft.ops.Multimodal.frameHashNearDupPairs(
      x, "doc_id", "bin", everyNBytes = 16, frameBytes = 8, minOverlap = 0.3))
    withShufflePartitions(3)(fp(payloads.repartition(2))) shouldBe
      withShufflePartitions(17)(fp(payloads.repartition(9, col("doc_id"))))
    // diversity: count + count-distinct aggregates are merge-order-free
    val grouped = docs.withColumn("g", ($"doc_id" % 3).cast("string"))
    def dv(x: DataFrame) = rows(graft.ops.TextOps.diversityStats(x, "g", "text", 2))
    withShufflePartitions(3)(dv(grouped.repartition(2))) shouldBe
      withShufflePartitions(17)(dv(grouped.repartition(9, col("text"))))
    // content diff: status is a pure function of the two digest tables
    val o = docs.withColumn("fp", md5($"text".cast("binary")))
    val c = docs.filter($"doc_id" % 4 =!= 0)
      .withColumn("text", concat($"text", when($"doc_id" % 4 === 1, " v2").otherwise("")))
      .withColumn("fp", md5($"text".cast("binary")))
    def cd(x: DataFrame, y: DataFrame) = rows(
      graft.ops.Curation.corpusDiff(x, y, "doc_id", "fp"))
    withShufflePartitions(3)(cd(o.repartition(2), c.repartition(3))) shouldBe
      withShufflePartitions(17)(cd(o.repartition(9, col("doc_id")), c))
    // embedding drift: vec-sum partials merge order-free into rounded means
    def ed(x: DataFrame) = rows(graft.ops.Similarity.embeddingDriftStats(
      x.filter($"vec_id" % 2 === 0), x.filter($"vec_id" % 2 =!= 0), "embedding"))
    withShufflePartitions(3)(ed(embs.repartition(2))) shouldBe
      withShufflePartitions(17)(ed(embs.repartition(9, col("vec_id"))))
  }

  test("BM25, RRF fusion, hash embedding, per-group cap ignore physical layout") {
    // grid-sum rule: per-term 9-decimal rounding makes the per-doc sum
    // independent of aggregation order, so scores AND ranks must agree
    val q = docs.filter($"doc_id" < 3)
    def bm(x: DataFrame) = rows(graft.ops.Retrieval.bm25TopK(
      x, "doc_id", "text", q, "doc_id", "text", k = 10))
    withShufflePartitions(3)(bm(docs.repartition(2))) shouldBe
      withShufflePartitions(17)(bm(docs.repartition(9, col("text"))))
    // fusion ranks on (rounded score, id) in both inputs
    val a = graft.ops.Retrieval.bm25TopK(docs, "doc_id", "text", q, "doc_id", "text", 10)
    val b = graft.ops.Similarity.cosineTopKBatch(
      embs, "vec_id", "embedding", embs.filter($"vec_id" < 3), "vec_id", "embedding", 10)
    def rf(x: DataFrame) = rows(graft.ops.Retrieval.rrfFuse(
      x, b, "query_id", "id", "bm25", "cos", k = 10))
    withShufflePartitions(3)(rf(a.repartition(2))) shouldBe
      withShufflePartitions(17)(rf(a.repartition(4, col("id"))))
    // hash embedding is per-row math; the vocab dump is a distinct
    def he(x: DataFrame) = rows(graft.ops.Retrieval.hashEmbed(x, "text", dim = 8)
      .select($"doc_id", $"text_hash"(0), $"text_hash_norm"))
    withShufflePartitions(3)(he(docs.repartition(2))) shouldBe
      withShufflePartitions(17)(he(docs.repartition(9, col("doc_id"))))
    // per-group token budget: integer hash order + driver prefix offsets,
    // merge-order-free on any layout
    val toked = docs.withColumn("g", ($"doc_id" % 2).cast("string"))
      .withColumn("n_tok", (($"doc_id" % 7) + 1).cast("int"))
    def tb(x: DataFrame) = rows(graft.ops.Sampling.sampleTokenBudgetPerGroup(
      x, "g", "doc_id", "n_tok", Map("0" -> 120L, "1" -> 60L), numBuckets = 4))
    withShufflePartitions(3)(tb(toked.repartition(2))) shouldBe
      withShufflePartitions(17)(tb(toked.repartition(9, col("doc_id"))))
    // per-group cap ranks on (score, id), never arrival order — the %4
    // score forces ties inside every %3 group
    val scored = docs
      .withColumn("g", ($"doc_id" % 3).cast("string"))
      .withColumn("score", ($"doc_id" % 4).cast("double"))
    def cp(x: DataFrame) = rows(
      graft.ops.Sampling.capPerGroup(x, "g", "doc_id", "score", perGroup = 2))
    withShufflePartitions(3)(cp(scored.repartition(2))) shouldBe
      withShufflePartitions(17)(cp(scored.repartition(9, col("doc_id"))))
  }
}
