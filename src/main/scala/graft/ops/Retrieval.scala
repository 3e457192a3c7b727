package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical and hybrid retrieval over document tables (extension beyond the
  * reference surface, SURVEY §2.12) — the sparse leg of the retrieval stack
  * whose dense leg lives in [[Similarity]] (brute/IVF/PQ cosine search).
  *
  * BM25 here is the Lucene flavor: idf = ln(1 + (N − df + ½)/(df + ½))
  * (always positive), tf saturation tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)),
  * duplicate query terms counted once. Scores are rounded to 9 decimals
  * BEFORE ranking (the [[TextOps.tfidfTopTerms]] rule) so libm ulp
  * differences in ln cannot flip near-ties across engines; exact ties break
  * by doc id.
  */
object Retrieval {

  /** BM25 top-k lexical retrieval: every query in `queries` retrieves its k
    * best-matching docs in one pass over the corpus.
    *
    * Scale shape (the part that matters at 100 TB): the exploded corpus
    * postings are semi-joined against the BROADCAST distinct query-term
    * list FIRST, so every downstream shuffle — the (query, doc, term) tf
    * aggregate, the per-term document-frequency aggregate, the per-(query,
    * doc) score sum — moves only rows whose term actually occurs in some
    * query. A 100-TB corpus with a 200-term query batch shuffles the
    * postings of 200 terms, not the corpus. Per-doc length and the corpus
    * (N, avgdl) constants come from one separate narrow aggregate over the
    * scan. The final per-query top-k is a rank window on query id that
    * WindowGroupLimit prunes to k rows per partition map-side.
    *
    * Output: (query_id, id, bm25), ≤ k rows per query.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      qIdCol: String,
      qTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    require(k1 >= 0.0, "k1 must be >= 0")
    require(b >= 0.0 && b <= 1.0, "b must be in [0, 1]")
    graft.core.Validators.requireColumns(docs, Seq(idCol, textCol))
    graft.core.Validators.requireColumns(queries, Seq(qIdCol, qTextCol))

    // corpus constants: one narrow aggregate (NULL text ⇒ dl 0, in N)
    val dlExpr = coalesce(TextOps.tokenCount(lower(col(textCol))).cast("long"), lit(0L))
    val stats = docs.agg(
      count(lit(1)).as("n"), avg(dlExpr).as("avgdl")).head()
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getDouble(1)
    if (n == 0.0) {
      return docs.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("id"), lit(0.0).as("bm25"))
        .limit(0)
    }

    // distinct (query, term): duplicate terms in one query count once
    val qTerms = queries
      .select(col(qIdCol).as("query_id"),
        explode(TextOps.tokens(lower(col(qTextCol)))).as("term"))
      .distinct()

    // postings, pruned to the query vocabulary BEFORE any wide operator
    val postings = docs
      .select(col(idCol).as("id"), dlExpr.as("dl"),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .join(broadcast(qTerms.select("term").distinct()), Seq("term"), "left_semi")

    // document frequency per surviving term (docs containing it ≥ once)
    val dfreq = postings.select("id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))

    // tf per (query, doc, term) — the query id rides in via the broadcast
    val tf = postings
      .join(broadcast(qTerms), Seq("term"))
      .groupBy("query_id", "id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))

    // Per-term scores are rounded to 9 decimals BEFORE the per-doc sum, and
    // the sum again after: rounded terms are (up to one ulp) multiples of
    // 1e-9, so their sum in ANY order re-rounds to the same grid point —
    // aggregation order (partitioning, engine) cannot perturb the score.
    tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("__s", round(idf * sat, 9))
      .groupBy("query_id", "id")
      .agg(round(sum(col("__s")), 9).as("bm25"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("bm25").desc, col("id").asc)))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Reciprocal-rank fusion of two per-query rankings (hybrid retrieval's
    * standard combiner): each input is re-ranked per query by
    * (score DESC, id ASC), a doc's fused score is Σ 1/(c + rank) over the
    * lists it appears in, and the k best fused docs survive per query.
    * RRF is rank-only — the two score columns never need to be on the same
    * scale, which is exactly why it is the default for BM25 ⊕ cosine.
    *
    * Fused scores are rounded to 9 decimals before the final rank (the
    * engine-portability rule); fused ties break by id. Inputs are already
    * top-k rankings (≤ k·|queries| rows), so every shuffle here is
    * queries-sized, not corpus-sized — trivially safe at any corpus scale.
    *
    * Output: (query_id, id, rrf), ≤ k rows per query.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      queryCol: String,
      idCol: String,
      scoreColA: String,
      scoreColB: String,
      k: Int,
      c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    require(c >= 0, "c must be >= 0")
    graft.core.Validators.requireColumns(a, Seq(queryCol, idCol, scoreColA))
    graft.core.Validators.requireColumns(b, Seq(queryCol, idCol, scoreColB))
    // each reciprocal is 9-decimal-rounded before the two-term sum (the
    // bm25TopK grid-sum rule), so the fused score replays bit-for-bit
    def ranked(df: DataFrame, scoreCol: String, out: String): DataFrame =
      df.select(col(queryCol).as("query_id"), col(idCol).as("id"),
        col(scoreCol).as("__s"))
        .withColumn(out,
          round(lit(1.0) / (lit(c.toDouble) + row_number().over(
            Window.partitionBy("query_id").orderBy(col("__s").desc, col("id").asc))), 9))
        .drop("__s")
    ranked(a, scoreColA, "__ra")
      .join(ranked(b, scoreColB, "__rb"), Seq("query_id", "id"), "full_outer")
      .withColumn("rrf",
        round(coalesce(col("__ra"), lit(0.0)) + coalesce(col("__rb"), lit(0.0)), 9))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("id").asc)))
      .filter(col("__rn") <= k)
      .select("query_id", "id", "rrf")
  }

  /** Feature-hashed signed bag-of-words embedding (Weinberger et al.'s
    * hashing trick): token t adds sign(t) ∈ {−1, +1} to component
    * bucket(t) = xxhash64(seed, t) mod dim, sign from an independent
    * xxhash64(seed+1, t) bit; the count vector is then L2-normalized. The
    * bridge from a raw text corpus into the dense retrieval stack
    * ([[Similarity.cosineTopKBatch]], IVF, PQ) when no trained embeddings
    * exist yet.
    *
    * Pure NARROW per-row compute — the token array maps to (bucket, sign)
    * structs, folds into a dim-sized accumulator, and normalizes, all
    * inside one projection: no explode, no shuffle, nothing corpus-wide.
    * O(tokens · dim) work per row, the right trade against a corpus-wide
    * explode + groupBy shuffle for the small dims (16–256) this targets.
    * All-zero rows (empty/NULL text, or signs cancelling) yield the zero
    * vector unchanged — NOT NaN — and carry hash_norm = 0 so callers can
    * filter them before cosine search (which drops zero-norm rows anyway).
    *
    * Appends `<textCol>_hash` (array<double>, unit L2 norm or all-zero)
    * and `<textCol>_hash_norm` (the pre-normalization L2 norm).
    */
  def hashEmbed(
      df: DataFrame,
      textCol: String,
      dim: Int,
      seed: Long = 42L): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(textCol))
    val toks = TextOps.tokens(lower(col(textCol)))
    val bs = transform(toks, t => struct(
      hashBucket(t, dim, seed).as("b"),
      hashSign(t, seed).as("s")))
    val accum = aggregate(
      bs,
      array_repeat(lit(0.0), dim),
      (acc, x) => transform(acc,
        (v, i) => v + when(i === x("b"), x("s")).otherwise(lit(0.0))))
    val raw = coalesce(accum, array_repeat(lit(0.0), dim))
    val nrm = sqrt(Similarity.dot(raw, raw))
    df.withColumn("__graft_raw", raw)
      .withColumn(s"${textCol}_hash_norm", nrm)
      .withColumn(s"${textCol}_hash",
        when(nrm > 0.0,
          transform(col("__graft_raw"), v => v / nrm))
          .otherwise(col("__graft_raw")))
      .drop("__graft_raw")
  }

  /** The bucket half of the hashing trick: xxhash64(seed, t) mod dim. */
  private[ops] def hashBucket(t: Column, dim: Int, seed: Long): Column =
    pmod(xxhash64(lit(seed), t), lit(dim.toLong)).cast("int")

  /** The sign half: an independent hash bit, ±1.0. */
  private[ops] def hashSign(t: Column, seed: Long): Column =
    when(pmod(xxhash64(lit(seed + 1L), t), lit(2L)) === 0L, lit(1.0))
      .otherwise(lit(-1.0))

  /** The (term → bucket, sign) table for a corpus's distinct terms — the
    * aux dump that lets an external engine replay [[hashEmbed]] exactly
    * (the xxhash64 chain itself has no SQL equivalent; the bag-of-words
    * fold, normalization, and everything downstream does). One distinct
    * over the exploded tokens: vocabulary-sized, not corpus-sized. */
  def hashVocab(
      df: DataFrame,
      textCol: String,
      dim: Int,
      seed: Long = 42L): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    graft.core.Validators.requireColumns(df, Seq(textCol))
    df.select(explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .distinct()
      .select(col("term"),
        hashBucket(col("term"), dim, seed).as("bucket"),
        hashSign(col("term"), seed).as("sign"))
  }
}
