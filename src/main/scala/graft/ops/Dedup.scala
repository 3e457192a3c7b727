package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Extension beyond the reference surface (SURVEY §2.11): the reference has
  * no dedup of any kind. Everything here is built from Catalyst expressions
  * (higher-order array functions + xxhash64) — no UDFs, so the hot path
  * stays inside whole-stage codegen, and no driver-side state, so each
  * operator is a fixed number of shuffles regardless of data size.
  */
object Dedup {

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

  /** MinHash signature: `numHashes` independent hash functions, each the
    * minimum of `xxhash64(shingle # seed)` over the shingle set. One
    * projection, no shuffle. */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      h =>
        array_min(
          transform(
            shingles(text, shingleSize),
            s => xxhash64(concat(s, lit("#"), h.cast("string"))))))

  /** MinHash + LSH banding near-duplicate candidate pairs.
    *
    * Plan shape (the standard scale-out LSH join):
    *   1. one projection computes the signature per row;
    *   2. explode to `bands` rows, hash each signature band → (band, bandHash);
    *   3. self-join on (band, bandHash) — a hash shuffle on the band hash,
    *      which is uniformly distributed, so no skew;
    *   4. estimated Jaccard = fraction of matching signature positions,
    *      filter ≥ `threshold`.
    *
    * Output: (idA, idB, estJaccard) with idA < idB, one row per pair.
    * `numHashes` must be divisible by `bands`.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 5,
      threshold: Double = 0.8,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sig = df.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
    val banded = sig.select(
      col("id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn(
        "band_hash",
        xxhash64(col("band"), slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select("id", "sig", "band", "band_hash")
    val a = banded.alias("a")
    val b = banded.alias("b")
    val matches = col("a.band") === col("b.band") &&
      col("a.band_hash") === col("b.band_hash") && col("a.id") < col("b.id")
    a.join(b, matches)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b") // sigs are functionally determined by id
      .withColumn(
        "est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
          lit(0),
          (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Production near-dup pattern: MinHash-LSH candidate generation followed
    * by EXACT n-gram Jaccard verification of only the candidate pairs.
    * The prefilter bounds the pair space (no O(n²)); the verify step removes
    * LSH estimation error, so the output is exactly "pairs with true Jaccard
    * ≥ threshold" as long as the prefilter recalls them (with bands=32,
    * rows-per-band=2, a true-0.8 pair is missed with p ≈ 6e-15).
    */
  def minhashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      estThreshold: Double = 0.5,
      threshold: Double = 0.8,
  ): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, n, estThreshold)
      .select("id_a", "id_b")
    val sets = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("gs"))
    val a = sets.alias("sa")
    val b = sets.alias("sb")
    cands
      .join(a, cands("id_a") === col("sa.id"))
      .join(b, cands("id_b") === col("sb.id"))
      .withColumn("common", size(array_intersect(col("sa.gs"), col("sb.gs"))))
      .withColumn(
        "jaccard",
        col("common").cast("double") /
          (size(col("sa.gs")) + size(col("sb.gs")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per bit, tokens vote +1/−1 by
    * their xxhash64 bit; the sign of the vote becomes the bit. One
    * projection (64 array folds), no shuffle. */
  def simhash(text: Column): Column = {
    val hashes = transform(
      filter(split(lower(text), "\\s+"), t => t =!= ""),
      t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(
        hashes,
        lit(0),
        (acc, h) =>
          acc + when(shiftrightunsigned(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-duplicate pairs with Hamming distance ≤ `maxHamming`.
    *
    * Candidate generation: split the 64-bit simhash into 4 16-bit chunks and
    * self-join on chunk equality — any pair with Hamming distance ≤ 3 shares
    * at least one chunk (pigeonhole); for larger `maxHamming` this is a
    * recall-bounded approximation, which is the standard scale trade-off.
    * Verification: exact `bit_count(xor)` on the candidate pairs.
    */
  def simhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
  ): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val withVal = sh.select(
      col("id"), col("sh"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("chunk"),
          shiftrightunsigned(col("sh"), 16 * i).bitwiseAND(lit(0xFFFFL)).as("chunk_val"))
      }: _*)).as("c"))
      .select(col("id"), col("sh"), col("c.chunk").as("chunk"), col("c.chunk_val").as("chunk_val"))
    val a = withVal.alias("a")
    val b = withVal.alias("b")
    a.join(b,
      col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity pairs (similarity ≥ `threshold`).
    *
    * Plan: explode distinct shingles → self-join on the shingle (hash
    * shuffle keyed by shingle) → per-pair common count → Jaccard from the
    * per-doc set sizes. At 100 TB the shingle join is the standard inverted-
    * index approach; ultra-common shingles create skew, so `maxShingleFreq`
    * drops shingles occurring in more than that many documents (a stop-gram
    * cap — they carry no discriminative signal and only inflate the join).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleFreq: Long = 1000000L,
  ): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"), shingles(col(textCol), n).as("gs"))
      .withColumn("sz", size(col("gs")))
    val exploded = sh.select(col("id"), col("sz"), explode(col("gs")).as("g"))
    val filtered = exploded
      .withColumn("gfreq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("gfreq") <= maxShingleFreq)
      .drop("gfreq")
    val a = filtered.alias("a")
    val b = filtered.alias("b")
    a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn(
        "jaccard",
        col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
