package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Extension beyond the reference surface (SURVEY §2.11). Dot products and
  * norms are higher-order-function folds in double precision — codegen'd
  * expressions, no UDFs. Brute force is the exact baseline (a single
  * narrow projection + TakeOrderedAndProject — no shuffle for top-k);
  * random-hyperplane LSH is the scale path (bucket prune, then brute force
  * within buckets).
  */
object Similarity {

  /** Sequential left fold Σ aᵢ·bᵢ in double precision. The fold order is the
    * array order, so results are bit-deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** cos(a, b) = dot/(√(a·a)·√(b·b)); NaN when either norm is zero. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact brute-force cosine top-k against a broadcast-literal query vector.
    *
    * Plan: one projection over the scan computes the score, then
    * `TakeOrderedAndProject` keeps k rows per partition and merges on the
    * driver — no shuffle, no full sort, embarrassingly parallel at 100 TB.
    * Ties break by id for determinism.
    */
  def cosineTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      query: Seq[Double],
      k: Int,
  ): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol).as("id"), cosine(col(embCol), q).as("cos"))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): derived
    * from a hash of (seed, plane, dim) — reproducible everywhere, no RNG
    * state to ship. */
  private def planeComponent(seed: Long, plane: Int, dim: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.stringHash(s"$seed:$plane:$dim")
    (h.toDouble / Int.MaxValue.toDouble)
  }

  /** The hyperplanes as driver-side literals (numPlanes × dim doubles — a
    * few KB; they ride to executors inside the serialized plan). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until numPlanes).map(p => (0 until dim).map(j => planeComponent(seed, p, j)))

  /** Random-hyperplane (sign) LSH bucket id: bit p = 1 iff emb·planeₚ > 0.
    * Cosine-similar vectors collide with high probability. One projection,
    * no shuffle. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, typedLit(p)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN top-k: prune to the query's bucket, then exact cosine
    * within it. Recall is tunable via numPlanes (fewer planes → bigger
    * buckets → higher recall & cost). At scale the bucket column is what
    * you'd partition/bucket the table by, so a query touches one partition.
    */
  def annTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      query: Seq[Double],
      k: Int,
      numPlanes: Int = 8,
      seed: Long = 42L,
  ): DataFrame = {
    val planes = hyperplanes(numPlanes, query.length, seed)
    val queryBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d > 0.0) 1L << i else 0L
    }.sum
    cosineTopK(
      df.filter(lshBucket(col(embCol), planes) === queryBucket),
      idCol, embCol, query, k)
  }

  /** All-pairs embedding near-duplicates: pairs with cosine ≥ threshold,
    * LSH-bucketed so only same-bucket pairs are compared (the scale path —
    * brute-force all-pairs is O(n²) and off the table at 100 TB).
    * Shuffle is a single hash partition by bucket id. */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double = 0.95,
      numPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
  ): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val bucketed = df.select(
      col(idCol).as("id"), col(embCol).as("emb"),
      lshBucket(col(embCol), planes).as("bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.emb"), col("b.emb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
