package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness for digging into a single query's phases. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val docs = d.unionByName(
      d.filter(col("doc_id") % 5 === 0).withColumn("doc_id", col("doc_id") + 10000))
    t("warm")(docs.count())
    // corpus shape: docs, distinct texts, distinct shingle-sets
    val reps = docs.groupBy("text").agg(min("doc_id").as("id"))
    t("distinct texts")(reps.count())
    val sets = reps.select(col("id"),
      sort_array(graft.ops.Dedup.shingleHashes(col("text"), 3)).as("gs"))
    t("distinct shingle-sets")(sets.groupBy("gs").count().count())
    t("set-size stats")(sets.agg(min(size(col("gs"))), avg(size(col("gs"))),
      max(size(col("gs")))).head())
    // phase timings of the ngram bitmap path
    val hashed = reps.select(col("id"),
      explode(graft.ops.Dedup.shingleHashes(col("text"), 3)).as("h"))
    t("phase explode+distinct-probe")(
      hashed.select("h").distinct().limit(4097).count())
    t("phase freq groupBy")(hashed.groupBy("h").count().count())
    t("phase bitmap feats")(hashed.groupBy("id").agg(count(lit(1))).count())
    t("ngramJaccardPairs")(
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    t("ngramJaccardPairs again")(
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    t("minhashDedupPairs")(
      graft.ops.Dedup.minhashDedupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
