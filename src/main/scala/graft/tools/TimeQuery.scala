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
    t("minhash pairs")(
      graft.ops.Dedup.minhashDedupPairs(docs, "doc_id", "text").count())
    t("cluster byText")(
      graft.ops.Dedup.duplicateClustersByText(docs, "doc_id", "text").count())
    t("cluster generic")(
      graft.ops.Dedup.duplicateClusters(
        docs.select("doc_id"), "doc_id",
        graft.ops.Dedup.minhashDedupPairs(docs, "doc_id", "text")
          .select("id_a", "id_b")).count())
    t("cluster byText again")(
      graft.ops.Dedup.duplicateClustersByText(docs, "doc_id", "text").count())
    spark.stop()
  }
}
