package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    t("warm")(d.count())
    val fn = graft.functions.TilePairs.TokenNgramName
    t("corpus grams explode")(
      d.filter(col("doc_id") % 3 =!= 0)
        .select(explode(call_function(fn, col("text"), lit(5))).as("h")).count())
    t("bench grams distinct")(
      d.filter(col("doc_id") % 3 === 0)
        .select(explode(call_function(fn, col("text"), lit(5))).as("h")).distinct().count())
    t("full op")(graft.ops.Dedup.ngramOverlapContamination(
      d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", n = 5).count())
    t("full op again")(graft.ops.Dedup.ngramOverlapContamination(
      d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", n = 5).count())
    t("no bloom")(graft.ops.Dedup.ngramOverlapContamination(
      d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", n = 5, useBloom = false).count())
    spark.stop()
  }
}
