package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    t("warm")(e.count())
    t("centroids lloyd 1")(graft.ops.Similarity.ivfCentroids(e, "embedding", 8).length)
    t("centroids lloyd 2")(graft.ops.Similarity.ivfCentroids(e, "embedding", 8).length)
    val q = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
    t("ivfTopK full")(graft.ops.Similarity.ivfTopK(e, "vec_id", "embedding", q, 10, 8, 2).count())
    spark.stop()
  }
}
