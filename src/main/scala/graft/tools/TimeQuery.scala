package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.transformers._

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
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val base = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
    t("warm count")(base.count())
    val enc = new MeanEncoder(Seq("l_returnflag"), "l_quantity")
    t("fit")(enc.fit(base))
    val out = enc.transform(base)
    t("transform+count")(out.count())
    t("again count")(out.count())
    val enc2 = new WoEEncoder(Seq("l_returnflag"), "l_quantity")
    t("woe fit")(enc2.fit(base))
    t("woe transform+count")(enc2.transform(base).count())
    spark.stop()
  }
}
