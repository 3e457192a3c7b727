package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Reproduction script for the BASELINE.md SCALING note on
  * sim_hard_negatives: the cell-tiled kNN pair stage is O(N²/nlist), so a
  * fixed `nlist` at 10× data shows a ~10× steeper-than-linear pair curve —
  * and re-sizing nlist ∝ √N flattens it. This probe times
  * [[Similarity.hardNegatives]] at one scale factor across a list of nlist
  * values (median of 3 after a warmup, the Bench protocol).
  *
  * Usage: runMain graft.tools.ScalingProbe <sfDir> <nlist> [<nlist> ...]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScalingProbe <sfDir> <nlist> [<nlist> ...]")
    val sfDir = args.head
    val nlists = args.tail.map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.limit(1).count()
    val results = nlists.map { nlist =>
      val m = Similarity.ivfFit(e, "embedding", nlist = nlist)
      def once(): Double = {
        val t0 = System.nanoTime()
        Similarity.hardNegatives(e, "vec_id", "embedding", "label", m,
          k = 3, minCosine = 0.0).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val timed = (1 to 3).map(_ => once()).sorted
      nlist -> timed(1)
    }
    println(results.map { case (n, s) => s""""nlist_$n":${f"$s%.3f"}""" }
      .mkString(s"""{"sf":"$sfDir",""", ",", "}"))
    spark.stop()
  }
}
