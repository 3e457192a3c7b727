package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the `graft-warc` reader (BASELINE.md note): builds a
  * synthetic gzip'd WET archive from the documents table replicated
  * `replicas`×, then times (median of 3 after a warmup)
  *   full    — a payload-consuming pass (sum of payload lengths), and
  *   pruned  — a metadata-only pass (count + sum(content_length)), which
  *             the pushed-down column pruning serves without decoding a
  *             single payload byte.
  *
  * Usage: runMain graft.tools.WarcProbe <sfDir> <replicas>
  */
object WarcProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, replicasS) = args
    val replicas = replicasS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_probe")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("probe.wet.gz")))
    var id = 0L
    (0 until replicas).foreach { _ =>
      texts.foreach { t =>
        val p = t.getBytes("UTF-8")
        out.write((s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
          s"WARC-Record-ID: <urn:probe:$id>\r\n" +
          s"Content-Length: ${p.length}\r\n\r\n").getBytes("UTF-8"))
        out.write(p)
        out.write("\r\n\r\n".getBytes("UTF-8"))
        id += 1
      }
    }
    out.close()
    val path = dir.resolve("probe.wet.gz").toString
    val nRecords = texts.length.toLong * replicas
    def timed(f: () => Unit): Double = {
      f() // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      runs(1)
    }
    val full = timed(() => assert(
      graft.sources.Loader.loadWarc(spark, path)
        .agg(sum(length(col("payload")))).head().getLong(0) > 0))
    val pruned = timed(() => assert(
      graft.sources.Loader.loadWarc(spark, path)
        .agg(count(lit(1)), sum(col("content_length"))).head().getLong(0) == nRecords))
    println(f"""{"records":$nRecords,"gz_bytes":${java.nio.file.Files.size(dir.resolve("probe.wet.gz"))},"full_s":$full%.3f,"pruned_s":$pruned%.3f}""")
    spark.stop()
  }
}
