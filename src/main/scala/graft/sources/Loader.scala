package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.errors.FeatureFactoryException.UnsupportedFormat

/** File-format dispatch (reference: examples/shared.rs:11-33): routes
  * `.parquet` / `.csv` by extension and raises `UnsupportedFormat` for
  * anything else — the reference's only source-side error path.
  *
  * CSV reads with header + schema inference, matching DataFusion's
  * `CsvReadOptions::new()` defaults (header true, schema inferred).
  *
  * Extension beyond the reference (the ingest formats a training-data
  * pipeline actually receives): `.json` / `.jsonl` as line-delimited JSON
  * with schema inference, `.txt` as one (value: string) row per line, and
  * `.warc` / `.wet` web-crawl archives via [[loadWarc]]. Compressed
  * variants route on the inner extension (`docs.jsonl.gz`). */
object Loader {

  def load(spark: SparkSession, path: String): DataFrame = {
    // strip a trailing compression suffix so `docs.jsonl.gz` routes as jsonl
    // (Spark's readers handle the codec themselves; loadWarc inflates its
    // own gzip — Common Crawl's member-per-record framing must reach the
    // record parser intact)
    val base = path.toLowerCase.replaceAll("\\.(gz|bz2|zst|snappy|deflate)$", "")
    val ext = base.lastIndexOf('.') match {
      case -1 => ""
      case i => base.substring(i + 1)
    }
    ext match {
      case "parquet" => spark.read.parquet(path)
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" | "jsonl" => spark.read.json(path)
      case "txt" => spark.read.text(path)
      case "warc" | "wet" => loadWarc(spark, path)
      case _ =>
        throw UnsupportedFormat(
          "Unsupported file format. Please provide a CSV, Parquet, JSON(L), " +
            "TXT, or WARC/WET file.")
    }
  }

  /** Web-crawl ingest (the Common-Crawl first mile): reads WARC/WET
    * archives — one row per RECORD — with columns
    * (warc_file, record_index, warc_type, record_id, target_uri,
    * warc_date, content_type, content_length, payload). WET conversion
    * records' payload feeds the curation chain directly; WARC response
    * records' HTML goes through [[graft.ops.TextOps.stripHtml]] first.
    * gzip archives (`.warc.gz` / `.wet.gz`) inflate inside the reader.
    *
    * Backed by the `graft-warc` DataSource V2
    * ([[graft.sources.warc.WarcDataSource]]): one task per archive file
    * (gzip is not splittable; crawl archives are ~1 GB by convention, so
    * a 100 TB crawl is ~100k independent file-tasks) STREAMING records
    * off the open file — memory is bounded by the largest single record,
    * never the archive, so multi-GB inflated .warc.gz parses fine.
    * Directories and globs expand through the path's Hadoop filesystem. */
  def loadWarc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-warc").load(path)
}
