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
  * with schema inference, and `.txt` as one (value: string) row per line.
  * Compressed variants route on the inner extension (`docs.jsonl.gz`). */
object Loader {

  def load(spark: SparkSession, path: String): DataFrame = {
    // strip a trailing compression suffix so `docs.jsonl.gz` routes as jsonl
    // (Spark's readers handle the codec themselves)
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
      case _ =>
        throw UnsupportedFormat(
          "Unsupported file format. Please provide a CSV, Parquet, JSON(L), " +
            "or TXT file.")
    }
  }
}
