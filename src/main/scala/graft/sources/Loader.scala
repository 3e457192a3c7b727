package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.errors.FeatureFactoryException.UnsupportedFormat

/** File-format dispatch (reference: examples/shared.rs:11-33): routes
  * `.parquet` / `.csv` by extension and raises `UnsupportedFormat` for
  * anything else — the reference's only source-side error path.
  *
  * CSV reads with header + schema inference, matching DataFusion's
  * `CsvReadOptions::new()` defaults (header true, schema inferred). */
object Loader {

  def load(spark: SparkSession, path: String): DataFrame = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i => path.substring(i + 1).toLowerCase
    }
    ext match {
      case "parquet" => spark.read.parquet(path)
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case _ =>
        throw UnsupportedFormat(
          "Unsupported file format. Please provide a CSV or Parquet file.")
    }
  }
}
