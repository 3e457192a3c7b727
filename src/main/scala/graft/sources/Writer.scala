package graft.sources

import org.apache.spark.sql.DataFrame
import graft.errors.FeatureFactoryException.UnsupportedFormat

/** Sink-side counterpart of [[Loader]] (the reference has NO sinks — callers
  * `collect()`; at 100 TB the result must be written distributed, so this is
  * a required extension, SURVEY §1 "Sinks: None").
  *
  * Two scale levers beyond a flat write:
  *
  *  - `partitionBy`: hive-style directory partitioning — downstream reads
  *    with a filter on the partition column scan only matching directories
  *    (partition pruning, visible as `PartitionFilters` in explain);
  *  - [[writeBucketed]]: bucket + sort by the join/aggregation key — two
  *    tables bucketed the same way join with ZERO exchanges (the classic
  *    co-located join), the single biggest shuffle saver for repeatedly
  *    joined 100-TB tables.
  */
object Writer {

  /** Extension-dispatched write, mirroring [[Loader.load]]'s csv/parquet
    * surface (+ `UnsupportedFormat` on anything else). */
  def save(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i => path.substring(i + 1).toLowerCase
    }
    val w = df.write.mode("overwrite").partitionBy(partitionBy: _*)
    ext match {
      case "parquet" => w.parquet(path)
      case "csv" => w.option("header", "true").csv(path)
      case _ =>
        throw UnsupportedFormat(
          "Unsupported file format. Please provide a CSV or Parquet file.")
    }
  }

  /** Bucketed + sorted managed table: `numBuckets` hash buckets on
    * `bucketCols`, each bucket sorted by `sortCols` (default: the bucket
    * columns). Joins/aggregations keyed on the bucket columns then plan
    * without a shuffle on the bucketed side(s). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None, // external table location; default = warehouse
  ): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    val w = df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
