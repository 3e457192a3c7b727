package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming-native event operators (extension beyond the
  * reference surface — the reference has no streaming of any kind,
  * SURVEY §1 "Streams: None").
  *
  * Every operator here is written against the unified DataFrame API, so the
  * SAME code runs in batch (driver correctness oracle) and as an incremental
  * streaming query (`readStream` → op → `writeStream`) — the Spark-native
  * way to get streaming for free. Watermark handling is conditional on
  * `df.isStreaming`: batch runs ignore it (a no-op there), streaming runs
  * get bounded state.
  *
  * At 100 TB / unbounded input: every aggregation below keys its state by
  * (window × key) or id, so state size is bounded by the watermark horizon,
  * not the stream length; shuffles are the single hash partition per
  * aggregate that Catalyst plans anyway.
  */
object StreamingOps {

  /** Tumbling-window counts + sums per key.
    * Output: window_start, window_end, <keys...>, n_events, sum_value.
    * In streaming mode, set `watermark` (e.g. "1 hour") for append-mode
    * emission and bounded state. */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      windowLength: String,
      watermark: Option[String] = None,
  ): DataFrame = {
    val in = watermark match {
      case Some(w) if df.isStreaming => df.withWatermark(tsCol, w)
      case _ => df
    }
    in.groupBy(window(col(tsCol), windowLength).as("w") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(
        Seq(col("w.start").as("window_start"), col("w.end").as("window_end")) ++
          keyCols.map(col) ++ Seq(col("n_events"), col("sum_value")): _*)
  }

  /** Native session windows (gap-based): consecutive events of one key merge
    * while each arrives within `gap` of the previous; the session closes at
    * last_event + gap. Output: <key>, session_start, session_end, n_events.
    * Exactly Spark's `session_window`, so streaming mode gets incremental
    * session state management for free (watermark required for append). */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermark: Option[String] = None,
  ): DataFrame = {
    val in = watermark match {
      case Some(w) if df.isStreaming => df.withWatermark(tsCol, w)
      case _ => df
    }
    in.groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"))
  }

  /** Exactly-once event dedup by id columns. Batch: plain dropDuplicates
    * (one hash shuffle). Streaming: watermarked dropDuplicates — state holds
    * only ids newer than the watermark horizon, the standard unbounded-input
    * dedup pattern. */
  def dedupEvents(
      df: DataFrame,
      idCols: Seq[String],
      tsCol: String,
      watermark: String = "1 hour",
  ): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicates(idCols :+ tsCol)
    else df.dropDuplicates(idCols :+ tsCol)

  /** Typed JSON property extraction from a string payload column — the
    * enrichment step of an event pipeline (codegen'd get_json_object, no
    * UDF). */
  def jsonField(payload: Column, path: String): Column =
    get_json_object(payload, path)
}
