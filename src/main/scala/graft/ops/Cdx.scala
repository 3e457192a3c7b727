package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDX-index query verbs beyond the prefix scan (`cdx_host_lookup`) and
  * latest-capture aggregate (`cdx_fetch_decisions`): the wayback-style
  * closest-timestamp lookup — "the page as it looked nearest time T" —
  * which composes with [[graft.sources.Loader.loadWarcRanges]] into
  * point-in-time replay (the index rows carry (filename, offset, length)
  * seek coordinates).
  *
  * Reference scope: the reference library has no crawl/index layer; this
  * is extension surface (SURVEY §2.12), format conventions per pywb /
  * Common Crawl cc-index. */
object Cdx {

  /** Per (urlkey, target) row of `targets`: the capture of `index` whose
    * time is CLOSEST to the target timestamp. Appends the winning
    * capture's columns plus `dist_sec`.
    *
    * Distance is REAL elapsed time — both 14-digit timestamps parse to
    * epoch seconds. Bare digit arithmetic is tempting (the strings
    * compare correctly for ORDER) but wrong for DISTANCE across any
    * month/year boundary: Jan 25 → Feb 1 is 7 days, not the 76·10⁶
    * digit-units that dwarf Jan 25 → Jan 1's 24·10⁶ (the fixture pins
    * exactly this shape). Ties break to the EARLIER capture, then by
    * `tieCols` — pass enough columns to make the winner unique when one
    * urlkey holds several captures at the same instant (e.g. `digest`),
    * or the row picked among exact ties is arbitrary.
    *
    * A capture whose timestamp does not parse (malformed index line) is
    * never picked (`try_to_timestamp` → NULL distance sorts last).
    *
    * Scale shape: one urlkey equi-join (both sides crawl-sized, no
    * broadcast assumption) + one window per (urlkey, target) group — the
    * same two-exchange plan as cdx_fetch_decisions; never a full sort of
    * the index. */
  def closestCaptures(
      index: DataFrame,
      targets: DataFrame,
      tsCol: String = "cdx_ts",
      targetCol: String = "target_ts",
      tieCols: Seq[String] = Nil): DataFrame = {
    graft.core.Validators.requireColumns(index, Seq("urlkey", tsCol) ++ tieCols)
    graft.core.Validators.requireColumns(targets, Seq("urlkey", targetCol))
    def epochOf(c: Column): Column =
      unix_timestamp(try_to_timestamp(c, lit("yyyyMMddHHmmss")))
    val joined = targets.join(index, Seq("urlkey"))
      .withColumn("dist_sec", abs(epochOf(col(tsCol)) - epochOf(col(targetCol))))
    val w = Window
      .partitionBy(col("urlkey") +: targets.columns.filter(_ != "urlkey")
        .map(col).toSeq: _*)
      .orderBy(col("dist_sec").asc_nulls_last +: col(tsCol).asc +:
        tieCols.map(col(_).asc): _*)
    joined
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1 && col("dist_sec").isNotNull)
      .drop("__graft_rn")
  }
}
