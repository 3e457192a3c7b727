package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.util.LongAccumulator

/** Observability for the LSH bucket-size caps in [[Dedup]] / [[Similarity]].
  *
  * Every banded/bucketed candidate generator drops buckets larger than its
  * `maxBucketSize` (degenerate mass duplication is [[Dedup.exact]]'s job,
  * and a giant bucket's O(k²) pair space is not worth paying even tiled).
  * The drop is deliberate — but at 100 TB an operator that silently
  * discards its densest clusters would be misread as "no duplicates
  * found". So the cap filter runs through [[capped]], which either:
  *
  *  - DEFAULT: counts dropped buckets/members into named Spark
  *    accumulators (visible in the UI as `graft.bucketCap.<op>.*`,
  *    readable via [[drops]], WARNed after any action that grew them).
  *    Accumulators rather than `observe`/CollectMetrics because AQE's
  *    empty-relation propagation can replace an all-dropped subtree with
  *    an EmptyRelation before metric collection — losing the signal in
  *    precisely the all-buckets-dropped case it exists for. The counting
  *    UDF runs ONLY on over-cap bucket rows (zero cost on healthy data);
  *    under-cap rows take the pure-Column branch.
  *  - STRICT (`spark.conf.set("graft.bucketCap.strict", "true")`): fails
  *    the query loudly on the first over-cap bucket, like
  *    [[Relational.rangeJoin]]'s fan-out guard.
  *
  * Accumulator totals are cumulative per SparkContext since [[reset]]
  * (standard Spark accumulator semantics: task retries/speculation can
  * over-count, and re-computed plans count again) — treat them as a
  * monotone "anything dropped since I last looked?" signal, not an exact
  * per-query audit.
  */
object BucketCap {

  /** Session-conf key: "true" → an over-cap bucket throws instead of being
    * dropped and counted.
    *
    * CONSTRUCTION-TIME BINDING: the conf is read when an operator BUILDS
    * its DataFrame, not when the frame executes — toggling it later has no
    * effect on already-constructed frames (a built strict frame keeps
    * throwing, a built counting frame keeps counting). Set the conf before
    * calling the dedup/similarity op, or rebuild the query after toggling. */
  val StrictConfKey = "graft.bucketCap.strict"

  private case class Accs(buckets: LongAccumulator, members: LongAccumulator)
  private val accs = new ConcurrentHashMap[(SparkContext, String), Accs]()
  // last totals already WARNed per (context, op), so the listener only
  // logs when an action actually grew the counters
  private val warnedAt = new ConcurrentHashMap[(SparkContext, String), (Long, Long)]()

  /** Drop registry entries of stopped SparkContexts — without this the
    * strong (context, op) keys would pin every cycled context's object
    * graph for the JVM lifetime (test suites, notebook servers). Called on
    * the registration path, so a long-lived JVM is bounded by its LIVE
    * contexts' op set. (`sessions` needs no pruning: weak keys.) */
  private def pruneStopped(): Unit = {
    val it = accs.keySet.iterator()
    while (it.hasNext) {
      val key = it.next()
      if (key._1.isStopped) { it.remove(); warnedAt.remove(key) }
    }
  }
  private val sessions = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def accsFor(spark: SparkSession, op: String): Accs = {
    pruneStopped()
    accs.computeIfAbsent((spark.sparkContext, op), { case (sc, o) =>
      Accs(
        sc.longAccumulator(s"graft.bucketCap.$o.droppedBuckets"),
        sc.longAccumulator(s"graft.bucketCap.$o.droppedMembers"))
    })
  }

  /** (droppedBuckets, droppedMembers) total for `op` on this session's
    * context since startup/[[reset]] — (0, 0) when nothing was ever
    * dropped. Reliable immediately after an action (accumulator updates
    * land before the action returns). */
  def drops(spark: SparkSession, op: String): (Long, Long) =
    Option(accs.get((spark.sparkContext, op)))
      .map(a => (a.buckets.value.longValue, a.members.value.longValue))
      .getOrElse((0L, 0L))

  /** Zero all drop counters of this session's context (test/ops hook). */
  def reset(spark: SparkSession): Unit =
    accs.forEach { (key, a) =>
      if (key._1 eq spark.sparkContext) {
        a.buckets.reset(); a.members.reset(); warnedAt.remove(key)
      }
    }

  private def ensureListener(spark: SparkSession): Unit = sessions.synchronized {
    if (sessions.add(spark)) {
      val sc = spark.sparkContext
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          accs.forEach { (key, a) =>
            if (key._1 eq sc) {
              val now = (a.buckets.value.longValue, a.members.value.longValue)
              val before = warnedAt.getOrDefault(key, (0L, 0L))
              if (now._1 > before._1) {
                warnedAt.put(key, now)
                log.warn(
                  s"${key._2} dropped ${now._1 - before._1} over-cap LSH bucket(s) covering " +
                    s"${now._2 - before._2} member(s); raise maxBucketSize, collapse exact " +
                    s"duplicates first, or set $StrictConfKey=true to fail instead")
              }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
      })
    }
  }

  /** The shared `1 < size(xs) ≤ maxBucketSize` bucket filter with drop
    * accounting (or the strict guard). `buckets` must carry the collected
    * member array in column `xs`. */
  private[ops] def capped(buckets: DataFrame, maxBucketSize: Int, op: String): DataFrame = {
    val sz = size(col("xs"))
    val spark = buckets.sparkSession
    if (spark.conf.getOption(StrictConfKey).exists(_.toBoolean))
      buckets.filter(
        when(sz > maxBucketSize, raise_error(concat(
          lit(s"$op: an LSH bucket exceeds maxBucketSize=$maxBucketSize (size "),
          sz.cast("string"),
          lit(s"); collapse exact duplicates first, raise the cap, or unset $StrictConfKey"))))
          .otherwise(sz > 1))
    else {
      ensureListener(spark)
      val a = accsFor(spark, op)
      // evaluated only on over-cap rows; records the drop, then filters it
      val record = udf { s: Int =>
        a.buckets.add(1L); a.members.add(s.toLong); false
      }.asNondeterministic()
      buckets.filter(
        when(sz > maxBucketSize, record(sz)).otherwise(sz > 1))
    }
  }
}
