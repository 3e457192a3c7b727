package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Transformer
import graft.transformers._

/** Guards BASELINE.md's fit-job budget: every stateful transformer's fit
  * triggers at most 2 Spark jobs regardless of how many columns it learns
  * (the reference's antipattern is one query per column per statistic —
  * e.g. bins+1 jobs per column, discretization.rs:228-253; at 100 TB every
  * extra job is a full scan). */
class FitJobCountSpec extends SparkSpec {
  import spark.implicits._

  private def jobsDuring(body: => Unit): Int = {
    val n = new AtomicInteger
    val l = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener delivery is async — wait for the bus to drain
      var last = -1
      var ticks = 0
      while (n.get != last && ticks < 50) { last = n.get; Thread.sleep(100); ticks += 1 }
    } finally spark.sparkContext.removeSparkListener(l)
    n.get
  }

  private lazy val df = Seq(
    (1.0, 10.0, "a", "x", 1L),
    (2.0, 20.0, "b", "y", 0L),
    (3.0, 30.0, "a", "x", 1L),
    (4.0, 40.0, "c", "z", 0L),
    (5.0, 50.0, "b", "y", 1L),
  ).toDF("n1", "n2", "s1", "s2", "tgt")

  // (name, transformer, max jobs). The budget is 2; DropConstantFeatures
  // gets 3 because its ONE aggregate mixes COUNT(DISTINCT) with plain aggs,
  // which Spark plans as Expand + two exchanges — AQE submits one job per
  // materialized stage, so the single scan shows up as 3 stage-jobs.
  private val fits: Seq[(String, Transformer, Int)] = Seq(
    ("MeanMedianImputer", new MeanMedianImputer(Seq("n1", "n2"), "mean"), 2),
    ("EndTailImputer", new EndTailImputer(Seq("n1", "n2"), 0.75, exact = true), 2),
    ("CategoricalImputer", new CategoricalImputer(Seq("s1", "s2")), 2),
    ("OneHotEncoder", new OneHotEncoder(Seq("s1", "s2")), 2),
    ("CountFrequencyEncoder", new CountFrequencyEncoder(Seq("s1", "s2")), 2),
    ("OrdinalEncoder", new OrdinalEncoder(Seq("s1", "s2")), 2),
    ("MeanEncoder", new MeanEncoder(Seq("s1", "s2"), "n1"), 2),
    ("WoEEncoder", new WoEEncoder(Seq("s1", "s2"), "tgt"), 2),
    ("RareLabelEncoder", new RareLabelEncoder(Seq("s1", "s2"), 0.25), 2),
    ("EqualFrequencyDiscretizer", new EqualFrequencyDiscretizer(Seq("n1", "n2"), 2, exact = true), 2),
    ("EqualWidthDiscretizer", new EqualWidthDiscretizer(Seq("n1", "n2"), 2), 2),
    ("GeometricWidthDiscretizer", new GeometricWidthDiscretizer(Seq("n1", "n2"), 2), 2),
    ("Winsorizer", new Winsorizer(Seq("n1", "n2"), 0.1, 0.9, exact = true), 2),
    ("OutlierTrimmer", new OutlierTrimmer(Seq("n1", "n2"), 0.1, 0.9, exact = true), 2),
    ("DropConstantFeatures", new DropConstantFeatures(1e-9, 1L), 3),
    ("StandardScaler", new StandardScaler(Seq("n1", "n2")), 2),
    ("MinMaxScaler", new MinMaxScaler(Seq("n1", "n2")), 2),
    ("RobustScaler", new RobustScaler(Seq("n1", "n2"), exact = true), 2),
  )

  fits.foreach { case (name, t, maxJobs) =>
    test(s"$name.fit runs at most $maxJobs Spark jobs for multi-column input") {
      val jobs = jobsDuring(t.fit(df))
      withClue(s"$name fit jobs = $jobs: ") { jobs should be <= maxJobs }
    }
  }

  // Lloyd's job budget: count+init plus a bounded number of stage-jobs per
  // iteration (the melt-aggregate is ONE query; the old per-dimension-avg
  // formulation paid a job per plan compile). Join mode adds the weighted
  // cache and the broadcast-join argmin — budget 4 stage-jobs/iteration.
  private lazy val embs = (0 until 200).map(i =>
    (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j) % 17).toFloat)))
    .toDF("vec_id", "embedding")

  test("ivfCentroids literal mode stays within its job budget") {
    val jobs = jobsDuring(graft.ops.Similarity.ivfCentroids(embs, "embedding", 4, maxIter = 3))
    withClue(s"literal-mode jobs = $jobs: ") { jobs should be <= 3 + 3 * 3 }
  }

  test("ivfCentroids join mode stays within its job budget") {
    val saved = graft.ops.Similarity.LiteralAssignMax
    val savedNative = graft.ops.Similarity.NativeLiteralAssignMax
    val jobs = try {
      graft.ops.Similarity.LiteralAssignMax = 0
      graft.ops.Similarity.NativeLiteralAssignMax = 0
      jobsDuring(graft.ops.Similarity.ivfCentroids(embs, "embedding", 4, maxIter = 3))
    } finally {
      graft.ops.Similarity.LiteralAssignMax = saved
      graft.ops.Similarity.NativeLiteralAssignMax = savedNative
    }
    // ~5 stage-jobs per iteration: broadcast materialization + the argmin
    // aggregate's AQE stages + the melt collect
    withClue(s"join-mode jobs = $jobs: ") { jobs should be <= 5 + 5 * 3 }
  }
}
