package graft

/** Every driver-contract query executes end to end at sf0.001 (the driver
  * itself only smoke-runs `entry`) — catches runtime breakage in any queries
  * entry at test time rather than at verify time. */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry flagship runs and returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    extra shouldBe empty
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      noException should be thrownBy fn(spark, dir).count()
    }
  }
}
