package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.transformers._
import graft.errors.FeatureFactoryException._

/** Fixture from reference tests/test_transformers_outliers.rs:11-45:
  * value=[1.0, 5.0, 10.0, 20.0], caps 2.0/15.0. */
class OutliersSpec extends SparkSpec {
  private def dfOf(vals: Double*) = spark.createDataFrame(
    java.util.Arrays.asList(vals.map(v => Row(java.lang.Double.valueOf(v))): _*),
    StructType(Seq(StructField("value", DoubleType, nullable = false))))

  private lazy val df = dfOf(1.0, 5.0, 10.0, 20.0)

  test("ArbitraryOutlierCapper caps at user bounds; one-sided works") {
    val out = new ArbitraryOutlierCapper(Map("value" -> (Some(2.0), Some(15.0))))
      .fitTransform(df).select("value").collect().map(_.getDouble(0))
    out shouldBe Array(2.0, 5.0, 10.0, 15.0)
    val lowOnly = new ArbitraryOutlierCapper(Map("value" -> (Some(2.0), None)))
      .fitTransform(df).select("value").collect().map(_.getDouble(0))
    lowOnly shouldBe Array(2.0, 5.0, 10.0, 20.0)
    an[InvalidParameter] should be thrownBy
      new ArbitraryOutlierCapper(Map("value" -> (Some(5.0), Some(2.0)))).transform(df)
  }

  test("Winsorizer caps at learned percentiles (exact)") {
    val t = new Winsorizer(Seq("value"), 0.0, 0.5, exact = true)
    val out = t.fitTransform(df).select("value").collect().map(_.getDouble(0))
    // exact p50 of [1,5,10,20] = 7.5 → upper cap 7.5
    out shouldBe Array(1.0, 5.0, 7.5, 7.5)
  }

  test("OutlierTrimmer filters rows outside learned bounds (exact)") {
    val t = new OutlierTrimmer(Seq("value"), 0.25, 0.75, exact = true)
    val out = t.fitTransform(df).select("value").collect().map(_.getDouble(0))
    // p25 = 2.0, p75 = 12.5 → keep 5.0, 10.0
    out shouldBe Array(5.0, 10.0)
  }

  test("percentile validation") {
    an[InvalidParameter] should be thrownBy new Winsorizer(Seq("value"), 0.9, 0.1).fit(df)
    an[InvalidParameter] should be thrownBy new OutlierTrimmer(Seq("value"), -0.1, 0.5).fit(df)
    a[FitNotCalled] should be thrownBy new Winsorizer(Seq("value")).transform(df)
  }
}
