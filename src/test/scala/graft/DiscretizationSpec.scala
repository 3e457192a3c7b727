package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.transformers._
import graft.errors.FeatureFactoryException._

class DiscretizationSpec extends SparkSpec {
  private def dfOf(vals: Double*) = spark.createDataFrame(
    java.util.Arrays.asList(vals.map(v => Row(java.lang.Double.valueOf(v))): _*),
    StructType(Seq(StructField("value", DoubleType, nullable = false))))

  test("ArbitraryDiscretizer maps intervals, NULL outside, last bin closed") {
    val t = new ArbitraryDiscretizer(Map("value" -> Seq(
      (0.0, 10.0, "low"), (10.0, 20.0, "high"))))
    val out = t.fitTransform(dfOf(5.0, 10.0, 20.0, 25.0))
      .select("value").collect().map(r => Option(r.getString(0)))
    out shouldBe Array(Some("low"), Some("high"), Some("high"), None)
  }

  test("ArbitraryDiscretizer rejects inverted intervals") {
    an[InvalidParameter] should be thrownBy
      new ArbitraryDiscretizer(Map("value" -> Seq((10.0, 5.0, "bad"))))
        .transform(dfOf(1.0))
  }

  test("EqualWidthDiscretizer builds correct bins and labels") {
    // values 0..10, 2 bins → [0, 5), [5, 10]
    val t = new EqualWidthDiscretizer(Seq("value"), 2)
    val out = t.fitTransform(dfOf(0.0, 2.5, 5.0, 7.5, 10.0))
      .select("value").collect().map(_.getString(0))
    out shouldBe Array("[0.00, 5.00)", "[0.00, 5.00)", "[5.00, 10.00)",
      "[5.00, 10.00)", "[5.00, 10.00)")
  }

  test("EqualFrequencyDiscretizer (exact) uses quantile boundaries") {
    val t = new EqualFrequencyDiscretizer(Seq("value"), 2, exact = true)
    val out = t.fitTransform(dfOf(1.0, 2.0, 3.0, 4.0))
      .select("value").collect().map(_.getString(0))
    // exact median of [1,2,3,4] = 2.5 → bins [1, 2.5), [2.5, 4]
    out shouldBe Array("[1.00, 2.50)", "[1.00, 2.50)", "[2.50, 4.00)", "[2.50, 4.00)")
  }

  test("GeometricWidthDiscretizer uses multiplicative bins; rejects min <= 0") {
    val t = new GeometricWidthDiscretizer(Seq("value"), 2)
    // [1, 100], ratio = 10 → bins [1, 10), [10, 100]
    val out = t.fitTransform(dfOf(1.0, 5.0, 10.0, 100.0))
      .select("value").collect().map(_.getString(0))
    out shouldBe Array("[1.00, 10.00)", "[1.00, 10.00)", "[10.00, 100.00)",
      "[10.00, 100.00)")
    an[InvalidParameter] should be thrownBy
      new GeometricWidthDiscretizer(Seq("value"), 2).fit(dfOf(0.0, 10.0))
  }

  test("constant columns are rejected; bins < 1 rejected; fit required") {
    an[InvalidParameter] should be thrownBy
      new EqualWidthDiscretizer(Seq("value"), 3).fit(dfOf(5.0, 5.0, 5.0))
    an[InvalidParameter] should be thrownBy
      new EqualFrequencyDiscretizer(Seq("value"), 0).fit(dfOf(1.0, 2.0))
    a[FitNotCalled] should be thrownBy
      new EqualWidthDiscretizer(Seq("value"), 2).transform(dfOf(1.0))
  }
}
