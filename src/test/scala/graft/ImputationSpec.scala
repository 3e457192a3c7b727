package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.transformers._
import graft.core.Pipeline
import graft.errors.FeatureFactoryException._

/** Fixture from reference tests/test_transformers_imputation.rs:15-42:
  * a=[1.0, 2.0, null, 4.0]; b=["x", null, "x", "y"]; mean(a)=7/3, mode(b)="x". */
class ImputationSpec extends SparkSpec {
  private lazy val df = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(java.lang.Double.valueOf(1.0), "x"),
      Row(java.lang.Double.valueOf(2.0), null),
      Row(null, "x"),
      Row(java.lang.Double.valueOf(4.0), "y")),
    StructType(Seq(
      StructField("a", DoubleType, nullable = true),
      StructField("b", StringType, nullable = true))))

  test("MeanMedianImputer fills nulls with the mean (7/3)") {
    val t = new MeanMedianImputer(Seq("a"))
    val out = t.fitTransform(df).select("a").collect().map(_.getDouble(0))
    out.length shouldBe 4
    assert(approxEqual(out(2), 7.0 / 3.0, 1e-6))
    assert(approxEqual(out(0), 1.0))
  }

  test("MeanMedianImputer median strategy (extension) fills with median") {
    val t = new MeanMedianImputer(Seq("a"), strategy = "median", exact = true)
    val out = t.fitTransform(df).select("a").collect().map(_.getDouble(0))
    assert(approxEqual(out(2), 2.0)) // exact interpolated median of [1,2,4]
  }

  test("MeanMedianImputer requires fit before transform") {
    val t = new MeanMedianImputer(Seq("a"))
    a[FitNotCalled] should be thrownBy t.transform(df)
  }

  test("MeanMedianImputer rejects unknown strategy and missing column") {
    a[InvalidParameter] should be thrownBy
      new MeanMedianImputer(Seq("a"), strategy = "mode").fit(df)
    a[MissingColumn] should be thrownBy new MeanMedianImputer(Seq("zzz")).fit(df)
    a[MissingColumn] should be thrownBy new MeanMedianImputer(Seq("b")).fit(df)
  }

  test("ArbitraryNumberImputer fills nulls with the given number") {
    val out = new ArbitraryNumberImputer(Seq("a"), -1.0)
      .fitTransform(df).select("a").collect().map(_.getDouble(0))
    out shouldBe Array(1.0, 2.0, -1.0, 4.0)
  }

  test("ArbitraryNumberImputer rejects non-finite numbers") {
    a[InvalidParameter] should be thrownBy
      new ArbitraryNumberImputer(Seq("a"), Double.NaN).transform(df)
    a[InvalidParameter] should be thrownBy
      new ArbitraryNumberImputer(Seq("a"), Double.PositiveInfinity).transform(df)
  }

  test("EndTailImputer fills with learned percentile") {
    val t = new EndTailImputer(Seq("a"), percentile = 1.0, exact = true)
    val out = t.fitTransform(df).select("a").collect().map(_.getDouble(0))
    out(2) shouldBe 4.0
  }

  test("EndTailImputer validates percentile range") {
    a[InvalidParameter] should be thrownBy new EndTailImputer(Seq("a"), 1.5).fit(df)
  }

  test("CategoricalImputer fills with the mode, or a user default") {
    val out = new CategoricalImputer(Seq("b"))
      .fitTransform(df).select("b").collect().map(_.getString(0))
    out shouldBe Array("x", "x", "x", "y")
    val out2 = new CategoricalImputer(Seq("b"), Some("zzz"))
      .fitTransform(df).select("b").collect().map(_.getString(0))
    out2 shouldBe Array("x", "zzz", "x", "y")
  }

  test("AddMissingIndicator appends boolean indicator columns") {
    val out = new AddMissingIndicator(Seq("a", "b")).fitTransform(df)
    out.columns shouldBe Array("a", "b", "a_missing", "b_missing")
    out.schema("a_missing").dataType shouldBe BooleanType
    out.select("a_missing").collect().map(_.getBoolean(0)) shouldBe
      Array(false, false, true, false)
  }

  test("DropMissingData drops rows with nulls in given columns / all columns") {
    new DropMissingData(Seq("a")).fitTransform(df).count() shouldBe 3
    new DropMissingData().fitTransform(df).count() shouldBe 2
  }

  test("Pipeline chains fit+transform and rejects empty pipelines") {
    val p = Pipeline(
      "impute" -> new MeanMedianImputer(Seq("a")),
      "indicate" -> new AddMissingIndicator(Seq("b")))
    val out = p.fit(df)
    out.columns shouldBe Array("a", "b", "b_missing")
    out.count() shouldBe 4
    an[InvalidParameter] should be thrownBy Pipeline().fit(df)
  }
}
