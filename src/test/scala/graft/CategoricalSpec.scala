package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.transformers._
import graft.errors.FeatureFactoryException._

/** Fixtures from reference tests/test_transformers_categorical.rs:15-61:
  * color=[red, blue, red, green, blue, red]; target=[10,20,10,30,20,10];
  * WoE target=[1,0,1,0,0,1]. */
class CategoricalSpec extends SparkSpec {

  private def mkDf = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("red", 10.0, 1L),
      Row("blue", 20.0, 0L),
      Row("red", 10.0, 1L),
      Row("green", 30.0, 0L),
      Row("blue", 20.0, 0L),
      Row("red", 10.0, 1L)),
    StructType(Seq(
      StructField("color", StringType, nullable = true),
      StructField("target", DoubleType, nullable = true),
      StructField("itarget", LongType, nullable = true))))

  test("OneHotEncoder appends one 0/1 column per category, keeps original") {
    val out = new OneHotEncoder(Seq("color")).fitTransform(mkDf)
    out.columns shouldBe Array("color", "target", "itarget",
      "color_blue", "color_green", "color_red")
    val rows = out.select("color", "color_red", "color_blue", "color_green")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    rows(0) shouldBe ("red", 1, 0, 0)
    rows(1) shouldBe ("blue", 0, 1, 0)
    rows(3) shouldBe ("green", 0, 0, 1)
  }

  test("CountFrequencyEncoder replaces categories with raw counts; unseen → 0") {
    val enc = new CountFrequencyEncoder(Seq("color"))
    val out = enc.fitTransform(mkDf).select("color").collect().map(_.getLong(0))
    out shouldBe Array(3L, 2L, 3L, 1L, 2L, 3L)
    // unseen category at transform time
    val other = spark.createDataFrame(
      java.util.Arrays.asList(Row("purple", 1.0, 1L)),
      mkDf.schema)
    enc.transform(other).select("color").head().getLong(0) shouldBe 0L
  }

  test("OrdinalEncoder encodes alphabetically; unseen → 0 (reference collision)") {
    val enc = new OrdinalEncoder(Seq("color"))
    val out = enc.fitTransform(mkDf).select("color").collect().map(_.getLong(0))
    // blue=0, green=1, red=2
    out shouldBe Array(2L, 0L, 2L, 1L, 0L, 2L)
    val other = spark.createDataFrame(
      java.util.Arrays.asList(Row("purple", 1.0, 1L)), mkDf.schema)
    enc.transform(other).select("color").head().getLong(0) shouldBe 0L
  }

  test("MeanEncoder replaces categories with mean(target); unseen → 0.0") {
    val enc = new MeanEncoder(Seq("color"), "target")
    val out = enc.fitTransform(mkDf).select("color").collect().map(_.getDouble(0))
    out shouldBe Array(10.0, 20.0, 10.0, 30.0, 20.0, 10.0)
  }

  test("WoEEncoder uses the reference's unnormalized raw-count formula") {
    val enc = new WoEEncoder(Seq("color"), "itarget")
    val out = enc.fitTransform(mkDf).select("color").collect().map(_.getDouble(0))
    // red: good=3, bad=0 → ln(3.000001/1e-6); blue: good=0, bad=2 → ln(1e-6/2.000001)
    // green: good=0, bad=1 → ln(1e-6/1.000001)
    assert(approxEqual(out(0), math.log((3.0 + 1e-6) / 1e-6), 1e-6))
    assert(approxEqual(out(1), math.log(1e-6 / (2.0 + 1e-6)), 1e-6))
    assert(approxEqual(out(3), math.log(1e-6 / (1.0 + 1e-6)), 1e-6))
    out.forall(v => !v.isNaN) shouldBe true
  }

  test("RareLabelEncoder collapses below-threshold categories to 'rare'") {
    // threshold 0.5: red freq 3/6=0.5 kept; blue 2/6, green 1/6 → rare
    val out = new RareLabelEncoder(Seq("color"), 0.5)
      .fitTransform(mkDf).select("color").collect().map(_.getString(0))
    out shouldBe Array("red", "rare", "red", "rare", "rare", "red")
  }

  test("RareLabelEncoder validates threshold; encoders demand fit first") {
    an[InvalidParameter] should be thrownBy
      new RareLabelEncoder(Seq("color"), 1.5).fit(mkDf)
    a[FitNotCalled] should be thrownBy new OneHotEncoder(Seq("color")).transform(mkDf)
    a[MissingColumn] should be thrownBy new OneHotEncoder(Seq("target")).fit(mkDf)
  }

  test("broadcast-join path (MaxCaseBranches=1) matches the CASE path") {
    val prev = CategoricalEncoding.MaxCaseBranches
    try {
      CategoricalEncoding.MaxCaseBranches = 1
      val out = new CountFrequencyEncoder(Seq("color"))
        .fitTransform(mkDf).select("color").collect().map(_.getLong(0))
      out shouldBe Array(3L, 2L, 3L, 1L, 2L, 3L)
      val out2 = new MeanEncoder(Seq("color"), "target")
        .fitTransform(mkDf).select("color").collect().map(_.getDouble(0))
      out2 shouldBe Array(10.0, 20.0, 10.0, 30.0, 20.0, 10.0)
    } finally CategoricalEncoding.MaxCaseBranches = prev
  }
}
