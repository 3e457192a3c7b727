package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.transformers._
import graft.errors.FeatureFactoryException._

/** Fixture from reference tests/test_transformers_numerical.rs:14-32:
  * a=[1,2,10]; b=[0.5,1.5,2.5]; c=[2,3,4]. */
class NumericalSpec extends SparkSpec {
  private lazy val df = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1.0, 0.5, 2.0), Row(2.0, 1.5, 3.0), Row(10.0, 2.5, 4.0)),
    StructType(Seq(
      StructField("a", DoubleType, nullable = false),
      StructField("b", DoubleType, nullable = false),
      StructField("c", DoubleType, nullable = false))))

  private def colVals(t: graft.core.Transformer, c: String): Array[Double] =
    t.fitTransform(df).select(c).collect().map(_.getDouble(0))

  test("LogTransformer = ln(x), rejects non-positive domains") {
    colVals(new LogTransformer(Seq("a")), "a") shouldBe
      Array(math.log(1.0), math.log(2.0), math.log(10.0))
    val withZero = spark.createDataFrame(
      java.util.Arrays.asList(Row(0.0, 1.0, 1.0)), df.schema)
    an[InvalidParameter] should be thrownBy
      new LogTransformer(Seq("a")).transform(withZero)
  }

  test("LogCpTransformer = ln(x + C)") {
    // tolerance: Spark's codegen log differs from JVM Math.log by 1 ULP
    val vals = colVals(new LogCpTransformer(Seq("a"), 1.0), "a")
    val expected = Array(math.log(2.0), math.log(3.0), math.log(11.0))
    vals.zip(expected).foreach { case (v, e) => assert(approxEqual(v, e, 1e-12)) }
    an[InvalidParameter] should be thrownBy
      new LogCpTransformer(Seq("a"), -1.0).transform(df)
  }

  test("ReciprocalTransformer = 1/x, rejects ranges straddling zero") {
    colVals(new ReciprocalTransformer(Seq("a")), "a") shouldBe Array(1.0, 0.5, 0.1)
    val straddle = spark.createDataFrame(
      java.util.Arrays.asList(Row(-1.0, 1.0, 1.0), Row(1.0, 1.0, 1.0)), df.schema)
    an[InvalidParameter] should be thrownBy
      new ReciprocalTransformer(Seq("a")).transform(straddle)
  }

  test("PowerTransformer = x^p") {
    colVals(new PowerTransformer(Seq("a"), 2.0), "a") shouldBe Array(1.0, 4.0, 100.0)
  }

  test("BoxCoxTransformer with λ and with λ≈0") {
    val l2 = colVals(new BoxCoxTransformer(Seq("a"), 2.0), "a")
    assert(approxEqual(l2(1), (4.0 - 1.0) / 2.0))
    val l0 = colVals(new BoxCoxTransformer(Seq("a"), 0.0), "a")
    assert(approxEqual(l0(2), math.log(10.0)))
    an[InvalidParameter] should be thrownBy
      new BoxCoxTransformer(Seq("a"), 1.0).transform(
        spark.createDataFrame(java.util.Arrays.asList(Row(-1.0, 1.0, 1.0)), df.schema))
  }

  test("YeoJohnsonTransformer handles positive and negative values") {
    val mixed = spark.createDataFrame(
      java.util.Arrays.asList(Row(2.0, 1.0, 1.0), Row(-2.0, 1.0, 1.0)), df.schema)
    val out = new YeoJohnsonTransformer(Seq("a"), 0.5)
      .fitTransform(mixed).select("a").collect().map(_.getDouble(0))
    // x=2, λ=0.5: ((3)^0.5 - 1)/0.5 ; x=-2, λ=0.5: -((3)^1.5 - 1)/1.5
    assert(approxEqual(out(0), (math.pow(3.0, 0.5) - 1) / 0.5))
    assert(approxEqual(out(1), -(math.pow(3.0, 1.5) - 1) / 1.5))
  }

  test("ArcsinTransformer = asin(sqrt(x)), domain [0,1]") {
    val unit = spark.createDataFrame(
      java.util.Arrays.asList(Row(0.25, 1.0, 1.0), Row(1.0, 1.0, 1.0)), df.schema)
    val out = new ArcsinTransformer(Seq("a"))
      .fitTransform(unit).select("a").collect().map(_.getDouble(0))
    assert(approxEqual(out(0), math.asin(0.5)))
    an[InvalidParameter] should be thrownBy new ArcsinTransformer(Seq("a")).transform(df)
  }

  test("StandardScaler: population std, zero-variance column maps to 0") {
    import spark.implicits._
    val d = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "const")
    val out = new StandardScaler(Seq("x", "const")).fitTransform(d).collect()
    val std = math.sqrt(2.0 / 3.0) // population: mean 2, M2/n
    assert(approxEqual(out(0).getDouble(0), (1.0 - 2.0) / std))
    out.map(_.getDouble(1)).foreach(_ shouldBe 0.0) // sigma=0 -> scale 1, centered
    a[FitNotCalled] should be thrownBy new StandardScaler(Seq("x")).transform(d)
  }

  test("RobustScaler: (x - median) / IQR, zero IQR -> scale 1") {
    import spark.implicits._
    val d = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    val out = new RobustScaler(Seq("x"), exact = true).fitTransform(d)
      .orderBy("x").collect().map(_.getDouble(0))
    // q25=2, med=3, q75=4 (linear interpolation on 5 points) -> IQR 2
    out.toSeq shouldBe Seq(-1.0, -0.5, 0.0, 0.5, 1.0)
  }

  test("MinMaxScaler: [0,1] range, zero-range column maps to 0") {
    import spark.implicits._
    val d = Seq((10.0, 5.0), (20.0, 5.0), (30.0, 5.0)).toDF("x", "const")
    val out = new MinMaxScaler(Seq("x", "const")).fitTransform(d)
      .orderBy("x").collect()
    out.map(_.getDouble(0)).toSeq shouldBe Seq(0.0, 0.5, 1.0)
    out.map(_.getDouble(1)).foreach(_ shouldBe 0.0)
  }
}
