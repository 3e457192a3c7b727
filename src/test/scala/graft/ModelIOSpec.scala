package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.errors.FeatureFactoryException._
import graft.transformers._

/** Fitted-pipeline persistence: JSON round trip must preserve both the
  * constructor parameters and every learned parameter, so the restored
  * pipeline's transform output is IDENTICAL to the original's. */
class ModelIOSpec extends SparkSpec {

  private lazy val base = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_shipdate"),
      when(col("l_orderkey") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity")).as("qty"),
      col("l_extendedprice"), col("l_discount"))

  test("a fitted pipeline with every stateful family round-trips exactly") {
    val pipe = new Pipeline(Seq(
      "impute" -> new MeanMedianImputer(Seq("qty"), "mean"),
      "indicator" -> new AddMissingIndicator(Seq("qty")),
      "catimp" -> new CategoricalImputer(Seq("l_returnflag")),
      "onehot" -> new OneHotEncoder(Seq("l_returnflag")),
      "count" -> new CountFrequencyEncoder(Seq("l_returnflag")),
      "winsor" -> new Winsorizer(Seq("l_extendedprice"), 0.05, 0.95, exact = true),
      "math" -> new MathFeatures(Seq(
        "disc_price" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))))),
      "cyc" -> new CyclicalFeatures(Seq(("d_sin", "l_discount", 0.1, CyclicalFn.Sin))),
      "rel" -> new RelativeFeatures(Seq(
        ("ratio", "l_extendedprice", "qty", RelativeOp.Ratio))),
      "disc" -> new EqualWidthDiscretizer(Seq("qty"), 4),
      "dt" -> new DatetimeFeatures(Seq("l_shipdate")),
      "log" -> new LogTransformer(Seq("l_extendedprice")),
      "std" -> new StandardScaler(Seq("l_discount")),
      "minmax" -> new MinMaxScaler(Seq("l_extendedprice")),
      "robust" -> new RobustScaler(Seq("l_extendedprice"), exact = true),
      "selconst" -> new DropConstantFeatures(1e-12, 0L),
    ))
    val expected = pipe.fit(base) // fits every step
    val json = ModelIO.toJsonString(pipe)
    val loaded = ModelIO.fromJsonString(json)
    loaded.steps.map(_._1) shouldBe pipe.steps.map(_._1)
    val actual = loaded.transform(base)
    actual.columns.toSeq shouldBe expected.columns.toSeq
    actual.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(actual).count() shouldBe 0
    // and a second round trip is byte-stable (canonical field order)
    ModelIO.toJsonString(ModelIO.fromJsonString(json)) shouldBe json
  }

  test("selection, outliers, encoders with learned state survive the trip") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_quantity"), (col("l_quantity") * 2.0).as("qty2"), col("l_discount"))
    val pipe = new Pipeline(Seq(
      "ord" -> new OrdinalEncoder(Seq("l_returnflag")),
      "trim" -> new OutlierTrimmer(Seq("l_quantity"), 0.05, 0.95, exact = true),
      "corr" -> new DropCorrelatedFeatures(0.95),
    ))
    val expected = pipe.fit(df)
    val loaded = ModelIO.fromJsonString(ModelIO.toJsonString(pipe))
    val actual = loaded.transform(df)
    actual.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(actual).count() shouldBe 0
  }

  test("save/load files; unfitted stateful steps stay unfitted; bad input errors") {
    val p = java.nio.file.Files.createTempFile("graft_model", ".json").toString
    val pipe = new Pipeline(Seq("imp" -> new MeanMedianImputer(Seq("qty"), "mean")))
    ModelIO.save(pipe, p) // never fitted
    val loaded = ModelIO.load(spark, p)
    a[FitNotCalled] should be thrownBy loaded.transform(base)
    an[InvalidParameter] should be thrownBy
      ModelIO.fromJsonString("""{"version":99,"steps":[]}""")
    an[InvalidParameter] should be thrownBy
      ModelIO.fromJsonString(
        """{"version":1,"steps":[{"name":"x","conf":{"type":"NoSuchThing"}}]}""")
  }
}
