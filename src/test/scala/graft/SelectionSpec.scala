package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.transformers._
import graft.errors.FeatureFactoryException._

/** Fixtures from reference tests/test_transformers_feature_selection.rs:
  * selection df: a=const 1.0; b=[1,2,3,4]; c=dup of b; d=[1.1,2.1,3.1,4.1]
  * target df: target=[0,1,0,1,0,1]; x=target copy; y=const 1.0; z=[10,20,..]. */
class SelectionSpec extends SparkSpec {

  private lazy val selDf = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1.0, 1.0, 1.0, 1.1),
      Row(1.0, 2.0, 2.0, 2.1),
      Row(1.0, 3.0, 3.0, 3.1),
      Row(1.0, 4.0, 4.0, 4.1)),
    StructType(Seq("a", "b", "c", "d").map(StructField(_, DoubleType, nullable = true))))

  private lazy val tgtDf = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(0.0, 0.0, 1.0, 10.0),
      Row(1.0, 1.0, 1.0, 20.0),
      Row(0.0, 0.0, 1.0, 30.0),
      Row(1.0, 1.0, 1.0, 40.0),
      Row(0.0, 0.0, 1.0, 50.0),
      Row(1.0, 1.0, 1.0, 60.0)),
    StructType(Seq("target", "x", "y", "z").map(StructField(_, DoubleType, nullable = true))))

  test("DropFeatures drops named columns, errors when empty would remain") {
    val out = new DropFeatures(Seq("a", "c")).fitTransform(selDf)
    out.columns shouldBe Array("b", "d")
    an[InvalidParameter] should be thrownBy
      new DropFeatures(Seq("a", "b", "c", "d")).fitTransform(selDf)
    a[MissingColumn] should be thrownBy new DropFeatures(Seq("zzz")).fitTransform(selDf)
  }

  test("DropConstantFeatures drops zero-variance numerics") {
    val out = new DropConstantFeatures(1e-12, 1).fitTransform(selDf)
    out.columns shouldBe Array("b", "c", "d")
  }

  test("DropConstantFeatures drops low-cardinality categoricals") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("k", 1.0), Row("k", 2.0), Row("k", 3.0)),
      StructType(Seq(
        StructField("s", StringType), StructField("v", DoubleType))))
    val out = new DropConstantFeatures(1e-12, 1).fitTransform(df)
    out.columns shouldBe Array("v")
  }

  test("DropDuplicateFeatures drops the later duplicate column") {
    val out = new DropDuplicateFeatures().fitTransform(selDf)
    out.columns shouldBe Array("a", "b", "d") // c is a dup of b
  }

  test("DropCorrelatedFeatures drops lower-variance member of correlated pairs") {
    // b, c, d all perfectly correlated; variances equal for b/c, d same variance
    // b vs c: var equal → drops c (var_i < var_j false → drops j=c); b vs d: drops d or b
    val out = new DropCorrelatedFeatures(0.9).fitTransform(selDf)
    // a is constant (corr NaN, skipped). pairs (b,c): drop c; (b,d): tie → drop d; (c,d): both dropped already
    out.columns shouldBe Array("a", "b")
  }

  test("SmartCorrelatedSelection keeps one of each correlated group + non-numerics") {
    val out = new SmartCorrelatedSelection(0.9).fitTransform(selDf)
    out.columns shouldBe Array("a", "b")
  }

  test("DropHighPSIFeatures drops shifted columns, keeps stable ones") {
    // reference=[1,1,1.5,1.5,2,2,2.5,2.5,3,3]; current=10×4.0 → high PSI
    val refDf = spark.createDataFrame(
      java.util.Arrays.asList(
        Seq(1.0, 1.0, 1.5, 1.5, 2.0, 2.0, 2.5, 2.5, 3.0, 3.0).map(v => Row(v, 1.0)): _*),
      StructType(Seq(
        StructField("x", DoubleType), StructField("stable", DoubleType))))
    val curDf = spark.createDataFrame(
      java.util.Arrays.asList((1 to 10).map(_ => Row(4.0, 1.0)): _*),
      refDf.schema)
    val t = new DropHighPSIFeatures(refDf, 0.5)
    val out = t.fit(curDf).transform(curDf)
    out.columns shouldBe Array("stable")
  }

  test("SelectByInformationValue keeps informative features, target first") {
    val out = new SelectByInformationValue("target", 0.1).fitTransform(tgtDf)
    out.columns should contain ("x")
    out.columns.head shouldBe "target"
    out.columns should not contain "y" // constant → no information
  }

  test("SelectBySingleFeaturePerformance keeps |corr| >= threshold") {
    val out = new SelectBySingleFeaturePerformance("target", 0.9).fitTransform(tgtDf)
    out.columns shouldBe Array("target", "x") // x == target → corr 1; y const → NaN; z weak
  }

  test("SelectByTargetMeanPerformance keeps features whose median split separates target") {
    val out = new SelectByTargetMeanPerformance("target", 0.9).fitTransform(tgtDf)
    // x: median (sorted[3]) = 1.0 → group1 (x<1): targets 0,0,0 mean 0; group2: 1,1,1 mean 1 → diff 1
    out.columns should contain ("x")
    out.columns should not contain "y"
  }

  test("MRMR keeps relevant, non-redundant features") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0.0, 0.0, 0.0, 10.0),
        Row(1.0, 1.0, 1.0, 20.0),
        Row(0.0, 0.0, 0.0, 30.0),
        Row(1.0, 1.0, 1.0, 40.0),
        Row(0.0, 0.0, 0.0, 50.0),
        Row(1.0, 1.0, 1.0, 60.0)),
      StructType(Seq("target", "x", "x2", "z").map(StructField(_, DoubleType))))
    // x and x2 identical (corr 1, both relevance 1); z irrelevant
    val t = new MRMR("target", 0.8, 0.9)
    val out = t.fit(df).transform(df)
    out.columns.toSet shouldBe Set("target", "x") // x2 redundant with x, z below relevance
  }

  test("selection transformers require fit") {
    a[FitNotCalled] should be thrownBy new DropConstantFeatures(0.0, 0).transform(selDf)
    a[FitNotCalled] should be thrownBy new MRMR("target", 0.1, 0.9).transform(tgtDf)
  }

  test("nearestRankAll histogram path matches the sort path on real data") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"),
        when(col("l_orderkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("l_discount")).as("disc_nulls"))
    val cols = Seq("l_quantity", "l_extendedprice", "disc_nulls")
    val fractions = (0 to 10).map(_ / 10.0)
    val hist = SelectionUtil.nearestRankAll(df, cols, fractions)
    val sorted = cols.map(c => c -> SelectionUtil.nearestRank(df, c, fractions)).toMap
    hist shouldBe sorted
    // capped columns fall back to the sort path and still agree
    val saved = SelectionUtil.MaxHistogramValues
    val capped = try {
      SelectionUtil.MaxHistogramValues = 10 // l_extendedprice has far more
      SelectionUtil.nearestRankAll(df, cols, fractions)
    } finally SelectionUtil.MaxHistogramValues = saved
    capped shouldBe sorted
  }

  test("PSI and target-mean selectors survive MaxHistogramValues = 0 (pure rank path)") {
    // force EVERY column through the distributed nearestRank fallback and
    // require identical selector decisions on real data
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val refDf = li.limit(2000)
    def psiCols() = new DropHighPSIFeatures(refDf, 0.1).fit(li).transform(li).columns.toSeq
    val tm = li.withColumnRenamed("l_quantity", "target")
    def tmCols() = new SelectByTargetMeanPerformance("target", 0.05).fitTransform(tm).columns.toSeq
    val (psiDefault, tmDefault) = (psiCols(), tmCols())
    val saved = SelectionUtil.MaxHistogramValues
    val (psiForced, tmForced) = try {
      SelectionUtil.MaxHistogramValues = 0
      (psiCols(), tmCols())
    } finally SelectionUtil.MaxHistogramValues = saved
    psiForced shouldBe psiDefault
    tmForced shouldBe tmDefault
  }
}
