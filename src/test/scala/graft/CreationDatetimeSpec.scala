package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.transformers._
import graft.errors.FeatureFactoryException._

class CreationDatetimeSpec extends SparkSpec {

  test("MathFeatures appends arbitrary user expressions") {
    // fixture: x=[1,2,3]; y=[4,5,6] (test_transformers_feature_creation.rs:14-27)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1.0, 4.0), Row(2.0, 5.0), Row(3.0, 6.0)),
      StructType(Seq(
        StructField("x", DoubleType), StructField("y", DoubleType))))
    val out = new MathFeatures(Seq(
      "sum_xy" -> (col("x") + col("y")),
      "sqrt_x" -> sqrt(col("x")))).fitTransform(df)
    out.columns shouldBe Array("x", "y", "sum_xy", "sqrt_x")
    out.select("sum_xy").collect().map(_.getDouble(0)) shouldBe Array(5.0, 7.0, 9.0)
    an[InvalidParameter] should be thrownBy
      new MathFeatures(Seq("" -> col("x")))
  }

  test("RelativeFeatures ratio/difference/percent-change") {
    // fixture: target=[10,20,30]; reference=[2,4,5]
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(10.0, 2.0), Row(20.0, 4.0), Row(30.0, 5.0)),
      StructType(Seq(
        StructField("t", DoubleType), StructField("r", DoubleType))))
    val out = new RelativeFeatures(Seq(
      ("ratio", "t", "r", RelativeOp.Ratio),
      ("diff", "t", "r", RelativeOp.Difference),
      ("pct", "t", "r", RelativeOp.PercentChange))).fitTransform(df)
    out.select("ratio").collect().map(_.getDouble(0)) shouldBe Array(5.0, 5.0, 6.0)
    out.select("diff").collect().map(_.getDouble(0)) shouldBe Array(8.0, 16.0, 25.0)
    out.select("pct").collect().map(_.getDouble(0)) shouldBe Array(4.0, 4.0, 5.0)
  }

  test("CyclicalFeatures sin/cos with period") {
    // fixture: time=[0, 6, 12, 18], period 24
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(0.0), Row(6.0), Row(12.0), Row(18.0)),
      StructType(Seq(StructField("time", DoubleType))))
    val out = new CyclicalFeatures(Seq(
      ("t_sin", "time", 24.0, CyclicalFn.Sin),
      ("t_cos", "time", 24.0, CyclicalFn.Cos))).fitTransform(df)
    val sins = out.select("t_sin").collect().map(_.getDouble(0))
    assert(approxEqual(sins(0), 0.0))
    assert(approxEqual(sins(1), 1.0))
    assert(approxEqual(sins(2), 0.0, 1e-9))
    assert(approxEqual(sins(3), -1.0))
    an[InvalidParameter] should be thrownBy
      new CyclicalFeatures(Seq(("bad", "time", 0.0, CyclicalFn.Sin)))
  }

  test("DatetimeFeatures extracts parts; weekday is 0=Sunday..6=Saturday") {
    // fixture: 2023-03-01T12:34:56Z (Wednesday), 2022-12-31T23:59:59Z (Saturday),
    // 2021-01-01T00:00:00Z (Friday)  (test_transformers_datetime.rs:21-44)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Timestamp.valueOf("2023-03-01 12:34:56")),
        Row(Timestamp.valueOf("2022-12-31 23:59:59")),
        Row(Timestamp.valueOf("2021-01-01 00:00:00"))),
      StructType(Seq(StructField("ts", TimestampType))))
    val out = new DatetimeFeatures(Seq("ts")).fitTransform(df)
    out.columns should contain allOf ("ts_year", "ts_month", "ts_day", "ts_hour",
      "ts_minute", "ts_second", "ts_weekday")
    val rows = out.select("ts_year", "ts_month", "ts_day", "ts_hour", "ts_minute",
      "ts_second", "ts_weekday").collect()
    rows(0).toSeq shouldBe Seq(2023, 3, 1, 12, 34, 56, 3) // Wednesday = 3
    rows(1).toSeq shouldBe Seq(2022, 12, 31, 23, 59, 59, 6) // Saturday = 6
    rows(2).toSeq shouldBe Seq(2021, 1, 1, 0, 0, 0, 5) // Friday = 5
  }

  test("DatetimeSubtraction produces fractional differences per unit") {
    // fixture: Δ=296s ≈ 4.9333 min; Δ=3600s = 1h (test_transformers_datetime.rs:46-82)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Timestamp.valueOf("2023-03-01 12:34:56"), Timestamp.valueOf("2023-03-01 12:30:00")),
        Row(Timestamp.valueOf("2023-03-01 00:00:00"), Timestamp.valueOf("2023-02-28 23:00:00"))),
      StructType(Seq(
        StructField("ts1", TimestampType), StructField("ts2", TimestampType))))
    val out = new DatetimeSubtraction(Seq(
      ("d_min", "ts1", "ts2", TimeUnit.Minute),
      ("d_hour", "ts1", "ts2", TimeUnit.Hour))).fitTransform(df)
    val mins = out.select("d_min").collect().map(_.getDouble(0))
    assert(approxEqual(mins(0), 296.0 / 60.0, 1e-9))
    assert(approxEqual(mins(1), 60.0, 1e-9))
    val hours = out.select("d_hour").collect().map(_.getDouble(0))
    assert(approxEqual(hours(1), 1.0, 1e-9))
    a[MissingColumn] should be thrownBy
      new DatetimeSubtraction(Seq(("d", "nope", "ts2", TimeUnit.Second))).transform(df)
  }
}
