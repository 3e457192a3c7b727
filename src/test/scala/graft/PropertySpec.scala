package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.transformers._

/** ScalaCheck property tests (SURVEY §5): invariants the reference's
  * hand-computed fixtures cannot cover — randomized datasets through real
  * Spark execution. Few trials per property (each trial runs Spark jobs);
  * the properties are deterministic given the generated data. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  private val dataGen: Gen[List[(Option[Double], String)]] =
    Gen.listOfN(
      25,
      Gen.zip(
        Gen.option(Gen.choose(-100.0, 100.0)),
        Gen.oneOf("a", "b", "c", "d")))

  test("property: imputation fills every null and never touches non-null values") {
    check(Prop.forAll(dataGen) { rows =>
      rows.exists(_._1.isDefined) ==> {
        val df = rows.map { case (v, s) => (v.map(Double.box).orNull, s) }
          .toDF("v", "s")
        val out = new MeanMedianImputer(Seq("v"), "mean").fitTransform(df)
          .select("v").collect().map(_.getDouble(0))
        val mean = rows.flatMap(_._1).sum / rows.count(_._1.isDefined)
        rows.map(_._1).zip(out).forall {
          case (Some(orig), got) => got == orig // untouched
          case (None, got) => math.abs(got - mean) < 1e-9 // filled with the mean
        }
      }
    })
  }

  test("property: winsorizing clamps into the learned bounds and is idempotent") {
    check(Prop.forAll(dataGen) { rows =>
      rows.count(_._1.isDefined) >= 3 ==> {
        val df = rows.map { case (v, s) => (v.map(Double.box).orNull, s) }
          .toDF("v", "s")
        val w = new Winsorizer(Seq("v"), 0.1, 0.9, exact = true)
        val once = w.fitTransform(df)
        val twice = w.transform(once)
        val a = once.select("v").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
        val b = twice.select("v").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
        val (lo, hi) = w.boundsLearned("v")
        a.sameElements(b) && a.forall(v => v == null || (v.asInstanceOf[Double] >= lo && v.asInstanceOf[Double] <= hi))
      }
    })
  }

  test("property: equal-width bins label every in-range value (no null labels)") {
    check(Prop.forAll(dataGen) { rows =>
      val vals = rows.flatMap(_._1)
      (vals.size >= 3 && (vals.max - vals.min) > 1e-3) ==> {
        val df = vals.map(Tuple1(_)).toDF("v")
        val out = new EqualWidthDiscretizer(Seq("v"), 4).fitTransform(df)
        out.filter(col("v").isNull).count() == 0L
      }
    })
  }

  test("property: one-hot indicators sum to 1 per non-null row and keep the column") {
    check(Prop.forAll(dataGen) { rows =>
      val df = rows.map { case (v, s) => (v.map(Double.box).orNull, s) }
        .toDF("v", "s")
      val out = new OneHotEncoder(Seq("s")).fitTransform(df)
      val indCols = out.columns.filter(_.startsWith("s_"))
      val sums = out
        .select(indCols.map(col).reduce(_ + _).as("sum"))
        .collect().map(_.getInt(0))
      out.columns.contains("s") && sums.forall(_ == 1)
    })
  }

  test("property: ordinal encoding is the rank in alphabetical category order") {
    check(Prop.forAll(dataGen) { rows =>
      val df = rows.map(_._2).map(Tuple1(_)).toDF("s")
      val cats = rows.map(_._2).distinct.sorted
      val out = new OrdinalEncoder(Seq("s")).fitTransform(df)
        .collect().map(_.getLong(0))
      rows.map(_._2).zip(out).forall { case (s, code) => code == cats.indexOf(s).toLong }
    })
  }

  private val numGen: Gen[List[Double]] =
    Gen.listOfN(20, Gen.choose(-1000.0, 1000.0))

  test("property: StandardScaler output has mean ~0 and population std ~1") {
    check(Prop.forAll(numGen) { xs =>
      (xs.distinct.size > 1) ==> {
        val out = new StandardScaler(Seq("x"))
          .fitTransform(xs.map(Tuple1(_)).toDF("x"))
          .collect().map(_.getDouble(0))
        val mean = out.sum / out.length
        val varp = out.map(v => (v - mean) * (v - mean)).sum / out.length
        math.abs(mean) < 1e-9 && math.abs(varp - 1.0) < 1e-9
      }
    })
  }

  test("property: MinMaxScaler output spans exactly [0, 1] and preserves order") {
    check(Prop.forAll(numGen) { xs =>
      (xs.distinct.size > 1) ==> {
        val out = new MinMaxScaler(Seq("x"))
          .fitTransform(xs.map(Tuple1(_)).toDF("x"))
          .collect().map(_.getDouble(0))
        val sortedIn = xs.zipWithIndex.sortBy(_._1).map(_._2)
        val sortedOut = out.zipWithIndex.sortBy(_._1).map(_._2)
        out.min == 0.0 && out.max == 1.0 && sortedIn == sortedOut.toList
      }
    })
  }

  test("property: hashSample keeps a subset, deterministically, within bounds") {
    check(Prop.forAll(Gen.choose(0, 100)) { pct =>
      val df = (1L to 500L).map(Tuple1(_)).toDF("id")
      val a = graft.ops.Sampling.hashSample(df, "id", pct).collect().map(_.getLong(0)).toSet
      val b = graft.ops.Sampling.hashSample(df, "id", pct).collect().map(_.getLong(0)).toSet
      a == b && a.size <= 500 && (pct != 0 || a.isEmpty) && (pct != 100 || a.size == 500)
    })
  }
}
