package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** graft_dot(a, b): Σ aᵢ·bᵢ in double precision, sequential in array order —
  * bit-identical to the `aggregate(zip_with(...))` fold it replaces, but a
  * native expression WITH CODEGEN: the generated code is a primitive loop
  * over the two ArrayData, so the similarity kernels stay inside
  * whole-stage codegen instead of dropping into the interpreted
  * higher-order-function evaluator per row. Accepts array&lt;float&gt; or
  * array&lt;double&gt; on either side. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch, like the HOF fold

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    // zip_with pads the shorter side with null and the fold propagates it:
    // the fallback yields NULL on a length mismatch, so the kernel must too
    if (arrA.numElements() != arrB.numElements()) return null
    val n = arrA.numElements()
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) arrA.getFloat(i).toDouble else arrA.getDouble(i)
      val y = if (bFloat) arrB.getFloat(i).toDouble else arrB.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (elemType(left) == FloatType) s"(double) $a.getFloat" else s"$a.getDouble"
      val getB = if (elemType(right) == FloatType) s"(double) $b.getFloat" else s"$b.getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getA($i) * $getB($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** graft_sqdist(a, b): Σ (aᵢ−bᵢ)² in double precision, sequential in array
  * order — bit-identical to the `aggregate(zip_with(...))` fold it replaces
  * (and to the DuckDB list-comprehension replay in the oracles), with
  * whole-stage codegen. Accepts array&lt;float&gt; or array&lt;double&gt;. */
case class SqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch, like the HOF fold

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_sqdist expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    // zip_with pads the shorter side with null and the fold propagates it:
    // the fallback yields NULL on a length mismatch, so the kernel must too
    if (arrA.numElements() != arrB.numElements()) return null
    val n = arrA.numElements()
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) arrA.getFloat(i).toDouble else arrA.getDouble(i)
      val y = if (bFloat) arrB.getFloat(i).toDouble else arrB.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (elemType(left) == FloatType) s"(double) $a.getFloat" else s"$a.getDouble"
      val getB = if (elemType(right) == FloatType) s"(double) $b.getFloat" else s"$b.getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $getA($i) - $getB($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}
