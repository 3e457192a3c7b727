package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_gram_sum(embedding, dims): the second-moment sufficient statistics
  * of a vector column in ONE aggregate pass — output array layout
  * `[count, sum_0 … sum_{d-1}, gram_00, gram_01 … gram_{d-1,d-1}]`
  * (1 + d + d² doubles). From these the driver derives mean and covariance
  * for PCA/whitening without a second scan: cov = (G − n·μμᵀ)/(n−1).
  *
  * The alternative pure-DataFrame formulation explodes d² product rows per
  * vector (245 M rows for 60 k × 64-dim) — this buffer does the same math
  * in a primitive loop with map-side partial aggregation, shuffling ONE
  * (1 + d + d²)-double buffer per partition. Null vectors are skipped;
  * rows with a different length than `dims` raise (corrupt input is better
  * loud than silently folded). */
case class GramSum(
    child: Expression,
    dims: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child, dims)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if dims.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_gram_sum expects (array<float|double>, foldable int dims)")
    }

  private lazy val d: Int = dims.eval().asInstanceOf[Number].intValue()
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](1 + d + d * d)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return buf
    require(arr.numElements() == d,
      s"graft_gram_sum: vector of length ${arr.numElements()}, expected $d")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      require(!arr.isNullAt(i), s"graft_gram_sum: null element at position $i")
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    while (i < d) {
      val xi = x(i)
      buf(1 + i) += xi
      val rowBase = 1 + d + i * d
      var j = 0
      while (j < d) {
        buf(rowBase + j) += xi * x(j)
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dims = newChildren(1))
}

/** graft_vec_sum(embedding, dims): first-moment statistics of a vector
  * column — output `[count, sum_0 … sum_{d-1}]` (1 + d doubles). The
  * per-GROUP companion of [[GramSum]] for centroid/prototype computation:
  * grouping the pure-DataFrame posexplode formulation shuffles rows × d
  * exploded values, this buffer shuffles one (1 + d)-double partial per
  * (group, partition). Null vectors are skipped; wrong-length vectors
  * raise (same contract as graft_gram_sum). */
case class VecSum(
    child: Expression,
    dims: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child, dims)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if dims.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_vec_sum expects (array<float|double>, foldable int dims)")
    }

  private lazy val d: Int = dims.eval().asInstanceOf[Number].intValue()
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](1 + d)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return buf
    require(arr.numElements() == d,
      s"graft_vec_sum: vector of length ${arr.numElements()}, expected $d")
    buf(0) += 1.0
    var i = 0
    while (i < d) {
      require(!arr.isNullAt(i), s"graft_vec_sum: null element at position $i")
      buf(1 + i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dims = newChildren(1))
}
