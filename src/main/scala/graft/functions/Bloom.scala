package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Shared bit math for the bloom build aggregate and the membership probe.
  *
  * Layout: the filter is a little-endian packed bit array, so global bit
  * index `i` lives in byte `i >>> 3` at position `i & 7` — identical whether
  * the filter is addressed as `Array[Long]` words (build side) or raw bytes
  * (probe side). Probes use Kirsch–Mitzenmacher double hashing
  * (`h1 + i·h2`) over two splitmix64 finalizer mixes of the key, so build
  * and probe agree without sharing any per-row state. */
object BloomRuntime {

  /** splitmix64 finalizer: full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private final val SecondSeed = 0x517cc1b727220a95L

  /** Set the `numHashes` probe bits of `value` in the word-packed filter. */
  def setBits(words: Array[Long], value: Long, numHashes: Int): Unit = {
    val bits = words.length.toLong * 64L
    val h1 = mix(value)
    val h2 = mix(value ^ SecondSeed) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, bits)
      words((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  /** True iff every probe bit of `value` is set (possible false positives,
    * never false negatives). A null/empty filter contains nothing. */
  def mightContain(bytes: Array[Byte], value: Long, numHashes: Int): Boolean = {
    if (bytes == null || bytes.length == 0) return false
    val bits = bytes.length.toLong * 8L
    val h1 = mix(value)
    val h2 = mix(value ^ SecondSeed) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, bits)
      if (((bytes((idx >>> 3).toInt) >> (idx & 7L).toInt) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** graft_bloom_agg(keys, numBits, numHashes): builds a bloom filter over a
  * LONG key column as ONE binary value — map-side partials are bit-ORed, so
  * the shuffle moves `numBits/8` bytes per partition regardless of row
  * count. The output binary feeds [[BloomMightContain]] via a one-row
  * broadcast: the canonical 100-TB semi-join prefilter when the build side
  * is too large to broadcast raw but its bloom (≈2 bytes/key at 1% fp with
  * k=5) still fits. Null keys are skipped (a bloom has no null membership).
  *
  * numBits is rounded up to a multiple of 64 and capped at 2³¹−64
  * (a 256 MB filter — beyond that, shard the build side instead). */
case class BloomBuildAgg(
    child: Expression,
    numBits: Expression,
    numHashes: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, numBits, numHashes)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = TilePairs.BloomAggName

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && numBits.foldable &&
      (numBits.dataType == IntegerType || numBits.dataType == LongType) &&
      numHashes.foldable && numHashes.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_agg expects (bigint, foldable int/bigint numBits, foldable int numHashes)")

  private lazy val words: Int = {
    val requested = numBits.eval().asInstanceOf[Number].longValue()
    require(requested > 0, s"graft_bloom_agg: numBits must be positive, got $requested")
    math.min((requested + 63) / 64, (Int.MaxValue.toLong + 1) / 64 - 1).toInt
  }
  private lazy val k: Int = {
    val v = numHashes.eval().asInstanceOf[Int]
    require(v >= 1 && v <= 32, s"graft_bloom_agg: numHashes must be in [1, 32], got $v")
    v
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomRuntime.setBits(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  private def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def eval(buf: Array[Long]): Any = toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), numBits = newChildren(1), numHashes = newChildren(2))
}

/** graft_bloom_contains(filter, key, numHashes): membership probe against a
  * [[BloomBuildAgg]] binary. False positives only — callers MUST exact-verify
  * survivors (graft's contamination op re-joins them against the true key
  * set), so the filter changes the plan, never the result. numHashes must
  * match the build. Null filter or null key → false. */
case class BloomMightContain(
    bloom: Expression,
    value: Expression,
    numHashes: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(bloom, value, numHashes)
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = TilePairs.BloomContainsName

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloom.dataType == BinaryType && value.dataType == LongType &&
      numHashes.foldable && numHashes.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects (binary, bigint, foldable int numHashes)")

  private lazy val k: Int = numHashes.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val b = bloom.eval(input)
    val v = value.eval(input)
    if (b == null || v == null) false
    else BloomRuntime.mightContain(b.asInstanceOf[Array[Byte]], v.asInstanceOf[Long], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = bloom.genCode(ctx)
    val v = value.genCode(ctx)
    ev.copy(code = code"""
      ${b.code}
      ${v.code}
      boolean ${ev.value} = !${b.isNull} && !${v.isNull} &&
        graft.functions.BloomRuntime.mightContain(${b.value}, ${v.value}, $k);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bloom = newChildren(0), value = newChildren(1), numHashes = newChildren(2))
}
