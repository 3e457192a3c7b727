package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_jpeg_dims(payload): `[width, height]` of a JPEG payload from its
  * SOF (start-of-frame) header — NULL for non-JPEG bytes, truncated
  * headers, or a stream with no SOF before SOS/EOI. No codec: JPEG frame
  * dimensions live in the SOF segment, which floats at a VARIABLE offset
  * behind APPn/DQT/DHT/COM segments, so extraction is a bounded MARKER
  * WALK — each segment declares its own length, the walk jumps segment to
  * segment (O(#segments), never a byte scan of entropy-coded data, never
  * a decode).
  *
  * ISO/IEC 10918-1 framing handled: the mandatory FFD8 SOI magic; fill
  * bytes (padding FFs before a marker code); standalone markers with no
  * length field (TEM, RST0-7, a doubled SOI); every SOF variant C0-CF
  * except the non-frame C4 (DHT), C8 (JPG extension), CC (DAC); big-endian
  * segment lengths that INCLUDE their own two bytes (a declared length
  * < 2 is malformed → NULL — progress is always forward, the walk cannot
  * loop). SOS (FFDA) or EOI (FFD9) before any SOF → NULL: dimensions
  * must precede entropy-coded data.
  *
  * `doGenCode` calls straight into [[compute]], so the projection stays
  * inside whole-stage codegen (the [[ShingleHashes]] convention).
  * Bit-parity with the pure-Column `aggregate`-fold fallback in
  * [[graft.ops.Multimodal.jpegDimsFallback]] is pinned in FunctionsSpec. */
case class JpegDims(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_jpeg_dims expects a binary input")

  def compute(bytes: Array[Byte]): ArrayData = {
    if (bytes == null) return null
    val n = bytes.length
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Long = ((u(i) << 8) | u(i + 1)).toLong
    if (n < 4 || u(0) != 0xff || u(1) != 0xd8) return null
    var pos = 2
    while (pos + 3 < n) {
      if (u(pos) != 0xff) return null // lost framing: not at a marker
      var code = u(pos + 1)
      // fill bytes: any number of FFs may pad before the marker code
      while (code == 0xff && pos + 2 < n) { pos += 1; code = u(pos + 1) }
      if (code == 0xff) return null // trailing fill, no code byte
      if (code == 0xd8 || code == 0x01 || (code >= 0xd0 && code <= 0xd7)) {
        pos += 2 // standalone marker: no length field
      } else if (code == 0xd9 || code == 0xda) {
        return null // EOI / SOS before any SOF: no dimensions declared
      } else {
        if (pos + 3 >= n) return null
        val len = be16(pos + 2)
        if (len < 2) return null // malformed: length includes itself
        val isSof = code >= 0xc0 && code <= 0xcf &&
          code != 0xc4 && code != 0xc8 && code != 0xcc
        if (isSof) {
          // segment: len(2) precision(1) height(2) width(2) ...
          if (pos + 8 >= n || len < 7) return null
          val h = be16(pos + 5)
          val w = be16(pos + 7)
          return new GenericArrayData(Array(w, h))
        }
        pos += 2 + len.toInt
      }
    }
    null
  }

  override def eval(input: InternalRow): Any = {
    val b = child.eval(input).asInstanceOf[Array[Byte]]
    if (b == null) null else compute(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("kernel", this)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) ${ev.value} = $ref.compute(${c.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
