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

/** graft_exif_orientation(payload): the EXIF Orientation tag (1-8) of a
  * JPEG payload, or NULL — the bit a pipeline needs to INTERPRET
  * [[JpegDims]] (orientations 5-8 transpose width and height on
  * display). Three bounded walks composed: the [[JpegDims]] MARKER walk
  * to the APP1 segment bearing the `Exif\0\0` header, then the TIFF
  * structure inside it — the byte-order mark (`II` little / `MM` big
  * endian, BOTH real: phone makers split roughly down the middle), the
  * 42 magic, the IFD0 offset — then one IFD ENTRY scan (12-byte
  * entries: tag, type, count, value) for tag 0x0112 as an inline SHORT,
  * read under the declared byte order. Entry count capped at 512
  * (a real IFD0 has dozens); values outside 1-8 are malformed → NULL.
  * All offsets are validated against the segment, so a truncated or
  * lying EXIF can never read out of bounds. */
case class ExifOrientation(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = TilePairs.ExifOrientationName

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_exif_orientation expects a binary input")

  def compute(bytes: Array[Byte]): Any = {
    val n = bytes.length
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    if (n < 4 || u(0) != 0xff || u(1) != 0xd8) return null
    // marker walk (the JpegDims chain) to an APP1 segment with Exif\0\0
    var pos = 2
    while (pos + 3 < n) {
      if (u(pos) != 0xff) return null
      var code = u(pos + 1)
      while (code == 0xff && pos + 2 < n) { pos += 1; code = u(pos + 1) }
      if (code == 0xff) return null
      if (code == 0xd8 || code == 0x01 || (code >= 0xd0 && code <= 0xd7)) {
        pos += 2
      } else if (code == 0xd9 || code == 0xda) {
        return null // entropy data reached without an EXIF APP1
      } else {
        if (pos + 3 >= n) return null
        val len = be16(pos + 2)
        if (len < 2) return null
        val segEnd = pos + 2 + len // one past the segment's last byte
        if (code == 0xe1 && segEnd <= n && len >= 16 &&
          bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
          bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
          bytes(pos + 8) == 0 && bytes(pos + 9) == 0) {
          // TIFF header starts after Exif\0\0; all offsets are relative to it
          val t = pos + 10
          if (t + 8 > segEnd) return null
          val little =
            if (bytes(t) == 'I' && bytes(t + 1) == 'I') true
            else if (bytes(t) == 'M' && bytes(t + 1) == 'M') false
            else return null
          def r16(i: Int): Int =
            if (little) u(i) | (u(i + 1) << 8) else be16(i)
          def r32(i: Int): Long =
            if (little)
              u(i).toLong | (u(i + 1).toLong << 8) |
                (u(i + 2).toLong << 16) | (u(i + 3).toLong << 24)
            else
              (u(i).toLong << 24) | (u(i + 1).toLong << 16) |
                (u(i + 2).toLong << 8) | u(i + 3).toLong
          if (r16(t + 2) != 42) return null
          val ifd = t + r32(t + 4)
          if (ifd < t || ifd + 2 > segEnd) return null
          val count = math.min(r16(ifd.toInt), 512)
          var e = 0
          while (e < count) {
            val at = ifd.toInt + 2 + 12 * e
            if (at + 12 > segEnd) return null
            if (r16(at) == 0x0112 && r16(at + 2) == 3 && r32(at + 4) == 1L) {
              val v = r16(at + 8) // inline SHORT, endianness applies
              return if (v >= 1 && v <= 8) Integer.valueOf(v) else null
            }
            e += 1
          }
          return null // APP1/Exif present, no orientation tag
        }
        pos = segEnd
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
      Object ${ev.value}_o = null;
      if (!${c.isNull}) ${ev.value}_o = $ref.compute(${c.value});
      boolean ${ev.isNull} = ${ev.value}_o == null;
      int ${ev.value} = ${ev.isNull} ? -1 : ((Integer) ${ev.value}_o).intValue();
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Shared shape of the codec-free media-duration kernels: binary in,
  * `[numerator, denominator]` out (duration = num/denom seconds — the
  * integer pair, not the division, so any SQL engine replays the exact
  * arithmetic), NULL for unparseable bytes. Same whole-stage-codegen
  * convention as [[JpegDims]]. */
private[functions] trait MediaDuration extends Expression {
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(bytes: Array[Byte]): ArrayData

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary input")

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
}

/** graft_riff_duration(payload): `[data_bytes, byte_rate]` of a RIFF/WAVE
  * payload — audio duration without a codec. A CHUNK WALK (the RIFF
  * sibling of [[JpegDims]]' marker walk): each chunk declares a
  * little-endian 32-bit size and pads to EVEN offsets (the classic
  * RIFF gotcha — an odd-sized LIST chunk shifts every later chunk by
  * one byte if the pad is forgotten; the fixture injects exactly that),
  * `fmt ` carries the byte rate at body offset 8, `data` carries the
  * payload size in its own header — so a TRUNCATED capture (header
  * present, audio bytes cut) still yields its declared duration, which
  * is precisely what a crawl pipeline wants to know. NULL for non-WAVE
  * bytes, a zero byte rate, or a walk that runs off the payload. */
case class RiffDuration(child: Expression) extends MediaDuration {
  override def prettyName: String = TilePairs.RiffDurationName

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    def u(i: Int): Long = (bytes(i) & 0xff).toLong
    def le32(i: Int): Long = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    def tag(i: Int, s: String): Boolean =
      (0 until 4).forall(k => bytes(i + k) == s.charAt(k).toByte)
    if (n < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var pos = 12
    var byteRate = -1L
    var dataSize = -1L
    while (pos + 8 <= n && (byteRate < 0 || dataSize < 0)) {
      val size = le32(pos + 4)
      val body = pos + 8
      if (tag(pos, "fmt ") && size >= 16 && body + 12 + 4 <= n)
        byteRate = le32(body + 8)
      else if (tag(pos, "data"))
        dataSize = size
      pos = body + size.toInt + (size.toInt & 1) // chunks pad to even
      if (size < 0 || pos < body) return null // declared-size overflow
    }
    if (byteRate <= 0 || dataSize < 0) null
    else new GenericArrayData(Array(dataSize, byteRate))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** graft_mp4_duration(payload): `[duration, timescale]` from an
  * ISO-BMFF (mp4/mov) payload's `moov`→`mvhd` header — video duration
  * without a codec. A BOX WALK: big-endian 32-bit sizes that INCLUDE the
  * 8-byte header; `size == 1` switches to a 64-bit largesize (the
  * >4 GiB convention — the fixture injects it on a skip box) and
  * `size == 0` means "to end of file". `mvhd` version 0 stores 32-bit
  * timescale/duration at body offsets 12/16, version 1 pushes them to
  * 20/24 with a 64-bit duration (both shapes in the fixture). Only the
  * top level and the `moov` children are walked — mdat is skipped by
  * its declared size, so a truncated capture with an intact moov still
  * answers. NULL for non-BMFF bytes, zero timescale, or a malformed
  * walk. */
case class Mp4Duration(child: Expression) extends MediaDuration {
  override def prettyName: String = TilePairs.Mp4DurationName

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    def u(i: Int): Long = (bytes(i) & 0xff).toLong
    def be32(i: Int): Long = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int, s: String): Boolean =
      (0 until 4).forall(k => bytes(i + k) == s.charAt(k).toByte)
    if (n < 12 || !tag(4, "ftyp")) return null
    // walk one box level in [from, to); returns the mvhd pair or null
    def walk(from: Long, to: Long, inMoov: Boolean): ArrayData = {
      var pos = from
      while (pos + 8 <= to) {
        var size = be32(pos.toInt)
        var hdr = 8L
        if (size == 1L) {
          if (pos + 16 > to) return null
          size = be64(pos.toInt + 8); hdr = 16L
        } else if (size == 0L) size = to - pos // box runs to EOF
        if (size < hdr || pos + size > to) return null
        val body = pos + hdr
        if (!inMoov && tag(pos.toInt + 4, "moov")) {
          val r = walk(body, pos + size, inMoov = true)
          if (r != null) return r
        } else if (inMoov && tag(pos.toInt + 4, "mvhd")) {
          val b = body.toInt
          if (b >= n || body + 4 > to) return null
          val version = u(b)
          if (version == 1L) {
            if (body + 32 > to) return null
            val ts = be32(b + 20)
            val dur = be64(b + 24)
            return if (ts <= 0) null else new GenericArrayData(Array(dur, ts))
          } else {
            if (body + 20 > to) return null
            val ts = be32(b + 12)
            val dur = be32(b + 16)
            return if (ts <= 0) null else new GenericArrayData(Array(dur, ts))
          }
        }
        pos += size
      }
      null
    }
    walk(0L, n.toLong, inMoov = false)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
