package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_warc_records(content): parse one WARC (ISO 28500) file's bytes —
  * the Common-Crawl ingest container — into an array of record structs
  * (warc_type, record_id, target_uri, warc_date, content_type,
  * content_length, payload). WET files are WARC files whose records are
  * `conversion` text, so the same parser covers both.
  *
  * Parsing rules:
  *  - gzip input is detected by magic (1f 8b) and decompressed inline;
  *    multi-member gzip (Common Crawl's one-member-per-record layout)
  *    concatenates naturally through GZIPInputStream;
  *  - a record is a `WARC/x.y` version line, `Key: value` headers up to a
  *    blank line, then exactly Content-Length payload bytes; record
  *    separators (CRLF CRLF, or any CR/LF run) are skipped. Both CRLF and
  *    bare-LF line endings are accepted;
  *  - the payload decodes as UTF-8 with invalid sequences replaced (the
  *    text-pipeline reading; binary payloads belong to
  *    [[graft.ops.Multimodal]]'s binary columns, not this reader);
  *  - parsing is LENIENT at the tail: a truncated or malformed trailing
  *    record (no version line, no Content-Length, or fewer payload bytes
  *    than declared) ends the parse with the records read so far — a
  *    100 TB crawl ingest must not abort on one torn file. Absent optional
  *    headers yield NULL fields.
  *
  * This is a per-FILE expression (one row per WARC file, via the binaryFile
  * source), not a per-row hot path: the cost is the file scan itself, so
  * the codegen wrapper just calls the kernel like the other graft kernels.
  */
case class WarcRecords(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType =
    ArrayType(WarcRecords.recordType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${TilePairs.WarcName} expects (binary)")

  private val empty = new GenericArrayData(Array.empty[Any])

  def compute(raw: Array[Byte]): ArrayData = {
    if (raw == null || raw.length == 0) return empty
    val bytes = WarcRecords.maybeGunzip(raw)
    val out = new ArrayBuffer[Any]
    var p = 0
    val n = bytes.length

    def readLine(): String = {
      var i = p
      while (i < n && bytes(i) != '\n') i += 1
      var end = i
      if (end > p && bytes(end - 1) == '\r') end -= 1
      val s = new String(bytes, p, end - p, java.nio.charset.StandardCharsets.UTF_8)
      p = if (i < n) i + 1 else n
      s
    }

    var ok = true
    while (ok && p < n) {
      // skip inter-record CR/LF runs
      while (p < n && (bytes(p) == '\r' || bytes(p) == '\n')) p += 1
      if (p >= n) ok = false
      else {
        val version = readLine()
        if (!version.startsWith("WARC/")) ok = false
        else {
          val headers = scala.collection.mutable.Map.empty[String, String]
          var line = readLine()
          while (line.nonEmpty) {
            val i = line.indexOf(':')
            if (i > 0)
              headers(line.substring(0, i).trim.toLowerCase) =
                line.substring(i + 1).trim
            line = readLine()
          }
          headers.get("content-length").flatMap(_.toLongOption) match {
            case Some(len) if len >= 0 && p + len <= n =>
              val payload = new String(bytes, p, len.toInt,
                java.nio.charset.StandardCharsets.UTF_8)
              p += len.toInt
              def h(k: String): UTF8String =
                headers.get(k).map(UTF8String.fromString).orNull
              out += InternalRow(
                h("warc-type"), h("warc-record-id"), h("warc-target-uri"),
                h("warc-date"), h("content-type"), len,
                UTF8String.fromString(payload))
            case _ => ok = false // truncated/malformed tail: stop, keep prefix
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("kernel", this)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $ref.compute(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object WarcRecords {

  /** One parsed record: the five standard headers a curation chain keys on
    * (NULL when absent), the declared length, and the UTF-8 payload. */
  val recordType: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Inflate iff the gzip magic leads; multi-member streams concatenate. */
  private[functions] def maybeGunzip(raw: Array[Byte]): Array[Byte] =
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw))
      try in.readAllBytes() finally in.close()
    } else raw
}
