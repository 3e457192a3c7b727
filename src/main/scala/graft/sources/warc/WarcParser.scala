package graft.sources.warc

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** One parsed WARC (ISO 28500) record: the five standard headers a curation
  * chain keys on (null when absent), the declared length, and the UTF-8
  * payload. WET files are WARC files whose records are `conversion` text,
  * so the same parser covers both. */
final case class WarcRecord(
    warcType: String,
    recordId: String,
    targetUri: String,
    warcDate: String,
    contentType: String,
    contentLength: Long,
    payload: String)

/** STREAMING WARC record iterator — the memory contract that makes crawl
  * ingest work: only ONE record is materialized at a time (bounded by the
  * largest single record, never by the archive), so a multi-gigabyte
  * inflated .warc.gz parses in constant memory. This is what the
  * [[WarcDataSource]] partition reader drives, one row per record.
  *
  * Parsing rules:
  *  - a record is a `WARC/x.y` version line, `Key: value` headers up to a
  *    blank line, then exactly Content-Length payload bytes; record
  *    separators (CRLF CRLF, or any CR/LF run) are skipped; bare-LF line
  *    endings are accepted;
  *  - the payload decodes as UTF-8 with invalid sequences replaced (the
  *    text-pipeline reading; binary payloads belong to
  *    [[graft.ops.Multimodal]]'s binary columns);
  *  - LENIENT tail: a truncated or malformed trailing record (no version
  *    line, no Content-Length, or fewer payload bytes than declared) ends
  *    the iteration with the records read so far — a 100 TB crawl ingest
  *    must not abort on one torn file. A single record whose payload
  *    exceeds [[WarcRecordIterator.MaxPayloadBytes]] is SKIPPED (its bytes
  *    are consumed) and iteration continues with the next record.
  *
  * The caller owns the stream (close it when done; [[WarcDataSource]]'s
  * reader does). gzip decompression is the caller's wrapping —
  * [[WarcDataSource.maybeGunzip]] sniffs the magic.
  *
  * `decodePayload = false` (the column-pruned read) SKIPS every payload's
  * bytes instead of allocating and UTF-8-decoding them — payload comes
  * back null; framing, headers, content_length, AND which records are
  * emitted (including the oversized-skip rule) are identical to the
  * decoding read, so row counts and record indexes never depend on the
  * projection.
  */
final class WarcRecordIterator(
    in: InputStream,
    decodePayload: Boolean = true,
    maxPayloadBytes: Long = WarcRecordIterator.MaxPayloadBytes)
    extends Iterator[WarcRecord] {

  private val buf = new BufferedInputStream(in, 1 << 16)
  private var pending: WarcRecord = null
  private var done = false

  /** Bytes up to (excluding) the next LF, CR stripped; null at clean EOF. */
  private def readLine(): String = {
    var b = buf.read()
    if (b == -1) return null
    val bo = new ByteArrayOutputStream(128)
    while (b != -1 && b != '\n') { bo.write(b); b = buf.read() }
    val bytes = bo.toByteArray
    val len =
      if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
      else bytes.length
    new String(bytes, 0, len, UTF_8)
  }

  private def readFully(dst: Array[Byte]): Boolean = {
    var off = 0
    while (off < dst.length) {
      val n = buf.read(dst, off, dst.length - off)
      if (n == -1) return false
      off += n
    }
    true
  }

  private def skipFully(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = buf.skip(left)
      if (s > 0) left -= s
      else if (buf.read() == -1) return false // skip() can return 0 at EOF
      else left -= 1
    }
    true
  }

  @scala.annotation.tailrec
  private def advance(): Unit = {
    if (done) return
    var line = readLine()
    while (line != null && line.isEmpty) line = readLine()
    if (line == null || !line.startsWith("WARC/")) { done = true; return }
    val headers = scala.collection.mutable.Map.empty[String, String]
    var h = readLine()
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      if (i > 0) headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
      h = readLine()
    }
    if (h == null) { done = true; return } // header block truncated
    headers.get("content-length").flatMap(_.toLongOption) match {
      case Some(len) if len >= 0 && len <= maxPayloadBytes =>
        val payload =
          if (decodePayload) {
            val bytes = new Array[Byte](len.toInt)
            if (!readFully(bytes)) { done = true; return } // payload truncated
            new String(bytes, UTF_8)
          } else {
            if (!skipFully(len)) { done = true; return }
            null
          }
        def g(k: String): String = headers.getOrElse(k, null)
        pending = WarcRecord(
          g("warc-type"), g("warc-record-id"), g("warc-target-uri"),
          g("warc-date"), g("content-type"), len, payload)
      case Some(len) if len > maxPayloadBytes =>
        // oversized single record: consume and move on (skip, don't abort).
        // Skipped in BOTH projection modes — a pruned census and a full
        // read must agree on row count and record_index, or a join on
        // (warc_file, record_index) would pair the wrong records
        if (!skipFully(len)) { done = true; return }
        advance()
      case _ => done = true // no/invalid Content-Length: unframeable tail
    }
  }

  override def hasNext: Boolean = {
    if (pending == null && !done) advance()
    pending != null
  }

  override def next(): WarcRecord = {
    if (!hasNext) throw new NoSuchElementException("WarcRecordIterator")
    val r = pending
    pending = null
    r
  }
}

object WarcRecordIterator {
  /** Largest single-record payload materialized (a String needs an Int
    * array); records beyond this are skipped, not fatal. */
  val MaxPayloadBytes: Long = Int.MaxValue - 16L
}
