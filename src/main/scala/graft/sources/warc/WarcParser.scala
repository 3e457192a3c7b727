package graft.sources.warc

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** One parsed WARC (ISO 28500) record: the five standard headers a curation
  * chain keys on (null when absent), the declared length, and the UTF-8
  * payload. WET files are WARC files whose records are `conversion` text,
  * so the same parser covers both.
  *
  * For `application/http` records (Common Crawl `response`/`request`
  * blocks) the payload is the HTTP MESSAGE — status line + response
  * headers + CRLF CRLF + body. The parser strips that envelope:
  * `payload` is the BODY alone (gunzipped when the HTTP headers declare
  * `Content-Encoding: gzip`), and the envelope surfaces as
  * `httpStatus` (null unless the first line is an `HTTP/x` status line)
  * and `httpContentType` (the HTTP-level Content-Type header, where the
  * real MIME type of a response lives). Both are null for non-http
  * records (conversion/WET, warcinfo, metadata). `contentLength` stays
  * the record's DECLARED length (the framing truth), which for http
  * records includes the envelope. */
final case class WarcRecord(
    warcType: String,
    recordId: String,
    targetUri: String,
    warcDate: String,
    contentType: String,
    contentLength: Long,
    payload: String,
    httpStatus: Integer = null,
    httpContentType: String = null,
    httpLocation: String = null,
    httpRobotsTag: String = null,
    // true when an http body's declared Content-Encoding was NOT decoded
    // (brotli/compress/chained codings, or a failed decode): `payload`
    // still holds the coded bytes. Null for non-http records, like the
    // other http_* fields.
    httpCodingUnsupported: java.lang.Boolean = null,
    payloadDigest: String = null,
    truncated: String = null,
    // byte position of the record's version line in the stream the
    // iterator consumed, and the exact header+payload byte span (record
    // separators excluded) — the random-access coordinates a CDX index
    // stores. For a plain .warc these are FILE offsets; for .warc.gz
    // they are positions in the INFLATED stream (see the ranged-read
    // notes on [[WarcDataSource]]).
    offset: Long = -1L,
    length: Long = -1L)

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
  *  - the payload decodes under its DECLARED charset ([[WarcRecordIterator
  *    .decodeBody]]: the HTTP Content-Type `charset=` for http records,
  *    the WARC-level Content-Type otherwise, an HTML `<meta>` sniff as
  *    the middle fallback, UTF-8 last — always with invalid sequences
  *    replaced; binary payloads belong to [[graft.ops.Multimodal]]'s
  *    binary columns);
  *  - LENIENT tail: a truncated or malformed trailing record (no version
  *    line, no Content-Length, or fewer payload bytes than declared) ends
  *    the iteration with the records read so far — a 100 TB crawl ingest
  *    must not abort on one torn file. A single record whose payload
  *    exceeds [[WarcRecordIterator.MaxPayloadBytes]] is SKIPPED (its bytes
  *    are consumed) and iteration continues with the next record.
  *
  * The caller owns the stream (close it when done; [[WarcDataSource]]'s
  * reader does). gzip decompression is the caller's wrapping —
  * [[WarcDataSource.maybeDecompress]] sniffs the magic.
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
  // bytes CONSUMED from the stream so far — the iterator-level counter
  // that makes record offsets exact regardless of BufferedInputStream's
  // read-ahead (counting the underlying stream would measure buffer
  // fills, not logical position)
  private var pos: Long = 0L

  /** Bytes up to (excluding) the next LF, CR stripped; null at clean EOF. */
  private def readLine(): String = {
    var b = buf.read()
    if (b == -1) return null
    pos += 1
    val bo = new ByteArrayOutputStream(128)
    while (b != -1 && b != '\n') {
      bo.write(b)
      b = buf.read()
      if (b != -1) pos += 1
    }
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
      pos += n
      off += n
    }
    true
  }

  private def skipFully(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = buf.skip(left)
      if (s > 0) { pos += s; left -= s }
      else if (buf.read() == -1) return false // skip() can return 0 at EOF
      else { pos += 1; left -= 1 }
    }
    true
  }

  @scala.annotation.tailrec
  private def advance(): Unit = {
    if (done) return
    var lineStart = pos
    var line = readLine()
    while (line != null && line.isEmpty) { lineStart = pos; line = readLine() }
    if (line == null || !line.startsWith("WARC/")) { done = true; return }
    val recordStart = lineStart
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
        def g(k: String): String = headers.getOrElse(k, null)
        if (decodePayload) {
          val bytes = new Array[Byte](len.toInt)
          if (!readFully(bytes)) { done = true; return } // payload truncated
          val isHttp = headers.get("content-type")
            .exists(_.toLowerCase.startsWith("application/http"))
          // WARC-Payload-Digest surfaces on EVERY record kind — it is
          // how `revisit` records (Common Crawl's refetch dedup, ISO
          // 28500 §6.7) point back at the capture they duplicate; a
          // reader that drops it cannot tell "empty page" from
          // "duplicate of an earlier capture". WARC-Truncated likewise
          // (ISO 28500 §5.13): Common Crawl cuts bodies at ~1 MB and
          // marks them `length` — a quality pipeline must be able to
          // drop or flag cut documents.
          val digest = g("warc-payload-digest")
          val trunc = g("warc-truncated")
          pending =
            if (isHttp) {
              val env = WarcRecordIterator.stripHttpEnvelope(bytes)
              WarcRecord(
                g("warc-type"), g("warc-record-id"), g("warc-target-uri"),
                g("warc-date"), g("content-type"), len, env.body, env.status,
                env.contentType, env.location, env.robotsTag,
                java.lang.Boolean.valueOf(env.codingUnsupported), digest, trunc,
                offset = recordStart, length = pos - recordStart)
            } else
              WarcRecord(
                g("warc-type"), g("warc-record-id"), g("warc-target-uri"),
                g("warc-date"), g("content-type"), len,
                // non-http (conversion/WET, metadata): the WARC-level
                // Content-Type is where a declared charset lives
                WarcRecordIterator.decodeBody(bytes, g("content-type")),
                payloadDigest = digest, truncated = trunc,
                offset = recordStart, length = pos - recordStart)
        } else {
          if (!skipFully(len)) { done = true; return }
          pending = WarcRecord(
            g("warc-type"), g("warc-record-id"), g("warc-target-uri"),
            g("warc-date"), g("content-type"), len, null,
            payloadDigest = g("warc-payload-digest"),
            truncated = g("warc-truncated"),
            offset = recordStart, length = pos - recordStart)
        }
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

  /** Largest INFLATED http body materialized from a gzip content-coding
    * (256 MB — far past any real page, far short of heap trouble): a
    * decompression bomb must fall back to the raw captured bytes, not
    * inflate ~2 GB per task thread. Checked BEFORE each chunk is
    * buffered, so the bomb never allocates past the cap. */
  val MaxInflatedBodyBytes: Long = 1L << 28

  /** `charset=` token of a Content-Type value (HTTP or WARC level),
    * resolved to a JVM charset; None when absent/unknown/illegal —
    * decoding then falls through to the next source in
    * [[decodeBody]]'s chain. Quotes around the token are stripped
    * (`charset="ISO-8859-1"` is common in the wild). */
  private[warc] def charsetFrom(contentType: String): Option[java.nio.charset.Charset] = {
    if (contentType == null) return None
    val m = CharsetParam.matcher(contentType)
    if (!m.find()) None
    else
      try Some(java.nio.charset.Charset.forName(m.group(1)))
      catch { case _: IllegalArgumentException => None }
  }
  private val CharsetParam = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*\"?\\s*([A-Za-z0-9][A-Za-z0-9._:-]*)")

  /** HTML `<meta charset=…>` / `http-equiv Content-Type` sniff over the
    * first [[MetaSniffBytes]] of a body — where the charset lives when
    * the HTTP header only says `text/html`. The prefix is scanned as
    * ISO-8859-1 (byte-transparent for the ASCII the markup itself is
    * in), and the same `charset=` token rule applies to both meta
    * forms. */
  private[warc] def sniffMetaCharset(body: Array[Byte]): Option[java.nio.charset.Charset] = {
    val n = math.min(body.length, MetaSniffBytes)
    val head = new String(body, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = MetaCharset.matcher(head)
    if (!m.find()) None
    else
      try Some(java.nio.charset.Charset.forName(m.group(1)))
      catch { case _: IllegalArgumentException => None }
  }
  private val MetaSniffBytes = 1024
  private val MetaCharset = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]*charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9][A-Za-z0-9._:-]*)")

  /** Decode a record body honoring the DECLARED charset — the real-crawl
    * rule (a large fraction of the web is not UTF-8; decoding everything
    * as UTF-8 mojibakes quality filters, dedup shingles, and tokenizer
    * input silently): the Content-Type `charset=` parameter wins, else
    * an HTML `<meta>` sniff in the first KB, else UTF-8. Malformed
    * sequences are REPLACED, never thrown (the String constructor's
    * contract) — one mislabeled page must not abort a crawl task. */
  private[warc] def decodeBody(bytes: Array[Byte], contentType: String): String = {
    // WHATWG encoding sniff, step 1: a BYTE-ORDER MARK overrides any
    // declared charset (servers routinely mislabel BOM'd content), and
    // the BOM itself is not content — strip it from the decoded text
    // (a surviving U+FEFF would leak into shingles/tokens invisibly)
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return new String(bytes, 3, bytes.length - 3, UTF_8)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16LE)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)
    val cs = charsetFrom(contentType)
      .orElse(sniffMetaCharset(bytes))
      .getOrElse(UTF_8)
    new String(bytes, cs)
  }

  /** Reassemble a `Transfer-Encoding: chunked` HTTP body (hex-size line,
    * data, CRLF, …, 0-size terminator; chunk extensions and trailers
    * ignored). Returns None when the bytes do not start with a valid
    * chunk-size line (mislabeled as chunked — keep the raw capture);
    * a TORN chunked stream (truncated capture) returns the bytes
    * assembled so far, the lenient-framing convention. De-chunking only
    * ever removes bytes, so no inflation cap is needed. */
  private[warc] def dechunk(bytes: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream(math.max(64, math.min(bytes.length, 1 << 20)))
    var i = 0
    var first = true
    while (i <= bytes.length) {
      var j = i
      while (j < bytes.length && bytes(j) != '\n') j += 1
      if (j >= bytes.length) // no size line terminator: torn
        return if (first) None else Some(out.toByteArray)
      val line = new String(bytes, i, j - i,
        java.nio.charset.StandardCharsets.ISO_8859_1).trim
      val sizeStr = line.takeWhile(_ != ';').trim
      val size =
        try java.lang.Long.parseLong(sizeStr, 16)
        catch { case _: NumberFormatException => -1L }
      if (size < 0 || size > MaxPayloadBytes)
        return if (first) None else Some(out.toByteArray)
      if (size == 0) return Some(out.toByteArray) // terminator; trailers ignored
      val start = j + 1
      val end = math.min(bytes.length.toLong, start + size).toInt
      out.write(bytes, start, end - start)
      if (end < start + size) return Some(out.toByteArray) // torn mid-chunk
      i = end
      if (i < bytes.length && bytes(i) == '\r') i += 1
      if (i < bytes.length && bytes(i) == '\n') i += 1
      first = false
    }
    None // unreachable: every path above returns
  }

  /** Split an `application/http` record payload into
    * (status, http content-type, location, body text).
    *
    * The envelope ends at the first blank line (`\r\n\r\n`, or bare
    * `\n\n` from lenient re-writers) — the split happens on BYTES, before
    * any charset decode, because the body may be binary-ish or
    * content-coded. Status parses only when the first line is an
    * `HTTP/x.y <code>` status line (request records' `GET / HTTP/1.1`
    * yields null). A body declared `Content-Encoding: gzip`/`x-gzip`/
    * `deflate`/`zstd` is decoded here, bounded by
    * [[MaxInflatedBodyBytes]]; any other content coding (brotli has no
    * public codec on a Spark classpath), or a coded stream that fails to
    * decode (truncated capture), falls back to the raw bytes WITH the
    * envelope's `codingUnsupported` flag raised — LENIENT, like the
    * record framing: one bad response must not abort a crawl task, and
    * the raw bytes preserve what was actually captured, but the flag
    * means downstream never mistakes coded bytes for text. A payload
    * with no blank line at all (malformed envelope) is returned verbatim
    * with null status. */
  /** The parsed HTTP response envelope — what [[stripHttpEnvelope]]
    * surfaces as columns next to the decoded body. `codingUnsupported`
    * is true when the body declared a Content-Encoding this reader did
    * not decode (brotli, compress, a chained multi-coding, or a coded
    * stream that failed to decode) — the payload column then still holds
    * the CODED bytes, and a text pipeline must branch on the flag
    * instead of tokenizing compressed garbage. */
  private[warc] final case class HttpEnvelope(
      status: Integer,
      contentType: String,
      location: String,
      robotsTag: String,
      body: String,
      codingUnsupported: Boolean = false)

  private[warc] def stripHttpEnvelope(bytes: Array[Byte]): HttpEnvelope = {
    // find the first \r\n\r\n or \n\n; remember where the body starts
    var i = 0
    var bodyStart = -1
    while (bodyStart < 0 && i < bytes.length) {
      if (bytes(i) == '\n') {
        if (i + 1 < bytes.length && bytes(i + 1) == '\n') bodyStart = i + 2
        else if (i + 2 < bytes.length && bytes(i + 1) == '\r' && bytes(i + 2) == '\n')
          bodyStart = i + 3
        else if (i + 1 == bytes.length) bodyStart = i + 1 // envelope-only
      }
      i += 1
    }
    if (bodyStart < 0)
      return HttpEnvelope(null, null, null, null, decodeBody(bytes, null))
    val envLines = new String(bytes, 0, bodyStart, UTF_8).split("\r?\n")
    val status: Integer =
      if (envLines.nonEmpty && envLines(0).startsWith("HTTP/")) {
        val parts = envLines(0).split(" ", 3)
        if (parts.length >= 2) parts(1).toIntOption.map(Integer.valueOf).orNull
        else null
      } else null
    def header(name: String): Option[String] =
      envLines.iterator.drop(1).flatMap { l =>
        val j = l.indexOf(':')
        if (j > 0 && l.substring(0, j).trim.equalsIgnoreCase(name))
          Some(l.substring(j + 1).trim)
        else None
      }.nextOption()
    val httpCt = header("content-type").orNull
    // where a 3xx points (RFC 9110 §10.2.2; possibly RELATIVE — resolve
    // downstream against the record's target URI): the redirect edge a
    // frontier must follow, ~a third of real crawl fetches
    val httpLoc = header("location").orNull
    // the header-side robots directives (X-Robots-Tag) — the compliance
    // opt-out for non-HTML content that has no <meta> to carry it
    val robotsTag = header("x-robots-tag").orNull
    var body = java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length)
    // HTTP layering: Transfer-Encoding (message framing) unwraps FIRST,
    // Content-Encoding (entity coding) second — a chunked capture of a
    // gzip page de-chunks, THEN inflates. WARC stores the raw message,
    // so chunked bodies do appear in real archives; without this the
    // hex size lines leak into the text as garbage tokens.
    val te = header("transfer-encoding").map(_.toLowerCase)
    if (te.exists(_.contains("chunked")))
      dechunk(body).foreach(b => body = b)
    // Content-Encoding (entity coding) second. Every coding with a codec
    // already on a Spark classpath decodes here — gzip/x-gzip (JDK),
    // deflate (JDK; RFC 9110 says zlib-wrapped, real servers also ship
    // RAW deflate, so both are tried), zstd (zstd-jni, which Spark
    // bundles). Brotli (`br`) has NO public codec on the classpath and
    // chained multi-codings are not unwound — those, and any coded
    // stream that fails or over-inflates its bomb cap, keep the RAW
    // captured bytes and raise `codingUnsupported` instead of silently
    // passing coded bytes off as text (the round-12 behavior).
    val enc = header("content-encoding").map(_.trim.toLowerCase)
    var codingUnsupported = false
    enc.filter(e => e.nonEmpty && e != "identity").foreach { e =>
      val decoded: Option[Array[Byte]] = e match {
        case "gzip" | "x-gzip" =>
          decodeCapped(body, s => new java.util.zip.GZIPInputStream(s, 1 << 13))
        case "deflate" =>
          decodeCapped(body, s => new java.util.zip.InflaterInputStream(s))
            .orElse(decodeCapped(body, s => new java.util.zip.InflaterInputStream(
              s, new java.util.zip.Inflater(true))))
        case "zstd" =>
          decodeCapped(body, s => new com.github.luben.zstd.ZstdInputStream(s))
        case _ => None // br, compress, "gzip, br" chains, unknown tokens
      }
      decoded match {
        case Some(b) => body = b
        case None => codingUnsupported = true
      }
    }
    HttpEnvelope(status, httpCt, httpLoc, robotsTag, decodeBody(body, httpCt),
      codingUnsupported)
  }

  /** Decode `body` through `open`'s stream, bounded by
    * [[MaxInflatedBodyBytes]] — None on any decode error, a truncated
    * stream, or a decompression bomb exceeding the cap (the cap is
    * checked BEFORE buffering each chunk, so a bomb never allocates past
    * it). One helper so every content-coding shares the exact bomb/error
    * discipline the gzip path always had. */
  private def decodeCapped(
      body: Array[Byte],
      open: java.io.InputStream => java.io.InputStream): Option[Array[Byte]] =
    try {
      val in = open(new java.io.ByteArrayInputStream(body))
      // capacity is a HINT: clamp it — body.length * 4 overflows Int
      // for >512 MB bodies and a negative capacity throws, aborting
      // the task this method promises never to abort
      val out = new ByteArrayOutputStream(
        math.max(64, math.min(body.length, 1 << 20)))
      val chunk = new Array[Byte](1 << 13)
      var n = in.read(chunk)
      var total = 0L
      var over = false
      while (n != -1 && !over) {
        if (total + n > MaxInflatedBodyBytes) over = true
        else { out.write(chunk, 0, n); total += n; n = in.read(chunk) }
      }
      if (over) None else Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
}
