package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_pdf_text(payload): rule-based text extraction from a PDF payload
  * — the PDF sibling of [[graft.ops.TextOps]]'s `htmlToText` convention
  * (engine-portable byte rules, no rendering library). PDFs are the
  * largest non-HTML text reservoir in a web crawl; this kernel recovers
  * the text-showing operators without a PDF engine.
  *
  * WHAT IT DOES (ISO 32000-1): walks the raw bytes for `<< dict >>
  * stream … endstream` objects; decodes a stream when its filter chain
  * is any sequence of `/FlateDecode` (JDK Inflater), `/ASCIIHexDecode`,
  * `/ASCII85Decode`, and `/RunLengthDecode` (pure byte math), applied
  * in declared order — or no filter at all; then scans the decoded
  * content for `BT … ET` text objects and appends the string operands of
  * the text-showing operators `Tj`, `TJ`, `'`, `"`. Literal strings
  * `(…)` honor balanced parens, the `\n \r \t \b \f \( \) \\` escapes,
  * octal `\ddd`, and line continuations; in-string EOLs normalize to
  * `\n`. Hex strings `<…>` decode byte-per-pair (odd final digit padded
  * with 0). Line-move operators (`Td`, `TD`, `T*`, `'`, `"`) and text-
  * object boundaries emit a newline (never doubled, never leading).
  *
  * HONEST BOUNDARIES (each deliberate, all documented here rather than
  * hidden): encrypted documents (`/Encrypt` in the trailer) return NULL
  * — extraction would emit ciphertext; ASCIIHexDecode and ASCII85Decode
  * decode too (pure byte math), INCLUDING chains in declared order
  * ([/ASCII85Decode /FlateDecode]); streams under any OTHER filter
  * (DCTDecode, LZWDecode, Crypt, JBIG2, JPX,
  * an indirect-reference /Filter, …) are skipped — filter names are
  * read TOKEN-accurately off the dict (a "/DCT" inside a string value
  * cannot misclassify a stream); FlateDecode streams carrying
  * /DecodeParms are skipped too (PNG/TIFF predictors would need
  * de-predicting after the inflate — feeding predictor-coded bytes to
  * the tokenizer would emit junk; content streams essentially never
  * carry predictors, xref/object streams do); bytes decode
  * as Latin-1, so composite-font hex strings (CMap-indexed CIDs) come
  * out as mojibake rather than being remapped — real Unicode mapping
  * needs the font's ToUnicode CMap, which is out of scope by the same
  * rule that keeps `htmlToText` free of a JS engine; TJ kerning numbers
  * are NOT turned into heuristic spaces (deterministic beats pretty);
  * inline-image data (`BI … EI`) is not special-cased, which can feed
  * garbage tokens to the scanner on adversarial input — never a throw,
  * at worst junk text. Inflate output is capped at 16 MiB per stream
  * (zip-bomb guard; an over-cap stream is skipped) and total extracted
  * text at 1M chars. NULL for non-PDF bytes and for PDFs yielding no
  * text at all — "nothing extractable" and "not extractable" share NULL
  * so the release-gate filter is one IS NOT NULL.
  *
  * `doGenCode` calls straight into [[compute]] ([[ShingleHashes]]
  * convention), so profiling projections stay in whole-stage codegen. */
case class PdfText(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def prettyName: String = TilePairs.PdfTextName
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary input")

  import PdfText._

  def compute(bytes: Array[Byte]): Any = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 8 || bytes(0) != '%' || bytes(1) != 'P' || bytes(2) != 'D' ||
      bytes(3) != 'F') return null
    if (hasEncryptToken(bytes)) return null
    val sb = new java.lang.StringBuilder
    var pos = 0
    while (pos < n - 1 && sb.length < MaxTextChars) {
      val d0 = indexOf(bytes, DictOpen, pos)
      if (d0 < 0) pos = n
      else {
        val dEnd = skipDict(bytes, d0)
        if (dEnd < 0) pos = n
        else {
          var k = dEnd
          while (k < n && isWs(bytes(k))) k += 1
          if (k + 6 <= n && regionMatches(bytes, k, StreamKw)) {
            var ds = k + 6
            if (ds < n && bytes(ds) == '\r') ds += 1
            if (ds < n && bytes(ds) == '\n') ds += 1
            val de = indexOf(bytes, EndstreamKw, ds)
            var dataEnd = if (de < 0) n else de
            // the writer's EOL before `endstream` is framing, not data
            if (dataEnd > ds && bytes(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > ds && bytes(dataEnd - 1) == '\r') dataEnd -= 1
            // token-accurate dict read (walkDictKeys consumes string
            // values atomically, so "/DCT" inside a path-string value
            // can never misclassify the stream; round-13 review)
            var filters: List[String] = Nil
            var hasParms = false
            walkDictKeys(bytes, d0 + 2, dEnd - 2) { (key, v) =>
              if (key == "Filter") {
                if (v < dEnd - 2 && bytes(v) == '/')
                  filters = filters :+ nameAt(bytes, v, dEnd - 2)
                else if (v < dEnd - 2 && bytes(v) == '[') {
                  var j = v + 1
                  while (j < dEnd - 2 && bytes(j) != ']') {
                    if (bytes(j) == '/') {
                      val nm = nameAt(bytes, j, dEnd - 2)
                      filters = filters :+ nm
                      j += 1 + nm.length
                    } else j += 1
                  }
                } else filters = filters :+ "?" // indirect ref: can't resolve
              } else if (key == "DecodeParms" || key == "DP") hasParms = true
            }
            val decodable = filters.forall(SupportedFilters)
            val unsupported = !decodable ||
              // predictors (PNG/TIFF row filters) would need de-predicting
              // after the decode — skip rather than feed predictor-coded
              // bytes to the tokenizer (xref/object streams carry these;
              // BT-text content streams essentially never do)
              (filters.nonEmpty && hasParms)
            if (!unsupported && dataEnd > ds) {
              val data = java.util.Arrays.copyOfRange(bytes, ds, dataEnd)
              val content = decodeFilters(data, filters)
              if (content != null) extract(content, sb)
            }
            pos = if (de < 0) n else de + EndstreamKw.length
          } else pos = dEnd
        }
      }
    }
    if (sb.length == 0) null else UTF8String.fromString(sb.toString)
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
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = ${ev.isNull}
        ? null : (org.apache.spark.unsafe.types.UTF8String) ${ev.value}_o;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object PdfText {
  private val MaxTextChars = 1 << 20 // 1M chars of extracted text
  private val MaxInflate = 16 << 20 // 16 MiB decoded per stream (bomb cap)
  private val DictOpen = "<<".getBytes
  private val StreamKw = "stream".getBytes
  private val EndstreamKw = "endstream".getBytes

  /** The filters this kernel decodes, CHAINS included, applied in the
    * dict's declared order ([/ASCII85Decode /FlateDecode] — the classic
    * 7-bit-safe transport around a compressed stream). FlateDecode via
    * the JDK Inflater; ASCIIHex/ASCII85 are pure byte math (ISO 32000-1
    * §7.4.2/§7.4.3), incl. the 1.0-era inline abbreviations some lax
    * writers emit in stream dicts. Anything else skips the stream. */
  private val SupportedFilters: Set[String] =
    Set("FlateDecode", "Fl", "ASCIIHexDecode", "AHx", "ASCII85Decode", "A85",
      "RunLengthDecode", "RL")

  private def decodeFilters(data: Array[Byte], filters: List[String]): Array[Byte] = {
    var cur = data
    filters.foreach { f =>
      if (cur == null) return null
      f match {
        case "FlateDecode" | "Fl" => cur = inflate(cur)
        case "ASCIIHexDecode" | "AHx" => cur = asciiHexDecode(cur)
        case "ASCII85Decode" | "A85" => cur = ascii85Decode(cur)
        case "RunLengthDecode" | "RL" => cur = runLengthDecode(cur)
        case _ => return null // unreachable: SupportedFilters gated
      }
    }
    cur
  }

  /** §7.4.2: hex pairs, whitespace ignored, `>` is EOD, an odd final
    * digit pads with 0; any other byte is malformed → null (skip). */
  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i)
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return out.toByteArray
      }
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (isWs(c)) -2
        else return null // malformed
      if (v >= 0) { if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 } }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // EOD marker missing: tolerate (torn)
    out.toByteArray
  }

  /** §7.4.5: length byte L — L<128 copies the next L+1 literal bytes,
    * L>128 repeats the next byte 257−L times, L==128 is EOD. Torn runs
    * keep the decoded prefix (crawl captures truncate); output is capped
    * at [[MaxInflate]] like every other decode (a repeat-heavy stream is
    * a 128× amplifier — bounded, but the cap keeps the discipline
    * uniform). */
  private def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(data.length * 2 + 16, 1 << 16))
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xff
      if (l == 128) return out.toByteArray // EOD
      else if (l < 128) {
        val n = l + 1
        val end = math.min(data.length, i + 1 + n)
        out.write(data, i + 1, end - (i + 1))
        if (end < i + 1 + n) return out.toByteArray // torn literal run
        i = end
      } else {
        if (i + 1 >= data.length) return out.toByteArray // torn repeat
        val n = 257 - l
        val b = data(i + 1).toInt
        var k = 0
        while (k < n) { out.write(b); k += 1 }
        i += 2
      }
      if (out.size > MaxInflate) return null // uniform bomb cap
    }
    out.toByteArray // EOD missing: tolerate (torn capture)
  }

  /** §7.4.3: base-85 groups of 5 chars `!`..`u` → 4 bytes; `z` = four
    * zero bytes (only BETWEEN groups); whitespace ignored; `~>` is EOD;
    * a partial final group of n ∈ [2,5) chars pads with `u` and emits
    * n−1 bytes; a group decoding past 2³²−1, a `z` inside a group, a
    * 1-char final group, or any other byte → null (skip). */
  private def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var k = 0
    def flush(n: Int): Boolean = { // n chars present (2..5); emits n-1 bytes
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < n) grp(i) else 84); i += 1 }
      if (v > 0xffffffffL) return false
      var j = 0
      while (j < n - 1) { out.write(((v >>> (24 - 8 * j)) & 0xff).toInt); j += 1 }
      true
    }
    var i = 0
    while (i < data.length) {
      val c = data(i)
      if (c == '~') { // EOD
        if (k == 1) return null
        if (k >= 2 && !flush(k)) return null
        return out.toByteArray
      } else if (c == 'z') {
        if (k != 0) return null // z inside a group is malformed
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (c >= '!' && c <= 'u') {
        grp(k) = c - '!'; k += 1
        if (k == 5) { if (!flush(5)) return null; k = 0 }
      } else if (!isWs(c)) return null
      i += 1
    }
    if (k == 1) return null // torn tail: a lone char is undecodable
    if (k >= 2 && !flush(k)) return null
    out.toByteArray // EOD missing: tolerate (torn capture)
  }

  private[functions] def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12
  private[functions] def isDelim(c: Byte): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  private[functions] def regionMatches(b: Array[Byte], at: Int, pat: Array[Byte]): Boolean = {
    if (at + pat.length > b.length) return false
    var i = 0
    while (i < pat.length) { if (b(at + i) != pat(i)) return false; i += 1 }
    true
  }

  private[functions] def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = b.length - pat.length
    while (i <= last) { if (regionMatches(b, i, pat)) return i; i += 1 }
    -1
  }

  /** `/Encrypt` as a TOKEN (next char is whitespace/delimiter/EOF), so
    * `/EncryptedPayload`-style names don't false-positive. A literal
    * string containing the token still trips this — accepted: the miss
    * direction is "extractable file reported out of scope", never
    * ciphertext reported as text. */
  private[functions] def hasEncryptToken(b: Array[Byte]): Boolean = {
    val pat = "/Encrypt".getBytes
    var at = indexOf(b, pat, 0)
    while (at >= 0) {
      val next = at + pat.length
      if (next >= b.length || isWs(b(next)) || isDelim(b(next))) return true
      at = indexOf(b, pat, at + 1)
    }
    false
  }

  /** Index just past the `>>` matching the `<<` at `d0`, tracking dict
    * nesting — or -1 when unbalanced. Strings/comments inside the dict
    * containing `<<`/`>>` can over-count (accepted: the walk then skips
    * bytes, never loops — progress is always forward). */
  private[functions] def skipDict(b: Array[Byte], d0: Int): Int = {
    val n = b.length
    var i = d0 + 2
    var depth = 1
    while (i < n - 1 && depth > 0) {
      if (b(i) == '<' && b(i + 1) == '<') { depth += 1; i += 2 }
      else if (b(i) == '>' && b(i + 1) == '>') { depth -= 1; i += 2 }
      else i += 1
    }
    if (depth == 0) i else -1
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(64, data.length * 4), 1 << 16))
      val buf = new Array[Byte](8192)
      var total = 0
      var stalled = false
      while (!inf.finished() && !stalled && total <= MaxInflate) {
        val m = inf.inflate(buf)
        if (m == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        else { out.write(buf, 0, m); total += m }
      }
      if (total > MaxInflate) null // zip bomb: skip the stream entirely
      else if (total == 0) null
      else out.toByteArray // truncated input keeps the decoded prefix
    } catch {
      case _: java.util.zip.DataFormatException => null
      case _: IllegalArgumentException => null
    } finally inf.end()
  }

  /** One pass over decoded content bytes: a content-stream tokenizer just
    * deep enough for the text operators. String operands accumulate in
    * `pending`; `Tj`/`TJ`/`'`/`"` inside a BT..ET block emit them; any
    * other operator clears them (operands precede their operator, so a
    * string consumed by an unhandled operator never leaks into the next
    * show). Tokens inside a `[` TJ array are operands, not operators —
    * kerning numbers there must NOT clear the strings around them. */
  private def extract(b: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    val n = b.length
    var i = 0
    var inText = false
    var inArray = false
    val pending = new scala.collection.mutable.ArrayBuffer[String](4)
    def newline(): Unit =
      if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def emit(): Unit = {
      pending.foreach { s =>
        val room = MaxTextChars - sb.length
        if (room > 0) sb.append(if (s.length <= room) s else s.substring(0, room))
      }
      pending.clear()
    }
    while (i < n && sb.length < MaxTextChars) {
      val c = b(i)
      if (isWs(c)) i += 1
      else if (c == '%') { while (i < n && b(i) != '\n' && b(i) != '\r') i += 1 }
      else if (c == '(') i = literalString(b, i, pending, n, MaxTextChars)
      else if (c == '<' && i + 1 < n && b(i + 1) == '<') {
        val e = skipDict(b, i); i = if (e < 0) n else e
      } else if (c == '<') i = hexString(b, i, pending, n, MaxTextChars)
      else if (c == '[') { inArray = true; i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c == '/') { // name: skipped, never clears operands
        i += 1
        while (i < n && !isWs(b(i)) && !isDelim(b(i))) i += 1
      } else if (isDelim(c)) i += 1 // stray ) > } {
      else {
        val t0 = i
        while (i < n && !isWs(b(i)) && !isDelim(b(i))) i += 1
        if (!inArray) {
          val len = i - t0
          val c0 = b(t0)
          val c1 = if (len > 1) b(t0 + 1) else 0.toByte
          if (len == 2 && c0 == 'B' && c1 == 'T') {
            inText = true; pending.clear(); newline() // text-object boundary
          }
          else if (len == 2 && c0 == 'E' && c1 == 'T') { inText = false; pending.clear() }
          else if (len == 2 && c0 == 'T' && (c1 == 'j' || c1 == 'J')) {
            if (inText) emit() else pending.clear()
          } else if (len == 1 && (c0 == '\'' || c0 == '"')) {
            if (inText) { newline(); emit() } else pending.clear()
          } else if (len == 2 && c0 == 'T' && (c1 == 'd' || c1 == 'D' || c1 == '*')) {
            if (inText) newline(); pending.clear()
          } else pending.clear()
        }
      }
    }
  }

  /** Decode the literal string starting at `b(start) == '('`; returns the
    * index just past the closing paren (or `end` for an unterminated
    * string — the decoded prefix is still kept: crawl payloads truncate).
    * The scan never reads past `end` (PdfInfo bounds it to the Info dict,
    * so a torn string cannot swallow trailing file bytes) and stops
    * APPENDING at `maxChars` while still consuming to the close paren. */
  private[functions] def literalString(
      b: Array[Byte], start: Int,
      out: scala.collection.mutable.ArrayBuffer[String],
      end: Int, maxChars: Int): Int = {
    val n = math.min(end, b.length)
    val s = new java.lang.StringBuilder
    var i = start + 1
    var depth = 1
    var done = false
    while (i < n && !done) {
      val c = b(i)
      if (c == '\\' && i + 1 < n) {
        val e = b(i + 1)
        (e: @annotation.switch) match {
          case 'n' => s.append('\n'); i += 2
          case 'r' => s.append('\r'); i += 2
          case 't' => s.append('\t'); i += 2
          case 'b' => s.append('\b'); i += 2
          case 'f' => s.append('\f'); i += 2
          case '(' => s.append('('); i += 2
          case ')' => s.append(')'); i += 2
          case '\\' => s.append('\\'); i += 2
          case '\r' => i += (if (i + 2 < n && b(i + 2) == '\n') 3 else 2)
          case '\n' => i += 2
          case _ =>
            if (e >= '0' && e <= '7') {
              var v = 0; var k = i + 1; var cnt = 0
              while (k < n && cnt < 3 && b(k) >= '0' && b(k) <= '7') {
                v = v * 8 + (b(k) - '0'); k += 1; cnt += 1
              }
              s.append((v & 0xff).toChar); i = k
            } else { s.append((e & 0xff).toChar); i += 2 } // lone \: dropped
        }
      } else if (c == '\\') i += 1 // trailing backslash at EOF
      else if (c == '(') { depth += 1; s.append('('); i += 1 }
      else if (c == ')') { depth -= 1; if (depth == 0) done = true else s.append(')'); i += 1 }
      else if (c == '\r') { // in-string EOL normalizes to \n (§7.3.4.2)
        s.append('\n'); i += (if (i + 1 < n && b(i + 1) == '\n') 2 else 1)
      } else { s.append((c & 0xff).toChar); i += 1 }
    }
    out += (if (s.length <= maxChars) s.toString else s.substring(0, maxChars))
    i
  }

  /** Decode the hex string starting at `b(start) == '<'`; whitespace
    * between digits is legal, non-hex junk is skipped leniently, an odd
    * final digit pads with 0 (§7.3.4.3). Bytes map via Latin-1 — see the
    * composite-font boundary in the class doc. */
  private[functions] def hexString(
      b: Array[Byte], start: Int,
      out: scala.collection.mutable.ArrayBuffer[String],
      end: Int, maxChars: Int): Int = {
    val n = math.min(end, b.length)
    val s = new java.lang.StringBuilder
    var i = start + 1
    var hi = -1
    var done = false
    while (i < n && !done) {
      val c = b(i)
      if (c == '>') done = true
      else {
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else -1
        if (v >= 0) { if (hi < 0) hi = v else { s.append(((hi << 4) | v).toChar); hi = -1 } }
      }
      i += 1
    }
    if (hi >= 0) s.append((hi << 4).toChar)
    out += (if (s.length <= maxChars) s.toString else s.substring(0, maxChars))
    i
  }

  /** Alternating key→value walk of a dict BODY [start, end): invokes `f`
    * with each key name and its value's start index, then consumes the
    * value ATOMICALLY — strings, arrays, and nested dicts are skipped as
    * whole objects, so a key name occurring INSIDE a string value can
    * never be mistaken for a dict key (the round-13 review caught
    * `/Author (by /Title (fake))` poisoning the /Title field under the
    * old raw-byte key scan). Malformed bytes always make forward
    * progress; never throws. */
  private[functions] def walkDictKeys(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int) => Unit): Unit = {
    val sink = new scala.collection.mutable.ArrayBuffer[String](1)
    def skipValue(at: Int): Int = {
      var i = at
      while (i < end && isWs(b(i))) i += 1
      if (i >= end) return end
      b(i) match {
        case '(' => sink.clear(); literalString(b, i, sink, end, 0)
        case '<' if i + 1 < end && b(i + 1) == '<' =>
          val e = skipDict(b, i); if (e < 0 || e > end) end else e
        case '<' => sink.clear(); hexString(b, i, sink, end, 0)
        case '[' =>
          var depth = 1
          var j = i + 1
          while (j < end && depth > 0) {
            b(j) match {
              case '(' => sink.clear(); j = literalString(b, j, sink, end, 0)
              case '<' if j + 1 < end && b(j + 1) == '<' =>
                val e = skipDict(b, j); j = if (e < 0 || e > end) end else e
              case '<' => sink.clear(); j = hexString(b, j, sink, end, 0)
              case '[' => depth += 1; j += 1
              case ']' => depth -= 1; j += 1
              case '%' =>
                while (j < end && b(j) != '\n' && b(j) != '\r') j += 1
              case _ => j += 1
            }
          }
          j
        case '/' =>
          var j = i + 1
          while (j < end && !isWs(b(j)) && !isDelim(b(j))) j += 1
          j
        case _ => // number / indirect ref / boolean / null: token run
          var j = i
          while (j < end && b(j) != '/' && b(j) != '(' && b(j) != '<' &&
            b(j) != '[' && b(j) != ']' && b(j) != '>') j += 1
          j
      }
    }
    var i = start
    while (i < end) {
      val c = b(i)
      if (isWs(c)) i += 1
      else if (c == '%') { while (i < end && b(i) != '\n' && b(i) != '\r') i += 1 }
      else if (c == '/') {
        val t0 = i + 1
        var j = t0
        while (j < end && !isWs(b(j)) && !isDelim(b(j))) j += 1
        val key = new String(b, t0, j - t0,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        var v = j
        while (v < end && isWs(b(v))) v += 1
        f(key, v)
        val next = skipValue(j)
        i = if (next > j) next else j + 1 // malformed: progress over purity
      } else i += 1 // stray token at key position: advance
    }
  }

  /** The name token at `b(at) == '/'` (empty for a bare slash). */
  private[functions] def nameAt(b: Array[Byte], at: Int, end: Int): String = {
    var j = at + 1
    while (j < end && !isWs(b(j)) && !isDelim(b(j))) j += 1
    new String(b, at + 1, j - at - 1, java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}

/** graft_pdf_info(payload): the document-information dictionary of a PDF
  * — struct `(title, author, creator, producer, created)`, the
  * provenance complement of [[PdfText]] (what [[ExifTags]] is to images
  * and [[Mp3Tags]] to audio: the cheap synthetic/converted screen —
  * generator tools land in Producer/Creator — plus dedup-by-title and
  * date-based recrawl priors).
  *
  * HOW (ISO 32000-1 §14.3.3): the LAST `/Info N G R` reference in the
  * file wins (incremental updates append new trailers; the final one is
  * authoritative), then the LAST `N G obj` body (same rule) has its
  * `<< … >>` dictionary scanned for the /Title /Author /Creator
  * /Producer /CreationDate keys. Values parse as PDF text strings:
  * literal or hex, with the UTF-16BE (FE FF) and UTF-8 (EF BB BF) BOMs
  * honored and everything else read as Latin-1 (≈PDFDocEncoding — the
  * same approximation [[PdfText]] documents). `created` stays the RAW
  * `D:YYYYMMDDHHmmSS…` string — deterministic, and downstream can parse
  * the prefix it needs.
  *
  * Boundaries: indirect-reference values (`/Title 7 0 R`) yield NULL for
  * that field (no xref walk — same rule that keeps the text kernel
  * engine-portable); encrypted documents return NULL (strings are
  * ciphertext); a present-but-empty Info dict returns a row of NULLs
  * (info EXISTS), while no /Info at all returns NULL (none declared). */
case class PdfInfo(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def prettyName: String = TilePairs.PdfInfoName
  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("creator", StringType, nullable = true),
    StructField("producer", StringType, nullable = true),
    StructField("created", StringType, nullable = true)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary input")

  import PdfText._
  import PdfInfo._

  def compute(bytes: Array[Byte]): Any = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 8 || bytes(0) != '%' || bytes(1) != 'P' || bytes(2) != 'D' ||
      bytes(3) != 'F') return null
    if (hasEncryptToken(bytes)) return null
    val ref = lastInfoRef(bytes)
    if (ref == null) return null
    val objAt = lastObjStart(bytes, ref(0), ref(1))
    if (objAt < 0) return null
    var k = objAt
    while (k < n && isWs(bytes(k))) k += 1
    if (k + 2 > n || bytes(k) != '<' || bytes(k + 1) != '<') return null
    val dEnd = skipDict(bytes, k)
    if (dEnd < 0) return null
    val body1 = dEnd - 2
    val vals = new Array[Any](5)
    // string-atomic key walk: a key name INSIDE a string value (an
    // Author of "by /Title (fake)") can never shadow the real key, and
    // every string read is bounded by the dict and capped — a torn
    // literal cannot swallow trailing file bytes into a metadata field
    walkDictKeys(bytes, k + 2, body1) { (key, v) =>
      val idx = key match {
        case "Title" => 0
        case "Author" => 1
        case "Creator" => 2
        case "Producer" => 3
        case "CreationDate" => 4
        case _ => -1
      }
      if (idx >= 0 && vals(idx) == null && v < body1) {
        if (bytes(v) == '(') {
          val buf = new scala.collection.mutable.ArrayBuffer[String](1)
          literalString(bytes, v, buf, body1, MaxMetaChars)
          vals(idx) = UTF8String.fromString(decodeTextString(buf.head))
        } else if (bytes(v) == '<' && (v + 1 >= body1 || bytes(v + 1) != '<')) {
          val buf = new scala.collection.mutable.ArrayBuffer[String](1)
          hexString(bytes, v, buf, body1, MaxMetaChars)
          vals(idx) = UTF8String.fromString(decodeTextString(buf.head))
        } // else: indirect ref / name / number value — out of scope, NULL
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
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
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = ${ev.isNull}
        ? null : (org.apache.spark.sql.catalyst.InternalRow) ${ev.value}_o;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object PdfInfo {
  import PdfText._

  /** Per-field cap on decoded metadata strings — real Info values are
    * tens of chars; a torn/adversarial string stops appending here
    * while still being consumed to its delimiter. */
  private val MaxMetaChars = 1 << 16

  /** The LAST well-formed `/Info N G R` in the file, as Array(n, g) —
    * or null when absent. */
  private[functions] def lastInfoRef(b: Array[Byte]): Array[Int] = {
    val pat = "/Info".getBytes
    val n = b.length
    var found: Array[Int] = null
    var at = indexOf(b, pat, 0)
    while (at >= 0) {
      var i = at + pat.length
      // token boundary: "/Information" must not match
      if (i >= n || isWs(b(i)) || isDelim(b(i))) {
        while (i < n && isWs(b(i))) i += 1
        val (num, i2) = digits(b, i)
        if (num >= 0) {
          var j = i2
          while (j < n && isWs(b(j))) j += 1
          val (gen, j2) = digits(b, j)
          if (gen >= 0) {
            var r = j2
            while (r < n && isWs(b(r))) r += 1
            if (r < n && b(r) == 'R' &&
              (r + 1 >= n || isWs(b(r + 1)) || isDelim(b(r + 1))))
              found = Array(num, gen)
          }
        }
      }
      at = indexOf(b, pat, at + 1)
    }
    found
  }

  /** Index just past the `obj` keyword of the LAST `n g obj` header — or
    * -1. Byte scan with token-boundary checks on both sides. */
  private[functions] def lastObjStart(b: Array[Byte], num: Int, gen: Int): Int = {
    val n = b.length
    val pat = String.valueOf(num).getBytes
    var found = -1
    var at = indexOf(b, pat, 0)
    while (at >= 0) {
      if (at == 0 || isWs(b(at - 1)) || isDelim(b(at - 1))) {
        var i = at + pat.length
        if (i < n && isWs(b(i))) {
          while (i < n && isWs(b(i))) i += 1
          val (g2, i2) = digits(b, i)
          if (g2 == gen) {
            var j = i2
            while (j < n && isWs(b(j))) j += 1
            if (j + 3 <= n && b(j) == 'o' && b(j + 1) == 'b' && b(j + 2) == 'j' &&
              (j + 3 >= n || isWs(b(j + 3)) || isDelim(b(j + 3))))
              found = j + 3
          }
        }
      }
      at = indexOf(b, pat, at + 1)
    }
    found
  }

  /** (value, index-after) of an unsigned int at `i`, or (-1, i). Caps at
    * 8 digits — object numbers beyond that are lying bytes, not PDFs. */
  private def digits(b: Array[Byte], i0: Int): (Int, Int) = {
    var i = i0
    var v = 0
    var cnt = 0
    while (i < b.length && cnt < 8 && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0'); i += 1; cnt += 1
    }
    if (cnt == 0 || (i < b.length && b(i) >= '0' && b(i) <= '9')) (-1, i0)
    else (v, i)
  }

  /** PDF text-string decode (§7.9.2.2): chars so far are raw byte values
    * — re-decode behind a UTF-16BE or UTF-8 BOM, else keep as Latin-1
    * (≈PDFDocEncoding). */
  private def decodeTextString(raw: String): String = {
    def bytesOf(from: Int): Array[Byte] = {
      val bs = new Array[Byte](raw.length - from)
      var i = 0
      while (i < bs.length) { bs(i) = raw.charAt(i + from).toByte; i += 1 }
      bs
    }
    if (raw.length >= 2 && raw.charAt(0) == 0xFE.toChar && raw.charAt(1) == 0xFF.toChar)
      new String(bytesOf(2), java.nio.charset.StandardCharsets.UTF_16BE)
    else if (raw.length >= 3 && raw.charAt(0) == 0xEF.toChar &&
      raw.charAt(1) == 0xBB.toChar && raw.charAt(2) == 0xBF.toChar)
      new String(bytesOf(3), java.nio.charset.StandardCharsets.UTF_8)
    else raw
  }
}
