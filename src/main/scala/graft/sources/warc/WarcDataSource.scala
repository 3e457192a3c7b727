package graft.sources.warc

import java.io.{BufferedInputStream, InputStream}
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-warc`: a DataSource V2 batch source that reads WARC/WET web-crawl
  * archives one RECORD per row with constant memory per task — the
  * Common-Crawl first mile done in Spark's own source framework rather
  * than a whole-file parse (a 1 GB .warc.gz inflates to several GB; a
  * whole-file Array[Byte] caps at 2 GB and fails as an executor OOM,
  * while this reader streams [[WarcRecordIterator]] over the open file).
  *
  * Scale shape: one InputPartition per archive file (gzip is not
  * splittable; crawl archives are ~1 GB by convention, so a 100 TB crawl
  * is ~100k independent file-tasks), each task a single sequential
  * read+inflate+parse pass. Directories and globs expand at planning
  * time through the path's Hadoop filesystem — local, HDFS, or object
  * store alike. Multi-member gzip (Common Crawl's member-per-record
  * framing) and multi-frame zstd (`.warc.zst`, incl. the IIPC
  * dictionary-frame convention) inflate naturally; torn tails end a
  * file's rows, never the job ([[WarcRecordIterator]]'s lenient rule).
  *
  * Schema (one row per record):
  * (warc_file, record_index, warc_type, record_id, target_uri, warc_date,
  * content_type, content_length, http_status, http_content_type,
  * http_location, http_robots_tag, http_coding_unsupported,
  * payload_digest, truncated, payload).
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema
  // writes arrive with the DataFrame's own schema (the export contract
  // is narrower than the read schema); reads keep the inferred one
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val ranges = WarcDataSource.rangesOf(properties)
    val paths =
      if (ranges.isDefined) ranges.get.map(_._1).distinct
      else WarcDataSource.pathsOf(properties)
    new WarcTable(paths, ranges, Option(schema))
  }
}

object WarcDataSource {

  val Schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("record_index", LongType, nullable = false),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    // application/http records only (null otherwise): parsed status code
    // and the HTTP-level Content-Type — where a response's real MIME type
    // lives. For those records `payload` is the BODY with the HTTP
    // envelope stripped (and gzip content-coding inflated).
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    // 3xx Location header (possibly relative — resolve against
    // target_uri with LinkGraph.resolveUrl): the redirect edge the
    // frontier follows; null for non-http / non-redirect records
    StructField("http_location", StringType),
    // X-Robots-Tag header — the header-side robots directives (the
    // compliance opt-out for non-HTML content); pair with
    // TextOps.metaRobots over the payload for the page-level half
    StructField("http_robots_tag", StringType),
    // true when the body declared a Content-Encoding the reader did not
    // decode (brotli — no public codec on a Spark classpath — compress,
    // chained codings, or a failed/bomb-capped decode): `payload` then
    // still holds the CODED bytes, and a text pipeline must filter or
    // branch on this flag instead of tokenizing compressed garbage.
    // gzip/x-gzip/deflate/zstd decode fine (flag false). Null for
    // non-http records, like the other http_* fields.
    StructField("http_coding_unsupported", BooleanType),
    // WARC-Payload-Digest when present (any record kind) — the join key
    // that resolves `revisit` records back to the capture they
    // deduplicate (ISO 28500 §6.7). Parsed from the headers, so it is
    // populated identically whether or not the payload column is read.
    StructField("payload_digest", StringType),
    // WARC-Truncated when present ('length' | 'time' | 'disconnect' |
    // 'unspecified', ISO 28500 §5.13): the record's payload was CUT at
    // capture time — Common Crawl marks ~1 MB body cuts with 'length'.
    // Header-derived like payload_digest, identical under pruning.
    StructField("truncated", StringType),
    // The record's random-access coordinates — byte position of its
    // version line and its exact header+payload span (separators
    // excluded) in the stream the reader consumed: FILE offsets for a
    // plain .warc, INFLATED-stream positions for .warc.gz (only the
    // former — or an external index's compressed member offsets — can
    // seed [[graft.sources.Loader.loadWarcRanges]]). Framing-derived,
    // identical under payload pruning.
    StructField("record_offset", LongType, nullable = false),
    StructField("record_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** `load(p)` arrives as "path"; `load(p1, p2, …)` as a JSON-array
    * "paths" — accept both. */
  private[warc] def pathsOf(properties: java.util.Map[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).toSeq.flatMap { json =>
      org.json4s.jackson.JsonMethods.parse(json) match {
        case org.json4s.JArray(xs) => xs.collect { case org.json4s.JString(s) => s }
        case _ => Nil
      }
    }
    val single = Option(properties.get("path")).toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "graft-warc: no path given — .load(<file|dir|glob>)")
    all
  }

  /** The `ranges` option of the CDX random-access path
    * ([[graft.sources.Loader.loadWarcRanges]]): a JSON array of
    * `[file, offset, length]` triples. None when the option is absent
    * (the normal full-archive scan). */
  private[warc] def rangesOf(
      properties: java.util.Map[String, String]): Option[Seq[(String, Long, Long)]] =
    Option(properties.get("ranges")).map { json =>
      org.json4s.jackson.JsonMethods.parse(json) match {
        case org.json4s.JArray(xs) => xs.map {
          // EVERY element must be a [string, int, int] triple: a partial
          // match (collect) would silently DROP a malformed entry and a
          // ranged fetch would quietly return fewer records — the loud
          // InvalidParameter is the whole point of validating here
          case org.json4s.JArray(List(
            org.json4s.JString(f), org.json4s.JInt(o), org.json4s.JInt(l))) =>
            (f, o.toLong, l.toLong)
          case bad => throw graft.errors.FeatureFactoryException.InvalidParameter(
            "graft-warc: malformed ranges entry " +
              s"${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(bad))} " +
              "— each element must be a [file, offset, length] triple of " +
              "(string, integer, integer)")
        }
        case _ => throw graft.errors.FeatureFactoryException.InvalidParameter(
          s"graft-warc: malformed ranges option")
      }
    }

  /** Sniff the compression magic and wrap; mark/reset needs the buffer.
    *
    * Three layouts, byte-sniffed so extensions never matter:
    *  - gzip `1f 8b` (incl. Common Crawl's member-per-record archives);
    *  - zstd `28 b5 2f fd` — `.warc.zst`, the newer web-archive-tooling
    *    output; Spark bundles zstd-jni, so no new dependency. Multi-frame
    *    (frame-per-record) archives decode seamlessly: the stream walks
    *    frame to frame like multi-member gzip;
    *  - a leading zstd SKIPPABLE frame `5x 2a 4d 18` — the IIPC
    *    `.warc.zst` convention stores a shared compression DICTIONARY
    *    there (itself optionally zstd-compressed). The frame is read
    *    (64 MiB cap — real dictionaries are ~100 KiB), unwrapped, and
    *    armed on the decoder, so dictionary-compressed archives decode
    *    too. A lying dictionary-frame size or an over-cap dictionary
    *    fails LOUDLY (config evidence beats silently-empty scans);
    *    dictionary archives fetched through the per-member `ranges` seek
    *    path are out of scope — each window would need the file-head
    *    dictionary, which a range deliberately never re-reads. */
  private[warc] def maybeDecompress(raw: InputStream): InputStream = {
    val buffered = new BufferedInputStream(raw, 1 << 16)
    buffered.mark(4)
    val b0 = buffered.read(); val b1 = buffered.read()
    val b2 = buffered.read(); val b3 = buffered.read()
    buffered.reset()
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(buffered, 1 << 16)
    else if (b0 == 0x28 && b1 == 0xb5 && b2 == 0x2f && b3 == 0xfd)
      new com.github.luben.zstd.ZstdInputStream(buffered)
    else if ((b0 & 0xf0) == 0x50 && b1 == 0x2a && b2 == 0x4d && b3 == 0x18) {
      // skippable frame: magic(4) + LE u32 size + dictionary bytes
      val hdr = buffered.readNBytes(8)
      if (hdr.length < 8)
        throw graft.errors.FeatureFactoryException.InvalidParameter(
          "graft-warc: truncated zstd skippable-frame header")
      val size = (hdr(4) & 0xffL) | ((hdr(5) & 0xffL) << 8) |
        ((hdr(6) & 0xffL) << 16) | ((hdr(7) & 0xffL) << 24)
      if (size > ZstdDictCap)
        throw graft.errors.FeatureFactoryException.InvalidParameter(
          s"graft-warc: zstd dictionary frame declares $size bytes " +
            s"(cap $ZstdDictCap)")
      val content = buffered.readNBytes(size.toInt)
      if (content.length < size)
        throw graft.errors.FeatureFactoryException.InvalidParameter(
          "graft-warc: truncated zstd dictionary frame")
      val dict =
        if (content.length >= 4 && (content(0) & 0xff) == 0x28 &&
          (content(1) & 0xff) == 0xb5 && (content(2) & 0xff) == 0x2f &&
          (content(3) & 0xff) == 0xfd) {
          val n = com.github.luben.zstd.Zstd.getFrameContentSize(content)
          if (n <= 0 || n > ZstdDictCap)
            throw graft.errors.FeatureFactoryException.InvalidParameter(
              s"graft-warc: zstd-compressed dictionary declares $n bytes")
          com.github.luben.zstd.Zstd.decompress(content, n.toInt)
        } else content
      val zin = new com.github.luben.zstd.ZstdInputStream(buffered)
      zin.setDict(dict)
      zin
    } else buffered
  }

  /** Bomb/typo guard for the `.warc.zst` dictionary frame — real shared
    * dictionaries are ~100 KiB; 64 MiB is "obviously wrong" territory. */
  private val ZstdDictCap: Long = 64L << 20
}

private[warc] class WarcTable(
    paths: Seq[String],
    ranges: Option[Seq[(String, Long, Long)]] = None,
    schemaOverride: Option[StructType] = None)
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-warc(${paths.mkString(",")})"
  override def schema(): StructType =
    schemaOverride.getOrElse(WarcDataSource.Schema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths, ranges)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.length == 1,
      s"graft-warc write: exactly one target directory, got ${paths.length}")
    new WarcWriteBuilder(paths.head, info)
  }
}

/** COLUMN PRUNING: the archive bytes must be read sequentially either way
  * (Content-Length framing), but a metadata-only query (URL survey, record
  * census) should not pay the UTF-8 decode + String allocation of every
  * payload — the dominant CPU cost. Spark pushes the required columns
  * here; the reader only materializes what the query asks for. */
private[warc] class WarcScanBuilder(
    paths: Seq[String], ranges: Option[Seq[(String, Long, Long)]] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field ORDER (get() emits by our own layout)
    required = StructType(WarcDataSource.Schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new WarcScan(paths, required, ranges)
}

private[warc] class WarcScan(
    paths: Seq[String], required: StructType,
    ranges: Option[Seq[(String, Long, Long)]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-warc ${paths.mkString(",")} cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = ranges match {
    // ranged mode: one partition per file carrying its (sorted) byte
    // ranges — a CDX-driven lookup of R records over F files is F tasks
    // doing forward seeks, never a full scan
    case Some(rs) =>
      rs.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, g) =>
        WarcInputPartition(f, g.map(t => (t._2, t._3))): InputPartition
      }.toArray
    case None =>
      WarcScan.listFiles(paths, strict = true)
        .map(f => WarcInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcScan.readerFactory(required)

  /** Continuous crawl ingest: the same one-task-per-archive scan as a
    * micro-batch stream — each trigger processes the files that LANDED
    * since the last committed offset, exactly once (the offset is the
    * sorted seen-file list, checkpointed by the engine).
    *
    * LANDING-DIRECTORY CONTRACT (the standard Hadoop pattern, and what
    * makes the exactly-once claim true):
    *  - land archives ATOMICALLY: upload under a dot- or underscore-
    *    prefixed temp name (the listing skips those) and rename into
    *    place — a file listed mid-copy would otherwise be truncated by
    *    the lenient parser and permanently marked seen;
    *  - files are immutable once landed, and names are never reused;
    *  - keep the LIVE directory bounded by periodically archiving
    *    processed files elsewhere (removal is safe: a removed file simply
    *    leaves the listing; it is never re-planned). The offset payload
    *    and the per-trigger listing are both proportional to the CURRENT
    *    directory size, so rotation is what keeps a long-lived stream's
    *    checkpoint log and trigger latency flat — this source keeps the
    *    offset simple (the file list) rather than maintaining
    *    FileStreamSource-style compacted seen-file logs. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(paths, required)
}

private[warc] object WarcScan {
  /** Directory-recursion bound for [[listFiles]] (real crawl layouts are
    * ~3 deep; past this a symlink cycle is the only explanation). */
  private val MaxListDepth = 32

  /** Driver-side planning: expand globs/directories to data files.
    * `strict` (the batch path) refuses an empty match loudly; the
    * streaming path is lenient — an empty landing directory just means
    * no batch yet. */
  def listFiles(paths: Seq[String], strict: Boolean): Seq[String] = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(hconf)
      val matched: Array[FileStatus] =
        Option(fs.globStatus(hp)).getOrElse(Array.empty)
      if (matched.isEmpty && strict)
        throw graft.errors.FeatureFactoryException.InvalidParameter(
          s"graft-warc: no files match '$p'")
      // RECURSIVE directory expansion: crawl layouts nest (e.g.
      // crawl-data/<segment>/wet/...), and a non-recursive listing would
      // silently ingest a partial corpus — skip _/.-prefixed names
      // (atomic-landing temps, _SUCCESS markers) at EVERY level. Depth
      // is BOUNDED: a symlinked directory cycle must fail loudly at
      // planning time, not recurse forever
      def expand(st: FileStatus, depth: Int): Seq[FileStatus] =
        if (!st.isDirectory) Seq(st)
        else if (depth > MaxListDepth)
          throw graft.errors.FeatureFactoryException.InvalidParameter(
            s"graft-warc: directory nesting under '${st.getPath}' exceeds " +
              s"$MaxListDepth levels — symlink cycle?")
        else
          fs.listStatus(st.getPath).toSeq
            .filterNot { f =>
              val n = f.getPath.getName
              n.startsWith("_") || n.startsWith(".")
            }
            .flatMap(expand(_, depth + 1))
      matched.flatMap(expand(_, 0)).map(_.getPath.toString)
    }.sorted
  }

  /** Shared by the batch scan and every micro-batch: capture the Hadoop
    * conf as a plain map for the executors. */
  def readerFactory(required: StructType): PartitionReaderFactory = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    new WarcReaderFactory(
      hconf.asScala.map(e => e.getKey -> e.getValue).toMap,
      required.fieldNames)
  }
}

/** Offset = the sorted list of files already visible at that point; a
  * micro-batch is (end minus start). JSON round-trips through the engine's
  * offset log, which is what makes restarts exactly-once. */
private[warc] final case class WarcOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      org.json4s.JArray(files.map(org.json4s.JString(_)).toList)))
}

private[warc] class WarcMicroBatchStream(paths: Seq[String], required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = WarcOffset(Nil)
  override def latestOffset(): Offset =
    WarcOffset(WarcScan.listFiles(paths, strict = false))
  override def deserializeOffset(json: String): Offset =
    org.json4s.jackson.JsonMethods.parse(json) match {
      case org.json4s.JArray(xs) =>
        WarcOffset(xs.collect { case org.json4s.JString(s) => s })
      case _ => throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"graft-warc: malformed stream offset $json")
    }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcOffset].files.toSet
    end.asInstanceOf[WarcOffset].files.filterNot(seen)
      .map(f => WarcInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcScan.readerFactory(required)
}

private[warc] final case class WarcInputPartition(
    file: String, ranges: Seq[(Long, Long)] = Nil) extends InputPartition

private[warc] class WarcReaderFactory(
    conf: Map[String, String], columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcInputPartition]
    new WarcPartitionReader(p.file, conf, columns, p.ranges)
  }
}

/** Bounded view over a stream: reads at most `limit` bytes and never
  * closes the underlying stream — the per-range window of
  * [[WarcPartitionReader]]'s ranged mode (one shared seekable file
  * stream serves every range of the partition). */
private[warc] final class BoundedInputStream(in: InputStream, limit: Long)
    extends InputStream {
  private var left = limit
  override def read(): Int =
    if (left <= 0) -1
    else { val b = in.read(); if (b != -1) left -= 1; b }
  override def read(dst: Array[Byte], off: Int, len: Int): Int = {
    if (left <= 0) return -1
    val n = in.read(dst, off, math.min(len.toLong, left).toInt)
    if (n > 0) left -= n
    n
  }
  override def close(): Unit = () // the range reader owns the file stream
}

/** Streams one archive: open → sniff compression → [[WarcRecordIterator]] →
  * one
  * InternalRow per record, emitting only the pruned `columns`. Memory is
  * bounded by the largest single record regardless of archive size; when
  * `payload` is pruned away the record bytes are SKIPPED, never decoded.
  *
  * RANGED mode (`ranges` non-empty — the CDX random-access path): one
  * seekable file stream, ranges visited in offset order (forward seeks,
  * near-sequential I/O when ranges are index-sorted); each range is a
  * [[BoundedInputStream]] window re-sniffed for compression, so plain
  * `.warc` file offsets, member-per-record `.warc.gz` compressed member
  * offsets (the Common Crawl cc-index convention), and frame-per-record
  * `.warc.zst` frame offsets all fetch correctly (dictionary-compressed
  * zstd archives excepted — see [[WarcDataSource.maybeDecompress]]). `record_offset` of an emitted row = range offset + the
  * record's position within its window (0 for the record the range
  * points at). */
private[warc] class WarcPartitionReader(
    file: String, conf: Map[String, String], columns: Array[String],
    ranges: Seq[(Long, Long)] = Nil)
    extends PartitionReader[InternalRow] {

  private var fsin: org.apache.hadoop.fs.FSDataInputStream = _
  private var wrapped: InputStream = _
  private var it: Iterator[WarcRecord] = _
  private var index = -1L
  private var current: WarcRecord = _
  private var baseOffset = 0L
  private var rangeIdx = 0
  private val sortedRanges = ranges.sortBy(_._1)
  private val fileUtf8 = UTF8String.fromString(file)
  // the http_* columns are parsed out of the payload bytes, so asking for
  // either forces the decode just like asking for the payload itself
  private val wantPayload = columns.exists(c =>
    c == "payload" || c == "http_status" || c == "http_content_type" ||
      c == "http_location" || c == "http_robots_tag" ||
      c == "http_coding_unsupported")

  private def openFile(): Unit = if (fsin == null) {
    val hconf = new Configuration()
    conf.foreach { case (k, v) => hconf.set(k, v) }
    val hp = new Path(file)
    fsin = hp.getFileSystem(hconf).open(hp)
  }

  /** Advance to the next record source: the whole file (full-scan mode,
    * once) or the next byte range. False when exhausted. */
  private def nextIterator(): Boolean = {
    if (sortedRanges.isEmpty) {
      if (it != null) return false
      openFile()
      wrapped = WarcDataSource.maybeDecompress(fsin)
      it = new WarcRecordIterator(wrapped, decodePayload = wantPayload)
      true
    } else if (rangeIdx < sortedRanges.length) {
      openFile()
      val (off, len) = sortedRanges(rangeIdx)
      rangeIdx += 1
      // close the previous window's wrapper (frees a gzip Inflater; the
      // BoundedInputStream shields the shared file stream)
      if (wrapped != null) wrapped.close()
      // LENIENT seek: a stale index entry (offset past EOF after an
      // archive was rewritten, corrupt member bytes) yields zero rows
      // for THAT range — one bad index line must not abort a lookup job
      // (the WarcRecordIterator torn-tail rule, applied to windows)
      try {
        fsin.seek(off)
        baseOffset = off
        wrapped = WarcDataSource.maybeDecompress(new BoundedInputStream(fsin, len))
        it = new WarcRecordIterator(wrapped, decodePayload = wantPayload)
      } catch {
        case scala.util.control.NonFatal(_) =>
          wrapped = null
          it = Iterator.empty
      }
      true
    } else false
  }

  override def next(): Boolean = {
    if (it == null && !nextIterator()) return false
    while (!it.hasNext) if (!nextIterator()) return false
    current = it.next(); index += 1; true
  }

  // field extractors resolved ONCE from the pruned column list — the
  // per-record path below is just an array walk, no per-row name dispatch
  private val extractors: Array[WarcRecord => Any] = {
    def s(x: String): UTF8String = if (x == null) null else UTF8String.fromString(x)
    columns.map[WarcRecord => Any] {
      case "warc_file" => _ => fileUtf8
      case "record_index" => _ => index
      case "warc_type" => r => s(r.warcType)
      case "record_id" => r => s(r.recordId)
      case "target_uri" => r => s(r.targetUri)
      case "warc_date" => r => s(r.warcDate)
      case "content_type" => r => s(r.contentType)
      case "content_length" => r => r.contentLength
      case "http_status" => r => r.httpStatus
      case "http_content_type" => r => s(r.httpContentType)
      case "http_location" => r => s(r.httpLocation)
      case "http_robots_tag" => r => s(r.httpRobotsTag)
      case "http_coding_unsupported" => r => r.httpCodingUnsupported
      case "payload_digest" => r => s(r.payloadDigest)
      case "truncated" => r => s(r.truncated)
      case "record_offset" => r => r.offset + baseOffset
      case "record_length" => r => r.length
      case "payload" => r => s(r.payload)
    }
  }

  override def get(): InternalRow =
    new GenericInternalRow(extractors.map(_.apply(current)))

  override def close(): Unit = {
    if (wrapped != null) wrapped.close()
    if (fsin != null) fsin.close()
  }
}
