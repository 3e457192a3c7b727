package graft.sources.warc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** The WRITE half of the `graft-warc` source: exports rows as WARC/1.0
  * records — the interchange format of the crawl world, so a curated
  * corpus leaves this engine the same way it arrived (WET-style
  * `conversion` records a downstream consumer, including this library's
  * own reader, ingests unchanged).
  *
  * Input contract (by column name; extra columns are rejected loudly —
  * silently dropping data from an EXPORT is the one thing an archive
  * writer must never do):
  *   - required: `warc_type`, `record_id`, `target_uri`, `warc_date`,
  *     `content_type`, `payload` (strings; `target_uri` may be null —
  *     its header is omitted then, the ISO 28500 rule);
  *   - optional: `payload_digest` (written as WARC-Payload-Digest when
  *     non-null).
  * `Content-Length` is computed from the payload's UTF-8 bytes — the
  * framing truth can never disagree with the body.
  *
  * Scale shape: one archive file per input partition, written
  * executor-side straight to the partition's Hadoop filesystem (local,
  * HDFS, object store) — no driver funnel, no shuffle; a 100 TB export
  * is as parallel as its input. Files land as
  * `part-<partition>-<task attempt>.warc`; commit is rename-free (each
  * attempt writes a unique name and abort deletes it, the same
  * idempotence story as the reader's landing-directory contract).
  * SaveMode.Overwrite maps to TRUNCATE: the target directory's previous
  * part files are removed at job start, driver-side. */
private[warc] class WarcWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new WarcWrite(
    path, info.schema(), doTruncate,
    codec = Option(info.options().get("codec")).getOrElse(""))
}

private[warc] class WarcWrite(
    path: String, schema: StructType, doTruncate: Boolean,
    codec: String = "")
    extends Write with BatchWrite {
  WarcWriteSupport.validateSchema(schema)
  require(codec == "" || codec == "gzip-member" || codec == "zstd-member",
    s"graft-warc write: unknown codec '$codec' — use gzip-member, " +
      "zstd-member, or none")
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val hconf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val conf = {
      import scala.jdk.CollectionConverters._
      hconf.asScala.map(e => e.getKey -> e.getValue).toMap
    }
    // driver-side, before any task runs: TRUNCATE = clear previous parts
    val hp = new Path(path)
    val fs = hp.getFileSystem(hconf)
    if (doTruncate && fs.exists(hp)) fs.delete(hp, true)
    fs.mkdirs(hp)
    new WarcWriterFactory(path, conf, schema, codec)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    WarcWriteSupport.deleteOutputs(messages)

  /** The STREAMING write — live curation-to-archive: each micro-batch's
    * partition appends one `part-<partition>-e<epoch>.warc[.gz]` file.
    * File names are deterministic in (partition, epoch), so a REPLAYED
    * epoch (failure recovery) overwrites its own files instead of
    * duplicating records — idempotent per epoch, the file-sink
    * convention without the metadata log. Caveat (documented, not
    * hidden): two CONCURRENT attempts of one task (speculative
    * execution) are not coordinated — last writer wins; disable
    * speculation for archive sinks or accept it. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
      override def createStreamingWriterFactory(
          info: PhysicalWriteInfo): StreamingDataWriterFactory = {
        val hconf = org.apache.spark.sql.SparkSession.active
          .sessionState.newHadoopConf()
        val conf = {
          import scala.jdk.CollectionConverters._
          hconf.asScala.map(e => e.getKey -> e.getValue).toMap
        }
        val hp = new Path(path)
        hp.getFileSystem(hconf).mkdirs(hp)
        WarcStreamingWriterFactory(path, conf, schema, codec)
      }
      override def commit(
          epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(
          epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        WarcWriteSupport.deleteOutputs(messages)
    }
}

private[warc] final case class WarcCommitMessage(file: String)
    extends WriterCommitMessage

/** Serializable factory of the streaming sink (a closure over the anon
  * StreamingWrite would drag a non-serializable parent to executors). */
private[warc] final case class WarcStreamingWriterFactory(
    path: String, conf: Map[String, String], schema: StructType,
    codec: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(path, conf, schema, partitionId, taskId,
      codec, epoch = Some(epochId))
}

private[warc] class WarcWriterFactory(
    path: String, conf: Map[String, String], schema: StructType,
    codec: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(path, conf, schema, partitionId, taskId, codec)
}

/** Streams one partition's rows into one `part-…​.warc` file.
  *
  * `codec = "gzip-member"` / `"zstd-member"` are the RANDOM-ACCESSIBLE
  * compressed layouts: each record is its own gzip member (Common
  * Crawl's `.warc.gz` framing) or its own zstd frame (the newer
  * `.warc.zst` tooling convention — one frame per record, no shared
  * dictionary, so every frame decodes standalone), and — because only
  * the WRITER knows each member's compressed start — a sibling
  * `part-….offsets.jsonl` records `{"record_id", "offset", "length"}`
  * per member (the coordinates
  * [[graft.sources.Loader.loadWarcRanges]] fetches by; a full CDX
  * index composes from this plus the main table's urlkeys). Both
  * layouts still read sequentially through the normal loader
  * (multi-member inflate / multi-frame decode). */
private[warc] class WarcDataWriter(
    path: String, conf: Map[String, String], schema: StructType,
    partitionId: Int, taskId: Long, codec: String,
    epoch: Option[Long] = None)
    extends DataWriter[InternalRow] {

  private val members = codec.nonEmpty
  private val suffix = codec match {
    case "gzip-member" => "warc.gz"
    case "zstd-member" => "warc.zst"
    case _ => "warc"
  }
  // batch: task-attempt-unique names (abort deletes them). streaming:
  // (partition, epoch)-DETERMINISTIC names, so an epoch replay
  // overwrites itself — idempotence without a metadata log
  private val stem = epoch match {
    case Some(e) => f"$path/part-$partitionId%05d-e$e"
    case None => f"$path/part-$partitionId%05d-$taskId"
  }
  private val file = s"$stem.$suffix"
  private val offsetsFile = s"$stem.offsets.jsonl"
  private val idx = WarcWriteSupport.fieldIndexes(schema)
  private var out: java.io.OutputStream = _
  private var offsetsOut: java.io.Writer = _
  private var bytesWritten = 0L

  private def fs(f: String) = {
    val hconf = new Configuration()
    conf.foreach { case (k, v) => hconf.set(k, v) }
    new Path(f).getFileSystem(hconf)
  }

  private def ensureOpen(): Unit = if (out == null) {
    out = new java.io.BufferedOutputStream(
      fs(file).create(new Path(file), true), 1 << 16)
    if (members)
      offsetsOut = new java.io.OutputStreamWriter(
        fs(offsetsFile).create(new Path(offsetsFile), true), "UTF-8")
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    def s(i: Int): String = if (row.isNullAt(i)) null else row.getUTF8String(i).toString
    val payload = {
      val p = s(idx.payload)
      if (p == null) "" else p
    }
    val body = payload.getBytes("UTF-8")
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(s(idx.warcType)).append("\r\n")
    sb.append("WARC-Record-ID: ").append(s(idx.recordId)).append("\r\n")
    sb.append("WARC-Date: ").append(s(idx.warcDate)).append("\r\n")
    val uri = s(idx.targetUri)
    if (uri != null) sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    idx.payloadDigest.foreach { di =>
      val d = s(di)
      if (d != null) sb.append("WARC-Payload-Digest: ").append(d).append("\r\n")
    }
    sb.append("Content-Type: ").append(s(idx.contentType)).append("\r\n")
    sb.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    if (members) {
      val member =
        if (codec == "gzip-member") {
          val bo = new java.io.ByteArrayOutputStream(head.length + body.length)
          val gz = new java.util.zip.GZIPOutputStream(bo)
          gz.write(head); gz.write(body); gz.write(WarcWriteSupport.Separator)
          gz.close()
          bo.toByteArray
        } else { // zstd-member: one standalone frame per record
          val raw = new Array[Byte](
            head.length + body.length + WarcWriteSupport.Separator.length)
          System.arraycopy(head, 0, raw, 0, head.length)
          System.arraycopy(body, 0, raw, head.length, body.length)
          System.arraycopy(WarcWriteSupport.Separator, 0, raw,
            head.length + body.length, WarcWriteSupport.Separator.length)
          com.github.luben.zstd.Zstd.compress(raw)
        }
      out.write(member)
      // JSON by hand is safe here: record_id is angle-bracket URN text the
      // schema requires, offsets are integers — but escape quotes anyway
      val rid = s(idx.recordId).replace("\\", "\\\\").replace("\"", "\\\"")
      val fn = file.replace("\\", "\\\\").replace("\"", "\\\"")
      offsetsOut.write(
        s"""{"record_id": "$rid", "filename": "$fn", """ +
          s""""offset": $bytesWritten, "length": ${member.length}}\n""")
      bytesWritten += member.length
    } else {
      out.write(head)
      out.write(body)
      out.write(WarcWriteSupport.Separator)
    }
  }

  override def commit(): WriterCommitMessage = {
    close()
    WarcCommitMessage(file)
  }

  override def abort(): Unit = {
    close()
    fs(file).delete(new Path(file), false)
    if (members) fs(offsetsFile).delete(new Path(offsetsFile), false)
  }

  override def close(): Unit = {
    if (out != null) { out.close(); out = null }
    if (offsetsOut != null) { offsetsOut.close(); offsetsOut = null }
  }
}

private[warc] object WarcWriteSupport {
  val Separator: Array[Byte] = "\r\n\r\n".getBytes("UTF-8")

  /** Job-level abort cleanup: each committed message names its archive
    * file; the member modes also leave an offsets sidecar next to
    * it (same stem) — delete BOTH, or an aborted job strands a sidecar
    * pointing at a deleted archive.
    *
    * Runs driver-side (DSV2 job abort), so the SESSION Hadoop conf is the
    * one that resolved the output filesystem at write time — a bare
    * `new Configuration()` would miss S3/HDFS credentials configured via
    * the session and fail the cleanup, stranding part files. Falls back
    * to the default conf only when no session is active (can't happen in
    * a real abort path; keeps the call total). */
  def deleteOutputs(messages: Array[WriterCommitMessage]): Unit = {
    val hconf =
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration())
    messages.foreach {
      case WarcCommitMessage(f) =>
        val p = new Path(f)
        val fs = p.getFileSystem(hconf)
        fs.delete(p, false)
        val sidecar = new Path(
          f.replaceAll("\\.warc(\\.gz|\\.zst)?$", "") + ".offsets.jsonl")
        if (fs.exists(sidecar)) fs.delete(sidecar, false)
      case _ => ()
    }
  }

  final case class Indexes(
      warcType: Int, recordId: Int, targetUri: Int, warcDate: Int,
      contentType: Int, payload: Int, payloadDigest: Option[Int])

  val Required: Seq[String] = Seq(
    "warc_type", "record_id", "target_uri", "warc_date",
    "content_type", "payload")
  val Optional: Set[String] = Set("payload_digest")

  def validateSchema(schema: StructType): Unit = {
    val names = schema.fieldNames.toSet
    val missing = Required.filterNot(names)
    if (missing.nonEmpty)
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"graft-warc write: missing required columns ${missing.mkString(", ")}")
    val extra = names -- Required.toSet -- Optional
    if (extra.nonEmpty)
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"graft-warc write: unexpected columns ${extra.toSeq.sorted.mkString(", ")} " +
          "— an archive export never drops data silently; select the " +
          "contract columns explicitly")
    val nonString = (Required ++ Optional.toSeq.filter(names))
      .filter(n => names(n) &&
        schema(n).dataType != org.apache.spark.sql.types.StringType)
    if (nonString.nonEmpty)
      throw graft.errors.FeatureFactoryException.InvalidParameter(
        s"graft-warc write: non-string columns ${nonString.mkString(", ")} " +
          "— cast before export")
  }

  def fieldIndexes(schema: StructType): Indexes = Indexes(
    schema.fieldIndex("warc_type"), schema.fieldIndex("record_id"),
    schema.fieldIndex("target_uri"), schema.fieldIndex("warc_date"),
    schema.fieldIndex("content_type"), schema.fieldIndex("payload"),
    if (schema.fieldNames.contains("payload_digest"))
      Some(schema.fieldIndex("payload_digest"))
    else None)
}
