package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** WARC-flavored web-archive source/sink — the container format crawl
  * corpora ship in (Common Crawl et al.): many independent archive
  * files, each a concatenation of length-prefixed records. Spark has no
  * built-in reader for record-concatenated binary containers; this one
  * follows the format's own scale contract instead of fighting it:
  *
  * - **Parallelism is per-FILE, not per-block.** A WARC record's
  *   boundary is only discoverable by walking headers (Content-Length),
  *   so mid-file splits cannot resync reliably; real archives are kept
  *   at ~1 GiB precisely so that file-granular parallelism is enough.
  *   The reader maps one `binaryFile` row → one record walk. (Gzipped
  *   member-per-record WARCs allow finer splitting; out of scope here.)
  * - **Malformed records are counted, not silently dropped, not
  *   poison.** A record that fails its header walk emits a marker row
  *   (null doc_id, the archive path, the byte offset) and ABORTS that
  *   archive's remaining bytes — without a trustworthy Content-Length
  *   there is no safe resync point, and guessing one would mis-attribute
  *   bytes across records. The abort is visible in the count; the other
  *   archives are unaffected (the blast radius of one truncated upload
  *   is one file, the format's own failure unit).
  * - **Reject accounting is single-pass** via `observe()` metrics on the
  *   frame the caller consumes, like [[Jsonl.readDocumentsCounted]].
  *
  * Record layout written/parsed (WARC/1.0-shaped, deterministic):
  * {{{
  * WARC/1.0\r\n
  * WARC-Record-ID: <doc_id>\r\n
  * WARC-Type: resource\r\n
  * X-Graft-Lang: <lang>\r\n
  * X-Graft-Source: <source>\r\n
  * X-Graft-NChars: <n_chars>\r\n
  * Content-Length: <byte length of body>\r\n
  * \r\n
  * <body bytes (UTF-8 text)>\r\n\r\n
  * }}}
  */
object Warc {

  private val Magic = "WARC/1.0"
  private val Crlf = "\r\n"

  /** Serialize one document record. */
  def encodeRecord(docId: Long, text: String, lang: String, source: String, nChars: Long): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val header = new StringBuilder()
      .append(Magic).append(Crlf)
      .append("WARC-Record-ID: ").append(docId).append(Crlf)
      .append("WARC-Type: resource").append(Crlf)
      .append("X-Graft-Lang: ").append(lang).append(Crlf)
      .append("X-Graft-Source: ").append(source).append(Crlf)
      .append("X-Graft-NChars: ").append(nChars).append(Crlf)
      .append("Content-Length: ").append(body.length).append(Crlf)
      .append(Crlf)
      .toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](header.length + body.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(body, 0, out, header.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write a document table as `nArchives` archive files under `dir`
    * (`archive-<k>.warc`, k = doc_id mod nArchives, records in doc_id
    * order — deterministic bytes for a deterministic input). Each
    * archive is written by the executor that owns its rows through the
    * Hadoop FileSystem API (so `dir` may be any supported scheme);
    * hash-partitioning on the archive key means an archive never has
    * two writers. `nArchives` is the write-side parallelism AND the
    * read-side parallelism — size it like real crawls do (~1 GiB per
    * archive), not to the cluster's core count.
    */
  def writeArchives(docs: DataFrame, dir: String, nArchives: Int): Unit =
    writeArchivesImpl(docs, dir, nArchives, gz = false)

  private def writeArchivesImpl(docs: DataFrame, dir: String, nArchives: Int, gz: Boolean): Unit = {
    require(nArchives >= 1, s"nArchives must be >= 1, got $nArchives")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        pmod(col("doc_id"), lit(nArchives.toLong)).as("_a"),
        col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(nArchives, col("_a"))
      .sortWithinPartitions("_a", "doc_id")
      .as[(Long, Long, String, String, String, Long)]
      .foreachPartition { (rows: Iterator[(Long, Long, String, String, String, Long)]) =>
        var current = -1L
        var out: java.io.OutputStream = null
        // default Hadoop conf on the executor: scheme resolution is all
        // the writer needs (file://, hdfs://); credentialed object-store
        // schemes would thread the session conf through a broadcast
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        // archives are integrity-checked by their own record framing
        // (Content-Length + trailer); local-FS .crc sidecars would only
        // shadow the format's own damage accounting
        fs.setWriteChecksum(false)
        try {
          rows.foreach { case (a, id, text, lang, source, nChars) =>
            if (a != current) {
              if (out != null) out.close()
              val name = if (gz) s"archive-$a.warc.gz" else s"archive-$a.warc"
              out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
              current = a
            }
            val rec = encodeRecord(id, text, lang, source, nChars)
            out.write(if (gz) gzipMember(rec) else rec)
          }
        } finally if (out != null) out.close()
      }
  }

  /** Walk one archive's bytes into parsed rows. Emits
    * `(docId, text, lang, source, nChars, ok, offset)`; on the first
    * malformed record emits one `ok = false` marker carrying the byte
    * offset and stops (see object doc for why there is no resync).
    */
  def parseArchive(path: String, bytes: Array[Byte]): Iterator[(Option[Long], String, String, String, Option[Long], Boolean, Long)] =
    new Iterator[(Option[Long], String, String, String, Option[Long], Boolean, Long)] {
      private var pos = 0
      private var dead = false
      def hasNext: Boolean = !dead && pos < bytes.length
      def next(): (Option[Long], String, String, String, Option[Long], Boolean, Long) = {
        val start = pos
        parseOne() match {
          case Some(row) => row
          case None =>
            dead = true
            (None, null, null, null, None, false, start.toLong)
        }
      }
      private def parseOne(): Option[(Option[Long], String, String, String, Option[Long], Boolean, Long)] = {
        val start = pos
        // header block ends at the first \r\n\r\n
        var hEnd = -1
        var i = start
        while (hEnd < 0 && i + 3 < bytes.length) {
          if (bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' && bytes(i + 3) == '\n')
            hEnd = i
          i += 1
        }
        if (hEnd < 0) return None
        val header = new String(bytes, start, hEnd - start, java.nio.charset.StandardCharsets.UTF_8)
        val lines = header.split("\r\n", -1)
        if (lines.isEmpty || lines(0) != Magic) return None
        val kv = lines.iterator.drop(1).flatMap { l =>
          val c = l.indexOf(": ")
          if (c < 0) None else Some(l.substring(0, c) -> l.substring(c + 2))
        }.toMap
        val parsed = for {
          id <- kv.get("WARC-Record-ID").flatMap(_.toLongOption)
          len <- kv.get("Content-Length").flatMap(_.toIntOption).filter(_ >= 0)
          lang <- kv.get("X-Graft-Lang")
          source <- kv.get("X-Graft-Source")
          nChars <- kv.get("X-Graft-NChars").flatMap(_.toLongOption)
          bodyStart = hEnd + 4
          bodyEnd = bodyStart + len
          // body must fit AND be followed by the record trailer
          if bodyEnd + 4 <= bytes.length &&
            bytes(bodyEnd) == '\r' && bytes(bodyEnd + 1) == '\n' &&
            bytes(bodyEnd + 2) == '\r' && bytes(bodyEnd + 3) == '\n'
        } yield {
          pos = bodyEnd + 4
          (Some(id),
            new String(bytes, bodyStart, len, java.nio.charset.StandardCharsets.UTF_8),
            lang, source, Some(nChars), true, start.toLong)
        }
        parsed
      }
    }

  /** Single-pass read: `docs` in the `documents` shape plus deferred
    * reject accounting riding the caller's own first action (the
    * [[Jsonl.JsonlScan]] contract). `rejects` is the count of marker
    * rows: malformed/truncated records, one per aborted archive tail.
    */
  final case class WarcScan(docs: DataFrame, observation: Observation) {
    def records: Long = observation.get("records").asInstanceOf[Long]
    def rejects: Long = observation.get("rejects").asInstanceOf[Long]
  }

  def readArchivesCounted(spark: SparkSession, dir: String): WarcScan = {
    import spark.implicits._
    val obs = Observation()
    val parsed = spark.read.format("binaryFile")
      .load(new org.apache.hadoop.fs.Path(dir, "*.warc").toString)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseArchive(path, bytes) }
      .toDF("doc_id", "text", "lang", "source", "n_chars", "_ok", "_offset")
      .observe(obs,
        count(lit(1)).as("records"),
        count(when(!col("_ok"), lit(1))).as("rejects"))
    WarcScan(
      parsed.where(col("_ok"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")),
      obs)
  }

  /** One gzip MEMBER per record — the compressed form crawl archives
    * actually ship (`.warc.gz`): each record is independently
    * deflated, members are concatenated per file, so real deployments
    * can range-request/recover at member boundaries. Java's
    * GZIPOutputStream writes a fixed zero-MTIME header — the bytes are
    * a pure function of the record.
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Decompress a concatenation of gzip members (GZIPInputStream handles
    * member boundaries natively). Returns (decompressed prefix, damaged):
    * a corrupt/truncated member yields everything cleanly inflated
    * before it plus `damaged = true` — the caller charges the aborted
    * tail as ONE reject, same blast radius as the uncompressed reader.
    */
  def gunzipMembers(bytes: Array[Byte]): (Array[Byte], Boolean) = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      (out.toByteArray, false)
    } catch {
      case _: java.io.IOException => (out.toByteArray, true)
    }
  }

  /** [[writeArchives]] with per-record gzip members (`archive-<k>.warc.gz`). */
  def writeArchivesGz(docs: DataFrame, dir: String, nArchives: Int): Unit =
    writeArchivesImpl(docs, dir, nArchives, gz = true)

  /** [[readArchivesCounted]] over member-gzipped archives: decompress
    * the member concatenation per file, then the same record walk. A
    * damaged member aborts that archive's remaining bytes as exactly
    * one counted reject (records cleanly inflated before it survive) —
    * the same failure-unit contract as the plain reader.
    */
  def readArchivesGzCounted(spark: SparkSession, dir: String): WarcScan = {
    import spark.implicits._
    val obs = Observation()
    val parsed = spark.read.format("binaryFile")
      .load(new org.apache.hadoop.fs.Path(dir, "*.warc.gz").toString)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val (plain, damaged) = gunzipMembers(bytes)
        val rows = parseArchive(path, plain).toVector
        if (!damaged) rows
        else if (rows.lastOption.exists(!_._6)) rows // parse already charged the tail
        else rows :+ ((Option.empty[Long], null: String, null: String, null: String,
          Option.empty[Long], false, plain.length.toLong))
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars", "_ok", "_offset")
      .observe(obs,
        count(lit(1)).as("records"),
        count(when(!col("_ok"), lit(1))).as("rejects"))
    WarcScan(
      parsed.where(col("_ok"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")),
      obs)
  }

  /** Eager convenience form: (clean docs, reject count) — the counting
    * action runs here, so the caller's own consumption re-parses the
    * archives once more (two walks total, the [[Jsonl.readDocuments]]
    * contract — no persist is taken out on the caller's behalf, so
    * nothing is left pinned in the block manager). A single-scan ingest
    * should use [[readArchivesCounted]].
    */
  def readArchives(spark: SparkSession, dir: String): (DataFrame, Long) = {
    val scan = readArchivesCounted(spark, dir)
    scan.docs.count()
    (scan.docs, scan.rejects)
  }
}
