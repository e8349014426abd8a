package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for member-gzipped WARC archives —
  * `spark.read.format("warcgz").load(dir)` — the Spark-native form of
  * [[Warc.readArchivesGzIndexedCounted]]'s record-granular split read:
  *
  *  - **Planning is driver-side metadata only**: one filesystem LISTING
  *    of `*.warc.gz` (no Spark jobs, no sidecar reads at plan time) and
  *    one InputPartition per `maxSplitBytes` byte range of each archive.
  *    The two-job split-table shape of the function API disappears.
  *  - **Each reader task** loads only ITS archive's tiny `.idx` sidecar,
  *    keeps the members whose offsets START inside its byte range (so
  *    every member is owned by exactly one task), positioned-reads that
  *    contiguous span, inflates, and walks records.
  *  - **Required-column pushdown** (`SupportsPushDownRequiredColumns`):
  *    a query that doesn't project `text` never materializes body
  *    strings — the record walk skips the UTF-8 decode entirely, so
  *    `count(*)`/metadata scans read headers only. The pruned schema is
  *    visible in `.explain` as ReadSchema, like any native source.
  *  - **Damage contract** unchanged: a member the file can no longer
  *    serve, or one that fails its header walk, is one `_ok = false`
  *    marker row for that task's aborted tail.
  *
  * Options: `maxSplitBytes` (default 256 MiB) bounds a task's byte
  * range. Archives must carry the writer's `.warc.gz.idx` sidecars
  * (the cdx-index contract); a missing sidecar fails planning loudly —
  * foreign un-indexed archives use [[Warc.readArchivesGzCounted]].
  */
class WarcGzSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warcgz"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcGzSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcGzTable(properties.get("path"), properties)
}

object WarcGzSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_ok", BooleanType, nullable = false),
    StructField("_offset", LongType, nullable = false)))

  val DefaultMaxSplitBytes: Long = 256L << 20
}

final class WarcGzTable(path: String, properties: util.Map[String, String])
    extends Table with SupportsRead {
  require(path != null, "warcgz requires a load(path)")
  override def name(): String = s"warcgz($path)"
  override def schema(): StructType = WarcGzSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcGzScanBuilder(path, options)
}

final class WarcGzScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcGzSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    val msb = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(WarcGzSource.DefaultMaxSplitBytes)
    require(msb >= 1, s"maxSplitBytes must be >= 1, got $msb")
    new WarcGzScan(path, required, msb)
  }
}

/** One InputPartition: the members of `archive` whose first byte lies in
  * [rangeStart, rangeEnd). Byte ranges tile the archive, so member
  * ownership is exact with no sidecar reads at plan time.
  */
final case class WarcGzPartition(archive: String, rangeStart: Long, rangeEnd: Long)
  extends InputPartition

final class WarcGzScan(path: String, required: StructType, maxSplitBytes: Long)
    extends Scan with Batch {
  // the SESSION's Hadoop conf (spark.hadoop.* — object-store credentials,
  // fs overrides), captured at build time and shipped to the readers as
  // plain properties: a bare `new Configuration()` would ignore it and
  // break format("warcgz") on any credentialed scheme
  private val hadoopProps: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
      .asScala.map(e => e.getKey -> e.getValue).toMap
  }
  private def hadoopConf(): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => c.set(k, v) }
    c
  }
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warcgz $path (maxSplitBytes=$maxSplitBytes, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf())
    val archives = fs.globStatus(new org.apache.hadoop.fs.Path(path, "*.warc.gz"))
    if (archives == null || archives.isEmpty) return Array.empty
    archives.flatMap { st =>
      val ap = st.getPath
      require(fs.exists(ap.suffix(".idx")),
        s"$ap has no .warc.gz.idx sidecar — warcgz needs the writer's member index; " +
          "read foreign un-indexed archives with Warc.readArchivesGzCounted")
      val len = st.getLen
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until n).map(k => WarcGzPartition(
        ap.toString, k * maxSplitBytes, if (k == n - 1) Long.MaxValue else (k + 1) * maxSplitBytes))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcGzReaderFactory(required, hadoopProps)
}

final class WarcGzReaderFactory(required: StructType, hadoopProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcGzPartitionReader(partition.asInstanceOf[WarcGzPartition], required, hadoopProps)
}

final class WarcGzPartitionReader(
    part: WarcGzPartition,
    required: StructType,
    hadoopProps: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val needText = required.fieldNames.contains("text")
  // positions of the pruned columns in the full schema — computed BEFORE
  // `rows` (vals initialize in declaration order; the degraded-file
  // branch materializes a marker row eagerly)
  private val fieldIdx: Array[Int] =
    required.fieldNames.map(n => WarcGzSource.Schema.fieldIndex(n))

  private val rows: Iterator[InternalRow] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(part.archive)
    val fs = p.getFileSystem(conf)
    // the task's member set: sidecar lines whose offset starts in-range
    val idxIn = fs.open(p.suffix(".idx"))
    val idxBytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = idxIn.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = idxIn.read(buf) }
      out.toByteArray
    } finally idxIn.close()
    val mine = new String(idxBytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator
      .filter(_.nonEmpty)
      .map { l => val f = l.split(" "); (f(1).toLong, f(2).toLong) } // (off, len)
      .filter { case (off, _) => off >= part.rangeStart && off < part.rangeEnd }
      .toArray
    if (mine.isEmpty) Iterator.empty
    else {
      val start = mine.map(_._1).min
      val span = mine.map { case (o, l) => o + l }.max - start
      // ONE shared implementation of the positioned-read damage contract
      // (Warc.readGzSpanTuples) — body decode skipped when `text` is
      // pruned away (Content-Length steps over the bytes)
      Warc.readGzSpanTuples(fs, p, start, span, decodeBody = needText)
        .iterator.map {
          case (id, text, lang, source, nChars, ok, off) =>
            if (ok) emit(Array[Any](
              id.get, if (text == null) null else UTF8String.fromString(text),
              UTF8String.fromString(lang), UTF8String.fromString(source),
              nChars.get, true, off))
            else emit(Array[Any](null, null, null, null, null, false, off))
        }
    }
  }

  /** Build the pruned row directly: one allocation at the required
    * width, no intermediate full row, no per-field type dispatch.
    */
  private def emit(full: Array[Any]): InternalRow = {
    val out = new Array[Any](fieldIdx.length)
    var i = 0
    while (i < fieldIdx.length) { out(i) = full(fieldIdx(i)); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private var current: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
