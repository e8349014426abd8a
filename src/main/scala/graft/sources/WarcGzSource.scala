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
  *  - **Sidecar trust caveat** (COUNT(*) pushdown + zone-map skips):
  *    both shortcuts answer from the writer-committed `.idx` without
  *    inflating members, guarded by the archive-length check
  *    (truncation → fall back to the header walk). IN-PLACE corruption
  *    that preserves the archive's length is NOT detectable from
  *    metadata: a pushed `count(*)` then reports the sidecar's member
  *    count while an unpushed record scan reports survivors + one
  *    marker row — pushed and unpushed counts diverge on
  *    damaged-but-full-length archives (pinned in ExtSpec). The
  *    sidecar is committed atomically with the archive, so this is a
  *    bit-rot/tamper case, not a normal pipeline state; audit damage
  *    with the record scan (`_ok = false` markers), not counts.
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

  /** Partial-count schema when COUNT(*) is pushed down (one LongType
    * partial per partition; Spark sums them).
    */
  val CountSchema: StructType =
    StructType(Seq(StructField("count_star", LongType, nullable = false)))

  /** The archive's `.idx` sidecar, one string per non-empty line —
    * member entries plus optional `#`-prefixed metadata lines (the
    * `#zmap` zone map). Shared by the record, count and zone readers so
    * the sidecar is fetched once per task.
    */
  def sidecarLines(
      fs: org.apache.hadoop.fs.FileSystem,
      archive: org.apache.hadoop.fs.Path): Array[String] = {
    val idxIn = fs.open(archive.suffix(".idx"))
    val idxBytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = idxIn.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = idxIn.read(buf) }
      out.toByteArray
    } finally idxIn.close()
    new String(idxBytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator
      .filter(_.nonEmpty)
      .toArray
  }

  /** Member (offset, length) entries from sidecar lines — `#` metadata
    * lines are skipped, so zone-mapped and legacy sidecars parse alike.
    */
  def membersFrom(lines: Array[String]): Array[(Long, Long)] =
    lines.iterator
      .filter(!_.startsWith("#"))
      .map { l => val f = l.split(" "); (f(1).toLong, f(2).toLong) } // (off, len)
      .toArray

  /** The archive's `.idx` sidecar as (offset, length) member entries —
    * the shared parse for the record reader and the count reader.
    */
  def sidecarMembers(
      fs: org.apache.hadoop.fs.FileSystem,
      archive: org.apache.hadoop.fs.Path): Array[(Long, Long)] =
    membersFrom(sidecarLines(fs, archive))

  /** Past this many distinct lang/source values the zone map stores `*`
    * (unbounded) — dictionaries are a skip aid, not a column store.
    */
  val MaxZoneDict: Int = 16

  /** Per-archive zone map (min/max of the integer header columns,
    * bounded dictionaries of the string ones) carried as ONE `#zmap`
    * comment line in the `.idx` sidecar. `langs`/`sources` = None means
    * the dictionary overflowed (`*`): the column can't refute anything.
    * Trust contract: like the member counts feeding the COUNT(*)
    * pushdown, the zone map is the WRITER's word, committed atomically
    * with the archive — a hand-edited archive with a stale sidecar can
    * make a zone-skipped scan miss rows, exactly as it can mis-count.
    */
  final case class WarcZoneMap(
      minId: Long, maxId: Long,
      minChars: Long, maxChars: Long,
      langs: Option[Set[String]], sources: Option[Set[String]])

  /** Parse the `#zmap` line (if present and well-formed — a malformed
    * line degrades to "no zone map", never to an error or a wrong skip).
    * Line shape: `#zmap doc_id <min> <max> n_chars <min> <max> lang
    * <dict|*> source <dict|*>` with dictionary values URL-encoded and
    * comma-joined.
    */
  def zoneFrom(lines: Array[String]): Option[WarcZoneMap] =
    lines.find(_.startsWith("#zmap ")).flatMap { l =>
      try {
        val f = l.split(" ")
        def dict(s: String): Option[Set[String]] =
          if (s == "*") None
          else Some(s.split(",").iterator.filter(_.nonEmpty)
            .map(java.net.URLDecoder.decode(_, "UTF-8")).toSet)
        if (f.length == 11 && f(1) == "doc_id" && f(4) == "n_chars" &&
          f(7) == "lang" && f(9) == "source")
          Some(WarcZoneMap(f(2).toLong, f(3).toLong, f(5).toLong, f(6).toLong,
            dict(f(8)), dict(f(10))))
        else None
      } catch { case _: RuntimeException => None }
    }

  /** Accumulates one archive's zone map while its members are written. */
  final class ZoneMapBuilder {
    private var any = false
    private var minId = Long.MaxValue
    private var maxId = Long.MinValue
    private var minChars = Long.MaxValue
    private var maxChars = Long.MinValue
    private val langs = scala.collection.mutable.HashSet.empty[String]
    private val sources = scala.collection.mutable.HashSet.empty[String]
    def add(id: Long, lang: String, source: String, nChars: Long): Unit = {
      any = true
      if (id < minId) minId = id
      if (id > maxId) maxId = id
      if (nChars < minChars) minChars = nChars
      if (nChars > maxChars) maxChars = nChars
      if (langs.size <= MaxZoneDict) langs += lang
      if (sources.size <= MaxZoneDict) sources += source
    }
    def reset(): Unit = {
      any = false
      minId = Long.MaxValue; maxId = Long.MinValue
      minChars = Long.MaxValue; maxChars = Long.MinValue
      langs.clear(); sources.clear()
    }
    /** The `#zmap` sidecar line (empty string for an empty archive).
      * A dictionary containing the EMPTY string degrades to `*`: ""
      * URL-encodes to itself and the comma-joined form can't carry it
      * (the parser's nonEmpty split would drop it, and a dropped value
      * would let `zoneRefutes` wrongly skip archives that contain it —
      * silent row loss on `WHERE lang = ''`).
      */
    def line: String = if (!any) "" else {
      def dict(s: scala.collection.mutable.HashSet[String]): String =
        if (s.size > MaxZoneDict || s.exists(_.isEmpty)) "*"
        else s.toSeq.sorted.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString(",")
      s"#zmap doc_id $minId $maxId n_chars $minChars $maxChars " +
        s"lang ${dict(langs)} source ${dict(sources)}\n"
    }
  }
}

final class WarcGzTable(path: String, properties: util.Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "warcgz requires a load(path)/save(path)")
  override def name(): String = s"warcgz($path)"
  override def schema(): StructType = WarcGzSource.Schema
  // ACCEPT_ANY_SCHEMA: writes take the 5-column document shape, reads
  // produce the 7-column shape (+_ok/_offset) — the write builder
  // validates the input columns itself
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcGzScanBuilder(path, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new WarcGzWriteBuilder(path, info)
}

final class WarcGzScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = WarcGzSource.Schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var countPushed = false
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  /** Header-level predicates (doc_id / lang / source / n_chars / _ok)
    * are pushed into the record walk, where they skip the body decode
    * and row emission the way column pruning already skips the decode.
    * ALL filters are also returned as residual: the reader's skip is a
    * pure optimization, Spark re-evaluates post-scan, so pushdown can
    * never change results — only the bytes decoded.
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(WarcGzFilters.supported)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  /** Bare `COUNT(*)` comes straight from the `.idx` sidecars — one line
    * per member, one member per record (the writer's cdx contract), so
    * the row count needs no member decode at all. PARTIAL pushdown
    * (`supportCompletePushDown` stays false): each partition emits its
    * in-range member count and Spark sums the partials. Spark offers
    * aggregate pushdown only when no post-scan filter remains; this
    * source reports every filter residual, so a filtered count can
    * never arrive here — the `pushed.isEmpty` guard keeps that honest
    * if the filter contract ever changes. The count reader verifies
    * the archive length covers its members (truncation → fall back to
    * the header walk, matching the damage contract's marker rows);
    * in-member corruption with an intact length is trusted to the
    * sidecar, which the writer commits atomically with the archive.
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = pushed.isEmpty && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) countPushed = true
    ok
  }
  override def build(): Scan = {
    val msb = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(WarcGzSource.DefaultMaxSplitBytes)
    require(msb >= 1, s"maxSplitBytes must be >= 1, got $msb")
    new WarcGzScan(path, required, msb, pushed, countPushed)
  }
}

/** The pushable-predicate subset and its executor-side evaluator.
  * Supported: EqualTo / In / ordered comparisons / IsNull / IsNotNull
  * on the five header-derivable columns — everything decidable BEFORE
  * the body decode. `_offset` is excluded (its coordinate is
  * reader-dependent); And/Or never arrive at top level (Spark splits
  * conjuncts) and are left residual.
  */
private[graft] object WarcGzFilters {
  import org.apache.spark.sql.sources._

  private val cols = Set("doc_id", "lang", "source", "n_chars", "_ok")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => cols(a)
    case In(a, _) => cols(a)
    case GreaterThan(a, _) => cols(a)
    case GreaterThanOrEqual(a, _) => cols(a)
    case LessThan(a, _) => cols(a)
    case LessThanOrEqual(a, _) => cols(a)
    case IsNull(a) => cols(a)
    case IsNotNull(a) => cols(a)
    case _ => false
  }

  /** SQL three-valued compare collapsed to the filter's two: a null on
    * either side fails every comparison (and IsNotNull), exactly how
    * Spark's residual re-evaluation treats the same rows. Strings
    * compare in UTF-8 BINARY order (UTF8String), not String.compareTo's
    * UTF-16 code-unit order — the two disagree on supplementary-plane
    * characters (U+10000+ sorts above U+E000 in UTF-8, below in
    * UTF-16), and a scan that skips a record the residual filter would
    * keep loses rows permanently.
    */
  private def cmp(v: Any, w: Any): Option[Int] = (v, w) match {
    case (null, _) | (_, null) => None
    case (a: java.lang.Long, b: java.lang.Number) => Some(java.lang.Long.compare(a.longValue, b.longValue))
    case (a: java.lang.Boolean, b: java.lang.Boolean) => Some(java.lang.Boolean.compare(a, b))
    case (a: String, b: String) =>
      Some(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    case _ => None
  }

  /** Evaluate one pushed filter against header values (nulls = marker
    * row / absent field).
    */
  private def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v) => cmp(get(a), v).contains(0)
    case In(a, vs) => vs.exists(v => cmp(get(a), v).contains(0))
    case GreaterThan(a, v) => cmp(get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(get(a), v).exists(_ <= 0)
    case IsNull(a) => get(a) == null
    case IsNotNull(a) => get(a) != null
    case _ => true
  }

  /** True when the archive's zone map PROVES no record in it can
    * satisfy the pushed conjunction, so the reader may skip the whole
    * archive without touching a data byte. Sound by construction:
    *
    *  - a refutation comes from ONE filter f over a zone-mapped column
    *    (doc_id/n_chars min-max, lang/source dictionary) such that no
    *    value inside the zone satisfies f — no healthy row passes f,
    *    hence none passes the conjunction;
    *  - damage MARKER rows carry null headers, and every refuting shape
    *    below (equality, IN, ordered compare) fails on null (`cmp`'s
    *    three-valued collapse) — so a skipped archive's hypothetical
    *    markers would have been dropped by the same residual anyway.
    *    IsNull/IsNotNull and `_ok` predicates never refute, keeping
    *    that argument airtight.
    *  - non-integral or foreign-typed comparison values never refute
    *    (`lv` returns None → "might match").
    */
  def zoneRefutes(filters: Array[Filter], zm: WarcGzSource.WarcZoneMap): Boolean = {
    def range(a: String): Option[(Long, Long)] = a match {
      case "doc_id" => Some((zm.minId, zm.maxId))
      case "n_chars" => Some((zm.minChars, zm.maxChars))
      case _ => None
    }
    def dict(a: String): Option[Set[String]] = a match {
      case "lang" => zm.langs
      case "source" => zm.sources
      case _ => None
    }
    def lv(v: Any): Option[Long] = v match {
      case n: java.lang.Long => Some(n.longValue)
      case n: java.lang.Integer => Some(n.longValue)
      case n: java.lang.Short => Some(n.longValue)
      case n: java.lang.Byte => Some(n.longValue)
      case _ => None
    }
    def refutes(f: Filter): Boolean = f match {
      case EqualTo(a, v) =>
        range(a).exists { case (mn, mx) => lv(v).exists(x => x < mn || x > mx) } ||
          (v.isInstanceOf[String] && dict(a).exists(d => !d(v.asInstanceOf[String])))
      case In(a, vs) =>
        vs.nonEmpty && (
          range(a).exists { case (mn, mx) =>
            vs.forall(v => lv(v).exists(x => x < mn || x > mx)) } ||
          dict(a).exists(d =>
            vs.forall(v => v.isInstanceOf[String] && !d(v.asInstanceOf[String]))))
      case GreaterThan(a, v) => range(a).exists { case (_, mx) => lv(v).exists(mx <= _) }
      case GreaterThanOrEqual(a, v) => range(a).exists { case (_, mx) => lv(v).exists(mx < _) }
      case LessThan(a, v) => range(a).exists { case (mn, _) => lv(v).exists(mn >= _) }
      case LessThanOrEqual(a, v) => range(a).exists { case (mn, _) => lv(v).exists(mn > _) }
      case _ => false
    }
    filters.exists(refutes)
  }

  /** Conjunction of all pushed filters over (id, lang, source, nChars,
    * ok) — id/nChars boxed, null for marker rows.
    */
  def matches(
      filters: Array[Filter],
      id: java.lang.Long,
      lang: String,
      source: String,
      nChars: java.lang.Long,
      ok: Boolean): Boolean = {
    val get: String => Any = {
      case "doc_id" => id
      case "lang" => lang
      case "source" => source
      case "n_chars" => nChars
      case "_ok" => java.lang.Boolean.valueOf(ok)
      case _ => null
    }
    filters.forall(eval(_, get))
  }
}

/** One InputPartition: the members of `archive` whose first byte lies in
  * [rangeStart, rangeEnd). Byte ranges tile the archive, so member
  * ownership is exact with no sidecar reads at plan time.
  */
final case class WarcGzPartition(archive: String, rangeStart: Long, rangeEnd: Long)
  extends InputPartition

final class WarcGzScan(
    path: String,
    required: StructType,
    maxSplitBytes: Long,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    countOnly: Boolean = false)
    extends Scan with Batch {
  // the SESSION's Hadoop conf (spark.hadoop.* — object-store credentials,
  // fs overrides), captured at build time and shipped to the readers as
  // plain properties: a bare `new Configuration()` would ignore it and
  // break format("warcgz") on any credentialed scheme
  private val hadoopProps: Map[String, String] =
    Warc.sessionHadoopProps(org.apache.spark.sql.SparkSession.active)
  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    Warc.hadoopConfFrom(hadoopProps)
  override def readSchema(): StructType =
    if (countOnly) WarcGzSource.CountSchema else required
  override def toBatch: Batch = this
  override def description(): String =
    s"warcgz $path (maxSplitBytes=$maxSplitBytes, columns=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=[${pushed.mkString(", ")}]" +
      (if (countOnly) ", PushedAggregation=[COUNT(*)]" else "") + ")"

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
    if (countOnly) new WarcGzCountReaderFactory(hadoopProps)
    else new WarcGzReaderFactory(required, hadoopProps, pushed)
}

final class WarcGzCountReaderFactory(hadoopProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcGzCountPartitionReader(partition.asInstanceOf[WarcGzPartition], hadoopProps)
}

/** COUNT(*) partial per byte range: the in-range member count straight
  * from the sidecar — no positioned read, no inflate. If the archive is
  * shorter than its members claim (truncation damage), the sidecar
  * count would overstate what a record scan emits, so the reader falls
  * back to the header walk for this partition — whose row count
  * (records + marker rows) matches the non-pushed scan exactly.
  */
final class WarcGzCountPartitionReader(
    part: WarcGzPartition,
    hadoopProps: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val count: Long = {
    val conf = Warc.hadoopConfFrom(hadoopProps)
    val p = new org.apache.hadoop.fs.Path(part.archive)
    val fs = p.getFileSystem(conf)
    val mine = WarcGzSource.sidecarMembers(fs, p)
      .filter { case (off, _) => off >= part.rangeStart && off < part.rangeEnd }
    if (mine.isEmpty) 0L
    else {
      val need = mine.map { case (o, l) => o + l }.max
      if (fs.getFileStatus(p).getLen >= need) mine.length.toLong
      else {
        val start = mine.map(_._1).min
        Warc.readGzSpanTuples(fs, p, start, need - start, decodeBody = false, keep = Warc.KeepAll)
          .iterator.size.toLong
      }
    }
  }

  private var emitted = false
  override def next(): Boolean = if (emitted) false else { emitted = true; true }
  override def get(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](count))
  override def close(): Unit = ()
}

final class WarcGzReaderFactory(
    required: StructType,
    hadoopProps: Map[String, String],
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcGzPartitionReader(partition.asInstanceOf[WarcGzPartition], required, hadoopProps, pushed)
}

final class WarcGzPartitionReader(
    part: WarcGzPartition,
    required: StructType,
    hadoopProps: Map[String, String],
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReader[InternalRow] {

  private val needText = required.fieldNames.contains("text")
  // positions of the pruned columns in the full schema — computed BEFORE
  // `rows` (vals initialize in declaration order; the degraded-file
  // branch materializes a marker row eagerly)
  private val fieldIdx: Array[Int] =
    required.fieldNames.map(n => WarcGzSource.Schema.fieldIndex(n))

  private val rows: Iterator[InternalRow] = {
    val conf = Warc.hadoopConfFrom(hadoopProps)
    val p = new org.apache.hadoop.fs.Path(part.archive)
    val fs = p.getFileSystem(conf)
    // the task's member set: sidecar lines whose offset starts in-range
    val lines = WarcGzSource.sidecarLines(fs, p)
    val mine = WarcGzSource.membersFrom(lines)
      .filter { case (off, _) => off >= part.rangeStart && off < part.rangeEnd }
    if (mine.isEmpty) Iterator.empty
    // zone-map skip: when the sidecar's #zmap line proves no record in
    // this ARCHIVE can satisfy a pushed filter, the whole positioned
    // read + inflate + header walk is skipped — a selective scan's cost
    // scales with the archives TOUCHED, not the corpus (the same
    // sidecar-only property the COUNT(*) pushdown has). Soundness:
    // WarcGzFilters.zoneRefutes - only filter shapes that null-headers
    // also fail can refute, so marker rows are never lost
    else if (pushed.nonEmpty &&
      WarcGzSource.zoneFrom(lines).exists(zm => WarcGzFilters.zoneRefutes(pushed, zm)))
      Iterator.empty
    else {
      val start = mine.map(_._1).min
      val span = mine.map { case (o, l) => o + l }.max - start
      // pushed header predicates run between header walk and body
      // decode: a non-matching record costs a header parse and a
      // Content-Length step — never a body UTF-8 decode or a row
      val keep: Warc.HeaderKeep =
        if (pushed.isEmpty) Warc.KeepAll
        else (id, lang, source, nChars) =>
          WarcGzFilters.matches(pushed, id, lang, source, nChars, ok = true)
      // ONE shared implementation of the positioned-read damage contract
      // (Warc.readGzSpanTuples) — body decode skipped when `text` is
      // pruned away (Content-Length steps over the bytes)
      Warc.readGzSpanTuples(fs, p, start, span, decodeBody = needText, keep = keep)
        .iterator.filter {
          // markers carry nulls: apply the same pushed conjunction, so a
          // scan that filters them out never emits them (Spark's residual
          // re-evaluation would drop them anyway — this just saves rows)
          case (_, _, _, _, _, false, _) =>
            pushed.isEmpty || WarcGzFilters.matches(pushed, null, null, null, null, ok = false)
          case _ => true
        }
        .map {
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

/** DSv2 WRITE path — `df.write.format("warcgz").mode(...).save(dir)`:
  * each non-empty input partition becomes one member-gzipped archive
  * `part-<partitionId>.warc.gz` plus its `.idx` sidecar, committed
  * executor-side via the same temp-name + rename contract as
  * [[Warc.writeArchivesGz]] (attempt-unique tmp, attempt-independent
  * final name — a retried/speculative attempt's complete rename wins,
  * never interleaves). `mode("overwrite")` truncates existing archives
  * + sidecars at write planning; `mode("append")` adds partitions
  * alongside (partition ids collide last-writer-wins, like any
  * re-run into the same dir — use overwrite for reruns). Input must
  * carry the document shape (doc_id, text, lang, source, n_chars);
  * write-side parallelism is the input's partitioning — `repartition(n)`
  * to size archives, exactly `nArchives` in the function API.
  */
final class WarcGzWriteBuilder(
    path: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var overwrite = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new WarcGzWrite(path, info.schema(), overwrite)
}

final class WarcGzWrite(path: String, input: StructType, overwrite: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  // resolve the document columns in the INPUT's layout once, driver-side;
  // loud failure names the missing/mistyped column
  private val fieldPos: Map[String, Int] = {
    val want: Map[String, org.apache.spark.sql.types.DataType] = Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    want.map { case (name, dt) =>
      val i = input.fieldNames.indexOf(name)
      require(i >= 0, s"warcgz write needs column '$name' (document shape), input has ${input.fieldNames.mkString(",")}")
      require(input.fields(i).dataType == dt,
        s"warcgz write column '$name' must be $dt, got ${input.fields(i).dataType}")
      name -> i
    }
  }

  private val hadoopProps: Map[String, String] =
    Warc.sessionHadoopProps(org.apache.spark.sql.SparkSession.active)

  override def toBatch: BatchWrite = this
  override def description(): String = s"warcgz write $path (overwrite=$overwrite)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (overwrite) {
      // truncate at write planning: clear prior archives + sidecars so the
      // committed result is exactly this write's partitions
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(Warc.hadoopConfFrom(hadoopProps))
      val old = fs.globStatus(new org.apache.hadoop.fs.Path(path, "*.warc.gz*"))
      if (old != null) old.foreach(st => fs.delete(st.getPath, false))
    }
    new WarcGzWriterFactory(path, fieldPos, hadoopProps)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class WarcGzCommitted(file: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class WarcGzWriterFactory(
    path: String,
    fieldPos: Map[String, Int],
    hadoopProps: Map[String, String])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(
      partitionId: Int,
      taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new WarcGzDataWriter(path, partitionId, taskId, fieldPos, hadoopProps)
}

final class WarcGzDataWriter(
    dir: String,
    partitionId: Int,
    taskId: Long,
    fieldPos: Map[String, Int],
    hadoopProps: Map[String, String])
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val iDoc = fieldPos("doc_id")
  private val iText = fieldPos("text")
  private val iLang = fieldPos("lang")
  private val iSource = fieldPos("source")
  private val iNChars = fieldPos("n_chars")

  private val name = s"part-$partitionId.warc.gz"
  private var fs: org.apache.hadoop.fs.FileSystem = _
  private var tmp: org.apache.hadoop.fs.Path = _
  private var out: java.io.OutputStream = _
  private val idx = new StringBuilder
  private val zone = new WarcGzSource.ZoneMapBuilder
  private var memberOrd = 0L
  private var memberOff = 0L

  // lazy open: an empty partition writes no file at all
  private def ensureOpen(): Unit = if (out == null) {
    val d = new org.apache.hadoop.fs.Path(dir)
    fs = d.getFileSystem(Warc.hadoopConfFrom(hadoopProps))
    fs.setWriteChecksum(false)
    tmp = new org.apache.hadoop.fs.Path(dir, s".$name.$taskId.tmp")
    out = fs.create(tmp, true)
  }

  override def write(row: InternalRow): Unit = {
    // ALL five fields loud-non-null: the function-API writer's tuple
    // encoder rejects nulls, and InternalRow.getLong on a null slot
    // would silently coerce n_chars to 0 — corrupted round-trips, not
    // errors
    require(
      !row.isNullAt(iDoc) && !row.isNullAt(iText) && !row.isNullAt(iLang) &&
        !row.isNullAt(iSource) && !row.isNullAt(iNChars),
      s"warcgz write: document fields must be non-null (partition $partitionId)")
    ensureOpen()
    val rec = Warc.encodeRecord(
      row.getLong(iDoc),
      row.getUTF8String(iText).toString,
      row.getUTF8String(iLang).toString,
      row.getUTF8String(iSource).toString,
      row.getLong(iNChars))
    val bytes = Warc.gzipMember(rec)
    out.write(bytes)
    idx.append(memberOrd).append(' ').append(memberOff).append(' ').append(bytes.length).append('\n')
    zone.add(
      row.getLong(iDoc), row.getUTF8String(iLang).toString,
      row.getUTF8String(iSource).toString, row.getLong(iNChars))
    memberOrd += 1L
    memberOff += bytes.length
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out == null) return WarcGzCommitted("") // empty partition: no file
    out.close(); out = null
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    rename(tmp, dst)
    val idst = dst.suffix(".idx")
    val itmp = new org.apache.hadoop.fs.Path(dir, s".${idst.getName}.$taskId.tmp")
    try {
      val w = fs.create(itmp, true)
      w.write((zone.line + idx.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      w.close()
      rename(itmp, idst)
    } catch {
      // the pair must commit atomically: an archive WITHOUT its sidecar
      // hard-fails every future DSv2 planning of the whole directory
      // (and the indexed readers silently skip it) — undo the archive
      // rename so a retry rewrites both, or neither exists
      case e: Throwable =>
        try { fs.delete(itmp, false); () } catch { case _: java.io.IOException => () }
        try { fs.delete(dst, false); () } catch { case _: java.io.IOException => () }
        throw e
    }
    WarcGzCommitted(dst.toString)
  }

  private def rename(from: org.apache.hadoop.fs.Path, to: org.apache.hadoop.fs.Path): Unit = {
    fs.delete(to, false)
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"warcgz commit rename failed: $from -> $to")
  }

  override def abort(): Unit = close()

  override def close(): Unit = if (out != null) {
    out.close(); out = null
    // uncommitted attempt: remove the orphaned tmp (retries get a new
    // task id — same hygiene as the function-API writer)
    try { fs.delete(tmp, false); () } catch { case _: java.io.IOException => () }
  }
}
