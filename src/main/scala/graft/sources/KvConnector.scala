package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.stream.Collectors

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-kv` — a complete DataSourceV2 connector for a line-based cell
  * store (rowkey BIGINT, qualifier STRING, value STRING — the HBase-cell
  * long format the reference utility exports; see SURVEY.md §2.A R2).
  *
  * Read path: one InputPartition per data file (split = parallelism unit,
  * exactly like an HFile region at scale), column pruning via
  * SupportsPushDownRequiredColumns, and rowkey/qualifier predicate
  * pushdown via SupportsPushDownFilters — pushed predicates are applied
  * inside the partition reader so non-matching cells never reach Spark.
  *
  * Write path: per-task DataWriter streams cells to a temp file and
  * RENAMES it into place on commit (the same two-phase protocol a real
  * object-store committer uses), so a failed task leaves no partial file.
  *
  * Local java.nio IO keeps the demo hermetic; at cluster scale the only
  * change is swapping Files.* for the Hadoop FileSystem API — the
  * planning, pruning, pushdown, and commit protocol are identical.
  */
object KvFormat {
  val schema: StructType = StructType(Seq(
    StructField("rowkey", LongType),
    StructField("qualifier", StringType),
    StructField("value", StringType)))

  val SEP = "\t"
  val SUFFIX = ".kv"

  def dataFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.collect(Collectors.toList[Path]).asScala.toSeq
        .filter(f => f.getFileName.toString.endsWith(SUFFIX))
        .sortBy(_.toString)
      finally s.close()
    }
  }
}

/** Per-file statistics computed INSIDE the writing task (streaming MD5 +
  * cell count + rowkey min/max) and carried back through the
  * `WriterCommitMessage` — the scale rule is that checksum work rides the
  * distributed write, never a driver re-read (O(files) driver metadata,
  * O(data) only on executors). The job committer persists them as the
  * `.file_meta.tsv` index next to the data, the same role HBase region
  * metadata plays: rowkey bounds let the scan prune files, and the
  * snapshot manifest is assembled from these entries without touching
  * data bytes again. */
case class KvFileMeta(file: String, bytes: Long, md5: String, cells: Long,
    minKey: Long, maxKey: Long)

object KvMeta {
  val FILE = ".file_meta.tsv"

  /** The committed per-file index for a kv dir; files without an entry
    * (e.g. hand-written fixtures) simply have no stats. */
  def read(dir: String): Map[String, KvFileMeta] = {
    val p = Paths.get(dir, FILE)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty)
      .map { l =>
        val a = l.split("\t", 6)
        KvFileMeta(a(0), a(1).toLong, a(2), a(3).toLong, a(4).toLong, a(5).toLong)
      }
      // last entry per filename wins (append-mode jobs merge on commit)
      .map(m => m.file -> m).toMap
  }

  /** Merge new entries into the index: single job committer per dir
    * (Spark's job-commit is driver-side and serialized), entries for
    * deleted files are pruned, and the write is temp-file + atomic move
    * so readers never see a torn index. */
  def append(dir: String, entries: Seq[KvFileMeta]): Unit = {
    val merged = (read(dir) ++ entries.map(m => m.file -> m).toMap)
      .filter { case (f, _) => Files.exists(Paths.get(dir, f)) }
    val text = merged.values.toSeq.sortBy(_.file)
      .map(m => s"${m.file}\t${m.bytes}\t${m.md5}\t${m.cells}\t${m.minKey}\t${m.maxKey}")
      .mkString("", "\n", "\n")
    val tmp = Paths.get(dir, s"$FILE.tmp")
    Files.writeString(tmp, text, StandardCharsets.UTF_8)
    Files.move(tmp, Paths.get(dir, FILE), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Streaming MD5 of a file (1 MiB chunks — constant memory regardless
    * of file size; runs on executors for verification jobs). */
  def md5HexOf(file: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = Files.newInputStream(Paths.get(file))
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }
}

/** Conservative [lo, hi] rowkey interval implied by a pushed filter —
  * the file-pruning mirror of HBase's region-range scan planning. ANDs
  * intersect, ORs take the hull, anything not about rowkey is the full
  * range. Never narrower than the true predicate, so pruning is always
  * sound. */
object KvKeyRange {
  type Range = (Long, Long)
  val Full: Range = (Long.MinValue, Long.MaxValue)
  val Empty: Range = (1L, 0L) // lo > hi

  def intersect(a: Range, b: Range): Range = (math.max(a._1, b._1), math.min(a._2, b._2))
  def hull(a: Range, b: Range): Range =
    if (a._1 > a._2) b else if (b._1 > b._2) a
    else (math.min(a._1, b._1), math.max(a._2, b._2))

  def of(f: Filter): Range = f match {
    case EqualTo("rowkey", v: Number) => (v.longValue, v.longValue)
    case GreaterThan("rowkey", v: Number) =>
      if (v.longValue == Long.MaxValue) Empty else (v.longValue + 1, Long.MaxValue)
    case GreaterThanOrEqual("rowkey", v: Number) => (v.longValue, Long.MaxValue)
    case LessThan("rowkey", v: Number) =>
      if (v.longValue == Long.MinValue) Empty else (Long.MinValue, v.longValue - 1)
    case LessThanOrEqual("rowkey", v: Number) => (Long.MinValue, v.longValue)
    case In("rowkey", vs) if vs != null && vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
      val ls = vs.map(_.asInstanceOf[Number].longValue)
      (ls.min, ls.max)
    case And(l, r) => intersect(of(l), of(r))
    case Or(l, r) => hull(of(l), of(r))
    case _ => Full
  }

  /** Top-level pushed filters are conjunctive. */
  def ofAll(filters: Array[Filter]): Range =
    filters.map(of).foldLeft(Full)(intersect)
}

class KvDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KvFormat.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

class KvTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-kv requires a path option")
  override def name(): String = s"graft-kv:$path"
  override def schema(): StructType = KvFormat.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.fieldNames.sameElements(KvFormat.schema.fieldNames),
      s"graft-kv write schema must be ${KvFormat.schema.fieldNames.mkString(",")}, got ${in.fieldNames.mkString(",")}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvBatchWrite(path)
      }
    }
  }
}

// ---------------------------------------------------------------- read

class KvScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var required: StructType = KvFormat.schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** rowkey/qualifier comparisons are evaluated inside the reader; anything
    * else is returned to Spark for post-scan evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(KvFilterEval.supports)
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT n stops each partition reader after n SURVIVING cells — a
    * point lookup at 100 TB opens its (range-pruned) files and reads k
    * cells instead of scanning them to the end. Partial push (the
    * default): n per file, Spark still applies the global limit. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  /** COUNT(*) / MIN(rowkey) / MAX(rowkey) with no grouping and no
    * filters are answered from the write-time stats index — O(files)
    * driver metadata, ZERO data bytes read (the parquet-footer-count
    * move). Sound only when every data file has a committed stats entry
    * (hand-written fixtures don't) — otherwise refuse and let Spark
    * aggregate the real scan. Complete pushdown: the index is exact. */
  private var aggStats: Option[Seq[String]] = None

  // one metadata read per builder: Spark calls supportCompletePushDown
  // AND pushAggregation during planning — don't re-list per call
  private lazy val indexCoversAllFiles: Boolean = {
    val meta = KvMeta.read(path)
    KvFormat.dataFiles(path).forall(f => meta.contains(f.getFileName.toString))
  }

  private def plannable(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty || limit.nonEmpty) return None
    if (!indexCoversAllFiles) return None
    def rowkeyRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("rowkey"))
        case _ => false
      }
    val stats = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if rowkeyRef(m.column) => Some("min")
      case m: Max if rowkeyRef(m.column) => Some("max")
      case _ => None
    }
    if (stats.nonEmpty && stats.forall(_.isDefined)) Some(stats.map(_.get)) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = plannable(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean = {
    aggStats = plannable(agg)
    aggStats.isDefined
  }

  override def build(): Scan = aggStats match {
    case Some(stats) => new KvStatsScan(path, stats)
    case None => new KvScan(path, required, pushed, limit)
  }
}

/** The aggregate-pushdown scan: one partition, one row, values straight
  * from the committed `.file_meta.tsv`. MIN/MAX of an empty store are
  * null (matching SQL aggregate semantics); COUNT is 0. */
class KvStatsScan(path: String, stats: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(stats.zipWithIndex.map {
    case (s, i) => StructField(s"${s}_$i", LongType, nullable = s != "count")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv $path, PushedAggregates: [${stats.mkString(", ")}] (stats-index only, no data read)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(KvStatsPartition(computeRow()))
  // driver-side O(files) metadata fold; the row travels inside the
  // partition. Restricted to files that still EXIST — a stale index
  // entry for a file deleted outside the connector must not be counted
  private def computeRow(): Array[Option[Long]] = {
    val files = KvFormat.dataFiles(path).map(_.getFileName.toString).toSet
    val metas = KvMeta.read(path).collect { case (f, m) if files(f) => m }.toSeq
    stats.map {
      case "count" => Some(metas.map(_.cells).sum)
      case "min" => if (metas.isEmpty) None else Some(metas.map(_.minKey).min)
      case "max" => if (metas.isEmpty) None else Some(metas.map(_.maxKey).max)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = KvStatsReaderFactory
}

case class KvStatsPartition(values: Array[Option[Long]]) extends InputPartition

object KvStatsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val values = partition.asInstanceOf[KvStatsPartition].values
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        InternalRow.fromSeq(values.toIndexedSeq.map(_.map(Long.box).orNull))
      override def close(): Unit = ()
    }
}

/** Predicate evaluation for the pushed subset. The kv store is dense
  * (no null cells), so two-valued logic is exact here. Filters carrying
  * a null literal are NOT accepted (their three-valued semantics stay
  * with Spark post-scan), and string comparison uses UTF8String —
  * byte order, not String's UTF-16 order, which disagrees on non-BMP
  * code points. */
object KvFilterEval {
  def supports(f: Filter): Boolean = f match {
    case EqualTo(a, v) => ok(a, v)
    case GreaterThan(a, v) => ok(a, v)
    case GreaterThanOrEqual(a, v) => ok(a, v)
    case LessThan(a, v) => ok(a, v)
    case LessThanOrEqual(a, v) => ok(a, v)
    case In(a, vs) => vs != null && vs.forall(ok(a, _))
    // Catalyst guards every pushed comparison with IsNotNull; accepting
    // it here is what lets column pruning drop filter-only columns.
    case IsNotNull(a) => col(a)
    case IsNull(a) => col(a)
    case And(l, r) => supports(l) && supports(r)
    case Or(l, r) => supports(l) && supports(r)
    case _ => false
  }
  private def col(attr: String) = attr == "rowkey" || attr == "qualifier" || attr == "value"
  // Literal RUNTIME type must match the column, or the executor-side
  // eval would ClassCastException mid-scan (Catalyst always sends the
  // right type, but Filter is a public API — a hand-built
  // EqualTo("rowkey", "x") must fall back to Spark, not crash a task).
  private def ok(attr: String, v: Any): Boolean = col(attr) && (v match {
    case null => false
    case _: Number => attr == "rowkey"
    case _: String => attr != "rowkey"
    case _ => false
  })

  def eval(f: Filter, rowkey: Long, qualifier: String, value: String): Boolean = {
    def get(a: String): Any = a match {
      case "rowkey" => rowkey
      case "qualifier" => qualifier
      case "value" => value
    }
    def cmp(a: String, v: Any): Int = get(a) match {
      case l: Long => java.lang.Long.compare(l, v.asInstanceOf[Number].longValue())
      case s: String => UTF8String.fromString(s).compareTo(UTF8String.fromString(v.toString))
    }
    f match {
      case EqualTo(a, v) => cmp(a, v) == 0
      case GreaterThan(a, v) => cmp(a, v) > 0
      case GreaterThanOrEqual(a, v) => cmp(a, v) >= 0
      case LessThan(a, v) => cmp(a, v) < 0
      case LessThanOrEqual(a, v) => cmp(a, v) <= 0
      case In(a, vs) => vs.exists(v => cmp(a, v) == 0)
      case IsNotNull(_) => true // dense store: every cell has all three fields
      case IsNull(_) => false
      case And(l, r) => eval(l, rowkey, qualifier, value) && eval(r, rowkey, qualifier, value)
      case Or(l, r) => eval(l, rowkey, qualifier, value) || eval(r, rowkey, qualifier, value)
      case _ => true
    }
  }
}

case class KvInputPartition(file: String) extends InputPartition

class KvScan(path: String, required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedLimit: ${limit.getOrElse("none")}, ReadSchema: ${required.simpleString}"

  /** One partition per surviving data file. Files whose committed
    * [minKey, maxKey] cannot overlap the pushed rowkey interval are
    * skipped entirely — the HBase prune-by-region-range move; at 100 TB
    * a point/range lookup opens a handful of files instead of the whole
    * store. Files without index entries are always read (sound). */
  override def planInputPartitions(): Array[InputPartition] = {
    val range = KvKeyRange.ofAll(pushed)
    val meta = KvMeta.read(path)
    KvFormat.dataFiles(path)
      .filter { f =>
        meta.get(f.getFileName.toString)
          .forall(m => m.maxKey >= range._1 && m.minKey <= range._2)
      }
      .map(f => KvInputPartition(f.toString)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required, pushed, limit)
}

class KvReaderFactory(required: StructType, pushed: Array[Filter], limit: Option[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(partition.asInstanceOf[KvInputPartition].file, required, pushed,
      limit)
}

/** Process-local read counters — spec observability for the pushdown
  * claims ("a limit-5 scan EMITS ≤ 5 cells per file", not just "the
  * result has 5 rows"). No correctness role; local-mode tests share the
  * JVM with the executors, so a plain atomic suffices. */
object KvReadStats {
  val cellsEmitted = new java.util.concurrent.atomic.AtomicLong
  val linesRead = new java.util.concurrent.atomic.AtomicLong
  def reset(): Unit = { cellsEmitted.set(0); linesRead.set(0) }
}

class KvPartitionReader(file: String, required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {
  private val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
  private val it = lines.iterator()
  private var current: InternalRow = _
  // project once up front: output ordinal -> cell extractor
  private val fields: Array[(Long, String, String) => Any] =
    required.fieldNames.map {
      case "rowkey" => (r: Long, _: String, _: String) => r
      case "qualifier" => (_: Long, q: String, _: String) => UTF8String.fromString(q)
      case "value" => (_: Long, _: String, v: String) => UTF8String.fromString(v)
    }

  private var lineNo = 0L
  private var emitted = 0L

  override def next(): Boolean = {
    // pushed limit: this file has yielded enough surviving cells — stop
    // without reading (or parsing) the rest of it
    if (limit.exists(emitted >= _)) return false
    while (it.hasNext) {
      val line = it.next(); lineNo += 1
      KvReadStats.linesRead.incrementAndGet()
      // A corrupt store must fail DIAGNOSABLY: name the file and line,
      // not surface a bare NumberFormat/ArrayIndexOutOfBounds from deep
      // inside a task retry loop.
      val parts = line.split(KvFormat.SEP, 3)
      if (parts.length != 3)
        throw new java.io.IOException(
          s"graft-kv: malformed cell at $file:$lineNo — expected 3 tab-separated fields, got ${parts.length}")
      val r =
        try parts(0).toLong
        catch {
          case e: NumberFormatException => throw new java.io.IOException(
            s"graft-kv: bad rowkey '${parts(0)}' at $file:$lineNo", e)
        }
      val (q, v) = (parts(1), parts(2))
      if (pushed.forall(KvFilterEval.eval(_, r, q, v))) {
        current = InternalRow.fromSeq(fields.map(_(r, q, v)).toIndexedSeq)
        emitted += 1
        KvReadStats.cellsEmitted.incrementAndGet()
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

// --------------------------------------------------------------- write

class KvBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    new KvWriterFactory(path)
  }
  /** Job commit assembles the per-file stats index from the tasks'
    * commit messages — the driver never re-reads data bytes; its work is
    * O(committed files). */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    KvMeta.append(path, messages.collect { case KvCommitMessage(Some(m)) => m }.toSeq)
  // job-level abort must undo task-level commits, or the renamed files of
  // successful tasks would remain visible as partial output
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommitMessage(Some(m)) => Files.deleteIfExists(Paths.get(path, m.file))
      case _ => ()
    }
}

class KvWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, partitionId, taskId)
}

/** None = the task received no rows and committed no file (empty shuffle
  * partitions must not litter the store with 0-byte files). */
case class KvCommitMessage(meta: Option[KvFileMeta]) extends WriterCommitMessage

/** Streams cells to a temp file, RENAMING into place on commit (two-phase
  * task commit). While writing it maintains the stats that become the
  * commit message: byte count + MD5 via a digesting stream (single pass,
  * constant memory) and the rowkey min/max for scan pruning. Rowkey
  * CLUSTERING is the plan's job (`sortWithinPartitions`/
  * `repartitionByRange` before the write) — min/max stays sound either
  * way, a writer-side sort would just re-buffer what Spark's sort
  * operator already spills correctly. */
class KvDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmp = Paths.get(path, s".tmp-$partitionId-$taskId")
  private val dest = Paths.get(path, s"part-$partitionId-$taskId.kv")
  private val digest = java.security.MessageDigest.getInstance("MD5")
  private var bytes = 0L
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.security.DigestOutputStream(Files.newOutputStream(tmp), digest) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        super.write(b, off, len); bytes += len
      }
      override def write(b: Int): Unit = { super.write(b); bytes += 1 }
    }, StandardCharsets.UTF_8))
  private var cells = 0L
  private var minKey = Long.MaxValue
  private var maxKey = Long.MinValue

  override def write(row: InternalRow): Unit = {
    // the format is one cell per line, tab-separated: reject rather than
    // silently corrupt rows whose fields would break framing
    require(!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2),
      "graft-kv cells must be fully non-null")
    val q = row.getUTF8String(1).toString
    val v = row.getUTF8String(2).toString
    require(!q.contains('\t') && !q.contains('\n') && !v.contains('\t') && !v.contains('\n'),
      "graft-kv qualifier/value must not contain tab or newline")
    val r = row.getLong(0)
    out.write(s"$r${KvFormat.SEP}$q${KvFormat.SEP}$v")
    out.newLine()
    cells += 1
    if (r < minKey) minKey = r
    if (r > maxKey) maxKey = r
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    if (cells == 0) { Files.deleteIfExists(tmp); KvCommitMessage(None) }
    else {
      Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
      val md5 = digest.digest().map("%02x".format(_)).mkString
      KvCommitMessage(Some(KvFileMeta(
        dest.getFileName.toString, bytes, md5, cells, minKey, maxKey)))
    }
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }
  override def close(): Unit = ()
}
