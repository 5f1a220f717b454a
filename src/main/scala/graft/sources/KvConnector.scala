package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.stream.Collectors

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
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

  def dataFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.collect(Collectors.toList[Path]).asScala.toSeq
        .filter(f => f.getFileName.toString.endsWith(".kv"))
        .sortBy(_.toString)
      finally s.close()
    }
  }
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
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = KvFormat.schema
  private var pushed: Array[Filter] = Array.empty

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

  override def build(): Scan = new KvScan(path, required, pushed)
}

/** Predicate evaluation for the pushed subset. The kv store is dense
  * (no null cells), so two-valued logic is exact here. Filters carrying
  * a null literal are NOT accepted (their three-valued semantics stay
  * with Spark post-scan), and string comparison uses UTF8String —
  * byte order, not String's UTF-16 order, which disagrees on non-BMP
  * code points. */
object KvFilterEval {
  def supports(f: Filter): Boolean = f match {
    case EqualTo(a, v) => ok(a) && v != null
    case GreaterThan(a, v) => ok(a) && v != null
    case GreaterThanOrEqual(a, v) => ok(a) && v != null
    case LessThan(a, v) => ok(a) && v != null
    case LessThanOrEqual(a, v) => ok(a) && v != null
    case In(a, vs) => ok(a) && vs != null && vs.forall(_ != null)
    // Catalyst guards every pushed comparison with IsNotNull; accepting
    // it here is what lets column pruning drop filter-only columns.
    case IsNotNull(a) => ok(a)
    case IsNull(a) => ok(a)
    case And(l, r) => supports(l) && supports(r)
    case Or(l, r) => supports(l) && supports(r)
    case _ => false
  }
  private def ok(attr: String) = attr == "rowkey" || attr == "qualifier" || attr == "value"

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

class KvScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv $path, PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    KvFormat.dataFiles(path).map(f => KvInputPartition(f.toString)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required, pushed)
}

class KvReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(partition.asInstanceOf[KvInputPartition].file, required, pushed)
}

class KvPartitionReader(file: String, required: StructType, pushed: Array[Filter])
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

  override def next(): Boolean = {
    while (it.hasNext) {
      val parts = it.next().split(KvFormat.SEP, 3)
      val (r, q, v) = (parts(0).toLong, parts(1), parts(2))
      if (pushed.forall(KvFilterEval.eval(_, r, q, v))) {
        current = InternalRow.fromSeq(fields.map(_(r, q, v)).toIndexedSeq)
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
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  // job-level abort must undo task-level commits, or the renamed files of
  // successful tasks would remain visible as partial output
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommitMessage(f) => Files.deleteIfExists(Paths.get(f))
      case _ => ()
    }
}

class KvWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, partitionId, taskId)
}

case class KvCommitMessage(file: String) extends WriterCommitMessage

class KvDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmp = Paths.get(path, s".tmp-$partitionId-$taskId")
  private val dest = Paths.get(path, s"part-$partitionId-$taskId.kv")
  private val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)

  override def write(row: InternalRow): Unit = {
    // the format is one cell per line, tab-separated: reject rather than
    // silently corrupt rows whose fields would break framing
    require(!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2),
      "graft-kv cells must be fully non-null")
    val q = row.getUTF8String(1).toString
    val v = row.getUTF8String(2).toString
    require(!q.contains('\t') && !q.contains('\n') && !v.contains('\t') && !v.contains('\n'),
      "graft-kv qualifier/value must not contain tab or newline")
    out.write(s"${row.getLong(0)}${KvFormat.SEP}$q${KvFormat.SEP}$v")
    out.newLine()
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    KvCommitMessage(dest.toString)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }
  override def close(): Unit = ()
}
