package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** `graft-jsonl-stats`: a DataSource V2 connector — the engine extending
  * Spark's source API itself rather than composing built-ins. Reads a
  * directory of JSONL data files whose file list AND per-file `value`
  * min/max bounds live in a `_stats.jsonl` manifest sidecar (the
  * Delta/Iceberg stance: the manifest is authoritative, so planning
  * never lists a directory — at 100 TB, listing is the eventually-
  * consistent, O(files) step a table format exists to avoid).
  *
  * What it implements, and why each piece matters at scale:
  *   - [[SupportsPushDownRequiredColumns]]: the reader parses ONLY the
  *     projected fields from each JSON line — a 2-column aggregate
  *     never materializes the wide row.
  *   - [[SupportsPushDownFilters]]: range/equality predicates on the
  *     stats column prune WHOLE FILES at planning time against the
  *     manifest bounds, before any task launches (the same skipping
  *     contract as q130's manifest scan, but enforced inside the
  *     connector where Catalyst's `PushedFilters` lands). Pushed
  *     filters are still returned as residuals — stats skip files,
  *     they don't filter rows, exactly like Parquet row-group pruning.
  *   - Byte-range [[InputPartition]]s at newline boundaries (r7 —
  *     VERDICT r6 #3): a surviving file larger than `splitBytes`
  *     (option, default 4 MB) fans out into contiguous ranges, so one
  *     skewed 10 GB file becomes ~2500 tasks instead of one. Range
  *     ownership follows the Hadoop LineRecordReader convention — a
  *     range owns every line that STARTS in (start, end] (plus byte 0
  *     for the first range): a reader at start>0 discards through its
  *     first newline (that prefix is the previous range's tail) and
  *     reads through its own end into the next range until the line
  *     that straddles it is complete. Newline scanning is byte-level
  *     (UTF-8 multi-byte sequences never contain 0x0A), so boundaries
  *     mid-character are safe. Scans projecting `_pos` (dense per-FILE
  *     row position) and key-grouped layouts (group identity = file)
  *     keep whole-file partitions.
  *
  * Registered as `graft-jsonl-stats` via the DataSourceRegister service
  * file (`META-INF/services`), so `spark.read.format("graft-jsonl-stats")`
  * resolves it like any built-in source.
  */
class JsonlStats extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl-stats"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = JsonlStats.schema
  // a caller may supply its own schema (e.g. a dimension table through
  // the same connector) — the reader parses whatever fields are asked of it
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // option lookup must stay case-insensitive regardless of which map
    // representation Spark hands over
    val opts = new CaseInsensitiveStringMap(properties)
    new JsonlStatsTable(properties.get("path"), schema,
      opts.getOrDefault("statsColumn", JsonlStats.statsColumn),
      Option(opts.get("partitionColumn")))
  }
}

object JsonlStats {
  /** Fixed event-feed schema (the reference's landing-zone shape). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Default maximum bytes per read split; per-read override via the
    * `splitBytes` option. 4 MB matches the engine's table-layout split
    * law (one split per 4 MB once scan bytes dominate task overhead). */
  val DefaultSplitBytes: Long = 4L << 20

  /** DEFAULT column the manifest carries bounds for; per-table override
    * via the `statsColumn` read/write option (a user-id-keyed layout
    * skips on user ranges, a value-keyed one on value ranges — the
    * manifest format is column-agnostic, the option names the column
    * its `min_value`/`max_value` describe). */
  val statsColumn = "value"

  /** Metadata columns (SupportsMetadataColumns): provenance the data
    * rows don't carry. Resolved by name like ordinary columns but ONLY
    * when referenced — an unqueried metadata column costs nothing and
    * never appears in `df.schema`. */
  val FileMeta = "_file" // absolute path of the data file a row came from
  val PosMeta = "_pos"   // 0-based row position within that file

  /** Manifest entry: data file path (relative to the table root), its
    * closed [min, max] interval over [[statsColumn]], its row count, and
    * — for key-grouped layouts — the single partition-column value every
    * row of the file carries (`pkey`; absent on unkeyed layouts). */
  final case class FileStats(file: String, min: Double, max: Double, rows: Long,
                             pkey: Option[String] = None)

  def readStats(root: String): Seq[FileStats] = {
    val mapper = new ObjectMapper()
    Files.readAllLines(Paths.get(root, "_stats.jsonl")).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val n = mapper.readTree(line)
        // n_rows is optional in the manifest (older manifests carry only
        // bounds); -1 marks it absent, which declines aggregate pushdown
        FileStats(n.get("file").asText(), n.get("min_value").asDouble(),
          n.get("max_value").asDouble(),
          if (n.hasNonNull("n_rows")) n.get("n_rows").asLong() else -1L,
          if (n.hasNonNull("pkey")) Some(n.get("pkey").asText()) else None)
      }
  }

  /** One manifest line, Jackson-serialized: `pkey` (and in principle the
    * file name) is user-data-derived, so string interpolation would
    * corrupt the manifest on the first quote or backslash. */
  def statsLine(s: FileStats): String = {
    val mapper = new ObjectMapper()
    val n = mapper.createObjectNode()
    n.put("file", s.file); n.put("min_value", s.min); n.put("max_value", s.max)
    if (s.rows >= 0) n.put("n_rows", s.rows)
    s.pkey.foreach(n.put("pkey", _))
    n.toString
  }

  /** Optional `_table.json` sidecar: table-level metadata the options
    * would otherwise have to carry out of band — which column the
    * manifest bounds describe, the key-grouping column, the schema. A
    * catalog MUST consult it: resolving a user-id-bounded table with the
    * default stats column would prune files against the wrong bounds
    * (silently wrong results) and serve MIN/MAX of the wrong column. */
  final case class TableMeta(statsCol: Option[String], partitionCol: Option[String],
                             schema: Option[StructType])

  def writeTableMeta(root: String, statsCol: String, partitionCol: Option[String],
                     schema: StructType): Unit = {
    val mapper = new ObjectMapper()
    val n = mapper.createObjectNode()
    n.put("statsColumn", statsCol)
    partitionCol.foreach(n.put("partitionColumn", _))
    n.put("schema", schema.json)
    Files.write(Paths.get(root, "_table.json"),
      java.util.Arrays.asList(n.toString),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** The commit point shared by every write path: manifest lines land
    * in a temp file and an ATOMIC_MOVE makes them the table. */
  def publishManifest(root: String, queryId: String, lines: Seq[String]): Unit = {
    val tmp = Paths.get(root, s"_stats.jsonl.tmp-$queryId")
    Files.write(tmp, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(root, "_stats.jsonl"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Wrap a Write with the clustered + sorted requirement a keyed
    * layout needs (`RequiresDistributionAndOrdering`): Spark
    * repartitions the incoming query by the partition column and sorts
    * within each task, so the task writer sees every key as one
    * contiguous run and rolls one file per key — the WRITE-side half
    * of the storage-partitioned-join contract (the read side reports
    * `KeyGroupedPartitioning` from the manifest pkeys those files get).
    * Unkeyed writes pass through untouched. */
  def keyedWrite(partitionCol: Option[String], inner: Write): Write = partitionCol match {
    case None => inner
    case Some(c) => new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        Distributions.clustered(Array(Expressions.identity(c)))
      override def requiredOrdering(): Array[SortOrder] =
        Array(Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
      override def toBatch: BatchWrite = inner.toBatch
      override def description(): String = s"keyed($c) ${inner.description()}"
    }
  }

  /** Flatten task commit messages (each task commits one or — keyed —
    * several files) to the real per-file entries. */
  def fileCommits(messages: Array[WriterCommitMessage]): Seq[JsonlFileCommit] =
    messages.toSeq.flatMap {
      case c: JsonlFileCommit   => Seq(c)
      case m: JsonlFileCommits  => m.commits
      case _                    => Seq.empty
    }.filter(c => c.file != null && c.rows > 0)

  /** Best-effort task-file cleanup on job abort (not load-bearing: an
    * unmanifested file is invisible to every reader). */
  def abortCleanup(root: String, messages: Array[WriterCommitMessage]): Unit =
    fileCommits(messages).foreach(c => Files.deleteIfExists(Paths.get(root, c.file)))

  def readTableMeta(root: String): TableMeta = {
    val p = Paths.get(root, "_table.json")
    if (!Files.exists(p)) TableMeta(None, None, None)
    else {
      val n = new ObjectMapper().readTree(Files.readAllLines(p).asScala.mkString("\n"))
      TableMeta(
        if (n.hasNonNull("statsColumn")) Some(n.get("statsColumn").asText()) else None,
        if (n.hasNonNull("partitionColumn")) Some(n.get("partitionColumn").asText()) else None,
        if (n.hasNonNull("schema"))
          Some(DataType.fromJson(n.get("schema").asText()).asInstanceOf[StructType])
        else None)
    }
  }

  /** Can this predicate prune files against a [min, max] interval? */
  def supportsSkipping(f: Filter): Boolean = supportsSkipping(f, statsColumn)

  def supportsSkipping(f: Filter, col: String): Boolean = f match {
    case GreaterThan(c, _: Number)        => c == col
    case GreaterThanOrEqual(c, _: Number) => c == col
    case LessThan(c, _: Number)           => c == col
    case LessThanOrEqual(c, _: Number)    => c == col
    case EqualTo(c, _: Number)            => c == col
    case _                                => false
  }

  /** Conservative interval test: may ANY row of a file with bounds
    * [mn, mx] satisfy the predicate? (False positives are fine — the
    * residual filter re-checks rows; false negatives would drop data.) */
  def intervalMayMatch(f: Filter, mn: Double, mx: Double): Boolean = f match {
    case GreaterThan(_, v: Number)        => mx > v.doubleValue()
    case GreaterThanOrEqual(_, v: Number) => mx >= v.doubleValue()
    case LessThan(_, v: Number)           => mn < v.doubleValue()
    case LessThanOrEqual(_, v: Number)    => mn <= v.doubleValue()
    case EqualTo(_, v: Number)            => mn <= v.doubleValue() && v.doubleValue() <= mx
    case _                                => true
  }
}

class JsonlStatsTable(root: String, tableSchema: StructType,
                      statsCol: String = JsonlStats.statsColumn,
                      partitionCol: Option[String] = None) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  import org.apache.spark.sql.connector.catalog.MetadataColumn

  /** SQL DELETE/UPDATE/MERGE on the table — copy-on-write at file
    * granularity ([[JsonlRowLevelOperation]]): the group is the file,
    * affected files are rewritten, the manifest swap commits. On
    * key-grouped layouts the rewrite WRITE declares the same clustered
    * + sorted requirement as a keyed batch write (r7 — this replaced
    * the r6 refusal), so replacement files are re-keyed and the
    * layout's zero-exchange SPJ contract survives the mutation. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo):
      org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    // a keyed layout may have been resolved without its partition
    // column (path-based read with no option): consult the sidecar, and
    // if the manifest carries pkeys whose column nobody can name, the
    // rewrite CANNOT preserve the layout — refuse rather than silently
    // strip the keys and downgrade every later SPJ join to a shuffle
    val keyed = partitionCol.orElse(JsonlStats.readTableMeta(root).partitionCol)
    if (keyed.isEmpty) {
      val stats = JsonlStats.readStats(root)
      if (stats.nonEmpty && stats.forall(_.pkey.isDefined))
        throw new UnsupportedOperationException(
          s"row-level ${info.command()} on key-grouped table $root: the partition " +
            "column is unknown (no _table.json), so the rewrite cannot re-key its output")
    }
    () => new JsonlRowLevelOperation(root, tableSchema, statsCol, info.command(), keyed)
  }
  override def name(): String = s"graft-jsonl-stats($root)"
  override def schema(): StructType = tableSchema

  /** Row provenance: which manifested file, which position in it. The
    * reader serves both from state it already has — no extra IO. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = JsonlStats.FileMeta
      override def dataType(): org.apache.spark.sql.types.DataType = StringType
      override def isNullable: Boolean = false
    },
    new MetadataColumn {
      override def name(): String = JsonlStats.PosMeta
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
    })
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlStatsScanBuilder(root, tableSchema, statsCol, partitionCol,
      splitBytes = options.getLong("splitBytes", JsonlStats.DefaultSplitBytes))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonlWriteBuilder(root, info.schema(), info.queryId(), statsCol, partitionCol)
}

/** Write side — the DSv2 commit protocol as a table format in
  * miniature. Task writers stream rows to their own data file while
  * tracking (min, max, rows) of the stats column; each task's
  * [[WriterCommitMessage]] carries exactly the manifest entry its file
  * deserves; the DRIVER's `commit()` merges them (plus, for append, the
  * previous manifest) and publishes via write-temp + ATOMIC_MOVE of
  * `_stats.jsonl`. Because readers trust only the manifest, the move is
  * the commit point: a crash before it leaves orphan data files that no
  * reader will ever see (which is also why task-level abort cleanup is
  * best-effort, not load-bearing) — the same marker-protocol stance as
  * the gold ledger, enforced at the connector layer. */
class JsonlWriteBuilder(root: String, writeSchema: StructType, queryId: String,
                        statsCol: String = JsonlStats.statsColumn,
                        partitionCol: Option[String] = None)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = JsonlStats.keyedWrite(partitionCol, new Write {
    override def toBatch: BatchWrite =
      new JsonlBatchWrite(root, writeSchema, queryId, truncateFirst, statsCol, partitionCol)
  })
}

final case class JsonlFileCommit(file: String, min: Double, max: Double, rows: Long,
                                 pkey: Option[String] = None)
  extends WriterCommitMessage

/** One task's commits — several files when the layout is keyed (one
  * per key run) or the task wrote nothing (empty). */
final case class JsonlFileCommits(commits: Seq[JsonlFileCommit]) extends WriterCommitMessage

class JsonlBatchWrite(root: String, writeSchema: StructType, queryId: String,
                      truncateFirst: Boolean,
                      statsCol: String = JsonlStats.statsColumn,
                      partitionCol: Option[String] = None) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonlWriterFactory(root, writeSchema, queryId, statsCol, partitionCol)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = JsonlStats.fileCommits(messages)
    val previous =
      if (!Files.exists(Paths.get(root, "_stats.jsonl"))) Seq.empty
      else JsonlStats.readStats(root)
    val kept = if (truncateFirst) Seq.empty else previous
    val lines = (kept.map(JsonlStats.statsLine) ++
      fresh.map(c =>
        JsonlStats.statsLine(JsonlStats.FileStats(c.file, c.min, c.max, c.rows, c.pkey)))).sorted
    // table-level metadata rides next to the manifest so a catalog can
    // resolve this table with the right stats column, key column, schema
    JsonlStats.writeTableMeta(root, statsCol, partitionCol, writeSchema)
    JsonlStats.publishManifest(root, queryId, lines)
    // truncate: the old generation's files are unreachable once the new
    // manifest lands; removing them is garbage collection, not commit
    if (truncateFirst)
      previous.foreach(s => Files.deleteIfExists(Paths.get(root, s.file)))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    JsonlStats.abortCleanup(root, messages)
}

/** Copy-on-write row-level operations (SQL DELETE/UPDATE/MERGE) at FILE
  * granularity — the connector as a mutable table format. The rewrite
  * group is the file: Spark's group filter identifies the files that
  * contain matching rows (delivered to the rewrite scan as a runtime IN
  * on `_file`), the scan re-reads those files' rows, the plan applies
  * the operation (drop deleted rows / project updated ones), and the
  * write publishes the survivors as NEW files while the commit swaps
  * the manifest to (previous − replaced) + fresh in one atomic move —
  * the same commit point as every other write, so a crash mid-rewrite
  * leaves the old generation fully intact.
  *
  * The REPLACED set is exactly the file set the rewrite scan PLANNED
  * (static bounds pruning and the runtime group filter both applied) —
  * see [[JsonlStatsScan.replacedFiles]] for why any other derivation
  * loses data: Spark pushes the POSITIVE operation condition into this
  * scan, so pruned files are provably unaffected and planned files are
  * the affected candidates, read in full and replaced. With no group
  * filter and no prunable condition the set degrades to every
  * manifested file: whole-table copy-on-write, correct and merely more
  * expensive. */
class JsonlRowLevelOperation(root: String, tableSchema: StructType, statsCol: String,
                             cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
                             partitionCol: Option[String] = None)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  import org.apache.spark.sql.connector.expressions.NamedReference

  @volatile private[sources] var rewriteScan: Option[JsonlStatsScan] = None

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def description(): String = s"graft-jsonl-stats copy-on-write $cmd"

  /** `_file` must survive the plan: it is both the group identity the
    * runtime filter targets and what the commit replaces by. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(JsonlStats.FileMeta))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlStatsScanBuilder(root, tableSchema, statsCol, None, Some(this),
      options.getLong("splitBytes", JsonlStats.DefaultSplitBytes))

  /** The replacement write re-keys on keyed layouts ([[JsonlStats.keyedWrite]]):
    * clustered + sorted on the partition column, one file per key run,
    * pkey'd manifest entries — the mutation preserves the SPJ layout. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = JsonlStats.keyedWrite(partitionCol, new Write {
      override def toBatch: BatchWrite =
        new JsonlReplaceBatchWrite(root, info.schema(), info.queryId(), statsCol,
          () => rewriteScan match {
            case Some(s) => s.replacedFiles
            case None => throw new IllegalStateException(
              "rewrite write committed before its scan was planned")
          }, partitionCol)
    })
  }
}

/** The replace-data commit: manifest becomes (previous − replaced) +
  * fresh in one atomic move; replaced data files are GC'd after the
  * swap, never before it. */
class JsonlReplaceBatchWrite(root: String, writeSchema: StructType, queryId: String,
                             statsCol: String,
                             replaced: () => Set[String],
                             partitionCol: Option[String] = None) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonlWriterFactory(root, writeSchema, queryId, statsCol, partitionCol)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = JsonlStats.fileCommits(messages)
    val gone = replaced()
    val kept = JsonlStats.readStats(root).filterNot(s => gone.contains(s.file))
    val lines = (kept.map(JsonlStats.statsLine) ++
      fresh.map(c =>
        JsonlStats.statsLine(JsonlStats.FileStats(c.file, c.min, c.max, c.rows, c.pkey)))).sorted
    JsonlStats.publishManifest(root, queryId, lines)
    // replaced files are unreachable once the new manifest lands;
    // deleting them is GC, never part of the commit
    gone.foreach(f => Files.deleteIfExists(Paths.get(root, f)))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    JsonlStats.abortCleanup(root, messages)
}

class JsonlWriterFactory(root: String, writeSchema: StructType, queryId: String,
                         statsCol: String = JsonlStats.statsColumn,
                         partitionCol: Option[String] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonlDataWriter(root, writeSchema, queryId, partitionId, taskId, statsCol, partitionCol)
}

/** Streams rows of ONE output data file, tracking (min, max, rows) of
  * the stats column — shared by the unkeyed (one file per task) and
  * keyed (one file per key run) writers. */
private[sources] class JsonlFileSink(root: String, val fileName: String,
                                     writeSchema: StructType, statsCol: String) {
  private val path = Paths.get(root, fileName)
  private val out = Files.newBufferedWriter(path)
  private val mapper = new ObjectMapper()
  private val statsIdx = writeSchema.fieldNames.indexOf(statsCol)
  private var mn = Double.PositiveInfinity
  private var mx = Double.NegativeInfinity
  private var rows = 0L

  def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    writeSchema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case LongType   => node.put(f.name, row.getLong(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case dt => throw new IllegalArgumentException(s"unsupported type $dt")
      }
    }
    if (statsIdx >= 0 && !row.isNullAt(statsIdx)) {
      // manifest bounds are doubles regardless of column type; exact for
      // longs below 2^53 (every key column in this engine)
      val v = writeSchema.fields(statsIdx).dataType match {
        case LongType => row.getLong(statsIdx).toDouble
        case _        => row.getDouble(statsIdx)
      }
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    out.write(node.toString); out.newLine()
    rows += 1
  }

  /** Close and return the manifest entry this file deserves. */
  def finish(pkey: Option[String]): JsonlFileCommit = {
    out.close()
    if (rows == 0) { Files.deleteIfExists(path); JsonlFileCommit(null, 0, 0, 0) }
    else if (mn > mx)
      // rows exist but the stats column was all-null: publish the whole
      // real line so the file is never pruned (conservative, correct)
      JsonlFileCommit(fileName, Double.MinValue, Double.MaxValue, rows, pkey)
    else JsonlFileCommit(fileName, mn, mx, rows, pkey)
  }

  def abort(): Unit = { out.close(); Files.deleteIfExists(path) }
}

/** Attempt-unique data files (retries and speculation can never
  * collide; only the attempt whose commit message reaches the driver
  * gets manifested). Unkeyed: one file per task. Keyed: the write's
  * clustered + sorted requirement delivers each key as one contiguous
  * run, so the writer ROLLS to a fresh file when the key changes — one
  * file per key per task, each manifested with its `pkey`, preserving
  * the layout contract `KeyGroupedPartitioning` reads from. */
class JsonlDataWriter(root: String, writeSchema: StructType, queryId: String,
                      partitionId: Int, taskId: Long,
                      statsCol: String = JsonlStats.statsColumn,
                      partitionCol: Option[String] = None) extends DataWriter[InternalRow] {
  private val keyIdx = partitionCol.map(writeSchema.fieldNames.indexOf(_)).getOrElse(-1)
  require(partitionCol.isEmpty || keyIdx >= 0,
    s"partition column ${partitionCol.orNull} missing from write schema $writeSchema")
  private var seq = 0
  private var curKey: String = _
  private var sink: JsonlFileSink = _
  private val done = scala.collection.mutable.ArrayBuffer.empty[JsonlFileCommit]

  private def roll(): Unit = {
    val name = f"part-$queryId-$partitionId%05d-$taskId-$seq.jsonl"
    seq += 1
    sink = new JsonlFileSink(root, name, writeSchema, statsCol)
  }

  override def write(row: InternalRow): Unit = {
    if (keyIdx >= 0) {
      if (row.isNullAt(keyIdx))
        throw new IllegalArgumentException(
          s"partition column ${partitionCol.get} must not be null in a keyed layout")
      val k = row.getUTF8String(keyIdx).toString
      if (sink == null || k != curKey) {
        if (sink != null) done += sink.finish(Some(curKey))
        curKey = k
        roll()
      }
    } else if (sink == null) roll()
    sink.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (sink != null) {
      done += sink.finish(if (keyIdx >= 0) Some(curKey) else None)
      sink = null
    }
    JsonlFileCommits(done.filter(_.file != null).toSeq)
  }

  override def abort(): Unit = {
    if (sink != null) { sink.abort(); sink = null }
    done.foreach(c => if (c.file != null) Files.deleteIfExists(Paths.get(root, c.file)))
  }
  override def close(): Unit = ()
}

class JsonlStatsScanBuilder(root: String, full: StructType,
                            statsCol: String = JsonlStats.statsColumn,
                            partitionCol: Option[String] = None,
                            rewriteOp: Option[JsonlRowLevelOperation] = None,
                            splitBytes: Long = JsonlStats.DefaultSplitBytes) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var aggSchema: Option[StructType] = None

  /** Accept skippable predicates for file pruning; return EVERY filter
    * as a residual — bounds can only prove a file irrelevant, never
    * that all its rows match. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(JsonlStats.supportsSkipping(_, statsCol))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** The third pushdown leg: a global COUNT(*)/MIN/MAX over the stats
    * column is answered FROM THE MANIFEST — zero data-file IO. Declined
    * whenever it would be wrong: any pushed filter (per-file bounds are
    * bounds over ALL rows of the file, not the filtered subset), any
    * grouping, or any aggregate the manifest doesn't carry. Partial
    * pushdown contract: the scan emits one partial row per file and
    * Spark's final aggregate merges (count→sum, min→min, max→max) —
    * Parquet's footer-stats pushdown shape. */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    def isStatsRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
      case n: NamedReference => n.fieldNames.toSeq == Seq(statsCol)
      case _ => false
    }
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return false
    val stats = JsonlStats.readStats(root)
    // a manifest without row counts cannot serve aggregates
    if (stats.exists(_.rows < 0)) return false
    // min/max are served from the manifest's double bounds — offered for
    // a double stats column as-is and for a LONG one via an exact
    // toLong round-trip (manifest doubles are exact for longs below
    // 2^53, which every key column in this engine satisfies; the writer
    // derives them from getLong, r7). Declined for other types, and
    // whenever any file carries the all-null sentinel bounds (the
    // writer publishes [MinValue, MaxValue] for a file whose stats
    // column was entirely null so it is never pruned — serving MIN/MAX
    // from those sentinels would return them as data).
    val hasSentinel = stats.exists(s =>
      s.min == Double.MinValue && s.max == Double.MaxValue)
    val statsType = full.fields.find(_.name == statsCol).map(_.dataType)
    val servable = !hasSentinel &&
      (statsType.contains(DoubleType) || statsType.contains(LongType))
    val boundType = statsType.getOrElse(DoubleType)
    val fields = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(StructField("count_star", LongType, nullable = false))
      case m: Min if servable && isStatsRef(m.column) => Some(StructField("min_value", boundType))
      case m: Max if servable && isStatsRef(m.column) => Some(StructField("max_value", boundType))
      case _ => None
    }
    if (fields.contains(None)) false
    else { aggSchema = Some(StructType(fields.flatten)); true }
  }

  override def build(): Scan = aggSchema match {
    case Some(s) => new JsonlManifestAggScan(root, s)
    case None =>
      val scan = new JsonlStatsScan(root, required, pushed, statsCol, partitionCol,
        rewriteOp, splitBytes)
      // the operation's commit must know what this scan replaced
      rewriteOp.foreach(_.rewriteScan = Some(scan))
      scan
  }
}

/** Aggregate-pushdown scan: partial rows served from the manifest. One
  * input partition carrying the (file-count-bounded) stats list; the
  * reader never opens a data file. */
class JsonlManifestAggScan(root: String, aggSchema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jsonl-stats root=$root, aggregatePushdown=[${aggSchema.fieldNames.mkString(", ")}] (manifest-only, no data IO)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(JsonlManifestAggPartition(JsonlStats.readStats(root), aggSchema))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val part = p.asInstanceOf[JsonlManifestAggPartition]
        new PartitionReader[InternalRow] {
          private val it = part.stats.iterator
          private var cur: JsonlStats.FileStats = _
          override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
          // a LONG stats column's bounds round-trip exactly through the
          // manifest's doubles below 2^53 (pushAggregation gates on type)
          override def get(): InternalRow = InternalRow.fromSeq(part.schema.fields.toSeq.map { f =>
            (f.name, f.dataType) match {
              case ("count_star", _)       => cur.rows
              case ("min_value", LongType) => cur.min.toLong
              case ("max_value", LongType) => cur.max.toLong
              case ("min_value", _)        => cur.min
              case ("max_value", _)        => cur.max
            }
          })
          override def close(): Unit = ()
        }
      }
    }
}

final case class JsonlManifestAggPartition(stats: Seq[JsonlStats.FileStats],
                                           schema: StructType) extends InputPartition

class JsonlStatsScan(root: String, required: StructType, pushed: Array[Filter],
                     statsCol: String = JsonlStats.statsColumn,
                     partitionCol: Option[String] = None,
                     rewriteOp: Option[JsonlRowLevelOperation] = None,
                     splitBytes: Long = JsonlStats.DefaultSplitBytes)
    extends Scan with Batch
    with SupportsRuntimeV2Filtering with SupportsReportStatistics
    with SupportsReportPartitioning {
  import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** Value sets delivered by runtime filters (one entry per IN
    * predicate, conjunctive); files must cover at least one value of
    * EACH set to survive. Empty until [[filter]] is called. */
  @volatile private var runtimeKeep: Seq[Array[Double]] = Seq.empty

  /** Affected-group set delivered by the row-level rewrite's runtime
    * group filter: absolute `_file` paths of files containing matching
    * rows. None until (and unless) such a filter arrives. */
  @volatile private var runtimeFileKeep: Option[Set[String]] = None

  /** ONE manifest snapshot per scan: planning consults the stats several
    * times (partitioning, statistics, partition planning, post-runtime
    * re-planning), and the connector's own commit protocol swaps the
    * manifest atomically underneath — two reads inside one planning pass
    * could see different generations and plan an inconsistent scan. */
  private lazy val statsSnapshot: Seq[JsonlStats.FileStats] = JsonlStats.readStats(root)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jsonl-stats root=$root, skipping=[${pushed.mkString(", ")}], " +
      s"read=[${required.fieldNames.mkString(", ")}], runtimeFilterable=[$statsCol], " +
      s"splitBytes=$splitBytes"

  /** The runtime-filtering leg (the DPP analogue for connectors): a
    * broadcast join on the stats column hands the scan the join side's
    * actual key set AT EXECUTION TIME, and files whose manifest interval
    * contains none of those keys are pruned before their tasks launch —
    * pruning the query's text never named. Like the planning-time leg
    * this only ever DROPS provably-irrelevant files (bounds prove
    * absence, never presence; the join itself re-checks rows), so an
    * unparseable predicate is safely ignored rather than guessed at. */
  /** Only advertised when the pruned read schema still carries the
    * stats column: Spark resolves these refs against the scan OUTPUT,
    * so naming an unprojected column is an analysis error (seen when a
    * query reads only metadata columns) — and a runtime join filter on
    * a column the node doesn't output can't exist anyway. Key-grouped
    * layouts decline runtime filtering entirely: once the scan reports
    * `KeyGroupedPartitioning`, Spark requires any runtime-filtered
    * re-plan to preserve the keyed partitions, and dropping files after
    * the grouping was reported breaks that contract — group alignment
    * (a shuffle-free join) is worth more than late file skipping. */
  override def filterAttributes(): Array[NamedReference] =
    if (rewriteOp.isDefined) {
      // rewrite scans accept ONLY the _file group filter: the group
      // identity is the file, and advertising the stats column too
      // makes Spark build a multi-column (value, _file) IN subquery
      // that translateRuntimeFilterV2 cannot convert — one attribute,
      // one translatable single-column IN
      if (required.fieldNames.contains(JsonlStats.FileMeta))
        Array(Expressions.column(JsonlStats.FileMeta))
      else Array.empty
    } else if (!keyGrouped && required.fieldNames.contains(statsCol))
      Array(Expressions.column(statsCol))
    else Array.empty

  override def filter(predicates: Array[Predicate]): Unit = {
    // one unparseable member voids the whole predicate: a partial value
    // set would prune files that only match the missing values
    def inValues(p: Predicate, col: String): Option[Seq[Any]] = {
      val kids = p.children()
      val onCol = kids.headOption.exists {
        case n: NamedReference => n.fieldNames.toSeq == Seq(col)
        case _ => false
      }
      if (p.name() == "IN" && onCol) {
        val lits = kids.tail.toSeq.map {
          case l: Literal[_] => Some(l.value())
          case _ => None
        }
        if (lits.forall(_.isDefined)) Some(lits.flatten) else None
      } else None
    }
    val sets = predicates.toSeq.flatMap { p =>
      inValues(p, statsCol).flatMap { raw =>
        val vals = raw.map { case n: Number => Some(n.doubleValue()); case _ => None }
        if (vals.forall(_.isDefined)) Some(vals.flatten.toArray) else None
      }
    }
    if (sets.nonEmpty) runtimeKeep = sets
    val fileSets = predicates.toSeq.flatMap { p =>
      inValues(p, JsonlStats.FileMeta).flatMap { raw =>
        val vals = raw.map {
          case s: UTF8String => Some(s.toString)
          case s: String => Some(s)
          case _ => None
        }
        // same voiding rule as the stats path: a partial _file set would
        // prune files whose matching rows then silently escape the
        // rewrite — worse than no pruning
        if (vals.forall(_.isDefined)) Some(vals.flatten.toSet) else None
      }
    }
    if (fileSets.nonEmpty) runtimeFileKeep = Some(fileSets.reduce(_ intersect _))
  }

  /** Files the row-level rewrite replaces = exactly the files this scan
    * PLANNED. Group-based rewrite contract: Spark pushes the POSITIVE
    * operation condition into the rewrite scan, so static bounds
    * skipping prunes precisely the files that provably contain no
    * matching row — unaffected, not replaced — while a file whose rows
    * ALL match keeps satisfying the pushed bounds, stays planned, reads
    * rows the keep-filter then drops, and is correctly replaced with
    * nothing. The runtime `_file` group filter refines the same set for
    * conditions bounds can't judge. (Deriving this from anything other
    * than the planned set is how you wipe a table: an earlier draft
    * ignored static pruning here, making `replaced` = everything while
    * only affected files' survivors were rewritten.) */
  private[sources] def replacedFiles: Set[String] = survivingStats().map(_.file).toSet

  /** Is this table a reportable key-grouped layout for the projected
    * output? Requires a declared partition column that survives column
    * pruning and a pkey on EVERY manifested file. A key-grouped scan
    * never receives runtime filters ([[filterAttributes]] declines
    * them), so this decision is stable across re-planning. */
  private lazy val keyGrouped: Boolean =
    partitionCol.exists(c => required.fieldNames.contains(c)) && {
      val s = survivingStats(); s.nonEmpty && s.forall(_.pkey.isDefined)
    }

  /** Storage-partitioned-join leg (`SupportsReportPartitioning`): when
    * every file carries a single declared partition-column value, the
    * scan reports `KeyGroupedPartitioning` over that column and each
    * input partition exposes its key (`HasPartitionKey`). Two tables
    * laid out this way join WITHOUT ANY EXCHANGE — Spark aligns the key
    * groups instead of shuffling either side (the DSv2 generalization
    * of the bucketed-join story: at 100 TB the fact table never moves).
    * Grouping follows from the layout contract, not trust: the reader
    * still reads only manifested immutable files, and a wrong pkey
    * would surface as wrong results against the oracle. */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (keyGrouped) {
      val keys = survivingStats().flatMap(_.pkey).distinct
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(Expressions.identity(partitionCol.get)), keys.size)
    } else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        survivingStats().size)

  /** Planning-time file skipping: consult the manifest, keep files whose
    * interval may satisfy every pushed predicate — and, once runtime
    * filters have arrived, whose interval covers at least one delivered
    * key per IN set. No directory listing.
    *
    * Surviving files larger than [[splitBytes]] fan out into byte-range
    * partitions (newline-boundary ownership per the class doc) — the
    * 100-TB posture: one skewed multi-GB file must never become one
    * task. Whole-file partitions are kept when (a) the layout is
    * key-grouped (the group identity is the file; extra partitions per
    * key would defeat group alignment) or (b) `_pos` is projected (its
    * contract is the dense row position within the FILE, which a range
    * reader cannot know without counting its predecessors' lines). */
  override def planInputPartitions(): Array[InputPartition] = {
    val grouped = keyGrouped
    val canSplit = !grouped && splitBytes > 0 &&
      !required.fieldNames.contains(JsonlStats.PosMeta)
    survivingStats()
      .flatMap { s =>
        val path = Paths.get(root, s.file).toString
        if (grouped) Seq(JsonlKeyedFilePartition(path, s.pkey.get): InputPartition)
        else {
          val size =
            try Files.size(Paths.get(path)) catch { case _: Throwable => 0L }
          if (!canSplit || size <= splitBytes)
            Seq(JsonlFilePartition(path): InputPartition)
          else {
            val n = ((size + splitBytes - 1) / splitBytes).toInt
            (0 until n).map { i =>
              val lo = i.toLong * splitBytes
              val hi = if (i == n - 1) Long.MaxValue else (i + 1).toLong * splitBytes
              JsonlFilePartition(path, lo, hi): InputPartition
            }
          }
        }
      }
      .toArray
  }

  private def survivingStats(): Seq[JsonlStats.FileStats] =
    statsSnapshot
      .filter(s => pushed.forall(f => JsonlStats.intervalMayMatch(f, s.min, s.max)))
      .filter(s => runtimeKeep.forall(_.exists(v => s.min <= v && v <= s.max)))
      .filter(s => runtimeFileKeep.forall(_.contains(Paths.get(root, s.file).toString)))

  /** Manifest-derived statistics: row count is the sum of surviving
    * files' exact counts, bytes the sum of their on-disk sizes (a
    * file-count-bounded metadata stat, never a data scan) — what lets
    * Catalyst/AQE see a post-pruning connector table as small enough to
    * broadcast. Unknown when an old manifest lacks row counts. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val surviving = survivingStats()
    val haveRows = surviving.forall(_.rows >= 0)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(surviving.map { s =>
          val p = Paths.get(root, s.file)
          if (Files.exists(p)) Files.size(p) else 0L
        }.sum)
      override def numRows(): java.util.OptionalLong =
        if (haveRows) java.util.OptionalLong.of(surviving.map(_.rows).sum)
        else java.util.OptionalLong.empty()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(required)

  /** Streaming leg: the manifest doubles as the source of incremental
    * progress. An offset is the SET of manifested files; each micro-batch
    * reads exactly the files that joined the manifest since the last
    * offset. Manifested files are immutable (the writer only ever adds
    * attempt-unique files and swaps the manifest), so a file read once
    * never changes — the property that makes offset-diff replay
    * exactly-once under checkpoint recovery. No stats skipping here:
    * bounds may be swapped out from under a running stream by truncate,
    * and residual row filters re-check anyway. */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new JsonlManifestStream(root, required)
}

class JsonlManifestStream(root: String, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = JsonlManifestOffset(Seq.empty)
  override def latestOffset(): Offset =
    JsonlManifestOffset(JsonlStats.readStats(root).map(_.file).sorted)
  override def deserializeOffset(json: String): Offset = JsonlManifestOffset.fromJson(json)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[JsonlManifestOffset].files.toSet
    end.asInstanceOf[JsonlManifestOffset].files
      .filterNot(seen)
      .map(f => JsonlFilePartition(Paths.get(root, f).toString): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new JsonlReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class JsonlManifestOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    files.foreach(arr.add)
    arr.toString
  }
}

object JsonlManifestOffset {
  def fromJson(json: String): JsonlManifestOffset = {
    val n = new ObjectMapper().readTree(json)
    JsonlManifestOffset((0 until n.size()).map(i => n.get(i).asText()))
  }
}

/** A byte range [start, end] of one JSONL file. Owns every line whose
  * first byte lands in (start, end] — plus byte 0 when start == 0.
  * Whole file = (0, Long.MaxValue]. Adjacent ranges share their
  * boundary (range i's end == range i+1's start), which with the
  * ownership rule covers every line exactly once. */
final case class JsonlFilePartition(file: String, start: Long = 0L,
                                    end: Long = Long.MaxValue) extends InputPartition

/** A file of a key-grouped layout: every row carries `key` in the
  * table's partition column, so the partition's identity IS the key —
  * what lets Spark align two such tables' groups instead of shuffling. */
final case class JsonlKeyedFilePartition(file: String, key: String)
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  @transient private lazy val row: InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(key)))
  override def partitionKey(): InternalRow = row
}

class JsonlReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case f: JsonlFilePartition      => new JsonlPartitionReader(f.file, required, f.start, f.end)
    case k: JsonlKeyedFilePartition => new JsonlPartitionReader(k.file, required)
    case other => throw new IllegalArgumentException(s"unexpected partition $other")
  }
}

/** Streams one byte range of a JSONL file, parsing only the projected
  * fields. Absent or null JSON fields surface as SQL nulls. The
  * `_file`/`_pos` metadata columns are served from reader state (the
  * partition's path and a row counter) — provenance without touching
  * the data bytes; `_pos` is only projected on whole-file partitions
  * (the scan planner guarantees it).
  *
  * Range ownership (class doc on [[JsonlFilePartition]]): a reader at
  * start > 0 first discards through its first newline — that prefix is
  * the previous range's tail — then emits every line starting at byte
  * position ≤ `end`, reading past `end` until the straddling line
  * completes. Line scanning is byte-level on 0x0A (never part of a
  * UTF-8 multi-byte sequence), so a boundary mid-character is safe. */
class JsonlPartitionReader(file: String, required: StructType,
                           start: Long = 0L, end: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val in = new java.io.BufferedInputStream(
    Files.newInputStream(Paths.get(file)), 1 << 16)
  private val filePath = UTF8String.fromString(file)
  private val lineBuf = new java.io.ByteArrayOutputStream(256)
  private var bpos = 0L   // byte position of the next unread byte
  private var line: String = _
  private var pos = -1L   // dense row index (whole-file partitions only)

  locally {
    var toSkip = start
    var eof = false
    while (toSkip > 0 && !eof) {
      val n = in.skip(toSkip)
      if (n > 0) { toSkip -= n; bpos += n }
      // skip() may return 0 before EOF; fall back to read()
      else if (in.read() >= 0) { toSkip -= 1; bpos += 1 }
      else eof = true
    }
    if (start > 0 && !eof) discardThroughNewline()
  }

  private def discardThroughNewline(): Unit = {
    var b = in.read()
    while (b >= 0 && b != '\n') { bpos += 1; b = in.read() }
    if (b >= 0) bpos += 1
  }

  /** Next line's bytes (trailing newline consumed, not included), or
    * null at EOF. Advances [[bpos]] to the following line's start. */
  private def readLineBytes(): Array[Byte] = {
    var b = in.read()
    if (b < 0) return null
    lineBuf.reset()
    while (b >= 0 && b != '\n') { lineBuf.write(b); bpos += 1; b = in.read() }
    if (b >= 0) bpos += 1
    lineBuf.toByteArray
  }

  override def next(): Boolean = {
    var found = false
    var eof = false
    while (!found && !eof) {
      if (bpos > end) eof = true // that line belongs to the next range
      else readLineBytes() match {
        case null => eof = true
        case bytes =>
          // skip blank lines (they advance bpos but carry no row); a
          // lone \r (CRLF feed) is blank too
          if (bytes.length > 0 && !(bytes.length == 1 && bytes(0) == '\r')) {
            line = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            pos += 1
            found = true
          }
      }
    }
    found
  }

  override def get(): InternalRow = {
    val n = mapper.readTree(line)
    InternalRow.fromSeq(required.fields.toSeq.map { f =>
      if (f.name == JsonlStats.FileMeta) filePath
      else if (f.name == JsonlStats.PosMeta) pos
      else {
        val v = n.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case LongType   => v.asLong()
          case DoubleType => v.asDouble()
          case StringType => UTF8String.fromString(v.asText())
          case dt => throw new IllegalArgumentException(s"unsupported type $dt")
        }
      }
    })
  }

  override def close(): Unit = in.close()
}
