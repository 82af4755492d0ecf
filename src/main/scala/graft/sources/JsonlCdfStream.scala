package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** STREAMING change data feed (r8) — the q181 batch `tableChanges` as a
  * structured-streaming SOURCE: offsets are table VERSIONS, each
  * micro-batch emits the row-level changes the commits in
  * (startVersion, endVersion] made, with the Delta CDF column shape
  * (the table's columns carrying the row image + `_change_type`).
  * This is the leg that turns the CDF→IVM composition (q229)
  * continuous: a `readStream` of changes drives the delta-join refresh
  * per micro-batch instead of per manual call.
  *
  * Exactness without a join: the batch CDF cancels copy-on-write
  * re-emissions by image comparison — a DataFrame-level join a
  * streaming source cannot run inside planning. So the STREAM scopes
  * itself to the commit family whose deltas are EXACT at the file
  * level, which is precisely the append + merge-on-read family the
  * OCC hot path serves:
  *
  *   - a file ADDED in the window ⇒ its surviving rows (masked by the
  *     file's DVs as of the window end) are `insert` images — NET
  *     semantics: a row inserted and deleted inside one window never
  *     surfaces, like Delta CDF over coalesced batches;
  *   - a DV GROWN on a pre-existing file ⇒ the newly-masked positions'
  *     rows are `delete` images, read by the same range reader with
  *     the mask INVERTED (emit ONLY the masked positions);
  *   - a file REMOVED (copy-on-write rewrite, truncate, compaction,
  *     zorder) ⇒ REFUSE loudly: those commits' row-level deltas need
  *     the image-cancelling join — use batch `tableChanges`, which
  *     handles them. Stated, not silent: a streaming CDF that guessed
  *     would fabricate or drop changes.
  *
  * Offsets are versions, so restarts replay exactly: archived
  * manifests are immutable, and a vacuumed generation fails loudly
  * (the q180 retention contract). `latestOffset` reports the last
  * SETTLED version — a reserved-but-unswapped OCC commit (in-flight
  * lease) is not yet readable, so the stream waits the lease out
  * rather than planning a batch whose end-manifest is not live yet. */
object JsonlCdfStream {
  val ChangeTypeCol = "_change_type"

  def cdfSchema(tableSchema: StructType): StructType =
    StructType(tableSchema.fields :+ StructField(ChangeTypeCol, StringType, nullable = false))

  /** The newest version whose manifest is actually LIVE: during an OCC
    * commit the version counter advances at slot reservation, one step
    * before the manifest swap — the feed must not read past the swap. */
  private[sources] def settledVersion(root: String): Int = {
    val k = JsonlStats.currentVersion(root)
    if (k <= 1) return k
    val slot = Paths.get(root, JsonlStats.HistoryDir, s"v${k - 1}.jsonl")
    val live = Paths.get(root, "_stats.jsonl")
    val inFlight = Files.exists(slot) && Files.exists(live) &&
      (try java.util.Arrays.equals(Files.readAllBytes(slot), Files.readAllBytes(live))
       catch { case _: java.io.IOException => false })
    if (inFlight) k - 1 else k
  }
}

/** The `readChangeFeed=true` table: same root, CDF schema, micro-batch
  * only (batch change reads are [[ChangeFeed.tableChanges]]'s job —
  * it handles the commit families the stream refuses). */
class JsonlCdfTable(root: String, startingVersion: Int)
    extends Table with SupportsRead {
  private val meta = JsonlStats.readTableMeta(root)
  private val tableSchema: StructType = meta.schema.getOrElse(JsonlStats.schema)
  private val mapping: Map[String, String] = meta.columnMapping

  override def name(): String = s"graft-jsonl-stats cdf $root"
  override def schema(): StructType = JsonlCdfStream.cdfSchema(tableSchema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = JsonlCdfStream.cdfSchema(tableSchema)
        override def description(): String = s"graft-jsonl-stats change feed $root"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new JsonlCdfMicroBatchStream(root, tableSchema, mapping, startingVersion)
      }
    }
}

final case class JsonlCdfOffset(v: Int) extends Offset {
  override def json(): String = s"""{"v":$v}"""
}
object JsonlCdfOffset {
  def fromJson(s: String): JsonlCdfOffset =
    JsonlCdfOffset(new ObjectMapper().readTree(s).get("v").asInt())
}

/** One CDF work unit: a whole file read under `mask`, either dropping
  * the masked positions (insert leg) or emitting ONLY them (delete
  * leg, `invert = true`). */
final case class JsonlCdfPartition(file: String, mask: Seq[String],
                                   invert: Boolean, changeType: String)
    extends InputPartition

class JsonlCdfMicroBatchStream(root: String, tableSchema: StructType,
                               mapping: Map[String, String],
                               startingVersion: Int)
    extends MicroBatchStream {

  override def initialOffset(): Offset = JsonlCdfOffset(math.max(0, startingVersion - 1))
  override def latestOffset(): Offset = JsonlCdfOffset(JsonlCdfStream.settledVersion(root))
  override def deserializeOffset(json: String): Offset = JsonlCdfOffset.fromJson(json)

  /** The version-v manifest, RACE-SAFELY (r8 review): the archive
    * `_history/v{v}.jsonl` is immutable and authoritative whenever it
    * exists (it appears the instant v is superseded — or reserved —
    * and holds exactly generation v's content), so prefer it; only a
    * still-live version has no archive, and a commit landing between
    * our read of the live manifest and now would have CREATED the
    * archive — re-check after reading and fall back to it, or a batch
    * ending at offset v could emit version v+1's files and the next
    * batch would emit them AGAIN (a duplicate, breaking exactly-once). */
  private def statsAt(v: Int): Seq[JsonlStats.FileStats] = {
    if (v <= 0) return Nil
    val arch = s"${JsonlStats.HistoryDir}/v$v.jsonl"
    val archPath = Paths.get(root, arch)
    if (Files.exists(archPath)) JsonlStats.readStats(root, arch)
    else {
      val live = JsonlStats.readStats(root, "_stats.jsonl")
      if (Files.exists(archPath)) JsonlStats.readStats(root, arch) else live
    }
  }

  /** Version-v eqdel set, with [[statsAt]]'s archive-or-live race
    * safety. */
  private def eqAt(v: Int): Seq[JsonlEqualityDeletes.EqDelete] = {
    if (v <= 0) return Nil
    val arch = s"${JsonlStats.HistoryDir}/v$v.jsonl"
    val archPath = Paths.get(root, arch)
    if (Files.exists(archPath)) JsonlEqualityDeletes.readEqDeletes(root, arch)
    else {
      val live = JsonlEqualityDeletes.readEqDeletes(root, "_stats.jsonl")
      if (Files.exists(archPath)) JsonlEqualityDeletes.readEqDeletes(root, arch) else live
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[JsonlCdfOffset].v
    val b = end.asInstanceOf[JsonlCdfOffset].v
    if (a >= b) return Array.empty
    val from = statsAt(a).map(s => s.file -> s).toMap
    val to = statsAt(b).map(s => s.file -> s).toMap
    // equality deletes (r9b): an upsert's retraction is KEY-scoped —
    // its row-level delta needs the image-cancelling join, exactly like
    // a rewrite. Refuse the window loudly; batch tableChanges handles
    // it (derived manifests carry each version's eqdel lines).
    if (eqAt(a).map(_.file).toSet != eqAt(b).map(_.file).toSet)
      throw new UnsupportedOperationException(
        s"streaming change feed of $root: versions ($a, $b] committed equality " +
          "deletes (an upsert) — key-scoped retraction needs the image-cancelling " +
          "join of batch tableChanges, or rewrite_deletes to materialize first")
    val removed = from.keySet.diff(to.keySet)
    if (removed.nonEmpty)
      throw new UnsupportedOperationException(
        s"streaming change feed of $root: versions ($a, $b] removed " +
          s"file(s) ${removed.take(3).mkString(", ")} — a copy-on-write rewrite, " +
          "truncate or compaction; its row-level delta needs the image-cancelling " +
          "join of batch tableChanges. The stream serves append + merge-on-read " +
          "commits exactly")
    val inserts = to.valuesIterator.filterNot(s => from.contains(s.file)).map { s =>
      JsonlCdfPartition(Paths.get(root, s.file).toString,
        s.dvs.map(d => Paths.get(root, d).toString), invert = false,
        changeType = "insert"): InputPartition
    }
    val deletes = from.valuesIterator.flatMap { was =>
      val now = to(was.file)
      val newDvs = now.dvs.filterNot(was.dvs.contains)
      if (newDvs.isEmpty) None
      else Some(JsonlCdfPartition(Paths.get(root, was.file).toString,
        newDvs.map(d => Paths.get(root, d).toString), invert = true,
        changeType = "delete"): InputPartition)
    }
    (inserts ++ deletes).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlCdfReaderFactory(tableSchema, mapping)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class JsonlCdfReaderFactory(tableSchema: StructType, mapping: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val c = p.asInstanceOf[JsonlCdfPartition]
    val inner = new JsonlPartitionReader(c.file, tableSchema,
      dvs = c.mask, columnMapping = mapping, invertMask = c.invert)
    // zero-copy constant-column append (r8 review): one reusable
    // JoinedRow over the inner row and a single-field tag row — no
    // per-row array allocation on the change-scan hot path
    val tagRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(c.changeType)))
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow()
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = joined(inner.get(), tagRow)
      override def close(): Unit = inner.close()
    }
  }
}
