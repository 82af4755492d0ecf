package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Stored procedures for [[GraftCatalog]] (`ProcedureCatalog`, Spark 4's
  * V2 procedure API): table MAINTENANCE addressed as SQL —
  * `CALL <catalog>.compact('<table>', <target_bytes>)` — the Iceberg
  * `rewrite_data_files` shape on this engine's manifest protocol.
  *
  * Compaction is the inverse pressure of the reader's byte-range
  * splits: splits keep one oversized file from becoming one task, while
  * compaction keeps a thousand undersized files (a streaming ingest's
  * natural output) from costing a thousand task launches and manifest
  * entries. Together they bound task size from both ends.
  *
  * The operation never parses a row: JSONL is concatenation-safe, so a
  * bin of small files becomes one file by STREAMING BYTE COPY (the
  * engine guarantees newline-terminated data files; a missing trailing
  * newline is patched during the copy), and the merged manifest entry
  * is derived from the members' entries — bounds = min/max of member
  * bounds, rows = sum of member counts, pkey preserved (bins never
  * cross keys, so a compacted key-grouped table keeps its SPJ layout).
  * Bins copy in parallel as one Spark job; the manifest swap is the
  * commit, so a crash mid-copy leaves invisible orphans and the old
  * generation intact; member files are GC'd only after the swap.
  *
  * Interplay caveats, stated rather than hidden: the streaming source
  * treats a compacted output file as NEW (its offset is the manifested
  * file set), so a drain that already consumed the members would
  * re-deliver their rows — run compaction between drains or behind an
  * idempotent/dedup sink, exactly Delta's guidance for OPTIMIZE under
  * a streaming reader. Compaction publishes a generation like any
  * write; its members stay on disk for the archived snapshots that
  * reference them until [[vacuum]] expires those (deferred GC, r7). */
object GraftProcedures {

  /** One compaction bin: member data files (relative names) → the
    * merged output file, with its ready-made manifest entry.
    * `matLineages` (r12): present when the bin's run list crossed
    * [[JsonlStats.MaxRunsPerEntry]] — the copy job then SPLICES each
    * member's manifest lineage in-row (one `Lineage` per member, in
    * order) instead of a pure byte concat, and the entry declares
    * frid = -2 with no runs. */
  private final case class Bin(members: Seq[String], out: String,
                               entry: JsonlStats.FileStats,
                               matLineages: Option[Seq[JsonlStats.Lineage]] = None)

  class CompactUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "compact(table, target_bytes): bin-pack small data files into target-sized ones"
    override def bind(inputType: StructType): BoundProcedure = new CompactBound(root)
  }

  class CompactBound(root: String) extends BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "bin-pack small manifest files into target-sized ones (manifest-swap commit)"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("target_bytes", LongType)
        .defaultValue(JsonlStats.DefaultSplitBytes.toString).build(),
      // SCOPED maintenance (r9c, the Delta `OPTIMIZE ... WHERE` shape):
      // '' = whole table; a partition value compacts only files whose
      // manifest pkey equals it — at 100 TB you compact yesterday's
      // partition, never the table
      ProcedureParameter.in("partition", StringType).defaultValue("''").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val target = input.getLong(1)
      require(target > 0, s"target_bytes must be positive, got $target")
      val part = Option(input.getUTF8String(2)).map(_.toString).filter(_.nonEmpty)
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val (before, after, merged) = GraftProcedures.compact(dir.toString, target, part)
      java.util.List.of[Scan](new CompactResultScan(before, after, merged)).iterator()
    }
  }

  /** CALL's result set: one row of compaction accounting. */
  class CompactResultScan(before: Int, after: Int, merged: Int) extends LocalScan {
    override def readSchema(): StructType = StructType(Seq(
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false),
      StructField("files_merged", IntegerType, nullable = false)))
    override def rows(): Array[InternalRow] =
      Array(InternalRow(before, after, merged))
    override def description(): String =
      s"compact result: $before -> $after files ($merged merged)"
  }

  class ZOrderUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "zorder"
    override def description(): String =
      "zorder(table, col_a, col_b, target_bytes): rewrite data files clustered by the Morton interleave of two columns"
    override def bind(inputType: StructType): BoundProcedure = new ZOrderBound(root)
  }

  /** `CALL <cat>.zorder('<table>', 'col_a', 'col_b'[, target_bytes])` —
    * OPTIMIZE ZORDER BY for the manifest protocol. Unlike [[compact]]
    * (a byte-level repack that never parses a row), zorder is a full
    * REWRITE: rows are re-bucketed by the Morton interleave of the two
    * named columns' 256-rank range buckets and re-written range-
    * partitioned + sorted by that z-value, so each output file covers a
    * compact z-cell run. The payoff is pure synergy with the r7b
    * per-column manifest stats: a z-clustered file has TIGHT bounds on
    * BOTH dimensions at once, so an ordinary 2-D box predicate prunes
    * ≈ the product of the selectivities from the manifest alone — no
    * z-cell arithmetic, no bounds artifact, no special read path (the
    * `ingest/ZOrder` parquet variant needs all three; here the manifest
    * IS the index and plain range predicates do the work). */
  class ZOrderBound(root: String) extends BoundProcedure {
    override def name(): String = "zorder"
    override def description(): String =
      "rewrite the table clustered by the Morton interleave of two columns"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("col_a", StringType).build(),
      ProcedureParameter.in("col_b", StringType).build(),
      ProcedureParameter.in("target_bytes", LongType)
        .defaultValue(JsonlStats.DefaultSplitBytes.toString).build(),
      // SCOPED maintenance (r12, the `OPTIMIZE ... WHERE` shape): '' =
      // whole table (unkeyed layouts only); a partition value
      // re-clusters ONE pkey's files — at 100 TB you zorder
      // yesterday's partition after it closes, never the table
      ProcedureParameter.in("partition", StringType).defaultValue("''").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val colA = input.getUTF8String(1).toString
      val colB = input.getUTF8String(2).toString
      val target = input.getLong(3)
      require(target > 0, s"target_bytes must be positive, got $target")
      val part = Option(input.getUTF8String(4)).map(_.toString).filter(_.nonEmpty)
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val (before, after, rows) = part match {
        case Some(p) => GraftProcedures.zorderScoped(dir.toString, colA, colB, target, p)
        case None => GraftProcedures.zorder(dir.toString, colA, colB, target)
      }
      java.util.List.of[Scan](new ZOrderResultScan(before, after, rows)).iterator()
    }
  }

  /** CALL's result set: one row of rewrite accounting. */
  class ZOrderResultScan(before: Int, after: Int, rows: Long) extends LocalScan {
    override def readSchema(): StructType = StructType(Seq(
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false),
      StructField("n_rows", LongType, nullable = false)))
    override def rows(): Array[InternalRow] =
      Array(InternalRow(before, after, rows))
    override def description(): String =
      s"zorder result: $before -> $after files, $rows rows"
  }

  class RewriteDeletesUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "rewrite_deletes"
    override def description(): String =
      "rewrite_deletes(table): collapse deletion vectors into clean rewritten data files"
    override def bind(inputType: StructType): BoundProcedure = new RewriteDeletesBound(root)
  }

  /** `CALL <cat>.rewrite_deletes('<table>')` — Iceberg's
    * `rewrite_position_delete_files` / DV major compaction: every data
    * file carrying deletion vectors is rewritten WITHOUT its masked
    * rows, its stats recomputed from the survivors (fresh attained
    * bounds — re-arming the MIN/MAX pushdown that DVs had declined),
    * and the manifest swap replaces entry + DVs in one commit. Clean
    * files regain byte-range splittability and compaction eligibility.
    * One task per DV'd file (metadata-bounded task list, like
    * [[compact]]); untouched files never read. Old files + DVs stay on
    * disk for archived snapshots (deferred GC). */
  class RewriteDeletesBound(root: String) extends BoundProcedure {
    override def name(): String = "rewrite_deletes"
    override def description(): String =
      "collapse deletion vectors into clean rewritten data files"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val (rewritten, dvsDropped, rowsDropped) = GraftProcedures.rewriteDeletes(dir.toString)
      val schema = StructType(Seq(
        StructField("files_rewritten", IntegerType, nullable = false),
        StructField("dvs_collapsed", IntegerType, nullable = false),
        StructField("rows_dropped", LongType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] =
          Array(InternalRow(rewritten, dvsDropped, rowsDropped))
        override def description(): String =
          s"rewrite_deletes result: $rewritten files, $dvsDropped DVs, $rowsDropped rows dropped"
      }).iterator()
    }
  }

  class DetailUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "detail"
    override def description(): String =
      "detail(table): one-row table report — version, files, rows, deletes, bytes"
    override def bind(inputType: StructType): BoundProcedure = new DetailBound(root)
  }

  /** `CALL <cat>.detail('<table>')` — DESCRIBE DETAIL for the manifest
    * protocol: the one-row operational report every table format ships
    * (Delta's DESCRIBE DETAIL): current version, live file/row/byte
    * counts, deletion-vector debt (files carrying DVs + masked rows —
    * the rewrite_deletes backlog), and layout facts (keyed?, stats
    * column). Pure manifest arithmetic plus per-file `Files.size` —
    * metadata-priced, no data file opened. */
  class DetailBound(root: String) extends BoundProcedure {
    override def name(): String = "detail"
    override def description(): String = "one-row table report from manifest arithmetic"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val stats = JsonlStats.readStats(dir.toString)
      val meta = JsonlStats.readTableMeta(dir.toString)
      val sized = stats.map { s =>
        val p = dir.resolve(s.file)
        s -> (if (Files.exists(p)) Files.size(p) else 0L)
      }
      val bytes = sized.map(_._2).sum
      val haveRows = stats.forall(_.rows >= 0)
      val row = InternalRow(
        JsonlStats.currentVersion(dir.toString),
        stats.size,
        if (haveRows) Long.box(stats.map(_.rows).sum) else null,
        if (haveRows) Long.box(stats.map(s => s.rows - s.dels).sum) else null,
        stats.count(_.dvs.nonEmpty),
        stats.map(_.dels).sum,
        bytes,
        meta.partitionCol.isDefined,
        org.apache.spark.unsafe.types.UTF8String.fromString(
          meta.statsCol.getOrElse(JsonlStats.statsColumn)),
        // splittability debt (r8): oversized files whose pre-checkpoint
        // manifests pin whole-file tasks for DV'd/_pos reads — what a
        // compact/rewrite_deletes pass (which regenerates checkpoints)
        // would clear
        sized.count { case (s, sz) =>
          sz > JsonlStats.DefaultSplitBytes && s.ckpts.isEmpty },
        // r9 tier state: the declared partition spec, whether every
        // live file's key derives from it (SPJ eligibility — FALSE mid
        // partition-evolution until rewrites migrate the stragglers),
        // the gram-index column, and how many archived snapshots are
        // delta-encoded (compact_history's footprint)
        meta.partitionCol.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
        meta.partitionCol.forall(pc =>
          stats.forall(_.pspec.forall(_ == pc))) && stats.forall(_.pkey.isDefined ||
            meta.partitionCol.isEmpty),
        meta.gramCol.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
        JsonlStats.historyVersions(dir.toString).count { v =>
          val pth = dir.resolve(s"${JsonlStats.HistoryDir}/v$v.jsonl")
          scala.util.Try(Files.newBufferedReader(pth).readLine())
            .toOption.exists(l => l != null && l.startsWith("{\"delta_base\""))
        })
      val schema = StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("n_files", IntegerType, nullable = false),
        StructField("n_rows_physical", LongType),
        StructField("n_rows_live", LongType),
        StructField("n_files_with_dvs", IntegerType, nullable = false),
        StructField("n_rows_masked", LongType, nullable = false),
        StructField("live_bytes", LongType, nullable = false),
        StructField("key_grouped", BooleanType, nullable = false),
        StructField("stats_column", StringType, nullable = false),
        StructField("n_oversized_no_ckpts", IntegerType, nullable = false),
        StructField("partition_spec", StringType),
        StructField("spec_uniform", BooleanType, nullable = false),
        StructField("gram_column", StringType),
        StructField("n_delta_snapshots", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(row)
        override def description(): String = s"detail of $table"
      }).iterator()
    }
  }

  class HistoryUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "history"
    override def description(): String =
      "history(table): one row per generation — version, supersede time, files, rows"
    override def bind(inputType: StructType): BoundProcedure = new HistoryBound(root)
  }

  /** `CALL <cat>.history('<table>')` — DESCRIBE HISTORY for the
    * manifest protocol: version number, the instant it was superseded
    * (null for the live generation — an archive file's mtime IS that
    * instant, the same convention TIMESTAMP AS OF resolves by), and
    * the generation's file/row counts read from its archived manifest.
    * Metadata-only: no data file is touched. */
  class HistoryBound(root: String) extends BoundProcedure {
    override def name(): String = "history"
    override def description(): String = "per-generation version/supersede/files/rows"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val current = JsonlStats.currentVersion(dir.toString)
      // vacuumed generations have no manifest to describe: list only
      // the surviving archive versions (a vacuumed prefix is a gap)
      val generations = (JsonlStats.historyVersions(dir.toString) :+ current).map { v =>
        val (manifest, supersedeUs) =
          if (v == current) ("_stats.jsonl", null)
          else {
            val p = s"${JsonlStats.HistoryDir}/v$v.jsonl"
            (p, Long.box(Files.getLastModifiedTime(dir.resolve(p)).toMillis * 1000L))
          }
        val stats = JsonlStats.readStats(dir.toString, manifest)
        InternalRow(v, supersedeUs,
          stats.size, if (stats.forall(_.rows >= 0)) Long.box(stats.map(_.rows).sum) else null)
      }
      val schema = StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("superseded_at", TimestampType),
        StructField("n_files", IntegerType, nullable = false),
        StructField("n_rows", LongType)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = generations.toArray
        override def description(): String = s"history of $table: $current generations"
      }).iterator()
    }
  }

  class VacuumUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "vacuum(table, retain_last, orphan_grace_ms): expire old snapshots and GC their files"
    override def bind(inputType: StructType): BoundProcedure = new VacuumBound(root)
  }

  /** `CALL <cat>.vacuum('<table>', retain_last, orphan_grace_ms)` — the
    * deletion point of the deferred-GC protocol (Delta VACUUM / Iceberg
    * `expire_snapshots` + `remove_orphan_files` in one service).
    * `retain_last` counts VERSIONS kept including the live one
    * (default 2 = live + newest archive); `orphan_grace_ms` guards the
    * unreferenced-file sweep (default 7 days — an in-flight write's
    * uncommitted task files look exactly like crash orphans, and only
    * AGE distinguishes them; tests pass 0 on quiesced tables). */
  class VacuumBound(root: String) extends BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "expire archived generations beyond retention; delete their unreferenced files"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("retain_last", IntegerType).defaultValue("2").build(),
      ProcedureParameter.in("orphan_grace_ms", LongType)
        .defaultValue((7L * 24 * 3600 * 1000).toString).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val retain = input.getInt(1)
      val grace = input.getLong(2)
      require(retain >= 1, s"retain_last must be >= 1, got $retain")
      require(grace >= 0, s"orphan_grace_ms must be >= 0, got $grace")
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val (expired, dataDeleted, orphans, oldest) =
        GraftProcedures.vacuum(dir.toString, retain, grace)
      val schema = StructType(Seq(
        StructField("expired_versions", IntegerType, nullable = false),
        StructField("data_files_deleted", IntegerType, nullable = false),
        StructField("orphan_files_deleted", IntegerType, nullable = false),
        StructField("oldest_retained_version", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] =
          Array(InternalRow(expired, dataDeleted, orphans, oldest))
        override def description(): String =
          s"vacuum result: $expired versions expired, $dataDeleted + $orphans files deleted"
      }).iterator()
    }
  }

  class CloneUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "clone"
    override def description(): String =
      "clone(source, target): zero-copy clone — hard-link data files, fresh manifest"
    override def bind(inputType: StructType): BoundProcedure = new CloneBound(root)
  }

  /** `CALL <cat>.clone('<src>', '<dst>')` — the dev/test-sandbox idiom
    * (Delta SHALLOW CLONE): a new table whose manifest lists the
    * source's CURRENT data files, materialized as HARD LINKS — zero
    * bytes copied, metadata-bounded work. The immutable-data-file
    * contract makes this safe with no refcounting of its own: neither
    * table ever modifies a shared file (every write path publishes new
    * names), and when one side's VACUUM unlinks its link the
    * filesystem's link count keeps the other side's bytes alive. The
    * clone starts with fresh history (version 1) and no horizon; bloom
    * sidecars link along with their files. Cross-device roots degrade
    * to a byte copy per file (still correct, no longer zero-cost). */
  class CloneBound(root: String) extends BoundProcedure {
    override def name(): String = "clone"
    override def description(): String = "hard-link clone of a table's live generation"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType).build(),
      ProcedureParameter.in("target", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val src = input.getUTF8String(0).toString
      val dst = input.getUTF8String(1).toString
      val srcDir = Paths.get(root, src)
      val dstDir = Paths.get(root, dst)
      require(Files.exists(srcDir.resolve("_stats.jsonl")), s"no such table $src under $root")
      require(!Files.exists(dstDir.resolve("_stats.jsonl")), s"table $dst already exists")
      val (linked, copied) = GraftProcedures.cloneTable(srcDir.toString, dstDir.toString)
      val schema = StructType(Seq(
        StructField("files_linked", IntegerType, nullable = false),
        StructField("files_copied", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(linked, copied))
        override def description(): String = s"clone result: $linked linked, $copied copied"
      }).iterator()
    }
  }

  /** `CALL analyze_table(table)` (r9c, [[ColStats]]): one distributed
    * scan computes per-column NDV (HLL++) and string lengths into the
    * `_colstats.json` sidecar; the scan's `estimateStatistics` then
    * serves them to CBO. Returns the analyze accounting, including how
    * stale the previous sidecar had become. */
  class AnalyzeUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "analyze_table"
    override def description(): String =
      "analyze_table(table): compute NDV/length column statistics for cost-based planning"
    override def bind(inputType: StructType): BoundProcedure = new AnalyzeBound(root)
  }

  class AnalyzeBound(root: String) extends BoundProcedure {
    override def name(): String = "analyze_table"
    override def description(): String = "one-pass column statistics scan"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("histogram", BooleanType).defaultValue("false").build(),
      ProcedureParameter.in("hist_bins", IntegerType).defaultValue("32").build(),
      // restrict the (two-pass) histogram work to named columns;
      // '' = every numeric column
      ProcedureParameter.in("hist_cols", StringType).defaultValue("''").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val prev = ColStats.read(dir.toString)
      val hc = Option(input.getUTF8String(3)).map(_.toString).filter(_.nonEmpty)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      // plain ANALYZE is delta-proportional (r15): only file identities
      // missing from the sketch cache are read; histograms keep the
      // full pass (a second bounded pass is inherently non-incremental)
      val (s, filesScanned) =
        if (input.getBoolean(1))
          (ColStats.analyze(SparkSession.active, dir.toString,
            histogram = true, histBins = input.getInt(2), histCols = hc),
            JsonlStats.readStats(dir.toString).size)
        else ColStats.analyzeIncremental(SparkSession.active, dir.toString)
      val schema = StructType(Seq(
        StructField("columns_analyzed", IntegerType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("analyzed_version", IntegerType, nullable = false),
        StructField("versions_stale_before", IntegerType, nullable = false),
        StructField("files_scanned", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          s.cols.size, s.rows, s.version,
          prev.map(p => s.version - p.version).getOrElse(-1), filesScanned))
        override def description(): String = s"analyze_table $table"
      }).iterator()
    }
  }

  class GramIndexUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "build_gram_index"
    override def description(): String =
      "build_gram_index(table, column): declare + backfill the substring gram index"
    override def bind(inputType: StructType): BoundProcedure = new GramIndexBound(root)
  }

  /** `CALL <cat>.build_gram_index('<table>', '<column>')` — declares
    * the substring gram index ([[Bloom]] r9) on a STRING column and
    * BACKFILLS the per-file gram sidecars for every live data file.
    * Declaration lands FIRST (sidecar write under the meta lock), so a
    * write racing the backfill sidecars its own files; the backfill is
    * one Spark job over the manifest's file list — a file-count-bounded
    * maintenance pass, each task one streaming parse (the same shape as
    * rewrite_deletes). Re-CALLing rebuilds — idempotent. */
  class GramIndexBound(root: String) extends BoundProcedure {
    override def name(): String = "build_gram_index"
    override def description(): String = "backfill substring gram sidecars"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("column", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val column = input.getUTF8String(1).toString
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val n = GraftProcedures.buildGramIndex(dir.toString, column)
      val schema = StructType(Seq(
        StructField("files_indexed", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(n))
        override def description(): String = s"gram index: $n files indexed"
      }).iterator()
    }
  }

  /** Declare the gram column in `_table.json` (logical name — layout
    * columns are never renamable) and sidecar every live file. */
  def buildGramIndex(tableRoot: String, column: String): Int = {
    val physical = JsonlStats.metaLock.synchronized {
      val m = JsonlStats.readTableMeta(tableRoot)
      val schema = m.schema.getOrElse(JsonlStats.schema)
      require(schema.fields.exists(f => f.name == column &&
          f.dataType == org.apache.spark.sql.types.StringType),
        s"gram index column $column must be a string column of ${schema.simpleString}")
      // declare FIRST: a writer landing after this sees the contract and
      // sidecars its own files; the backfill below covers the past
      JsonlStats.writeTableMeta(tableRoot, m.copy(schema = Some(schema),
        gramCol = Some(column)))
      m.columnMapping.getOrElse(column, column)
    }
    val files = JsonlStats.readStats(tableRoot).map(_.file)
    val rootCopy = tableRoot
    if (files.nonEmpty) SparkSession.active.sparkContext
      .parallelize(files, math.min(files.size, 32))
      .foreach(f => GraftProcedures.gramIndexOneFile(rootCopy, f, physical))
    files.size
  }

  /** Executor side of [[buildGramIndex]]: one streaming parse of `file`,
    * the indexed column's values fed through [[Bloom.GramTracker]]. */
  private[sources] def gramIndexOneFile(root: String, file: String,
                                        physical: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val grams = new Bloom.GramTracker
    val in = Files.newBufferedReader(Paths.get(root, file))
    try {
      var line = in.readLine()
      while (line != null) {
        if (line.nonEmpty && line != "\r") {
          val v = mapper.readTree(line).get(physical)
          if (v != null && !v.isNull) grams.add(v.asText())
        }
        line = in.readLine()
      }
    } finally in.close()
    grams.writeSidecar(Paths.get(root, file))
  }

  class CompactHistoryUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "compact_history"
    override def description(): String =
      "compact_history(table, keep_recent, full_every): re-encode archived snapshots as reverse deltas"
    override def bind(inputType: StructType): BoundProcedure = new CompactHistoryBound(root)
  }

  /** `CALL <cat>.compact_history('<table>')` — HISTORY COMPACTION (r9):
    * the MetaBench law says every commit archives a FULL manifest, so
    * metadata history grows at manifest-size × commit-rate. This
    * procedure re-encodes archived snapshots as REVERSE DELTAS against
    * their predecessor (adds verbatim + `{"del": line}` removals),
    * keeping periodic FULL snapshots (`full_every`, bounding the
    * reconstruction walk) and the newest `keep_recent` slots untouched
    * (the OCC lease protocol compares their raw bytes). An append-only
    * history shrinks ~manifest/Δ per version; a snapshot whose delta
    * would not shrink (truncate/replace rewrote everything) stays
    * full. Archive mtimes are preserved — they ARE the TIMESTAMP AS OF
    * index. Readers resolve transparently
    * ([[JsonlStats.readManifestLines]]); the first CALL stamps the
    * `history-deltas` read-gating feature (an unaware reader would
    * take a delta's add-lines as the whole snapshot). VACUUM
    * materializes the first retained archive before expiring its
    * bases, so expiry never strands a chain. */
  class CompactHistoryBound(root: String) extends BoundProcedure {
    override def name(): String = "compact_history"
    override def description(): String = "reverse-delta encoding of archived manifests"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("keep_recent", IntegerType).defaultValue("4").build(),
      ProcedureParameter.in("full_every", IntegerType).defaultValue("16").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val keepRecent = input.getInt(1)
      val fullEvery = input.getInt(2)
      require(keepRecent >= 2, s"keep_recent must be >= 2 (OCC lease slots), got $keepRecent")
      require(fullEvery >= 2, s"full_every must be >= 2, got $fullEvery")
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val (rewritten, before, after) =
        GraftProcedures.compactHistory(dir.toString, keepRecent, fullEvery)
      val schema = StructType(Seq(
        StructField("snapshots_rewritten", IntegerType, nullable = false),
        StructField("bytes_before", LongType, nullable = false),
        StructField("bytes_after", LongType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(rewritten, before, after))
        override def description(): String =
          s"history compaction: $rewritten snapshots, $before -> $after bytes"
      }).iterator()
    }
  }

  /** Core of [[CompactHistoryBound]]. Returns (rewritten, archive bytes
    * before, after) over the candidate range. */
  def compactHistory(tableRoot: String, keepRecent: Int, fullEvery: Int): (Int, Long, Long) = {
    val versions = JsonlStats.historyVersions(tableRoot)
    val newest = versions.lastOption.getOrElse(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def pathOf(v: Int) = Paths.get(tableRoot, JsonlStats.HistoryDir, s"v$v.jsonl")
    def isDelta(v: Int): Boolean = {
      val ls = Files.readAllLines(pathOf(v)).asScala
      ls.headOption.exists(h => h.startsWith("{\"delta_base\"") &&
        mapper.readTree(h).hasNonNull("delta_base"))
    }
    val candidates = versions.filter { v =>
      v <= newest - keepRecent && v % fullEvery != 0 &&
        versions.contains(v - 1) && !isDelta(v)
    }
    if (candidates.isEmpty) return (0, 0L, 0L)
    // stamp the read gate BEFORE the first delta exists (a crash in
    // between over-declares — conservative, same stance as the DV
    // stamp). A table with no schema sidecar CANNOT be gated, so it
    // must not be delta-encoded at all (r9 review): an ungated pre-r9
    // reader would take a delta's add-lines as the whole snapshot.
    JsonlStats.metaLock.synchronized {
      val m = JsonlStats.readTableMeta(tableRoot)
      if (m.schema.isEmpty)
        throw new UnsupportedOperationException(
          s"compact_history($tableRoot): the table has no _table.json schema, so the " +
            "history-deltas read gate cannot be stamped — refusing to encode deltas " +
            "an ungated reader would silently truncate")
      if (!m.features.contains(JsonlStats.FeatureHistoryDeltas))
        JsonlStats.writeTableMeta(tableRoot,
          m.copy(features = m.features :+ JsonlStats.FeatureHistoryDeltas))
    }
    var rewritten = 0; var before = 0L; var after = 0L
    candidates.foreach { v =>
      val p = pathOf(v)
      val fullBytes = Files.size(p)
      val cur = JsonlStats.readManifestLines(tableRoot, s"${JsonlStats.HistoryDir}/v$v.jsonl")
      val prev = JsonlStats.readManifestLines(tableRoot, s"${JsonlStats.HistoryDir}/v${v - 1}.jsonl")
      val prevSet = prev.toSet; val curSet = cur.toSet
      val adds = cur.filterNot(prevSet)
      val dels = prev.filterNot(curSet)
      val header = {
        val n = mapper.createObjectNode(); n.put("delta_base", v - 1); n.toString
      }
      val delLines = dels.map { l =>
        val n = mapper.createObjectNode(); n.put("del", l); n.toString
      }
      val deltaLines = header +: (adds ++ delLines)
      val deltaBytes = deltaLines.map(_.length + 1L).sum
      before += fullBytes
      if (deltaBytes < fullBytes) {
        val mtime = Files.getLastModifiedTime(p)
        val tmp = p.resolveSibling(s"v$v.jsonl.tmp-histc")
        Files.write(tmp, deltaLines.asJava,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(p, mtime) // the TIMESTAMP AS OF index
        rewritten += 1
        after += Files.size(p)
      } else after += fullBytes
    }
    (rewritten, before, after)
  }

  /** VACUUM phase-0 helper (r9): before archive expiry deletes versions
    * 1..m, the FIRST retained archive must become self-contained — its
    * delta chain may pass through the expired range. Reconstruct and
    * materialize it full (mtime preserved); later retained deltas base
    * on retained versions only, so one materialization suffices. */
  private[sources] def materializeFirstRetained(tableRoot: String, retained: Seq[Int]): Unit =
    retained.minOption.foreach { r =>
      val p = Paths.get(tableRoot, JsonlStats.HistoryDir, s"v$r.jsonl")
      if (Files.exists(p)) {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val head = Files.readAllLines(p).asScala.headOption
        val isDelta = head.exists(h => h.startsWith("{\"delta_base\"") &&
          mapper.readTree(h).hasNonNull("delta_base"))
        if (isDelta) {
          val full = JsonlStats.readManifestLines(tableRoot,
            s"${JsonlStats.HistoryDir}/v$r.jsonl")
          val mtime = Files.getLastModifiedTime(p)
          val tmp = p.resolveSibling(s"v$r.jsonl.tmp-histm")
          Files.write(tmp, full.asJava,
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
          Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(p, mtime)
        }
      }
    }

  class EvolveSpecUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "evolve_partition_spec"
    override def description(): String =
      "evolve_partition_spec(table, spec): change the partition transform without rewriting data"
    override def bind(inputType: StructType): BoundProcedure = new EvolveSpecBound(root)
  }

  /** `CALL <cat>.evolve_partition_spec('<table>', '<spec>')` — PARTITION
    * EVOLUTION ([[PartitionTransforms]] r9): the table's layout contract
    * changes (`bucket(16,user_id)`, `truncate(100,event_id)`, a bare
    * string column for identity, or `''` to unpartition) while every
    * existing byte stays where it is — the Iceberg marquee move. One
    * OCC commit stamps each live KEYED entry with the spec its pkey was
    * derived under (`ps`; entries already stamped keep theirs — a
    * racing append is self-describing), then the sidecar's
    * `partitionColumn` becomes the new spec. From then on: new writes
    * derive keys under the new spec, scans prune each file under its
    * OWN spec, COW rewrites lazily migrate the files they touch, and
    * key-grouped reporting (SPJ) stays OFF until every surviving file
    * is uniform under the current spec. A crash between the two steps
    * leaves explicit stamps equal to the still-current spec — a no-op,
    * re-CALL to finish. */
  class EvolveSpecBound(root: String) extends BoundProcedure {
    override def name(): String = "evolve_partition_spec"
    override def description(): String = "stamp per-file specs and swap the table transform"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("spec", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val specStr = input.getUTF8String(1).toString
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val (before, stamped) = GraftProcedures.evolvePartitionSpec(dir.toString, specStr)
      val schema = StructType(Seq(
        StructField("spec_before", StringType, nullable = true),
        StructField("spec_after", StringType, nullable = true),
        StructField("files_stamped", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          before.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
          if (specStr.isEmpty) null
          else org.apache.spark.unsafe.types.UTF8String.fromString(specStr),
          stamped))
        override def description(): String =
          s"partition evolution: ${before.getOrElse("<none>")} -> $specStr"
      }).iterator()
    }
  }

  /** Stamp + swap core of [[EvolveSpecBound]]. Returns (previous spec,
    * entries stamped). */
  def evolvePartitionSpec(tableRoot: String, newSpecStr: String): (Option[String], Int) = {
    val newSpec = if (newSpecStr.isEmpty) None else Some(newSpecStr)
    val meta = JsonlStats.readTableMeta(tableRoot)
    val schema = meta.schema.getOrElse(JsonlStats.schema)
    newSpec.foreach { ns =>
      // composite targets validate per component (parseMulti enforces
      // the one-time-unit-plus-one-bucket contract itself, r12)
      PartitionTransforms.parseMulti(ns).foreach { spec =>
      val f = schema.fields.find(_.name == spec.col).getOrElse(
        throw new IllegalArgumentException(
          s"partition source column ${spec.col} not in ${schema.simpleString}"))
      spec match {
        case PartitionTransforms.Identity(c) =>
          require(f.dataType == org.apache.spark.sql.types.StringType,
            s"identity partition column $c must be a string column")
        case PartitionTransforms.Bucket(n, _) =>
          require(n >= 1 && n <= 4096,
            s"bucket count must be in [1, 4096], got $n (writer fan-out bound)")
          require(f.dataType == org.apache.spark.sql.types.LongType ||
              f.dataType == org.apache.spark.sql.types.StringType,
            s"hidden transforms need a long or string source, got ${f.dataType}")
        case PartitionTransforms.Trunc(w, _) =>
          require(w >= 1, s"truncate width must be positive, got $w")
          require(f.dataType == org.apache.spark.sql.types.LongType ||
              f.dataType == org.apache.spark.sql.types.StringType,
            s"hidden transforms need a long or string source, got ${f.dataType}")
        case t: PartitionTransforms.TimeSpec =>
          require(f.dataType == org.apache.spark.sql.types.TimestampType ||
              f.dataType == org.apache.spark.sql.types.TimestampNTZType ||
              f.dataType == org.apache.spark.sql.types.DateType,
            s"${t.encoded} needs a timestamp or date source, got ${f.dataType}")
      }
      }
    }
    val oldSpec = meta.partitionCol
    var stamped = 0
    // step 1: make every keyed live entry self-describing. The rebase
    // maps whatever base wins, so entries appended during the CALL keep
    // their own stamps (writers stamp ps at commit since r9).
    JsonlStats.commitAtomic(tableRoot, "evolve-spec", base => {
      stamped = 0
      // one shared mapper + one parse per line (r9 review — the
      // normLines stance): this map runs per OCC attempt over O(files)
      val entries = JsonlStats.parseStatsLines(base).map(e => e.file -> e).toMap
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      base.map { line =>
        val n = mapper.readTree(line)
        if (!n.hasNonNull("file")) line
        else {
          val entry = entries(n.get("file").asText())
          if (entry.pkey.isEmpty || entry.pspec.isDefined || oldSpec.isEmpty) line
          else { stamped += 1; JsonlStats.statsLine(entry.copy(pspec = oldSpec)) }
        }
      }
    })
    // step 2: the sidecar swap — new writes and table resolution see
    // the new contract (serialized with every other DDL sidecar write)
    JsonlStats.metaLock.synchronized {
      val m = JsonlStats.readTableMeta(tableRoot)
      JsonlStats.writeTableMeta(tableRoot,
        m.copy(partitionCol = newSpec, schema = Some(schema)))
    }
    (oldSpec, stamped)
  }

  /** Link (or, cross-device, copy) the live generation's files and
    * publish the clone's own manifest + table sidecar. Returns
    * (hardLinked, byteCopied) file counts. */
  def cloneTable(srcRoot: String, dstRoot: String): (Int, Int) = {
    val stats = JsonlStats.readStats(srcRoot)
    Files.createDirectories(Paths.get(dstRoot))
    var linked = 0; var copied = 0
    def bring(rel: String): Unit = {
      val from = Paths.get(srcRoot, rel)
      val to = Paths.get(dstRoot, rel)
      Option(to.getParent).foreach(Files.createDirectories(_))
      try { Files.createLink(to, from); linked += 1 }
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        Files.copy(from, to, java.nio.file.StandardCopyOption.REPLACE_EXISTING); copied += 1
      }
    }
    stats.foreach { s =>
      bring(s.file)
      if (Files.exists(Paths.get(srcRoot, Bloom.sidecarName(s.file))))
        bring(Bloom.sidecarName(s.file))
      if (Files.exists(Paths.get(srcRoot, Bloom.gramSidecarName(s.file))))
        bring(Bloom.gramSidecarName(s.file))
      s.dvs.foreach(bring) // deletion vectors ride with their files
    }
    // equality deletes (r9b) are part of the live image exactly like
    // DVs: a clone without its source's outstanding retractions would
    // resurrect every upserted-away key
    val eqdels = JsonlEqualityDeletes.readEqDeletes(srcRoot, "_stats.jsonl")
    eqdels.foreach(d => bring(d.file))
    val tm = Paths.get(srcRoot, "_table.json")
    if (Files.exists(tm))
      Files.copy(tm, Paths.get(dstRoot, "_table.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // column statistics (r9c) describe the cloned content verbatim —
    // carry them (advisory; the clone diverges like any other table)
    val cs = Paths.get(srcRoot, ColStats.Sidecar)
    if (Files.exists(cs))
      Files.copy(cs, Paths.get(dstRoot, ColStats.Sidecar),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the clone's OWN manifest (fresh history: a clone is version 1 of
    // a new table, not a continuation of the source's timeline) — PLUS
    // the source's row-id counter line: fully-materialized sources
    // (frid = -2 after zorder/rewrite_deletes) give the floor pass
    // nothing, so without the carry the clone's first append would
    // stamp from 0 and collide with the in-row ids just linked (r11)
    JsonlStats.publishManifest(dstRoot, "clone",
      (stats.map(JsonlStats.statsLine) ++ eqdels.map(JsonlEqualityDeletes.line)).sorted ++
        JsonlStats.counterCarry(srcRoot))
    (linked, copied)
  }

  /** The GC core. Three phases, each safe in isolation:
    *  1. EXPIRE: archived versions below `current − retainLast + 1`
    *     lose their manifests. The horizon sidecar records the newest
    *     expired generation's supersede instant FIRST, so a crash
    *     between sidecar and deletes fails time travel conservatively
    *     (claims slightly more vacuumed than is) rather than serving a
    *     wrong snapshot.
    *  2. DATA GC: a file is deletable iff some expired manifest
    *     references it and NO retained manifest (live included) does —
    *     pure manifest arithmetic, no directory listing, metadata-
    *     bounded like every planning step.
    *  3. ORPHAN SWEEP: directory listing minus all surviving
    *     references, gated by `graceMs` of file age — the one place the
    *     engine lists a directory, because crash debris is by
    *     definition unreferenced by any manifest. Tmp manifests from
    *     torn publishes (`_stats.jsonl.tmp-*`) fall out the same way.
    * Returns (expired, dataFilesDeleted, orphansDeleted, oldestRetained). */
  def vacuum(tableRoot: String, retainLast: Int, graceMs: Long): (Int, Int, Int, Int) = {
    val current = JsonlStats.currentVersion(tableRoot)
    val keepFrom = math.max(1, current - retainLast + 1)
    val (expired, retained) =
      JsonlStats.historyVersions(tableRoot).partition(_ < keepFrom)
    val dir = Paths.get(tableRoot)
    def manifestOf(v: Int) = s"${JsonlStats.HistoryDir}/v$v.jsonl"
    // a manifest references its data files AND their deletion-vector
    // sidecars (r7c): a DV is alive exactly as long as some manifest
    // names it — same refcount law as the data bytes it masks
    // a manifest references its data files, their DV sidecars AND its
    // equality-delete files (r9b) — one refcount law for all three
    def filesOfManifest(m: String): Seq[String] = {
      val raw = JsonlStats.readManifestLines(tableRoot, m)
      JsonlStats.parseStatsLines(raw).flatMap(s => s.file +: s.dvs) ++
        JsonlEqualityDeletes.filesOf(raw)
    }
    val retainedRefs: Set[String] =
      (retained.map(manifestOf) :+ "_stats.jsonl")
        .flatMap(filesOfManifest).toSet ++
        // refs (r9) are live ROOTS: a tag-pinned or branch-staged file is
        // neither expirable nor an orphan, whatever `_history/` retention
        // says — tag durability IS this refcount, and a staged-but-not-
        // yet-published branch load survives any maintenance pass
        Refs.referencedFiles(tableRoot)
    var dataDeleted = 0
    if (expired.nonEmpty) {
      // history deltas (r9): the first retained archive may be a delta
      // whose chain passes through the expired range — make it
      // self-contained while its bases still exist
      materializeFirstRetained(tableRoot, retained)
      // horizon first (see phase 1): supersede instant of the newest
      // expired generation = its own archive's mtime
      val horizonMs = Files.getLastModifiedTime(
        dir.resolve(manifestOf(expired.max))).toMillis
      JsonlStats.writeVacuumHorizon(tableRoot,
        JsonlStats.VacuumHorizon(horizonMs, keepFrom))
      val deletable = expired
        .flatMap(v => filesOfManifest(manifestOf(v)))
        .distinct.filterNot(retainedRefs)
      deletable.foreach { f =>
        if (Files.deleteIfExists(dir.resolve(f))) dataDeleted += 1
        Files.deleteIfExists(dir.resolve(Bloom.sidecarName(f))) // rides with its file
        Files.deleteIfExists(dir.resolve(Bloom.gramSidecarName(f)))
      }
      expired.foreach(v => Files.deleteIfExists(dir.resolve(manifestOf(v))))
    }
    var orphansDeleted = 0
    val cutoff = System.currentTimeMillis() - graceMs
    val listing = Files.list(dir)
    try listing.iterator().asScala
      .filter(Files.isRegularFile(_))
      .foreach { p =>
        val n = p.getFileName.toString
        // a bloom/gram sidecar is referenced iff its data file is
        val ref =
          if (n.endsWith(".jsonl.bloom")) n.stripSuffix(".bloom")
          else if (n.endsWith(".jsonl.grams")) n.stripSuffix(".grams")
          else n
        val sweepable =
          (n.endsWith(".jsonl") || n.endsWith(".jsonl.bloom") ||
            n.endsWith(".jsonl.grams") || n.contains(".jsonl.tmp-")) &&
          n != "_stats.jsonl" && !retainedRefs.contains(ref)
        if (sweepable && Files.getLastModifiedTime(p).toMillis < cutoff &&
            Files.deleteIfExists(p)) orphansDeleted += 1
      }
    finally listing.close()
    // same sweep over the deletion-vector dir: a DV fragment written by
    // a crashed DELETE is referenced by no manifest — age-gated debris
    val dvDir = dir.resolve(JsonlDeleteVectors.DeletesDir)
    if (Files.isDirectory(dvDir)) {
      val dvListing = Files.list(dvDir)
      try dvListing.iterator().asScala
        .filter(Files.isRegularFile(_))
        .foreach { p =>
          val rel = s"${JsonlDeleteVectors.DeletesDir}/${p.getFileName}"
          if (!retainedRefs.contains(rel) &&
              Files.getLastModifiedTime(p).toMillis < cutoff &&
              Files.deleteIfExists(p)) orphansDeleted += 1
        }
      finally dvListing.close()
    }
    // and the equality-delete dir (r9b): same age-gated debris law
    val eqDir = dir.resolve(JsonlEqualityDeletes.DeletesDir)
    if (Files.isDirectory(eqDir)) {
      val eqListing = Files.list(eqDir)
      try eqListing.iterator().asScala
        .filter(Files.isRegularFile(_))
        .foreach { p =>
          val rel = s"${JsonlEqualityDeletes.DeletesDir}/${p.getFileName}"
          if (!retainedRefs.contains(rel) &&
              Files.getLastModifiedTime(p).toMillis < cutoff &&
              Files.deleteIfExists(p)) orphansDeleted += 1
        }
      finally eqListing.close()
    }
    (expired.size, dataDeleted, orphansDeleted, keepFrom)
  }

  /** The maintenance core. Greedy first-fit over size-sorted
    * sub-target files, binned WITHIN each pkey (an unkeyed table is one
    * key group of None); only bins of ≥2 members rewrite anything.
    * Returns (files_before, files_after, files_merged). */
  /** The zorder rewrite: read the live generation through the connector,
    * cluster by the Morton interleave of `colA`/`colB`, write back
    * through the connector's own overwrite path. Self-overwrite is safe
    * by the table format's own laws: the scan pins the live manifest at
    * planning, writer tasks emit attempt-unique new files, the atomic
    * manifest swap is the only visibility change, and deferred GC keeps
    * the old generation's files on disk for its archived snapshot —
    * so `VERSION AS OF` still reads the pre-zorder layout afterwards.
    *
    * Refuses key-grouped layouts: re-clustering would destroy the
    * one-pkey-per-file contract the SPJ leg depends on ([[compact]]
    * preserves keys by never binning across them; zorder by definition
    * mixes rows across files). Bucket ranks use double math over the
    * observed [min, max] of each dimension — monotone, which is all
    * clustering needs (no read-side mirror exists to disagree with:
    * the manifest bounds the writer measures ARE the index).
    * Null dimension values rank as bucket 0 (clustered together,
    * still within every file's recorded non-null bounds only). */
  /** SCOPED zorder (r12, the `OPTIMIZE ... WHERE` shape for keyed
    * layouts): re-cluster ONE partition's files by the Morton
    * interleave, leaving every other entry byte-untouched. At 100 TB
    * you zorder yesterday's `days(ts)` partition after it closes —
    * never the table. The scope's rows are read through a TEMPORARY
    * manifest naming exactly the scoped entries (plus the table's
    * eqdel/txn lines, so masks apply with their seq semantics), the
    * z-clustered output lands via a STAGED plain write (no keyed
    * distribution requirement to fight the z range-partitioning — the
    * pkey is a constant over the scope, so it is stamped onto the
    * fresh entries directly, `pspec` included), files move into the
    * table directory, and ONE rewrite commit replaces the scoped
    * entries under the same OCC law as row-level DML: a rival that
    * touched a scoped file (DV attach, compaction) conflicts loudly.
    * Lineage rides in-row exactly like the global path (ids project
    * through the rewrite, entries publish frid = -2); an unassigned
    * table's fresh entries stay unassigned. */
  def zorderScoped(tableRoot: String, colA: String, colB: String,
                   targetBytes: Long, partition: String): (Int, Int, Long) = {
    import org.apache.spark.sql.functions._
    val meta = JsonlStats.readTableMeta(tableRoot)
    val statsCol = meta.statsCol.getOrElse(JsonlStats.statsColumn)
    val spark = SparkSession.active
    val raw = JsonlStats.readManifestLines(tableRoot, "_stats.jsonl").filter(_.nonEmpty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def isEntry(l: String) = mapper.readTree(l).hasNonNull("file")
    val all = JsonlStats.parseStatsLines(raw)
    val scoped = all.filter(_.pkey.contains(partition))
    require(scoped.nonEmpty,
      s"zorder($tableRoot, partition => '$partition'): no live file carries that pkey " +
        s"(pkeys: ${all.flatMap(_.pkey).distinct.sorted.take(10).mkString(", ")})")
    if (scoped.size == 1 && scoped.head.dvs.isEmpty) return (all.size, all.size, scoped.head.rows)
    val scopedNames = scoped.map(_.file).toSet
    val runId = java.util.UUID.randomUUID().toString.take(8)
    // a read-only snapshot manifest of exactly the scope: scoped entry
    // lines verbatim + every non-entry line except the counter (eqdels
    // keep their seq semantics; the counter is commit-protocol state)
    val tmpManifest = s"_zscope-$runId.jsonl"
    val tmpLines = raw.filter(l =>
      if (isEntry(l)) scopedNames.contains(mapper.readTree(l).get("file").asText())
      else !l.contains(JsonlStats.NextRowIdKey))
    Files.write(Paths.get(tableRoot, tmpManifest), tmpLines.asJava)
    val staging = Paths.get(tableRoot, s"_zorder-staging-$runId")
    try {
      var reader = spark.read.format("graft-jsonl-stats")
        .option("path", tableRoot).option("manifest", tmpManifest)
        .option("statsColumn", statsCol)
      meta.schema.foreach(s => reader = reader.schema(s))
      val df = reader.load()
      require(df.columns.contains(colA) && df.columns.contains(colB),
        s"zorder columns must exist in the table schema: $colA, $colB vs ${df.columns.mkString(",")}")
      val b = df.agg(
        min(col(colA)).cast("double"), max(col(colA)).cast("double"),
        min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
      if (b.isNullAt(0) || b.isNullAt(2)) return (all.size, all.size, scoped.map(_.rows).sum)
      val zc = mortonColumn(colA, colB, b.getDouble(0), b.getDouble(1),
        b.getDouble(2), b.getDouble(3))
      val hasLineage = scoped.exists(s => s.frid >= 0L || s.frid == -2L || s.runs.nonEmpty)
      val src =
        if (!hasLineage) df
        else df.select(col("*"), col(JsonlStats.RowIdMeta),
          col(JsonlStats.LuvMeta).as(JsonlStats.LuvField))
      val liveBytes = scoped.map { s =>
        val p = Paths.get(tableRoot, s.file)
        if (Files.exists(p)) Files.size(p) else 0L
      }.sum
      val nOut = math.max(1L, (liveBytes + targetBytes - 1) / targetBytes).toInt
      Files.createDirectories(staging)
      // the staged write must speak the TABLE's physical dialect —
      // column mapping renames are metadata-only and files carry
      // PHYSICAL keys, so seed the staging sidecar with the table meta
      // (minus the layout columns: partitionCol would re-key the write
      // and fight the z range-partitioning; sortCol would re-sort it)
      JsonlStats.writeTableMeta(staging.toString,
        meta.copy(partitionCol = None, sortCol = None))
      var writer = src.withColumn("__graft_z", zc)
        .repartitionByRange(nOut, col("__graft_z"))
        .sortWithinPartitions("__graft_z")
        .drop("__graft_z")
        .write.format("graft-jsonl-stats")
        .option("path", staging.toString).option("statsColumn", statsCol)
      meta.bloomCol.foreach(bc => writer = writer.option("bloomColumn", bc))
      meta.gramCol.foreach(gc => writer = writer.option("gramColumn", gc))
      writer.mode("overwrite").save()
      val staged = JsonlStats.readStats(staging.toString)
      staged.foreach(s => Files.move(staging.resolve(s.file), Paths.get(tableRoot, s.file)))
      // the scope's pkey is a row-level invariant (every source file
      // carried it), so fresh entries stamp it directly — the staged
      // write was deliberately UNKEYED so z range-partitioning survives
      val fresh = staged.map { s =>
        val keyed = s.copy(pkey = Some(partition), pspec = meta.partitionCol)
        if (hasLineage) keyed // frid = -2, ids materialized in-row
        else keyed.copy(frid = -1L, luv = 0L, runs = Nil) // stays unassigned/restamps like any rewrite
      }
      val removedLines = scoped.map(JsonlStats.statsLine)
      JsonlStats.commitAtomic(tableRoot, s"zorder-scoped-$runId", base => {
        val m = JsonlEqualityDeletes.maxSeq(base)
        val freshLines = fresh.map(fs => JsonlStats.statsLine(
          if (m == 0L) fs else fs.copy(seq = m)))
        JsonlStats.rebaseRewrite(removedLines, freshLines)(base)
      })
      (all.size, all.size - scoped.size + staged.size, fresh.map(_.rows).sum)
    } finally {
      Files.deleteIfExists(Paths.get(tableRoot, tmpManifest))
      if (Files.exists(staging)) graft.util.Fs.deleteRecursively(staging.toString)
    }
  }

  /** Morton z-value of two 256-rank range buckets (shared by the
    * global and scoped zorder paths). */
  private def mortonColumn(colA: String, colB: String,
      aLo: Double, aHi: Double, bLo: Double, bHi: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    def bucket(c: Column, mn: Double, mx: Double): Column =
      if (mx <= mn) lit(0)
      else least(lit(255), greatest(lit(0),
        floor((c.cast("double") - lit(mn)) / lit(mx - mn) * 256).cast("int")))
    val bx = coalesce(bucket(col(colA), aLo, aHi), lit(0))
    val by = coalesce(bucket(col(colB), bLo, bHi), lit(0))
    (0 until 8).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(by, i).bitwiseAND(lit(1)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  def zorder(tableRoot: String, colA: String, colB: String, targetBytes: Long): (Int, Int, Long) = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    val meta = JsonlStats.readTableMeta(tableRoot)
    require(meta.partitionCol.isEmpty,
      "zorder refuses key-grouped layouts: re-clustering would destroy the " +
        "one-pkey-per-file SPJ contract (compact preserves keys; zorder cannot) — " +
        "scope it instead: zorder(table, a, b, target, partition => '<pkey>') " +
        "re-clusters ONE partition and keeps the contract")
    val statsCol = meta.statsCol.getOrElse(JsonlStats.statsColumn)
    val spark = SparkSession.active
    val stats = JsonlStats.readStats(tableRoot)
    val liveBytes = stats.map { s =>
      val p = Paths.get(tableRoot, s.file)
      if (Files.exists(p)) Files.size(p) else 0L
    }.sum
    val nOut = math.max(1L, (liveBytes + targetBytes - 1) / targetBytes).toInt
    var reader = spark.read.format("graft-jsonl-stats")
      .option("path", tableRoot).option("statsColumn", statsCol)
    meta.bloomCol.foreach(bc => reader = reader.option("bloomColumn", bc))
    meta.gramCol.foreach(gc => reader = reader.option("gramColumn", gc))
    meta.schema.foreach(s => reader = reader.schema(s))
    val df = reader.load()
    require(df.columns.contains(colA) && df.columns.contains(colB),
      s"zorder columns must exist in the table schema: $colA, $colB vs ${df.columns.mkString(",")}")
    val b = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if (b.isNullAt(0) || b.isNullAt(2))
      // empty table or an all-null dimension: no meaningful clustering
      return (stats.size, stats.size, math.max(0L, stats.map(_.rows).sum))
    // 256 range buckets per dimension (8 bits each → 16-bit z), monotone
    val zc = mortonColumn(colA, colB, b.getDouble(0), b.getDouble(1),
      b.getDouble(2), b.getDouble(3))
    // row lineage (r10): a clustering rewrite SCATTERS rows, so ids
    // ride through the rewrite as projected metadata columns and land
    // as materialized in-row fields (the write sees `_row_id`/`_luv`
    // in its schema → publishes frid = -2 and keeps them out of stats
    // and the table contract). Only when the table has assigned ids —
    // an unstamped table rewrites plainly and gets stamped fresh.
    val hasLineage = stats.exists(s => s.frid >= 0L || s.frid == -2L || s.runs.nonEmpty)
    val src =
      if (!hasLineage) df
      else df.select(col("*"), col(JsonlStats.RowIdMeta),
        col(JsonlStats.LuvMeta).as(JsonlStats.LuvField))
    var writer = src.withColumn("__graft_z", zc)
      .repartitionByRange(nOut, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.format("graft-jsonl-stats")
      .option("path", tableRoot).option("statsColumn", statsCol)
    meta.bloomCol.foreach(bc => writer = writer.option("bloomColumn", bc))
    meta.gramCol.foreach(gc => writer = writer.option("gramColumn", gc))
    writer.mode("overwrite").save()
    val after = JsonlStats.readStats(tableRoot)
    (stats.size, after.size, after.map(_.rows).sum)
  }

  /** The DV-collapse core: one Spark task per DV'd file, each streaming
    * its survivors to a fresh file while re-deriving the full stats the
    * writer would have (statsCol bounds, per-numeric-column bounds,
    * bloom hashes) by parsing kept lines — the one maintenance op that
    * must parse, because attained bounds cannot be derived from masked
    * entries. Returns (filesRewritten, dvsCollapsed, rowsDropped). */
  def rewriteDeletes(tableRoot: String): (Int, Int, Long) = {
    val stats = JsonlStats.readStats(tableRoot)
    // equality deletes (r9b) materialize here too: every file an eqdel
    // still applies to is rewritten without its key-masked rows, and
    // the eqdel lines leave the manifest in the same commit — after
    // which COUNT/MIN/MAX pushdown re-arms and the read-side probe tax
    // is gone (the Iceberg rewrite_position/equality_deletes service,
    // one verb here)
    val eqdels = JsonlEqualityDeletes.readEqDeletes(tableRoot, "_stats.jsonl")
    def eqdsFor(s: JsonlStats.FileStats): Seq[(String, Seq[String])] =
      eqdels.filter(_.seq > s.seq)
        .map(d => (Paths.get(tableRoot, d.file).toString, d.cols))
    val dirty = stats.filter(s => s.dvs.nonEmpty || eqdsFor(s).nonEmpty)
    if (dirty.isEmpty && eqdels.isEmpty) return (0, 0, 0L)
    val meta = JsonlStats.readTableMeta(tableRoot)
    val schema = meta.schema.getOrElse(JsonlStats.schema)
    val schemaJson = schema.json
    val statsCol = meta.statsCol.getOrElse(JsonlStats.statsColumn)
    val bloomCol = meta.bloomCol
    val gramCol = meta.gramCol
    val mapping = meta.columnMapping
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val work = dirty.zipWithIndex.map { case (s, i) =>
      (s.file, s.dvs, s.pkey, s.pspec, f"part-rwdel-$runId-$i%05d.jsonl", eqdsFor(s),
        JsonlStats.Lineage.of(s), s.sorted)
    }
    val rootCopy = tableRoot
    val fresh: Seq[JsonlStats.FileStats] =
      if (work.isEmpty) Nil
      else SparkSession.active.sparkContext
        .parallelize(work, math.min(work.size, 32))
        .map { case (file, dvs, pkey, pspec, out, eqds, lin, sorted) =>
          GraftProcedures.rewriteOneFile(rootCopy, file, dvs, pkey, out,
            schemaJson, statsCol, bloomCol, mapping, gramCol, pspec, eqds, lin, sorted)
        }
        .collect().toSeq // file-count-bounded: one manifest entry per task
    // OCC rewrite (r8): the collapsed files' planned entries must
    // survive verbatim — a DV attached since planning would mean the
    // rewritten survivors resurrect freshly-masked rows, so that
    // CONFLICTS; concurrent appends ride through (maintenance commutes
    // with ingest — the Iceberg rewrite-procedure contract)
    // the materialized eqdel LINES leave in the same swap (a concurrent
    // upsert's NEW eqdel line is not in the removed set, survives the
    // rebase, and still applies to the fresh unstamped entries — its
    // retraction is never lost)
    JsonlStats.commitAtomic(tableRoot, s"rwdel-$runId",
      JsonlStats.rebaseRewrite(
        dirty.map(JsonlStats.statsLine) ++ eqdels.map(JsonlEqualityDeletes.line),
        fresh.filter(_.rows > 0).map(JsonlStats.statsLine)))
    // rows_dropped is the MATERIALIZED count — DV'd positions AND
    // eq-masked keys (review r9c: the DV-only sum reported 0 for a
    // pure-upsert rewrite): physical in minus physical out
    (dirty.size, dirty.map(_.dvs.size).sum,
      dirty.map(_.rows).sum - fresh.map(_.rows).sum)
  }

  /** Executor side of [[rewriteDeletes]]: stream `file` minus the DV'd
    * positions into `out`, tracking exactly the stats
    * [[JsonlFileSink]] would. Position counting mirrors the reader
    * (physical non-blank lines, 0-based). */
  private[sources] def rewriteOneFile(root: String, file: String, dvs: Seq[String],
                                      pkey: Option[String], out: String,
                                      schemaJson: String, statsCol: String,
                                      bloomCol: Option[String],
                                      columnMapping: Map[String, String] = Map.empty,
                                      gramCol: Option[String] = None,
                                      pspec: Option[String] = None,
                                      eqds: Seq[(String, Seq[String])] = Nil,
                                      lin: JsonlStats.Lineage = JsonlStats.Lineage(),
                                      sorted: Option[String] = None): JsonlStats.FileStats = {
    import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructType}
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val deleted = JsonlDeleteVectors.readDvPositions(dvs.map(d => Paths.get(root, d).toString))
    // equality deletes (r9b): materialize the key-scoped masks too —
    // the rewritten file drops both position- and key-deleted rows
    val eqMasks = if (eqds.isEmpty) Nil else JsonlEqualityDeletes.readMasks(eqds)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // Data bytes carry PHYSICAL names on column-mapped tables; stats
    // keys are physical too (readers translate logical→physical before
    // consulting them). Parse and key everything by the physical name,
    // mirroring JsonlFileSink.
    def physOf(name: String): String = columnMapping.getOrElse(name, name)
    // temporal columns (r11) bound like longs here too: their stored
    // JSON image IS the epoch number, so asDouble() below reads it —
    // rewrite_deletes regenerates time bounds instead of dropping them
    val numFields = schema.fields.filter(f => JsonlStats.numericStatType(f.dataType))
      .map(f => f.copy(name = physOf(f.name)))
    // vector stats (r12): the collapse regenerates `#norm`/`#cell`
    // bounds AND the exact cell bitmap for float/double arrays —
    // pre-r12 rewrites silently DROPPED them (conservative but a full
    // scan on every probe after the first rewrite). Same arithmetic as
    // the sink ([[JsonlStats.vecNormOf]]/[[JsonlStats.vecCellOf]]).
    val vecNames: Array[String] = schema.fields
      .filter(f => JsonlStats.isVectorType(f.dataType)).map(f => physOf(f.name))
    // nested leaf stats (r12): the collapse regenerates the per-leaf
    // bounds too — JSON-byte navigation by path segments
    val leafDefs: Array[JsonlStats.LeafRef] =
      JsonlStats.structLeaves(schema, physOf).toArray
    val leafMn = scala.collection.mutable.Map.empty[String, Double]
    val leafMx = scala.collection.mutable.Map.empty[String, Double]
    val leafCnt = scala.collection.mutable.Map.empty[String, Long]
    val leafSMn = scala.collection.mutable.Map.empty[String, String]
    val leafSMx = scala.collection.mutable.Map.empty[String, String]
    val vecNormMn = scala.collection.mutable.Map.empty[String, Double]
    val vecNormMx = scala.collection.mutable.Map.empty[String, Double]
    val vecCellMn = scala.collection.mutable.Map.empty[String, Int]
    val vecCellMx = scala.collection.mutable.Map.empty[String, Int]
    val vecBm = scala.collection.mutable.Map.empty[String, Long]
    val colMn = scala.collection.mutable.Map.empty[String, Double]
    val colMx = scala.collection.mutable.Map.empty[String, Double]
    val colCnt = scala.collection.mutable.Map.empty[String, Long]
    numFields.foreach(f => colCnt(f.name) = 0L)
    // string bounds + counts (r8), tracked like the writer's sink
    val strNames = schema.fields.filter(_.dataType == StringType).map(f => physOf(f.name))
    val strMn = scala.collection.mutable.Map.empty[String, String]
    val strMx = scala.collection.mutable.Map.empty[String, String]
    strNames.foreach(c => colCnt(c) = 0L)
    val bloomHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val grams = if (gramCol.isDefined) new Bloom.GramTracker else null
    var rows = 0L
    // row-offset checkpoints for the rewritten file (r8): same rule as
    // JsonlFileSink — one (line start, rows before) pair per granularity
    val ckpts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var bytesOut = 0L
    var lastCkpt = 0L
    // zone maps (r8): per-segment stats-column bounds, regenerated like
    // the sink's — rewrite_deletes re-arms range skipping too. The
    // shared tracker owns the boundary law (seal at the checkpoint
    // BEFORE the boundary row's value merges).
    val zones = new JsonlStats.ZoneTracker
    // monotone run cursor (r11, ADVICE r10 low): positions are scanned
    // in increasing order, so the run lookup advances O(1) amortized
    // instead of a per-row runs.find — O(rows × runs) on a bin-packed
    // compaction product. Mirrors JsonlPartitionReader.linRunAt.
    val linRuns: Array[(Long, Long, Long, Long)] = lin.runs.sortBy(_._1).toArray
    var linIdx = 0
    def linRunAt(p: Long): Int = {
      if (linRuns.isEmpty) -1
      else {
        while (linIdx < linRuns.length && p >= linRuns(linIdx)._1 + linRuns(linIdx)._3) linIdx += 1
        if (linIdx < linRuns.length && p >= linRuns(linIdx)._1) linIdx else -1
      }
    }
    val dest = Paths.get(root, out)
    val os = Files.newBufferedWriter(dest)
    val in = Files.newBufferedReader(Paths.get(root, file))
    try {
      var pos = -1L
      var line = in.readLine()
      while (line != null) {
        if (line.nonEmpty && line != "\r") {
          pos += 1
          val n0 =
            if (deleted.contains(pos)) null
            else {
              val parsed = mapper.readTree(line)
              val eqMasked = eqMasks.exists { case (cols, set) =>
                set.contains(JsonlEqualityDeletes.canonicalKey(parsed, cols)) }
              if (eqMasked) null else parsed
            }
          if (n0 != null) {
            if (rows > 0 && bytesOut - lastCkpt >= JsonlStats.CheckpointBytes) {
              ckpts += ((bytesOut, rows)); lastCkpt = bytesOut
              zones.seal() // BEFORE this row's value: it starts the next segment
            }
            // row lineage (r10): survivors SHIFT physical positions, so
            // the collapse is the one maintenance op that must
            // MATERIALIZE ids — each kept row gets its manifest-derived
            // `_row_id`/`_luv` as in-row fields (prefix splice; a row
            // already materialized by an earlier rewrite keeps its own
            // fields — `lin` cannot cover its position)
            val ri = if (lin.frid >= 0L) -1 else linRunAt(pos)
            // luv-only runs (r12, ADVICE r11 high): firstId = -1 marks
            // "ids are in-row; this luv backs rows whose in-row `_luv`
            // is null" — the shape compact records for a materialized
            // member that carried an entry luv (COW-update images)
            val luvOnly = ri >= 0 && linRuns(ri)._2 == -1L
            val rid =
              if (lin.frid >= 0L) lin.frid + pos
              else if (ri >= 0 && !luvOnly) linRuns(ri)._2 + (pos - linRuns(ri)._1)
              else -1L
            val rluv =
              if (lin.frid >= 0L) lin.luv
              else if (ri >= 0 && !luvOnly) linRuns(ri)._4
              else -1L
            // the version that backs null-luv materialized rows at THIS
            // position: the entry luv (frid = -2 sources) or the
            // covering luv-only run's (recompacted products)
            val backLuv =
              if (lin.frid == -2L) lin.luv
              else if (luvOnly) linRuns(ri)._4
              else 0L
            val outLine =
              if (rid >= 0L && line.startsWith("{")) {
                val pre = s"""{"${JsonlStats.RowIdMeta}":$rid,"${JsonlStats.LuvField}":$rluv"""
                if (line.length > 2) pre + "," + line.substring(1) else pre + "}"
              } else if (backLuv > 0L && n0.hasNonNull(JsonlStats.RowIdMeta) &&
                         !n0.hasNonNull(JsonlStats.LuvField)) {
                // MATERIALIZE the fallback (r12, ADVICE r11 high): a
                // COW-updated row (in-row id, null `_luv`) served its
                // version via the entry-luv fallback; the rewrite
                // splices that version IN-ROW so no later maintenance
                // generation (compact bins, restamped entries) can
                // strand it. Only affected rows pay the re-serialize.
                n0.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
                  .put(JsonlStats.LuvField, backLuv)
                mapper.writeValueAsString(n0)
              } else line
            os.write(outLine); os.write('\n')
            bytesOut += outLine.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1L
            rows += 1
            val n = n0
            numFields.foreach { f =>
              val v = n.get(f.name)
              if (v != null && !v.isNull) {
                val d = v.asDouble()
                // NaN poisons to vacuous bounds (never pruned): finite
                // bounds computed past it would exclude `=== NaN` rows
                if (d.isNaN) {
                  colMn(f.name) = Double.MinValue; colMx(f.name) = Double.MaxValue
                } else {
                  if (d < colMn.getOrElse(f.name, Double.PositiveInfinity)) colMn(f.name) = d
                  if (d > colMx.getOrElse(f.name, Double.NegativeInfinity)) colMx(f.name) = d
                }
                colCnt(f.name) += 1L
                if (f.name == statsCol) zones.add(d)
              }
            }
            strNames.foreach { c =>
              val v = n.get(c)
              if (v != null && !v.isNull) {
                val s = v.asText()
                if (!strMn.contains(c) || JsonlStats.strCompare(s, strMn(c)) < 0) strMn(c) = s
                if (!strMx.contains(c) || JsonlStats.strCompare(s, strMx(c)) > 0) strMx(c) = s
                colCnt(c) += 1L
              }
            }
            leafDefs.foreach { l =>
              var v: com.fasterxml.jackson.databind.JsonNode = n
              var k = 0
              while (v != null && !v.isNull && k < l.names.length) {
                v = v.get(l.names(k)); k += 1
              }
              if (v != null && !v.isNull) {
                if (l.dt == StringType) {
                  val s = v.asText()
                  if (!leafSMn.contains(l.key) ||
                    JsonlStats.strCompare(s, leafSMn(l.key)) < 0) leafSMn(l.key) = s
                  if (!leafSMx.contains(l.key) ||
                    JsonlStats.strCompare(s, leafSMx(l.key)) > 0) leafSMx(l.key) = s
                } else {
                  val d = v.asDouble()
                  if (d.isNaN) { leafMn(l.key) = Double.MinValue; leafMx(l.key) = Double.MaxValue }
                  else {
                    if (d < leafMn.getOrElse(l.key, Double.PositiveInfinity)) leafMn(l.key) = d
                    if (d > leafMx.getOrElse(l.key, Double.NegativeInfinity)) leafMx(l.key) = d
                  }
                }
                leafCnt(l.key) = leafCnt.getOrElse(l.key, 0L) + 1L
              }
            }
            vecNames.foreach { c =>
              val v = n.get(c)
              if (v != null && v.isArray) {
                var normSq = 0.0
                var cell = 0
                var j = 0
                val m = v.size()
                while (j < m) {
                  val el = v.get(j)
                  val e = if (el == null || el.isNull) 0.0 else el.asDouble()
                  normSq += e * e
                  if (j < JsonlStats.VecCellBits && e > 0) cell |= 1 << j
                  j += 1
                }
                val nrm = math.sqrt(normSq)
                if (nrm.isNaN) { vecNormMn(c) = 0.0; vecNormMx(c) = Double.MaxValue }
                else {
                  if (nrm < vecNormMn.getOrElse(c, Double.PositiveInfinity)) vecNormMn(c) = nrm
                  if (nrm > vecNormMx.getOrElse(c, Double.NegativeInfinity)) vecNormMx(c) = nrm
                }
                if (cell < vecCellMn.getOrElse(c, Int.MaxValue)) vecCellMn(c) = cell
                if (cell > vecCellMx.getOrElse(c, Int.MinValue)) vecCellMx(c) = cell
                vecBm(c) = vecBm.getOrElse(c, 0L) | (1L << cell)
              }
            }
            bloomCol.foreach { bc =>
              val v = n.get(bc)
              if (v != null && !v.isNull) {
                bloomHashes += (schema.fields.find(_.name == bc).map(_.dataType) match {
                  case Some(LongType)   => Bloom.hashLong(v.asLong())
                  case Some(DoubleType) => Bloom.hashDouble(v.asDouble())
                  case _                => Bloom.hashString(v.asText())
                })
              }
            }
            gramCol.foreach { gc =>
              // data bytes carry PHYSICAL names (r9 review: a gram
              // index declared on a renamed column reads its physical
              // key, like every other stat here)
              val v = n.get(physOf(gc))
              if (v != null && !v.isNull) grams.add(v.asText())
            }
          }
        }
        line = in.readLine()
      }
    } finally { in.close(); os.close() }
    // a wholly-deleted file rewrites to nothing: no entry, no file
    // (mirrors the COW zero-survivors case)
    if (rows == 0) {
      Files.deleteIfExists(dest)
      return JsonlStats.FileStats(out, 0, 0, 0, pkey)
    }
    // the DV collapse preserves the file's LAYOUT: same pkey, same
    // partition spec — lazy spec migration is COW's job, not this one's
    if (bloomCol.isDefined) Bloom.writeSidecar(dest, bloomHashes.toArray)
    if (gramCol.isDefined) grams.writeSidecar(dest)
    val cols = colMn.keySet.map(c => c -> (colMn(c), colMx(c))).toMap ++
      vecNormMn.keySet.map(c => s"$c#norm" -> (vecNormMn(c), vecNormMx(c))).toMap ++
      vecCellMn.keySet.map(c => s"$c#cell" ->
        (vecCellMn(c).toDouble, vecCellMx(c).toDouble)).toMap ++
      leafMn.keySet.map(k => k -> (leafMn(k), leafMx(k))).toMap
    val strCols = strMn.keySet.map(c =>
      c -> (JsonlStats.truncLower(strMn(c)), JsonlStats.truncUpper(strMx(c)))).toMap ++
      leafSMn.keySet.map(k => k -> (JsonlStats.truncLower(leafSMn(k)),
        JsonlStats.truncUpper(leafSMx(k)))).toMap
    val (mn, mx) = cols.get(statsCol) match {
      case Some(b) => b
      case None => (Double.MinValue, Double.MaxValue) // all-null sentinel
    }
    // entries whose rows carry (or inherited) materialized ids must
    // never be re-stamped — frid = -2 marks in-row lineage; a source
    // that never had ids stays unassigned and the commit stamps it
    // fresh (ids that never existed may be invented now)
    val hadLineage = lin.frid >= 0L || lin.frid == -2L || lin.runs.nonEmpty
    // carry the source's luv onto the fresh frid = -2 entry (r12,
    // ADVICE r11 high): an entry published WITHOUT a luv is restamped
    // by the commit with the MAINTENANCE version, drifting any
    // fallback-served rows forward. The splice above materialized the
    // fallback in-row, so the carried luv is belt-and-braces — but it
    // keeps the entry's version history honest either way.
    val carriedLuv =
      if (lin.frid >= 0L || lin.frid == -2L) lin.luv
      else lin.runs.map(_._4).foldLeft(0L)(math.max)
    JsonlStats.FileStats(out, mn, mx, rows, pkey, cols,
      colNonNull = colCnt.toMap ++ leafCnt.toMap,
      strCols = strCols, ckpts = ckpts.toSeq,
      segb = zones.zones(ckpts.nonEmpty), pspec = pspec,
      frid = if (hadLineage) -2L else -1L, luv = carriedLuv,
      vcells = vecBm.toMap,
      // survivors keep the source's row order — the stamp carries
      sorted = sorted)
  }

  def compact(tableRoot: String, targetBytes: Long,
              partition: Option[String] = None): (Int, Int, Int) = {
    val stats = JsonlStats.readStats(tableRoot)
    // scoped compaction (r9c): only files whose manifest pkey equals
    // the requested partition are candidates; everything else is
    // untouched BY CONSTRUCTION (it never enters a bin). On an unkeyed
    // table a partition scope matches nothing — loud, not silent
    partition.foreach { p =>
      require(stats.exists(_.pkey.contains(p)),
        s"compact($tableRoot, partition => '$p'): no live file carries that pkey " +
          s"(pkeys: ${stats.flatMap(_.pkey).distinct.sorted.take(10).mkString(", ")})")
    }
    val sized = stats.map(s => s -> {
      val p = Paths.get(tableRoot, s.file)
      if (Files.exists(p)) Files.size(p) else 0L
    })
    // candidates: under-target files with exact row counts (a merged
    // entry must stay exact; unknown-count files are left untouched).
    // DV'd files are excluded too — byte concatenation shifts physical
    // positions out from under their deletion vectors; rewrite_deletes
    // collapses the DVs first, after which the clean file can compact
    val (candidates, untouched) =
      sized.partition { case (s, bytes) => bytes < targetBytes && s.rows >= 0 &&
        s.dvs.isEmpty && partition.forall(s.pkey.contains) }
    val runId = java.util.UUID.randomUUID().toString.take(8)
    var binSeq = 0
    // partition evolution (r9): a bin's files must share BOTH the key
    // and the spec the key derives from — merging across specs would
    // publish one entry whose pkey lies for half its rows. Equality
    // deletes (r9b): the SEQUENCE NUMBER is part of the merge key too —
    // concatenating a seq-3 upsert file into a seq-0 base bin would
    // publish one entry whose seq lies for half its rows, making
    // outstanding deletes re-retract the upserted images (or spare
    // rows they should mask)
    val bins = candidates.groupBy(c => (c._1.pkey, c._1.pspec, c._1.seq)).toSeq.sortBy(_._1)
        .flatMap {
      case ((pkey, pspec, seq), files) =>
        val sorted = files.sortBy(-_._2) // big-first first-fit packs tighter
        val groups = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[(JsonlStats.FileStats, Long)], Long)]
        sorted.foreach { case (s, b) =>
          groups.indexWhere(_._2 + b <= targetBytes) match {
            case -1 => groups += ((scala.collection.mutable.ArrayBuffer((s, b)), b))
            case i  => val (g, tot) = groups(i); g += ((s, b)); groups(i) = (g, tot + b)
          }
        }
        groups.filter(_._1.size >= 2).map { case (g0, _) =>
          // bin membership is packed big-first, but the CONCAT order
          // within a bin is free — order by first row id (r12) so
          // same-commit neighbors land position-contiguous and their
          // runs coalesce; unstamped/materialized members follow by
          // file name (any order is correct, this one compresses)
          val g = g0.sortBy { case (m, _) =>
            val firstId =
              if (m.frid >= 0L) m.frid
              else m.runs.filter(_._2 >= 0L).map(_._2).minOption.getOrElse(Long.MaxValue)
            (firstId, m.file)
          }
          val members = g.map(_._1).toSeq
          val out = f"part-compact-$runId-$binSeq%05d.jsonl"
          binSeq += 1
          // a member with the all-null SENTINEL bounds poisons the bin:
          // a half-merged (MinValue, realMax) entry would escape the
          // aggregate-pushdown sentinel check and serve MinValue as
          // MIN(data) — the merged entry must be fully sentinel (never
          // pruned, min/max pushdown declined), matching the writer's
          // own all-null convention
          val hasSentinel = members.exists(m =>
            m.min == Double.MinValue && m.max == Double.MaxValue)
          val (mn, mx) =
            if (hasSentinel) (Double.MinValue, Double.MaxValue)
            else (members.map(_.min).min, members.map(_.max).max)
          // per-column bounds (r7b) survive the merge only for columns
          // EVERY member recorded — a member with unknown bounds for a
          // column poisons that column (absent = never pruned), the
          // same conservatism as the sentinel rule above
          val sharedCols = members.map(_.cols.keySet).reduce(_ intersect _)
          val mergedCols0 = sharedCols.map { c =>
            c -> (members.map(_.cols(c)._1).min, members.map(_.cols(c)._2).max)
          }.toMap
          // map-key stats (r13) merge by UNION under the completeness
          // marker: when EVERY member carries `<col>#mk`, a key absent
          // from a member means "no row of that member has it" — the
          // interval union over the members that DO is exact. The
          // intersection rule above would DROP such keys while keeping
          // the marker, and the marker would then prune files that
          // hold the key — wrong results after compaction. A member
          // without the marker (poisoned cap, legacy) drops the
          // column's key stats wholesale, the usual conservatism.
          val mapMerged = sharedCols.filter(_.endsWith("#mk")).flatMap { mk =>
            val pre = mk.stripSuffix("#mk") + "."
            members.flatMap(_.cols.keySet.filter(_.startsWith(pre))).toSet.map {
              (k: String) =>
                val bs = members.flatMap(_.cols.get(k))
                k -> (bs.map(_._1).min, bs.map(_._2).max)
            }
          }.toMap
          val mergedCols = mergedCols0 ++ mapMerged
          // vector cell bitmaps (r12) merge by UNION — exact, like the
          // members themselves; a member without the bitmap poisons the
          // column (absent = interval fallback), same conservatism
          val sharedV = members.map(_.vcells.keySet).reduce(_ intersect _)
          val mergedV = sharedV.map(c => c -> members.map(_.vcells(c)).reduce(_ | _)).toMap
          // non-null counts sum iff every member recorded one — a member
          // with unknown counts poisons that column (same conservatism)
          val sharedN = members.map(_.colNonNull.keySet).reduce(_ intersect _)
          val mergedN = sharedN.map(c => c -> members.map(_.colNonNull(c)).sum).toMap
          // string bounds (r8) merge under the one-sided invariants:
          // lower = min of lowers (still ≤ attained min), upper = max of
          // uppers UNLESS any member's upper is unknown (None poisons)
          val sharedS = members.map(_.strCols.keySet).reduce(_ intersect _)
          val mergedS = sharedS.map { c =>
            val bs = members.map(_.strCols(c))
            val lo = bs.map(_._1).min(Ordering.fromLessThan[String](
              JsonlStats.strCompare(_, _) < 0))
            val hi =
              if (bs.exists(_._2.isEmpty)) None
              else Some(bs.map(_._2.get).max(Ordering.fromLessThan[String](
                JsonlStats.strCompare(_, _) < 0)))
            c -> (lo, hi)
          }.toMap ++
          // STRING map-key bounds (r14) merge by UNION under the
          // completeness marker, like the numeric leg above: a key
          // absent from a marker-carrying member has no rows there, so
          // the union over the members that DO carry it is exact — the
          // intersection rule would drop such keys while keeping the
          // marker, which would then WRONGLY prune files holding them
          sharedCols.filter(_.endsWith("#mk")).flatMap { mk =>
            val pre = mk.stripSuffix("#mk") + "."
            members.flatMap(_.strCols.keySet.filter(_.startsWith(pre))).toSet.map {
              (k: String) =>
                val bs = members.flatMap(_.strCols.get(k))
                val lo = bs.map(_._1).min(Ordering.fromLessThan[String](
                  JsonlStats.strCompare(_, _) < 0))
                val hi =
                  if (bs.exists(_._2.isEmpty)) None
                  else Some(bs.map(_._2.get).max(Ordering.fromLessThan[String](
                    JsonlStats.strCompare(_, _) < 0)))
                k -> (lo, hi)
            }
          }.toMap
          // checkpoints (r8) survive the byte concat: each member's
          // pairs shift by its byte/row offset in the bin, and every
          // member boundary is itself an exact (line start, rows
          // before) pair — a compacted file splits as well as a
          // freshly-written one. Valid only when the concat IS pure
          // bytes: concatFiles patches a missing trailing newline,
          // which would shift every later offset by one — the sink
          // always terminates files, but a hand-made member without
          // the terminator drops the merged checkpoints (conservative:
          // absent ckpts = pre-r8 whole-file behavior, never wrong).
          val pureConcat = members.forall(m => endsWithNewline(tableRoot, m.file))
          val offs = g.toSeq.scanLeft((0L, 0L)) { case ((bo, ro), (m, b)) =>
            (bo + b, ro + m.rows)
          }
          val mergedK = if (!pureConcat) Nil
          else g.toSeq.zip(offs).flatMap { case ((m, _), (bo, ro)) =>
            (if (bo > 0) Seq((bo, ro)) else Nil) ++
              m.ckpts.map { case (o, r) => (bo + o, ro + r) }
          }.sortBy(_._1)
          // zone maps (r8) survive the concat: each member contributes
          // its segments in order (member boundaries are themselves
          // checkpoints, so merged segments = concat of member
          // segments); a checkpoint-free member IS one segment whose
          // bounds are its file bounds. A member whose zones are
          // unknown/mismatched poisons the whole bin — conservative.
          val memberSegs = g.toSeq.map { case (m, _) =>
            if (m.segb.size == m.ckpts.size + 1) m.segb
            else if (m.ckpts.isEmpty) Seq((m.min, m.max))
            else Nil
          }
          val mergedSegB =
            if (!pureConcat || memberSegs.exists(_.isEmpty)) Nil
            else memberSegs.flatten
          // row lineage (r10) survives the byte concat as manifest
          // arithmetic: member i's id range lands at its row offset in
          // the bin — one run per stamped member (or its own shifted
          // runs when the member was itself a compaction product).
          // A materialized member (frid = -2) carries ids IN its rows,
          // which the concat copies verbatim — the reader's in-row
          // fallback serves positions no run covers. An unstamped
          // member contributes nothing (its rows never had ids); the
          // merged entry still declares `frids` so the commit never
          // re-stamps rows whose neighbors hold assigned ids.
          val mergedRuns0 = g.toSeq.zip(offs).flatMap { case ((m, _), (_, ro)) =>
            if (m.frid >= 0L) Seq((ro, m.frid, m.rows, m.luv))
            // luv-only run (r12, ADVICE r11 high): a materialized
            // member whose ENTRY carried a luv backs its null-luv rows
            // (COW-update images) through that entry — which this merge
            // replaces. Record a degenerate run (firstId = -1: ids stay
            // in-row) carrying the luv so the reader's fallback
            // survives the concat instead of serving NULL.
            else if (m.frid == -2L && m.luv > 0L) Seq((ro, -1L, m.rows, m.luv))
            else m.runs.map(r => (ro + r._1, r._2, r._3, r._4))
          }
          // run-list hygiene (r12): same-commit neighbors coalesce
          // (contiguous positions + consecutive ids + one luv); a list
          // still past the ceiling trips the MATERIALIZE path — the
          // copy job splices lineage in-row and the entry stays O(1)
          // instead of accreting one run per member per generation
          // (LineageDeepBench's kilocommit bloat).
          val mergedRuns = JsonlStats.coalesceRuns(mergedRuns0)
          val materialize = mergedRuns.size > JsonlStats.MaxRunsPerEntry
          // an ALL-materialized bin produces no runs — the entry must
          // still declare in-row lineage (frid = -2) or the commit
          // would re-stamp it and override every row's carried id
          // (r10 review)
          val mergedFrid =
            if (materialize || (mergedRuns.isEmpty && members.exists(_.frid == -2L))) -2L
            else -1L
          if (!materialize)
            Bin(members.map(_.file), out,
              JsonlStats.FileStats(out, mn, mx, members.map(_.rows).sum, pkey, mergedCols,
                colNonNull = mergedN, strCols = mergedS, ckpts = mergedK,
                segb = mergedSegB, pspec = pspec, seq = seq,
                frid = mergedFrid, runs = mergedRuns, vcells = mergedV))
          else
            // the splice shifts byte offsets, so checkpoint/zone pairs
            // are dropped (conservative: whole-file tasks until the
            // next rewrite regenerates them); row-content stats are
            // untouched — lineage fields are provenance, not data
            Bin(members.map(_.file), out,
              JsonlStats.FileStats(out, mn, mx, members.map(_.rows).sum, pkey, mergedCols,
                colNonNull = mergedN, strCols = mergedS, ckpts = Nil,
                segb = Nil, pspec = pspec, seq = seq,
                frid = -2L, runs = Nil, vcells = mergedV),
              matLineages = Some(members.map(JsonlStats.Lineage.of)))
        }
    }
    if (bins.isEmpty) return (stats.size, stats.size, 0)
    // bins copy in parallel as one job — a metadata-bounded maintenance
    // task list, each task a streaming byte concat on shared storage
    val rootCopy = tableRoot
    val work = bins.map(b => (b.members, b.out, b.matLineages))
    SparkSession.active.sparkContext
      .parallelize(work, math.min(work.size, 32))
      .foreach {
        case (members, out, None) => GraftProcedures.concatFiles(rootCopy, members, out)
        case (members, out, Some(lins)) =>
          GraftProcedures.concatMaterialize(rootCopy, members.zip(lins), out)
      }
    // OCC rewrite (r8): every bin member's planned entry must survive
    // verbatim — a DV attached to a member since planning would have
    // its masked rows resurrected by the byte concat, so that
    // CONFLICTS; files appended concurrently ride through untouched
    // (compaction commutes with ingest)
    val mergedNames = bins.flatMap(_.members).toSet
    JsonlStats.commitAtomic(tableRoot, s"compact-$runId",
      JsonlStats.rebaseRewrite(
        stats.filter(s => mergedNames.contains(s.file)).map(JsonlStats.statsLine),
        bins.map(b => JsonlStats.statsLine(b.entry))))
    // members leave the live manifest but stay on disk: the archived
    // pre-compaction snapshot still references them, so VERSION AS OF
    // keeps working until [[vacuum]] expires it (deferred GC, r7)
    (stats.size, stats.size - mergedNames.size + bins.size, mergedNames.size)
  }

  /** Streaming byte concat of newline-terminated JSONL members; patches
    * a missing trailing newline between members so lines never fuse. */
  /** Does the file's last byte equal `\n`? (Empty = vacuously true.)
    * Driver-side, one positioned read per compaction member. */
  private def endsWithNewline(tableRoot: String, file: String): Boolean = {
    val p = Paths.get(tableRoot, file)
    try {
      val ch = Files.newByteChannel(p)
      try {
        if (ch.size() == 0) true
        else {
          ch.position(ch.size() - 1)
          val bb = java.nio.ByteBuffer.allocate(1)
          ch.read(bb)
          bb.get(0) == '\n'
        }
      } finally ch.close()
    } catch { case _: Throwable => false }
  }

  /** REF management (r9, [[Refs]]) — one bound shape for the five
    * verbs. `create_tag(table, name[, version])` pins a snapshot (live
    * by default, or `VERSION AS OF version`); `create_branch(table,
    * name)` forks the live manifest for staged writes
    * (`INSERT INTO <cat>.<table>.branch_<name> …`);
    * `fast_forward(table, name)` is the PUBLISH half of
    * write-audit-publish — one OCC commit that conflicts loudly if main
    * diverged since the fork; the drop verbs delete the ref file (its
    * exclusively-staged data files become age-gated vacuum orphans).
    * Returns (ref, action, version): version = the pinned/fork/
    * superseded generation (0 for drops). */
  class RefUnbound(root: String, verb: String) extends UnboundProcedure {
    override def name(): String = verb
    override def description(): String = verb match {
      case "create_tag"    => "create_tag(table, name[, version]): pin a named immutable snapshot"
      case "drop_tag"      => "drop_tag(table, name): delete a tag (its files become vacuumable)"
      case "create_branch" => "create_branch(table, name): fork a writable staging branch"
      case "drop_branch"   => "drop_branch(table, name): delete a branch head"
      case "rollback"      => "rollback(table, target): restore main to a tag or version - metadata only"
      case "cherry_pick"   => "cherry_pick(table, version): re-apply an append-shaped version's delta onto main"
      case _               => "fast_forward(table, name): publish a branch head to main (WAP)"
    }
    override def bind(inputType: StructType): BoundProcedure = new RefBound(root, verb)
  }

  class RefBound(root: String, verb: String) extends BoundProcedure {
    override def name(): String = verb
    override def description(): String = s"$verb on the refs tier"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = {
      if (verb == "cherry_pick")
        return Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", IntegerType).build())
      val base = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      if (verb == "create_tag")
        base :+ ProcedureParameter.in("version", IntegerType).defaultValue("-1").build()
      else base
    }
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val refName =
        if (verb == "cherry_pick") input.getInt(1).toString
        else input.getUTF8String(1).toString
      val dir = Paths.get(root, table)
      require(Files.exists(dir.resolve("_stats.jsonl")), s"no such table $table under $root")
      val version = verb match {
        case "create_tag" =>
          val v = input.getInt(2)
          Refs.createTag(dir.toString, refName, if (v < 0) None else Some(v))
        case "drop_tag" =>
          Refs.dropRef(dir.toString, Refs.tagManifest(refName)); 0
        case "create_branch" =>
          Refs.createBranch(dir.toString, refName)
        case "drop_branch" =>
          Refs.dropRef(dir.toString, Refs.branchManifest(refName)); 0
        case "fast_forward" =>
          Refs.fastForward(dir.toString, refName,
            s"ff-${java.util.UUID.randomUUID().toString.take(8)}")
        case "rollback" =>
          Refs.rollbackTo(dir.toString, refName,
            s"rb-${java.util.UUID.randomUUID().toString.take(8)}")
        case "cherry_pick" =>
          Refs.cherryPick(dir.toString, refName.toInt,
            s"cp-${java.util.UUID.randomUUID().toString.take(8)}")
      }
      val schema = StructType(Seq(
        StructField("ref", StringType, nullable = false),
        StructField("action", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(refName),
          org.apache.spark.unsafe.types.UTF8String.fromString(verb), version))
        override def description(): String = s"$verb $refName on $table"
      }).iterator()
    }
  }

  /** `fast_forward_pair(table1, branch1, table2, branch2)` (r11): the
    * ATOMIC two-table publish — both branch heads land on their mains
    * or neither does ([[Refs.Wtxn]]: marker-committed roll-forward,
    * recovered by every catalog access). The fact+agg WAP shape: stage
    * both, audit both, publish as one warehouse transaction. */
  class FfPairUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "fast_forward_pair"
    override def description(): String =
      "fast_forward_pair(table1, branch1, table2, branch2): publish two branch heads atomically"
    override def bind(inputType: StructType): BoundProcedure = new FfPairBound(root)
  }

  class FfPairBound(root: String) extends BoundProcedure {
    override def name(): String = "fast_forward_pair"
    override def description(): String = "atomic two-table branch publish"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table1", StringType).build(),
      ProcedureParameter.in("branch1", StringType).build(),
      ProcedureParameter.in("table2", StringType).build(),
      ProcedureParameter.in("branch2", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t1 = input.getUTF8String(0).toString
      val b1 = input.getUTF8String(1).toString
      val t2 = input.getUTF8String(2).toString
      val b2 = input.getUTF8String(3).toString
      Seq(t1, t2).foreach(t => require(
        Files.exists(Paths.get(root, t, "_stats.jsonl")), s"no such table $t under $root"))
      val applied = Refs.Wtxn.publish(root, Seq((t1, b1), (t2, b2)),
        s"ffp-${java.util.UUID.randomUUID().toString.take(8)}")
      val schema = StructType(Seq(
        StructField("tables", StringType, nullable = false),
        StructField("legs_applied", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$t1,$t2"), applied))
        override def description(): String = s"fast_forward_pair $t1/$b1 + $t2/$b2"
      }).iterator()
    }
  }

  /** `fast_forward_all(legs)` (r11): the N-table generalization of the
    * pair publish — `legs` = "table:branch,table:branch,..." and every
    * named branch head lands on its main or none does ([[Refs.Wtxn]]
    * is leg-count-agnostic; the pair procedure is the common-case
    * sugar). The fact + N downstream aggregates publish as ONE
    * warehouse transaction. */
  class FfAllUnbound(root: String) extends UnboundProcedure {
    override def name(): String = "fast_forward_all"
    override def description(): String =
      "fast_forward_all('t1:b1,t2:b2,...'): publish N branch heads atomically"
    override def bind(inputType: StructType): BoundProcedure = new FfAllBound(root)
  }

  class FfAllBound(root: String) extends BoundProcedure {
    override def name(): String = "fast_forward_all"
    override def description(): String = "atomic N-table branch publish"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("legs", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val legs = input.getUTF8String(0).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq.map { s =>
          s.split(":", 2) match {
            case Array(t, b) if t.nonEmpty && b.nonEmpty => (t, b)
            case _ => throw new IllegalArgumentException(
              s"fast_forward_all: each leg must be table:branch, got '$s'")
          }
        }
      legs.foreach { case (t, _) => require(
        Files.exists(Paths.get(root, t, "_stats.jsonl")), s"no such table $t under $root") }
      val applied = Refs.Wtxn.publish(root, legs,
        s"ffa-${java.util.UUID.randomUUID().toString.take(8)}")
      val schema = StructType(Seq(
        StructField("tables", StringType, nullable = false),
        StructField("legs_applied", IntegerType, nullable = false)))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(
            legs.map(_._1).mkString(",")), applied))
        override def description(): String = s"fast_forward_all ${legs.size} legs"
      }).iterator()
    }
  }

  /** Splice-concat for runaway-run bins (r12): like [[concatFiles]],
    * but each member's manifest lineage MATERIALIZES in-row as it
    * streams — stamped ids/luvs land as the `_row_id`/`_luv` prefix
    * (the rewriteOneFile splice), and null-luv materialized rows get
    * their backing fallback luv written into the bytes. The merged
    * entry then declares frid = -2 with ZERO runs, whatever the bin's
    * member count — the manifest stays O(1) per entry while compaction
    * cadence grows unbounded. Costs one JSON parse only for rows that
    * might need the fallback splice; stamped rows pay a string prefix. */
  private[sources] def concatMaterialize(tableRoot: String,
      members: Seq[(String, JsonlStats.Lineage)], out: String): Unit = {
    val dest = Paths.get(tableRoot, out)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val os = Files.newBufferedWriter(dest)
    try {
      members.foreach { case (m, lin) =>
        val in = Files.newBufferedReader(Paths.get(tableRoot, m))
        // monotone run cursor (the rewriteOneFile discipline): positions
        // stream in increasing order, so the lookup is O(1) amortized —
        // the bins that trip this path are exactly the many-run ones
        val linRuns: Array[(Long, Long, Long, Long)] = lin.runs.sortBy(_._1).toArray
        var linIdx = 0
        def runAt(p: Long): Int = {
          if (linRuns.isEmpty) -1
          else {
            while (linIdx < linRuns.length && p >= linRuns(linIdx)._1 + linRuns(linIdx)._3)
              linIdx += 1
            if (linIdx < linRuns.length && p >= linRuns(linIdx)._1) linIdx else -1
          }
        }
        try {
          var pos = -1L
          var line = in.readLine()
          while (line != null) {
            if (line.nonEmpty && line != "\r") {
              pos += 1
              val ri = if (lin.frid >= 0L) -1 else runAt(pos)
              val luvOnly = ri >= 0 && linRuns(ri)._2 == -1L
              val rid =
                if (lin.frid >= 0L) lin.frid + pos
                else if (ri >= 0 && !luvOnly) linRuns(ri)._2 + (pos - linRuns(ri)._1)
                else -1L
              val rluv =
                if (lin.frid >= 0L) lin.luv
                else if (ri >= 0 && !luvOnly) linRuns(ri)._4
                else -1L
              val outLine =
                if (rid >= 0L && line.startsWith("{")) {
                  val pre =
                    s"""{"${JsonlStats.RowIdMeta}":$rid,"${JsonlStats.LuvField}":$rluv"""
                  if (line.length > 2) pre + "," + line.substring(1) else pre + "}"
                } else {
                  val back =
                    if (lin.frid == -2L) lin.luv
                    else if (luvOnly) linRuns(ri)._4
                    else 0L
                  if (back > 0L) {
                    // a materialized member with an entry luv / a
                    // luv-only run: splice the fallback into null-luv
                    // rows so it survives without any manifest carrier
                    val n = mapper.readTree(line)
                    if (n.hasNonNull(JsonlStats.RowIdMeta) &&
                        !n.hasNonNull(JsonlStats.LuvField)) {
                      n.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
                        .put(JsonlStats.LuvField, back)
                      mapper.writeValueAsString(n)
                    } else line
                  } else line
                }
              os.write(outLine); os.write('\n')
            }
            line = in.readLine()
          }
        } finally in.close()
      }
    } finally os.close()
  }

  private[sources] def concatFiles(tableRoot: String, members: Seq[String], out: String): Unit = {
    val dest = Paths.get(tableRoot, out)
    val os = new java.io.BufferedOutputStream(
      Files.newOutputStream(dest, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING), 1 << 16)
    try {
      members.foreach { m =>
        val in = new java.io.BufferedInputStream(
          Files.newInputStream(Paths.get(tableRoot, m)), 1 << 16)
        try {
          var last = -1
          var b = in.read()
          while (b >= 0) { os.write(b); last = b; b = in.read() }
          if (last >= 0 && last != '\n') os.write('\n')
        } finally in.close()
      }
    } finally os.close()
  }

  // ---- view DDL (r12b, [[GraftViews]]) -----------------------------------
  // Spark 4.1 has no native SQL route to a V2 ViewCatalog (CREATE VIEW
  // cat.v fails with MISSING_CATALOG_ABILITY before the catalog is
  // consulted), so the DDL verbs ride the engine's CALL surface — the
  // same place every other engine verb without parser support lives.
  // READS need no verb: [[graft.plans.ResolveGraftViews]] resolves
  // SELECT over a stored view natively. `create_view` analyzes the body
  // UP FRONT in the calling session (schema + output-column capture,
  // loud failure on a body that doesn't resolve) and stores the
  // session's current catalog/namespace as the definition context, so
  // the body later re-resolves exactly as the author saw it.

  private def splitViewName(root: String, dotted: String): (java.nio.file.Path, Array[String], String) = {
    val parts = dotted.split('.')
    val ns = parts.init
    val nsDir = Paths.get(root, ns: _*)
    require(parts.forall(_.nonEmpty), s"malformed view name '$dotted'")
    require(ns.isEmpty || Files.isDirectory(nsDir),
      s"no such namespace ${ns.mkString(".")} under $root")
    require(!Files.exists(nsDir.resolve("_stats.jsonl")),
      s"'${ns.mkString(".")}' is a table, not a namespace")
    (nsDir, ns, parts.last)
  }

  class ViewDdlUnbound(root: String, verb: String) extends UnboundProcedure {
    override def name(): String = verb
    override def description(): String = verb match {
      case "create_view" => "create_view(name, sql[, comment][, or_replace][, columns]): store a persistent SQL view"
      case "drop_view" => "drop_view(name): delete a stored view definition"
      case "rename_view" => "rename_view(name, to): move a stored view to a new name/namespace"
      case "list_views" => "list_views([namespace]): the stored views of a namespace"
      case _ => "describe_view(name): a stored view's definition, context and schema"
    }
    override def bind(inputType: StructType): BoundProcedure = new ViewDdlBound(root, verb)
  }

  class ViewDdlBound(root: String, verb: String) extends BoundProcedure {
    override def name(): String = verb
    override def description(): String = s"$verb on the stored-view tier"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = verb match {
      case "create_view" => Array(
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("sql", StringType).build(),
        ProcedureParameter.in("comment", StringType).defaultValue("''").build(),
        ProcedureParameter.in("or_replace", BooleanType).defaultValue("false").build(),
        // r14: comma-joined column ALIASES — the view's visible column
        // names, positionally over the body's output (the CREATE VIEW
        // `(a, b, ...)` column-list form)
        ProcedureParameter.in("columns", StringType).defaultValue("''").build())
      case "rename_view" => Array(
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("to", StringType).build())
      case "drop_view" => Array(
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("if_exists", BooleanType).defaultValue("false").build())
      case "list_views" => Array(
        ProcedureParameter.in("namespace", StringType).defaultValue("''").build())
      case _ => Array(ProcedureParameter.in("name", StringType).build())
    }

    private def utf8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

    private def oneRowScan(fields: Seq[(String, String)], desc: String): java.util.Iterator[Scan] = {
      val schema = StructType(fields.map { case (n, _) => StructField(n, StringType, nullable = false) })
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] =
          Array(InternalRow(fields.map(f => utf8(f._2)): _*))
        override def description(): String = desc
      }).iterator()
    }

    override def call(input: InternalRow): java.util.Iterator[Scan] = verb match {
      case "create_view" =>
        val dotted = input.getUTF8String(0).toString
        val sql = input.getUTF8String(1).toString
        val comment = Option(input.getUTF8String(2)).map(_.toString).filter(_.nonEmpty)
        val orReplace = input.getBoolean(3)
        val (nsDir, _, vname) = splitViewName(root, dotted)
        GraftViews.requireValidName(vname)
        require(!Files.exists(nsDir.resolve(vname).resolve("_stats.jsonl")),
          s"a TABLE named '$dotted' exists — views and tables share one identifier space")
        require(orReplace || !GraftViews.exists(nsDir, vname),
          s"view '$dotted' already exists (pass or_replace => true to redefine)")
        // analyze NOW, in the calling session: schema capture plus the
        // loud create-time failure for a body that doesn't resolve
        val spark = SparkSession.active
        val schema = spark.sql(sql).schema
        require(schema.fieldNames.toSeq.distinct.size == schema.size,
          s"view body output has duplicate column names " +
            s"(${schema.fieldNames.mkString(", ")}) — alias them apart")
        // r14: an explicit column list renames the body's output
        // positionally (the `CREATE VIEW v (a, b) AS ...` form) — the
        // stored schema carries the ALIAS names (what readers see), the
        // queryColumnNames keep the body's names (what the expansion
        // projects by)
        val aliases = Option(input.getUTF8String(4)).map(_.toString).filter(_.nonEmpty)
          .map(_.split(',').map(_.trim).toSeq)
        aliases.foreach { as =>
          require(as.size == schema.size,
            s"column list has ${as.size} names but the view body produces " +
              s"${schema.size} columns (${schema.fieldNames.mkString(", ")})")
          require(as.forall(_.nonEmpty) && as.distinct.size == as.size,
            s"view column list must be distinct non-empty names: ${as.mkString(", ")}")
        }
        val visibleSchema = aliases match {
          case Some(as) => StructType(schema.fields.zip(as).map { case (f, a) => f.copy(name = a) })
          case None => schema
        }
        val cm = spark.sessionState.catalogManager
        GraftViews.write(nsDir, GraftViews.ViewDef(
          name = vname, sql = sql,
          currentCatalog = cm.currentCatalog.name(),
          currentNamespace = cm.currentNamespace.toSeq,
          schema = visibleSchema,
          queryColumnNames = schema.fieldNames.toSeq,
          columnAliases = visibleSchema.fieldNames.toSeq,
          columnComments = Seq.empty,
          properties = comment.map(c => Map("comment" -> c)).getOrElse(Map.empty)),
          replace = orReplace)
        oneRowScan(Seq("view" -> dotted, "action" -> "created",
          "columns" -> visibleSchema.fieldNames.mkString(",")), s"create_view $dotted")

      case "drop_view" =>
        val dotted = input.getUTF8String(0).toString
        val ifExists = input.getBoolean(1)
        val (nsDir, ns, vname) = splitViewName(root, dotted)
        if (ifExists && !GraftViews.exists(nsDir, vname))
          return oneRowScan(Seq("view" -> dotted, "action" -> "not-found"),
            s"drop_view $dotted")
        // a view referenced by OTHER stored views must not vanish out
        // from under them — fail loudly naming every dependent (the
        // alternative, a nested view that errors at next read, debugs
        // like a corruption)
        val dependents = GraftViews.referencingViews(
          s => SparkSession.active.sessionState.sqlParser.parsePlan(s),
          root, ns.toSeq, vname)
        require(dependents.isEmpty,
          s"cannot drop view '$dotted': referenced by stored view(s) " +
            s"${dependents.mkString(", ")} — drop or redefine the dependents first")
        // a materialized view owns its backing table and any
        // COUNT(DISTINCT) liveness tables (r15) — dropping the
        // definition removes all of them (engine-managed storage,
        // unreachable from listings; leaving them would orphan it)
        val defn = GraftViews.read(nsDir, vname)
        val owned = defn.flatMap(_.properties.get(GraftViews.MvTableProp)).toSeq ++
          defn.flatMap(_.properties.get(GraftViews.MvAuxProp)).toSeq
            .flatMap(_.split(',').filter(_.nonEmpty))
        require(GraftViews.drop(nsDir, vname), s"no such view '$dotted' under $root")
        owned.foreach { b =>
          val dir = nsDir.resolve(b)
          if (Files.exists(dir.resolve("_stats.jsonl")))
            graft.util.Fs.deleteRecursively(dir.toString)
        }
        oneRowScan(Seq("view" -> dotted, "action" -> "dropped"), s"drop_view $dotted")

      case "rename_view" =>
        val from = input.getUTF8String(0).toString
        val to = input.getUTF8String(1).toString
        val (fromDir, _, fromName) = splitViewName(root, from)
        val (toDir, _, toName) = splitViewName(root, to)
        GraftViews.requireValidName(toName)
        val d = GraftViews.read(fromDir, fromName)
          .getOrElse(throw new IllegalArgumentException(s"no such view '$from' under $root"))
        require(!GraftViews.exists(toDir, toName), s"view '$to' already exists")
        require(!Files.exists(toDir.resolve(toName).resolve("_stats.jsonl")),
          s"a TABLE named '$to' exists — views and tables share one identifier space")
        // definition context stays: rename moves the ADDRESS, the body
        // still resolves exactly as written. A materialized view's
        // backing table moves with it (backing first, sidecar second —
        // a crash in between reads as a stale MV, never a lost one)
        val moved = GraftViews.moveMvBacking(fromDir, toDir, d, toName)
        GraftViews.write(toDir, moved.copy(name = toName), replace = false)
        GraftViews.drop(fromDir, fromName)
        oneRowScan(Seq("view" -> from, "action" -> "renamed", "to" -> to),
          s"rename_view $from -> $to")

      case "list_views" =>
        val ns = Option(input.getUTF8String(0)).map(_.toString).filter(_.nonEmpty)
        val nsDir = ns.map(s => Paths.get(root, s.split('.'): _*)).getOrElse(Paths.get(root))
        require(ns.isEmpty || Files.isDirectory(nsDir), s"no such namespace ${ns.get} under $root")
        val names = GraftViews.list(nsDir)
        val schema = StructType(Seq(
          StructField("namespace", StringType, nullable = false),
          StructField("view", StringType, nullable = false),
          StructField("comment", StringType, nullable = true)))
        java.util.List.of[Scan](new LocalScan {
          override def readSchema(): StructType = schema
          override def rows(): Array[InternalRow] = names.map { n =>
            val c = GraftViews.read(nsDir, n).flatMap(_.properties.get("comment"))
            InternalRow(utf8(ns.getOrElse("")), utf8(n), c.map(utf8).orNull)
          }.toArray
          override def description(): String = s"views of ${ns.getOrElse("(root)")}"
        }).iterator()

      case "describe_view" =>
        val dotted = input.getUTF8String(0).toString
        val (nsDir, ns, vname) = splitViewName(root, dotted)
        val d = GraftViews.read(nsDir, vname)
          .getOrElse(throw new IllegalArgumentException(s"no such view '$dotted' under $root"))
        oneRowScan(Seq(
          "view" -> dotted,
          "sql" -> d.sql,
          "current_catalog" -> d.currentCatalog,
          "current_namespace" -> d.currentNamespace.mkString("."),
          "schema" -> d.schema.toDDL,
          "properties" -> d.properties.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(", ")),
          s"describe_view $dotted")
    }
  }

  // ---- materialized views (r12b) -----------------------------------------
  // `create_materialized_view(name, sql)` = the stored view plus an
  // engine-managed backing table `_mv_<name>` (atomic CTAS) plus the
  // source tables' manifest versions recorded BEFORE the build (a
  // commit racing the build makes the MV stale, never wrong).
  // `refresh_materialized_view(name)` rebuilds the backing atomically
  // (RTAS) from [[graft.plans.ResolveGraftViews.bodyPlan]] — the SAME
  // derivation a stale read expands, so precomputed and recomputed
  // rows agree by construction. Reads route in the resolution rule:
  // fresh -> backing table, stale -> body; both correct, the
  // materialization only picks the cheaper plan.

  class MvDdlUnbound(catName: String, root: String, verb: String) extends UnboundProcedure {
    override def name(): String = verb
    override def description(): String = verb match {
      case "create_materialized_view" =>
        "create_materialized_view(name, sql[, or_replace]): store a view with a precomputed backing table"
      case _ =>
        "refresh_materialized_view(name): rebuild the backing table and re-record source versions"
    }
    override def bind(inputType: StructType): BoundProcedure = new MvDdlBound(catName, root, verb)
  }

  class MvDdlBound(catName: String, root: String, verb: String) extends BoundProcedure {
    override def name(): String = verb
    override def description(): String = s"$verb on the stored-view tier"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = verb match {
      case "create_materialized_view" => Array(
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("sql", StringType).build(),
        ProcedureParameter.in("or_replace", BooleanType).defaultValue("false").build())
      case _ => Array(ProcedureParameter.in("name", StringType).build())
    }

    private def utf8(x: String) = org.apache.spark.unsafe.types.UTF8String.fromString(x)

    private def oneRow(fields: Seq[(String, String)], desc: String): java.util.Iterator[Scan] = {
      val schema = StructType(fields.map { case (n, _) => StructField(n, StringType, nullable = false) })
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] =
          Array(InternalRow(fields.map(f => utf8(f._2)): _*))
        override def description(): String = desc
      }).iterator()
    }

    /** The body's source TABLES as warehouse-relative paths, resolved
      * under `ctx` (the calling session's context at create — exactly
      * the context the definition stores — or the stored context at
      * refresh). A stored-VIEW source FLATTENS (r15): the walk recurses
      * into its body under the view's OWN stored context, collecting
      * the underlying tables for version tracking plus the view itself
      * as a definition-hash dependency ([[GraftViews.MvViewDepsProp]] —
      * views have no versions, so freshness pins the definition).
      * Every leaf must be a plain table of THIS catalog. */
    private def sourceTables(spark: SparkSession, sql: String, ctx: Seq[String])
        : (Seq[String], Seq[(String, String)]) = {
      import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, UnresolvedRelation}
      import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
      import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
      val cm = spark.sessionState.catalogManager
      def rels(pl: LogicalPlan): Seq[Seq[String]] = {
        val direct = pl.collect { case UnresolvedRelation(parts, _, false) => parts }
        val inSubq = pl.flatMap(_.expressions.flatMap(_.collect {
          case sq: SubqueryExpression => rels(sq.plan)
        }.flatten))
        direct ++ inSubq
      }
      val tables = scala.collection.mutable.LinkedHashSet.empty[String]
      val viewDeps = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      def walk(sql: String, ctx: Seq[String], seen: Set[String], depth: Int): Unit = {
        require(depth < 16,
          "materialized view source nesting deeper than 16 — flatten the chain")
        val parsed = CTESubstitution.apply(spark.sessionState.sqlParser.parsePlan(sql))
        rels(parsed).foreach { parts =>
          val full =
            if (parts.size == 1) ctx ++ parts
            else if (cm.isCatalogRegistered(parts.head)) parts
            else ctx.head +: parts
          val sameCat = cm.isCatalogRegistered(full.head) && (cm.catalog(full.head) match {
            case g: GraftCatalog => g.warehouseRoot == root
            case _ => false
          })
          require(sameCat,
            s"materialized view sources must be tables of catalog '$catName' — " +
              s"'${parts.mkString(".")}' resolves to '${full.mkString(".")}' " +
              "(temp views and foreign catalogs have no trackable versions)")
          val rel = full.tail.mkString("/")
          val dir = Paths.get(root, full.tail: _*)
          if (Files.exists(dir.resolve("_stats.jsonl"))) tables += rel
          else {
            val nsDir = if (full.tail.size > 1)
              Paths.get(root, full.tail.init: _*) else Paths.get(root)
            GraftViews.read(nsDir, full.last) match {
              case Some(vd) =>
                require(!seen.contains(rel),
                  s"cyclic view reference through '${full.mkString(".")}'")
                viewDeps += (rel -> GraftViews.defHash(nsDir, full.last))
                walk(vd.sql, vd.currentCatalog +: vd.currentNamespace,
                  seen + rel, depth + 1)
              case None => throw new IllegalArgumentException(
                s"no such source table '${full.mkString(".")}' for the materialized view")
            }
          }
        }
      }
      walk(sql, ctx, Set.empty, 0)
      (tables.toSeq, viewDeps.toSeq)
    }

    private def quoted(parts: Seq[String]): String = parts.map(p => s"`$p`").mkString(".")

    override def call(input: InternalRow): java.util.Iterator[Scan] = verb match {
      case "create_materialized_view" =>
        val dotted = input.getUTF8String(0).toString
        val sql = input.getUTF8String(1).toString
        val orReplace = input.getBoolean(2)
        val (nsDir, ns, vname) = splitViewName(root, dotted)
        GraftViews.requireValidName(vname)
        require(!Files.exists(nsDir.resolve(vname).resolve("_stats.jsonl")),
          s"a TABLE named '$dotted' exists — views and tables share one identifier space")
        val existing = GraftViews.read(nsDir, vname)
        require(orReplace || existing.isEmpty,
          s"view '$dotted' already exists (pass or_replace => true to redefine)")
        val spark = SparkSession.active
        // source versions recorded BEFORE the build: a source commit
        // racing the CTAS leaves the MV stale (correct), never serving
        // a backing built from data newer than the recorded versions
        val cm0 = spark.sessionState.catalogManager
        val (sources, viewDeps) = sourceTables(spark, sql,
          cm0.currentCatalog.name() +: cm0.currentNamespace.toSeq)
        require(sources.nonEmpty, "a materialized view needs at least one source table")
        val versions = sources.map(t =>
          (t, JsonlStats.currentVersion(Paths.get(root, t.split('/').toSeq: _*).toString)))
        val df = spark.sql(sql)
        val schema = df.schema
        require(schema.fieldNames.toSeq.distinct.size == schema.size,
          s"view body output has duplicate column names " +
            s"(${schema.fieldNames.mkString(", ")}) — alias them apart")
        val backing = s"_mv_$vname"
        // maintainable bodies (distributive SUM/COUNT at the stored
        // grain) back with the AUGMENTED aggregate — visible columns
        // plus hidden graft_ivm_* state (and one liveness table per
        // COUNT(DISTINCT) slot, r15) — built from version-PINNED reads
        // so the recorded versions exactly describe the state. The
        // fresh-read path projects the declared columns, so the state
        // columns never surface.
        // REPLACE crash bracket (ADVICE r15, same family as the refresh
        // rebuild): the OLD sidecar stays live while the shared backing
        // `_mv_<name>` is createOrReplace'd with the NEW body — a crash
        // before the new sidecar publishes would leave the old
        // definition pointing at a backing built from a different body,
        // and its next refresh would merge the old body's delta into
        // it. The standing marker forces that refresh through the
        // rebuild; the new sidecar write below (marker-free properties)
        // clears it.
        existing.foreach { old =>
          if (old.properties.contains(GraftViews.MvTableProp) &&
              !old.properties.contains(GraftViews.MvPendingProp))
            GraftViews.write(nsDir, old.copy(properties = old.properties +
              (GraftViews.MvPendingProp -> "replace")), replace = true)
        }
        val (auxTables, havingSql) = MvDdlBound.buildMvBacking(
          spark, root, catName, ns.toSeq, vname, df, versions, orReplace)
        // a replaced MV may have owned MORE liveness tables than the
        // new shape: drop the orphans (engine-managed storage)
        existing.foreach(_.properties.get(GraftViews.MvAuxProp).foreach(
          _.split(',').filter(_.nonEmpty).filterNot(auxTables.contains).foreach { an =>
            val dir = nsDir.resolve(an)
            if (Files.exists(dir.resolve("_stats.jsonl")))
              graft.util.Fs.deleteRecursively(dir.toString)
          }))
        val cm = spark.sessionState.catalogManager
        GraftViews.write(nsDir, GraftViews.ViewDef(
          name = vname, sql = sql,
          currentCatalog = cm.currentCatalog.name(),
          currentNamespace = cm.currentNamespace.toSeq,
          schema = schema,
          queryColumnNames = schema.fieldNames.toSeq,
          columnAliases = schema.fieldNames.toSeq,
          columnComments = Seq.empty,
          properties = Map(
            GraftViews.MvTableProp -> backing,
            GraftViews.MvSourcesProp -> GraftViews.mvSourcesEncode(versions)) ++
            (if (auxTables.nonEmpty)
              Map(GraftViews.MvAuxProp -> auxTables.mkString(",")) else Map.empty) ++
            havingSql.map(GraftViews.MvHavingProp -> _) ++
            (if (viewDeps.nonEmpty)
              Map(GraftViews.MvViewDepsProp ->
                viewDeps.map { case (r, h) => s"$r@$h" }.mkString(",")) else Map.empty)),
          replace = orReplace)
        oneRow(Seq("view" -> dotted, "action" -> "created", "backing" -> backing,
          "sources" -> GraftViews.mvSourcesEncode(versions)),
          s"create_materialized_view $dotted")

      case "refresh_materialized_view" =>
        val dotted = input.getUTF8String(0).toString
        val (nsDir, ns, vname) = splitViewName(root, dotted)
        // ATOMIC CLAIM (r14, ADVICE r13): refreshes of one view
        // serialize on a per-view file lock — without it two concurrent
        // calls could both pass the pending check and both apply the
        // same (fromV, toV] delta window, double-counting it. The lock
        // is an OS FileLock (released on process death, no stale-lock
        // sweep needed) behind a JVM monitor (same-process threads
        // would otherwise hit OverlappingFileLockException). The loser
        // BLOCKS, then re-reads the sidecar: the winner's re-recorded
        // versions make the second refresh a noop (or a genuinely new,
        // disjoint window) — never the same window twice.
        MvRefreshLock.withLock(nsDir, vname) {
        val d = GraftViews.read(nsDir, vname)
          .getOrElse(throw new IllegalArgumentException(s"no such view '$dotted' under $root"))
        val backing = d.properties.getOrElse(GraftViews.MvTableProp,
          throw new IllegalArgumentException(
            s"'$dotted' is a plain view — only materialized views refresh"))
        val spark = SparkSession.active
        val cat = spark.sessionState.catalogManager.catalog(catName)
          .asInstanceOf[GraftCatalog]
        val recorded = GraftViews.mvSourcesDecode(
          d.properties.getOrElse(GraftViews.MvSourcesProp, ""))
        // versions re-recorded BEFORE the rebuild — same conservatism
        val versions = recorded.map { case (t, _) =>
          (t, JsonlStats.currentVersion(Paths.get(root, t.split('/').toSeq: _*).toString)) }
        val backingFqn = quoted(catName +: (ns.toSeq :+ backing))
        val ident = org.apache.spark.sql.connector.catalog.Identifier.of(ns, vname)
        def bodyDf() = org.apache.spark.sql.graftops.Bridge.ofRows(spark,
          new graft.plans.ResolveGraftViews(spark).bodyPlan(catName, cat, ident, d))

        // INCREMENTAL path (r13): a single-source distributive body
        // whose backing carries the graft_ivm_* state refreshes by
        // applying the signed change feed of (recorded, head] to the
        // backing with one maintenance MERGE — cost proportional to the
        // DELTA, not the source. Crash protocol: a pending marker
        // brackets the MERGE; while it stands, reads take the (correct)
        // body path and the next refresh rebuilds fully — an
        // interrupted window can never be applied twice.
        // a redefined VIEW dependency (r15) changes the body's meaning
        // with no table version moving — the incremental window cannot
        // express that, so stale deps force the rebuild (which also
        // re-derives the source set: the new definition may reference
        // different tables)
        val depsFresh = GraftViews.mvViewDepsFresh(root, d)
        val mode = (if (depsFresh) MvDdlBound.tryIncrementalRefresh(
          spark, root, nsDir, catName, cat, ident, backingFqn, d, recorded, versions)
          else None) match {
          case Some(m) => m
          case None =>
            // full RTAS fallback — always correct, and it (re)writes
            // the hidden state columns (and COUNT(DISTINCT) liveness
            // tables, r15) when the body is maintainable, from
            // version-PINNED reads of `versions`, so the NEXT refresh
            // can go incremental. Atomic: readers see the old backing
            // or the new one, and the definition updates only AFTER
            // the swap.
            // crash bracket (ADVICE r15): the backing's createOrReplace
            // commits BEFORE the sidecar re-records versions — reached
            // via a pre-marker decline (stale backing schema,
            // repairDisable, a frozen mover), no marker may be standing,
            // and a crash between the two writes would leave the backing
            // NEWER than the recorded versions: the next refresh's
            // incremental MERGE would re-apply the already-included
            // window (the r14 double-count family). Put the marker down
            // first; the sidecar publish below clears it in the same
            // write that re-records versions.
            if (!d.properties.contains(GraftViews.MvPendingProp))
              GraftViews.write(nsDir, d.copy(properties = d.properties +
                (GraftViews.MvPendingProp -> "rebuild")), replace = true)
            // re-derive the source set from the body (a redefined view
            // dependency may reference different tables) and re-record
            // its versions BEFORE the rebuild — same conservatism
            val (srcTabs, newDeps) = sourceTables(spark, d.sql,
              d.currentCatalog +: d.currentNamespace)
            val newVersions = srcTabs.map(t => (t,
              JsonlStats.currentVersion(Paths.get(root, t.split('/').toSeq: _*).toString)))
            val df = bodyDf()
            val oldAux = d.properties.getOrElse(GraftViews.MvAuxProp, "")
              .split(',').filter(_.nonEmpty).toSeq
            val (auxTables, havingSql) = MvDdlBound.buildMvBacking(
              spark, root, catName, ns.toSeq, vname, df, newVersions, orReplace = true)
            oldAux.filterNot(auxTables.contains).foreach { an =>
              val dir = nsDir.resolve(an)
              if (Files.exists(dir.resolve("_stats.jsonl")))
                graft.util.Fs.deleteRecursively(dir.toString)
            }
            GraftViews.write(nsDir, d.copy(properties = {
              val base = d.properties +
                (GraftViews.MvSourcesProp -> GraftViews.mvSourcesEncode(newVersions)) -
                GraftViews.MvPendingProp
              val withAux =
                if (auxTables.nonEmpty)
                  base + (GraftViews.MvAuxProp -> auxTables.mkString(","))
                else base - GraftViews.MvAuxProp
              val withHaving = havingSql match {
                case Some(h) => withAux + (GraftViews.MvHavingProp -> h)
                case None => withAux - GraftViews.MvHavingProp
              }
              if (newDeps.nonEmpty)
                withHaving + (GraftViews.MvViewDepsProp ->
                  newDeps.map { case (r, h) => s"$r@$h" }.mkString(","))
              else withHaving - GraftViews.MvViewDepsProp
            }), replace = true)
            "full"
        }
        // readout sources from the POST-refresh sidecar: a rebuild may
        // have re-derived the set through redefined view dependencies
        val sourcesNow = GraftViews.read(nsDir, vname)
          .flatMap(_.properties.get(GraftViews.MvSourcesProp))
          .getOrElse(GraftViews.mvSourcesEncode(versions))
        oneRow(Seq("view" -> dotted, "action" -> "refreshed", "mode" -> mode,
          "sources" -> sourcesNow),
          s"refresh_materialized_view $dotted")
        }
    }
  }

  /** Per-view refresh serialization (r14): JVM monitor for same-process
    * threads + OS [[java.nio.channels.FileLock]] for cross-process —
    * the OS releases the lock on process death, so a crashed holder
    * never wedges future refreshes (the pending MARKER, not this lock,
    * carries crash-recovery semantics). */
  private object MvRefreshLock {
    private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
    def withLock[T](nsDir: java.nio.file.Path, vname: String)(f: => T): T = {
      val lockPath = nsDir.resolve("_views").resolve(s".$vname.refresh.lock")
      Files.createDirectories(lockPath.getParent)
      val key = lockPath.toAbsolutePath.normalize.toString
      monitors.computeIfAbsent(key, _ => new Object).synchronized {
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock()
          try f finally lock.release()
        } finally ch.close()
      }
    }
  }

  object MvDdlBound {
    /** Build (or rebuild) an MV backing and its COUNT(DISTINCT)
      * liveness tables from the analyzed body. Maintainable shapes
      * write their hidden `graft_ivm_*` state ONLY from version-PINNED
      * reads of the recorded source versions (r15): a source commit
      * racing the build can then never make the written state disagree
      * with the versions recorded beside it — the MV is merely stale,
      * exactly as recorded. (Without the pin, a racing commit makes the
      * backing NEWER than the recorded versions, and the next
      * incremental refresh re-applies the already-included window —
      * the same double-count family ADVICE r14 closed on the delta
      * path.) Unpinnable shapes write the plain body: correct, and
      * never incrementally refreshed. Returns the liveness table names
      * created, and the body's HAVING predicate (rendered over visible
      * columns) when the backing was built UNFILTERED — the caller
      * stores it so reads re-apply it (r15). */
    private[sources] def buildMvBacking(
        spark: SparkSession, root: String, catName: String, ns: Seq[String],
        vname: String, df: org.apache.spark.sql.DataFrame,
        versions: Seq[(String, Int)], orReplace: Boolean)
        : (Seq[String], Option[String]) = {
      import graft.plans.MvIncremental
      def quoted(parts: Seq[String]) = parts.map(p => s"`$p`").mkString(".")
      def classicPlan(d: org.apache.spark.sql.DataFrame) =
        d.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
          .queryExecution.analyzed
      val backingFqn = quoted(catName +: (ns :+ s"_mv_$vname"))
      def write(d: org.apache.spark.sql.DataFrame, fqn: String): Unit = {
        val w = d.writeTo(fqn)
        if (orReplace) w.createOrReplace() else w.create()
      }
      val verByRoot = versions.map { case (t, v) =>
        Paths.get(root, t.split('/').toSeq: _*).toString -> v }.toMap
      val pinnable = MvIncremental.detect(classicPlan(df)).filter(_.leaves.forall(_.table match {
        case t: JsonlStatsTable => verByRoot.contains(t.tableRoot)
        case _ => false
      }))
      pinnable match {
        case Some(sh) =>
          val nonce = java.util.UUID.randomUUID().toString.take(8)
          val pins = scala.collection.mutable.Map.empty[(String, Int),
            org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]
          try {
            val leafRoots = sh.leaves.map(_.table.asInstanceOf[JsonlStatsTable].tableRoot)
            def pinnedAt(r: String) = pins.getOrElseUpdate((r, verByRoot(r)),
              classicPlan(ChangeFeed.pinnedScan(spark, r, verByRoot(r), nonce)))
            val pinMap = leafRoots.indices.map(j => j -> pinnedAt(leafRoots(j))).toMap
            MvIncremental.pinnedChild(sh, pinMap) match {
              case Some(pc) =>
                // NOT shared-scan-cached across the backing + aux CTAS:
                // persisting the pinned source for the two builds was
                // measured SLOWER than re-scanning it (r16 — cache fill
                // ~0.2-0.4 s vs ~0.3 s JSONL re-scan at sf0.1, and the
                // cached copy pressures execution memory at scale).
                // Instead the backing CTAS and each aux CTAS OVERLAP
                // (r17, guide §2.6): independent writes to disjoint
                // tables, all reading the same immutable pinned
                // manifests (written eagerly when pinMap was built) —
                // the aux build back-fills the backing build's task
                // tail instead of waiting for it.
                val auxNames = sh.distinctSlots.map(s =>
                  s.j -> MvIncremental.auxTableName(vname, s.j))
                if (auxNames.isEmpty) {
                  write(org.apache.spark.sql.graftops.Bridge.ofRows(spark,
                    MvIncremental.augmentedPlan(sh, Some(pc))), backingFqn)
                  (Nil, sh.havingSql)
                } else {
                  import java.util.concurrent.{Executors, TimeUnit}
                  val pool = Executors.newFixedThreadPool(1 + auxNames.size)
                  try {
                    def task(body: => Unit) = pool.submit(
                      new java.util.concurrent.Callable[Unit] {
                        override def call(): Unit = {
                          org.apache.spark.sql.classic.SparkSession
                            .setActiveSession(spark
                              .asInstanceOf[org.apache.spark.sql.classic.SparkSession])
                          body
                        }
                      })
                    val fs = task(write(org.apache.spark.sql.graftops.Bridge
                      .ofRows(spark, MvIncremental.augmentedPlan(sh, Some(pc))),
                      backingFqn)) +: auxNames.map { case (j, an) =>
                        val s = sh.distinctSlots.find(_.j == j).get
                        task(write(org.apache.spark.sql.graftops.Bridge.ofRows(spark,
                          MvIncremental.auxTablePlan(sh, s, Some(pc))),
                          quoted(catName +: (ns :+ an))))
                      }
                    val errs = fs.flatMap(f =>
                      try { f.get(); None } catch { case t: Throwable => Some(t) })
                    errs.headOption.foreach(t => throw (t.getCause match {
                      case e: Exception => e
                      case _ => t
                    }))
                  } finally { pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS) }
                  (auxNames.map(_._2), sh.havingSql)
                }
              case None => write(df, backingFqn); (Nil, None)
            }
          } finally pins.keys.foreach { case (r, v) =>
            java.nio.file.Files.deleteIfExists(ChangeFeed.pinnedManifest(r, v, nonce)) }
        case None => write(df, backingFqn); (Nil, None)
      }
    }

    /** Attempt the delta-merge refresh; Some(mode) when it (or a no-op)
      * settled the MV, None to fall back to the full rebuild. Every
      * unprovable condition declines BEFORE any state is touched; only
      * the MERGE itself runs inside the pending bracket. */
    private[sources] def tryIncrementalRefresh(
        spark: SparkSession, root: String, nsDir: java.nio.file.Path,
        catName: String, cat: GraftCatalog,
        ident: org.apache.spark.sql.connector.catalog.Identifier,
        backingFqn: String, d: GraftViews.ViewDef,
        recorded: Seq[(String, Int)], head: Seq[(String, Int)]): Option[String] = {
      import graft.plans.MvIncremental
      // a pending marker from a died refresh: the backing is suspect —
      // force the full rebuild (never re-apply a maybe-applied window)
      if (d.properties.contains(GraftViews.MvPendingProp)) return None
      if (recorded == head) {
        // nothing moved: re-stamp nothing, report the no-op
        return Some("noop")
      }
      // step profiler (optimization rounds): spark.graft.mv.profile=true
      // prints per-step wall time to stderr; zero cost when off
      val profOn = spark.conf.getOption("spark.graft.mv.profile").contains("true")
      def prof[T](label: String)(f: => T): T =
        if (!profOn) f else {
          val t0 = System.nanoTime()
          val r = f
          System.err.println(f"    [mv-refresh] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
          r
        }
      // r14/r15 (join-aware, telescoping): the view is LINEAR in every
      // LEAF OCCURRENCE (inner join is bilinear), so the multiset delta
      // telescopes — for mover occurrences L_i in leaf order,
      //   Δview = Σ_i E(..earlier leaves at HEAD.., ΔL_i,
      //                 ..later mover leaves at RECORDED..)
      // — one spliced term per mover occurrence, earlier leaves reading
      // live (unmoved leaves are identical in both states), later mover
      // occurrences version-PINNED at their recorded manifest. One
      // mover is the fact⋈dim case (either side); several movers (and
      // self-joined movers — two occurrences, two terms) union their
      // terms into the same delta aggregate. Rollbacks (a mover whose
      // head precedes its recorded version) decline: windows don't
      // subtract.
      val headMap = head.toMap
      val movers = recorded.filter { case (t, v) => headMap.get(t).exists(_ != v) }
      if (movers.isEmpty) return None // set drift (shouldn't happen): RTAS
      if (movers.exists { case (t, v) => v >= headMap(t) }) return None
      try {
        val analyzed = prof("body-analyze")(org.apache.spark.sql.graftops.Bridge.ofRows(spark,
          new graft.plans.ResolveGraftViews(spark).bodyPlan(catName, cat, ident, d))
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
          .queryExecution.analyzed)
        val shape = prof("detect")(MvIncremental.detect(analyzed)).getOrElse(return None)
        // the backing must already carry the state columns (it might
        // predate r13 or have been built by a non-maintainable twin)
        val backingCols = prof("backing-schema")(spark.table(backingFqn).schema.fieldNames.toSet)
        if (!shape.auxCols.forall(backingCols.contains)) return None
        // COUNT(DISTINCT) slots (r15) additionally need their
        // per-(group, value) liveness tables — a backing predating the
        // slot's aux table cannot maintain it incrementally
        val auxNameByJ: Map[Int, String] = shape.distinctSlots.map(s =>
          s.j -> MvIncremental.auxTableName(ident.name(), s.j)).toMap
        if (!auxNameByJ.values.forall(an =>
          Files.exists(nsDir.resolve(an).resolve("_stats.jsonl")))) return None
        case class Mover(root: String, fromV: Int, toV: Int)
        val ms = movers.map { case (t, v) =>
          Mover(Paths.get(root, t.split('/').toSeq: _*).toString, v, headMap(t)) }
        val moverRoots = ms.map(_.root).toSet
        val leafRootOpts: Seq[Option[String]] = shape.leaves.map(_.table match {
          case t: JsonlStatsTable => Some(t.tableRoot)
          case _ => None
        })
        // EVERY leaf must be a graft table we can version-pin (ADVICE
        // r14): a leaf we cannot pin would read live at merge-execution
        // time, and a source commit racing the refresh would make the
        // executed delta disagree with the versions recorded below
        if (leafRootOpts.exists(_.isEmpty)) return None
        val leafRoots: Seq[String] = leafRootOpts.map(_.get)
        // every mover must surface as at least one source leaf (a
        // subquery-only mover was already declined by detect, but stay
        // defensive — a missed occurrence would silently drop its term)
        if (!moverRoots.forall(leafRoots.contains)) return None
        // head version of every leaf's table — recorded for ALL sources
        // at refresh start, so every leaf occurrence can pin on it
        val headVerByRoot: Map[String, Int] = head.map { case (t, v) =>
          Paths.get(root, t.split('/').toSeq: _*).toString -> v }.toMap
        if (!leafRoots.forall(headVerByRoot.contains)) return None
        val moverIdxsPre = leafRoots.zipWithIndex.collect {
          case (r, i) if moverRoots.contains(r) => i }
        // compensated movers (r16): a window moving the single-leaf
        // right side of a left-outer join refreshes via the
        // Griffin–Libkin flip term — its spliced term contains signed
        // DELETIONS (the null-extended rows that flip out) even when
        // the window itself is insert-only
        def statusOf(i: Int) = shape.moverStatus.lift(i)
        val compMover = moverIdxsPre.exists(i =>
          statusOf(i).contains(MvIncremental.CompMover))
        // MIN/MAX slots merge freely over INSERT-ONLY windows (an
        // insert only ever extends an extremum); a DELETING window can
        // retract one, which no merge of extrema can express — r14
        // repairs GROUP-SCOPED instead of rebuilding: the SUM/COUNT/
        // liveness legs still merge from the signed delta, then the
        // MIN/MAX columns of exactly the AFFECTED groups (the delta's
        // groups) recompute from the live source — a grain-predicate
        // scan the connector prunes — via a second, matched-only MERGE.
        // Cost ∝ affected groups' rows, never the source. A comp-mover
        // window needs the repair regardless of its own insert-onlyness
        // (its flip rows retract).
        val needsRepair = shape.needsInsertOnly && (compMover || ms.exists(m =>
          !ChangeFeed.windowInsertOnly(m.root, m.fromV, m.toV)))
        // operator escape hatch (r15, also the bench's RTAS control):
        // disabling repair declines deleting windows to the rebuild
        if (needsRepair && spark.conf.getOption("spark.graft.mv.repairDisable")
          .contains("true")) return None
        // signed delta + the delta aggregate, ANALYZED before anything
        // mutates (a vacuumed window or unrenderable expression lands
        // here, declining to RTAS). The nonce makes this call's derived
        // _cdf manifests private — deletable on exit without racing a
        // concurrent refresh of ANOTHER view over the same source.
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        val signedView = s"graft_ivm_signed_${math.abs(backingFqn.hashCode)}"
        val deltaView = s"graft_ivm_delta_${math.abs(backingFqn.hashCode)}"
        val repairView = s"graft_ivm_repair_${math.abs(backingFqn.hashCode)}"
        val auxDeltaViews = shape.distinctSlots.map(s =>
          s.j -> s"graft_ivm_dvals_${math.abs(backingFqn.hashCode)}_${s.j}").toMap
        val auxReadViews = shape.distinctSlots.map(s =>
          s.j -> s"graft_ivm_dcur_${math.abs(backingFqn.hashCode)}_${s.j}").toMap
        val moverIdxs = moverIdxsPre
        // left-outer bodies (r15/r16): a LINEAR mover splices directly;
        // a COMP mover (single-leaf right side of a left-outer join)
        // splices via the Griffin–Libkin flip term, built below with
        // its recorded-version pin; a FROZEN mover (anything else on an
        // outer right side) has no term — only the full rebuild
        // expresses it. Decline before any state.
        if (moverIdxs.exists(i => !statusOf(i).exists(_ != MvIncremental.FrozenMover)))
          return None
        val termViews = moverIdxs.indices.map(k => s"${signedView}_t$k")
        // version-pinned scans, one per (root, version) actually used —
        // each a PRIVATE manifest snapshot under _cdf/ (swept below)
        val pinnedScans = scala.collection.mutable.Map.empty[(String, Int),
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]
        // parquet spools of past-the-cap repair restrictions (swept below)
        val repairSpools = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        val persistedDeltas =
          scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
        try {
        // one telescoping term per mover occurrence: that leaf reads
        // its signed (fromV, toV] window at ±1, EARLIER leaves read
        // live, LATER mover occurrences read their recorded manifest
        // (version-pinned scan) — the body's own filter/join structure
        // applies verbatim above each term, and the terms union into
        // one signed view (Δview telescopes over leaf occurrences)
        def classicPlan(df: org.apache.spark.sql.DataFrame) =
          df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
            .queryExecution.analyzed
        val signedByRoot = ms.map(m => m.root ->
          classicPlan(ChangeFeed.signedChanges(spark, m.root, m.fromV, m.toV, nonce))).toMap
        def pinnedAt(r: String, v: Int): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
          pinnedScans.getOrElseUpdate((r, v),
            classicPlan(ChangeFeed.pinnedScan(spark, r, v, nonce)))
        val recordedVerByRoot = ms.map(m => m.root -> m.fromV).toMap
        // the pin version for leaf occurrence j inside the term whose
        // signed occurrence is i (ADVICE r14 — EVERY leaf pins, so the
        // executed delta matches the recorded versions even under a
        // racing source commit): mover occurrences AFTER the signed one
        // read their RECORDED version, everything else reads the
        // recorded HEAD (for unmoved leaves the two coincide)
        def pinVersion(j: Int, signedI: Int): Int = {
          val r = leafRoots(j)
          if (j > signedI && moverRoots.contains(r)) recordedVerByRoot(r)
          else headVerByRoot(r)
        }
        val childNames = shape.aggregate.child.output.map(_.name)
        prof("term-views")(moverIdxs.zipWithIndex.foreach { case (i, k) =>
          val pin = leafRoots.indices.filter(_ != i)
            .map(j => j -> pinnedAt(leafRoots(j), pinVersion(j, i))).toMap
          // a COMP mover's flip set needs the moved leaf's OLD state
          // too: the n0 probe reads it at the RECORDED version (the
          // window's fromV), key-bounded by the window's join keys
          val oldPin =
            if (statusOf(i).contains(MvIncremental.CompMover))
              Some(pinnedAt(leafRoots(i), recordedVerByRoot(leafRoots(i))))
            else None
          val term = MvIncremental.splicedTerm(
            shape, i, signedByRoot(leafRoots(i)), pin, oldPin).getOrElse(return None)
          // normalize column ORDER across terms (the `_sign` tag sits
          // wherever the signed leaf sits in the join output)
          org.apache.spark.sql.graftops.Bridge.ofRows(spark, term)
            .selectExpr((childNames.map(n => s"`$n`") :+ "_sign"): _*)
            .createOrReplaceTempView(termViews(k))
        })
        val signedUnion =
          spark.sql(termViews.map(v => s"SELECT * FROM $v").mkString("\nUNION ALL\n"))
        // DISTINCT slots read the signed window once more (the
        // per-(group, value) delta) on top of the main delta — persist
        // it so the window's files are scanned once either way
        if (shape.distinctSlots.nonEmpty) {
          signedUnion.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          persistedDeltas += signedUnion
        }
        signedUnion.createOrReplaceTempView(signedView)
        // each DISTINCT slot (r15): the window's per-(group, value) net
        // counts, plus a PATH-based read of the liveness table (a temp
        // view over a catalog-resolved relation trips Spark 4.1's
        // MERGE analysis). The liveness table is only ever mutated
        // under this view's refresh lock, so the live read is stable.
        shape.distinctSlots.foreach { s =>
          val auxDelta = spark.sql(MvIncremental.auxDeltaSql(shape, s, signedView))
          // consumed by the distinct leg AND the liveness merge — one
          // signed-window scan, not two
          auxDelta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          persistedDeltas += auxDelta
          auxDelta.createOrReplaceTempView(auxDeltaViews(s.j))
          val auxRoot = nsDir.resolve(auxNameByJ(s.j)).toString
          // PIN the liveness read at its pre-refresh version (r17): the
          // delta's distinct leg must read PRE-merge liveness state,
          // which a live read only guarantees if the liveness MERGE
          // runs strictly after the main MERGE (and even then only
          // because nothing recomputes the delta afterwards). A pinned
          // manifest snapshot makes the pre-merge read hold BY
          // CONSTRUCTION — any re-plan or recompute still sees the old
          // state — which is what lets the main and liveness MERGEs
          // below run CONCURRENTLY (guide §2.6). Registered in
          // pinnedScans, so the finally sweeps the snapshot.
          val auxRead = org.apache.spark.sql.graftops.Bridge.ofRows(spark,
            pinnedAt(auxRoot, JsonlStats.currentVersion(auxRoot)))
          // the leg's LEFT JOIN only ever matches inside the window's
          // group bounds — range-restrict the liveness read so
          // clustered grains prune its files instead of scanning the
          // whole value-grain table per refresh (null class only when
          // the window holds null group values)
          import org.apache.spark.sql.functions.{col => fcol, lit => flit,
            min => fmin, max => fmax, when => fwhen}
          val gNames = shape.groupOuts.map(_.name)
          val b = prof("aux-bounds-head")(auxDelta.select(gNames.flatMap(n => Seq(
            fmin(fcol(s"`$n`")), fmax(fcol(s"`$n`")),
            org.apache.spark.sql.functions.sum(
              fwhen(fcol(s"`$n`").isNull, 1L).otherwise(0L)))): _*).head())
          val restricted = gNames.zipWithIndex.foldLeft(auxRead) { case (df, (n, i)) =>
            if (b.isNullAt(3 * i)) df.filter(fcol(s"`$n`").isNull)
            else {
              val range = fcol(s"`$n`") >= flit(b.get(3 * i)) &&
                fcol(s"`$n`") <= flit(b.get(3 * i + 1))
              val hasNull = !b.isNullAt(3 * i + 2) && b.getLong(3 * i + 2) > 0
              df.filter(if (hasNull) range || fcol(s"`$n`").isNull else range)
            }
          }
          restricted.createOrReplaceTempView(auxReadViews(s.j))
        }
        val delta = prof("delta-analyze")(spark.sql(
          MvIncremental.deltaSql(shape, signedView, auxReadViews, auxDeltaViews)))
        // the delta is consumed several times on deleting windows (the
        // affected-group probe, the repair restriction's bounds and
        // semi-join build, the maintenance MERGE itself) — persist it
        // so the signed window is SCANNED ONCE however many consumers
        // read it (delta-sized state, spills if ever large)
        delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persistedDeltas += delta
        delta.createOrReplaceTempView(deltaView)
        val merge = MvIncremental.mergeSql(shape, backingFqn, deltaView)
        // analyze WITHOUT executing (spark.sql would run the command
        // eagerly): unresolvable merges decline here, before any state
        prof("merge-analyze")(spark.sessionState.executePlan(
          spark.sessionState.sqlParser.parsePlan(merge)).assertAnalyzed())
        // liveness-table merges (r15), one per DISTINCT slot — analyzed
        // up front like everything else, EXECUTED after the main merge
        // (whose delta leg must read the PRE-merge liveness state)
        val auxMerges = shape.distinctSlots.map { s =>
          val auxFqn = (catName +: (ident.namespace().toSeq :+ auxNameByJ(s.j)))
            .map(p => s"`$p`").mkString(".")
          MvIncremental.auxMergeSql(shape, auxFqn, auxDeltaViews(s.j))
        }
        auxMerges.foreach(m => spark.sessionState.executePlan(
          spark.sessionState.sqlParser.parsePlan(m)).assertAnalyzed())
        // group-scoped MIN/MAX repair plan, built and analyzed BEFORE
        // any state moves. Two restriction strategies by affected-group
        // cardinality (r15 — the cap no longer forces RTAS):
        //   - up to `spark.graft.mv.repairMaxGroups` (10k): a driver
        //     IN-list per grain column, which the connector's file
        //     pruning understands (a per-column list is a SUPERSET of
        //     the affected tuples — the matched-only repair merge
        //     ignores the extras).
        //   - past the cap: a LEFT-SEMI join of the pinned source
        //     against the delta's distinct groups — unbounded group
        //     count, no driver materialization. No broadcast HINT
        //     (ADVICE r15): past the cap is exactly the regime where
        //     the group set can be huge, and a hint ignores
        //     autoBroadcastJoinThreshold — the planner picks broadcast
        //     when the build side is actually small, shuffles otherwise.
        // Either way the repair rows land in a private parquet spool
        // the MERGE reads back — never the driver (ADVICE r15 task 9;
        // also: a temp view over a resolved catalog relation trips
        // Spark 4.1's MERGE analysis, a parquet relation doesn't).
        val repairMerge: Option[String] = if (!needsRepair) None else {
          import org.apache.spark.sql.functions.{col => fcol, expr => fexpr, lit => flit}
          val maxGroups = spark.conf.getOption("spark.graft.mv.repairMaxGroups")
            .map(_.toInt).getOrElse(10000)
          val groupCols = shape.groupOuts.map(_.name)
          val affected = prof("repair-affected")(delta.select(groupCols.map(n => fcol(s"`$n`")): _*)
            .distinct().limit(maxGroups + 1).collect())
          if (affected.isEmpty) None
          else {
            // the repair reads the source at the recorded HEAD versions
            // (every leaf pinned), never live — ADVICE r14: a racing
            // source commit would otherwise repair extrema from data
            // newer than the versions this refresh records
            val pinnedAll = leafRoots.indices
              .map(j => j -> pinnedAt(leafRoots(j), headVerByRoot(leafRoots(j)))).toMap
            val src = org.apache.spark.sql.graftops.Bridge.ofRows(
              spark, MvIncremental.pinnedChild(shape, pinnedAll).getOrElse(return None))
            val mmAggs = MvIncremental.minMaxSlots(shape).map(s =>
              fexpr(s.deltaSql).as(s.aux))
            def grouped(restricted: org.apache.spark.sql.DataFrame) =
              restricted.groupBy(shape.groupOuts.map(o =>
                fexpr(o.groupSql.get).as(o.name)): _*)
                .agg(mmAggs.head, mmAggs.tail: _*)
            def spool(repairSrc: org.apache.spark.sql.DataFrame): Unit = {
              val tmp = java.nio.file.Files.createTempDirectory("graft_ivm_repair")
              repairSpools += tmp
              repairSrc.write.mode("overwrite").parquet(tmp.toString)
              spark.read.parquet(tmp.toString).createOrReplaceTempView(repairView)
            }
            if (affected.length <= maxGroups) {
              val conds = shape.groupOuts.zipWithIndex.map { case (o, i) =>
                val e = fexpr(o.groupSql.get)
                val vals = affected.map(_.get(i)).toSeq
                val nonNull = vals.filter(_ != null).distinct
                val inList =
                  if (nonNull.isEmpty) flit(false) else e.isin(nonNull: _*)
                if (vals.contains(null)) inList || e.isNull else inList
              }
              prof("repair-spool")(spool(grouped(src.filter(conds.reduce(_ && _)))))
            } else {
              val gdf = delta.select(shape.groupOuts.zipWithIndex.map { case (o, i) =>
                fcol(s"`${o.name}`").as(s"graft_ivm_g$i") }: _*).distinct()
              val cond = shape.groupOuts.zipWithIndex.map { case (o, i) =>
                fexpr(o.groupSql.get) <=> fcol(s"`graft_ivm_g$i`") }.reduce(_ && _)
              // per-grain RANGE bounds of the affected groups ride as an
              // extra pushable filter: the semi-join restricts exactly,
              // the [min, max] band (plus the null class ONLY when the
              // delta actually has null group values — an always-on OR
              // IS NULL disjunct would block partition/file pruning) is
              // a SUPERSET the connector's file pruning understands —
              // clustered grains keep their pruning at any cardinality
              import org.apache.spark.sql.functions.{min => fmin, max => fmax, sum => fsum}
              val bounds = delta.select(shape.groupOuts.flatMap(o => Seq(
                fmin(fcol(s"`${o.name}`")), fmax(fcol(s"`${o.name}`")),
                fsum(org.apache.spark.sql.functions.when(
                  fcol(s"`${o.name}`").isNull, 1L).otherwise(0L)))): _*).head()
              val rangeConds = shape.groupOuts.zipWithIndex.map { case (o, i) =>
                val e = fexpr(o.groupSql.get)
                val hasNull = !bounds.isNullAt(3 * i + 2) && bounds.getLong(3 * i + 2) > 0
                if (bounds.isNullAt(3 * i)) e.isNull
                else {
                  val range = e >= flit(bounds.get(3 * i)) && e <= flit(bounds.get(3 * i + 1))
                  if (hasNull) range || e.isNull else range
                }
              }
              spool(grouped(src.filter(rangeConds.reduce(_ && _))
                .join(gdf, cond, "left_semi")))
            }
            val sql = MvIncremental.repairMergeSql(shape, backingFqn, repairView)
            spark.sessionState.executePlan(
              spark.sessionState.sqlParser.parsePlan(sql)).assertAnalyzed()
            Some(sql)
          }
        }
        // pending bracket: marker down, the MERGE(s), marker up with
        // the new versions. A crash inside the bracket leaves the
        // marker standing — reads stay on the body path, repair is RTAS
        // (the bracket covers the gap BETWEEN the two merges too: a
        // half-repaired backing is never served).
        GraftViews.write(nsDir, d.copy(properties = d.properties +
          (GraftViews.MvPendingProp ->
            ms.map(m => s"${m.fromV}->${m.toV}").mkString(","))), replace = true)
        // Cost-based ELISION of Spark's runtime group-filter subquery
        // (r17, guide §3.2's own logic turned around): for group-based
        // row-level ops the optimizer injects a runtime subquery that
        // pre-computes the affected _file set so the rewrite prunes
        // unaffected files — one extra subquery JOB per MERGE whose
        // only possible benefit is the files it prunes. When the
        // TARGET fits in a single scan task (total bytes ≤
        // maxPartitionBytes over at most a handful of files) the prune
        // can never repay the job, exactly the inverse of the
        // application-side-size threshold Spark's runtime bloom-filter
        // injection uses. The gate reads the target's ACTUAL manifest:
        // a large backing at cluster scale keeps its group filter
        // automatically (past 64 manifest entries the gate does not
        // even stat the files). Semantics are unchanged either way —
        // the filter is purely a rewrite-set prune; without it the
        // rewrite re-emits unmatched rows of unpruned files verbatim.
        val gfKey = "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled"
        def singleTaskTable(r: String): Boolean = {
          val st = JsonlStats.readStats(r)
          st.length <= 64 && {
            val bytes = st.iterator.map { e =>
              try Files.size(Paths.get(r, e.file))
              catch { case _: Exception => Long.MaxValue / 128 }
            }.sum
            bytes <= spark.sessionState.conf.filesMaxPartitionBytes
          }
        }
        val backingRoot = nsDir.resolve(
          d.properties(GraftViews.MvTableProp)).toString
        val elideGroupFilter = singleTaskTable(backingRoot) &&
          auxNameByJ.values.forall(an => singleTaskTable(nsDir.resolve(an).toString))
        val gfSaved = spark.conf.getOption(gfKey)
        if (elideGroupFilter) spark.conf.set(gfKey, "false")
        try {
          if (profOn && sys.env.contains("GRAFT_MV_EXPLAIN"))
            spark.sql("EXPLAIN FORMATTED " + merge).collect()
              .foreach(r => System.err.println(r.getString(0)))
          if (auxMerges.isEmpty) {
            prof("main-merge")(spark.sql(merge))
            prof("repair-merge")(repairMerge.foreach(spark.sql(_)))
          } else {
            // main MERGE (+ its dependent repair) and the liveness
            // MERGEs run CONCURRENTLY (r17, guide §2.6 / VERDICT r16
            // #1 "fuse aux/liveness MERGEs where ordering allows").
            // Ordering is free to drop because (a) the delta's
            // distinct leg reads the liveness state through the
            // version-PINNED snapshot above — the liveness commit
            // cannot change what any plan or recompute of the delta
            // sees; (b) the two chains mutate DISJOINT tables, each
            // behind its own atomic manifest swap; (c) both run inside
            // the same pending bracket, so a failure of either leaves
            // the marker standing exactly as the sequential code did.
            // The repair MERGE stays ordered after the main MERGE (it
            // reads post-merge backing state by design).
            import java.util.concurrent.{Executors, TimeUnit}
            val pool = Executors.newFixedThreadPool(2)
            try {
              def task(label: String)(body: => Unit) = pool.submit(
                new java.util.concurrent.Callable[Unit] {
                  override def call(): Unit = {
                    org.apache.spark.sql.classic.SparkSession
                      .setActiveSession(spark
                        .asInstanceOf[org.apache.spark.sql.classic.SparkSession])
                    prof(label)(body)
                  }
                })
              val mainF = task("main-merge") {
                spark.sql(merge)
                repairMerge.foreach(spark.sql(_))
              }
              val auxF = task("aux-merges")(auxMerges.foreach(spark.sql(_)))
              // surface the FIRST failure after both settle (get()
              // rethrows), so the catch below sees it with no thread
              // still mutating state
              val errs = Seq(mainF, auxF).flatMap(f =>
                try { f.get(); None } catch { case t: Throwable => Some(t) })
              errs.headOption.foreach(t => throw (t.getCause match {
                case e: Exception => e
                case _ => t
              }))
            } finally { pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS) }
          }
          prof("sidecar-write")(GraftViews.write(nsDir, d.copy(properties = d.properties +
            (GraftViews.MvSourcesProp -> GraftViews.mvSourcesEncode(head))
            - GraftViews.MvPendingProp), replace = true))
          Some(if (needsRepair) "incremental-repair" else "incremental")
        } catch {
          case _: Exception =>
            // once spark.sql(merge) has been INVOKED, a failure cannot
            // prove the first MERGE did not commit (the repair merge,
            // or the version re-record, may be what failed) — so the
            // marker STAYS STANDING (ADVICE r14): reads keep taking the
            // correct body path, and whichever refresh completes next
            // is forced through the full RTAS, which clears the marker
            // AFTER the rebuild commits. Clearing it here would open a
            // crash window (marker gone, half-applied backing, stale
            // recorded versions) in which the same delta window could
            // be applied twice.
            None
        } finally {
          if (elideGroupFilter) gfSaved match {
            case Some(v) => spark.conf.set(gfKey, v)
            case None => spark.conf.unset(gfKey)
          }
        }
        } finally {
          // every exit path — success, merge failure, or a decline
          // AFTER temp views were created (a failed splice term, the
          // repair cap) — drops the session temp views it created and
          // sweeps the derived _cdf manifests: the signed window pair
          // per mover plus every version-pin snapshot. Nothing else
          // (vacuum included) would ever sweep them (ADVICE r13/r14).
          termViews.foreach(spark.catalog.dropTempView)
          spark.catalog.dropTempView(signedView)
          spark.catalog.dropTempView(deltaView)
          spark.catalog.dropTempView(repairView)
          auxDeltaViews.values.foreach(spark.catalog.dropTempView)
          auxReadViews.values.foreach(spark.catalog.dropTempView)
          ms.foreach(m => ChangeFeed.signedManifests(m.root, m.fromV, m.toV, nonce)
            .foreach(java.nio.file.Files.deleteIfExists))
          pinnedScans.keys.foreach { case (r, v) =>
            java.nio.file.Files.deleteIfExists(ChangeFeed.pinnedManifest(r, v, nonce)) }
          repairSpools.foreach(p => graft.util.Fs.deleteRecursively(p.toString))
          persistedDeltas.foreach(_.unpersist(false))
        }
      } catch {
        case e: Exception => // any unprovable leg: RTAS
          if (sys.env.contains("GRAFT_IVM_DEBUG")) e.printStackTrace()
          None
      }
    }
  }
}
