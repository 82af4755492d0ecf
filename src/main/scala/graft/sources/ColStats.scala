package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** TABLE-LEVEL COLUMN STATISTICS (r9c) — the Iceberg Puffin /
  * `ANALYZE TABLE` shape: NDV and length statistics live in a sidecar
  * written by an explicit `CALL analyze_table` scan, NOT per commit —
  * distinct counts don't merge from per-file numbers (union ≠ sum), so
  * a mergeable-per-commit design would either lie or ship a sketch per
  * file per column (100k files × columns of HLL bytes through every
  * planning pass). The scan serves them to Spark through the DSv2
  * `Statistics.columnStats()` API, which CBO converts to per-attribute
  * catalyst stats — join-cardinality estimation and cost-based join
  * REORDERING then work on connector tables exactly as on ANALYZEd
  * parquet ones.
  *
  * Division of labor, by freshness: min/max and null counts are served
  * LIVE from the manifest (exact per-file bounds and non-null counts,
  * current at every commit — never from this sidecar); the sidecar
  * carries only what a full scan must compute (NDV via HLL++, string
  * lengths) and records the table VERSION it saw. Stale stats are
  * served anyway (the Iceberg posture — an estimate beats none), with
  * NDV capped at the scan's surviving live rows so growth can't make
  * the estimate impossible; staleness is visible in the CALL output
  * and `analyzed_version` here. Advisory metadata: no protocol feature
  * gate — a stats-blind reader plans worse, never wrong. */
object ColStats {
  val Sidecar = "_colstats.json"

  /** Per-column analyze results, keyed by PHYSICAL name (rename-stable,
    * like data bytes and eq_on). `avgLen`/`maxLen` are -1 for non-string
    * columns (type width is the reader's business). `hist` is the
    * optional equi-height histogram — (rows per bin, [(lo, hi, ndv)]),
    * the catalyst `Histogram` shape FilterEstimation interpolates range
    * selectivity from. */
  final case class ColStat(ndv: Long, avgLen: Long, maxLen: Long,
                           hist: Option[(Double, Seq[(Double, Double, Long)])] = None)
  final case class TableColStats(version: Int, analyzedMs: Long, rows: Long,
                                 cols: Map[String, ColStat])

  def write(root: String, s: TableColStats): Unit = {
    val mapper = new ObjectMapper()
    val n = mapper.createObjectNode()
    n.put("analyzed_version", s.version)
    n.put("analyzed_ms", s.analyzedMs)
    n.put("rows", s.rows)
    val cs = n.putObject("cols")
    s.cols.toSeq.sortBy(_._1).foreach { case (c, st) =>
      val o = cs.putObject(c)
      o.put("ndv", st.ndv)
      if (st.avgLen >= 0) o.put("avg_len", st.avgLen)
      if (st.maxLen >= 0) o.put("max_len", st.maxLen)
      st.hist.foreach { case (h, bins) =>
        val ho = o.putObject("hist")
        ho.put("h", h)
        val ba = ho.putArray("bins")
        bins.foreach { case (lo, hi, ndv) =>
          val b = ba.addArray(); b.add(lo); b.add(hi); b.add(ndv)
        }
      }
    }
    val tmp = Paths.get(root, s"$Sidecar.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, Seq(n.toString).asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(root, Sidecar),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def read(root: String): Option[TableColStats] = {
    val p = Paths.get(root, Sidecar)
    if (!Files.exists(p)) return None
    val n = new ObjectMapper().readTree(Files.readAllBytes(p))
    val cols = n.get("cols")
    Some(TableColStats(
      n.get("analyzed_version").asInt(), n.get("analyzed_ms").asLong(),
      n.get("rows").asLong(),
      cols.properties().asScala.map { e =>
        val v = e.getValue
        val hist = Option(v.get("hist")).map { h =>
          (h.get("h").asDouble(),
            (0 until h.get("bins").size()).map { i =>
              val b = h.get("bins").get(i)
              (b.get(0).asDouble(), b.get(1).asDouble(), b.get(2).asLong())
            }.toSeq)
        }
        e.getKey -> ColStat(v.get("ndv").asLong(),
          if (v.hasNonNull("avg_len")) v.get("avg_len").asLong() else -1L,
          if (v.hasNonNull("max_len")) v.get("max_len").asLong() else -1L,
          hist)
      }.toMap))
  }

  // ---------------------------------------------------------------------------
  // Incremental ANALYZE (r15): per-file MERGEABLE sketches, maintained
  // by ANALYZE itself.
  //
  // The r9c design note above still holds for COMMITS — shipping a
  // sketch per file per column through every write would tax every
  // write path. But ANALYZE re-reading the WHOLE table when one
  // partition landed is the same waste at maintenance cadence: at
  // 100 TB the nightly stats pass re-scanned a year to see a day. So
  // ANALYZE now keeps its own sidecar cache (`_colstats_files.jsonl`):
  // one line per LIVE FILE IDENTITY — (file, deletion vectors,
  // applicable equality deletes), the change-feed identity, so a
  // masked or rewritten file re-sketches — carrying a DataSketches HLL
  // sketch per column (mergeable, unlike a bare HLL++ number) plus
  // exact row/length moments. The ANALYZE pass scans ONLY identities
  // missing from the cache (a derived-manifest scan, the change-feed
  // trick), merges every live identity's sketches, and prunes dropped
  // identities — cost ∝ the DELTA, never table size. NDV values are
  // sketched over 64-bit column hashes (uniform across types; ~2%
  // relative error at lgK=12, exact at small cardinalities); row
  // counts and string-length stats merge exactly.
  // ---------------------------------------------------------------------------

  val FilesSidecar = "_colstats_files.jsonl"
  private val LgK = 12

  /** Per-(file identity, column) mergeable state: the HLL sketch bytes
    * (empty = no non-null values seen) and exact string-length moments
    * (-1 when not a string column). */
  final case class ColSketch(sk: Array[Byte], lenSum: Long, lenMax: Long, lenCnt: Long)
  final case class FileSketches(id: String, rows: Long, cols: Map[String, ColSketch])

  private def writeFileSketches(root: String, all: Seq[FileSketches]): Unit = {
    val mapper = new ObjectMapper()
    val lines = all.map { fs =>
      val n = mapper.createObjectNode()
      n.put("id", fs.id)
      n.put("rows", fs.rows)
      val cs = n.putObject("cols")
      fs.cols.toSeq.sortBy(_._1).foreach { case (c, st) =>
        val o = cs.putObject(c)
        o.put("sk", java.util.Base64.getEncoder.encodeToString(st.sk))
        if (st.lenSum >= 0) o.put("ls", st.lenSum)
        if (st.lenMax >= 0) o.put("lm", st.lenMax)
        if (st.lenCnt >= 0) o.put("lc", st.lenCnt)
      }
      n.toString
    }
    val tmp = Paths.get(root,
      s"$FilesSidecar.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(root, FilesSidecar),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def readFileSketches(root: String): Map[String, FileSketches] = {
    val p = Paths.get(root, FilesSidecar)
    if (!Files.exists(p)) return Map.empty
    val mapper = new ObjectMapper()
    Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      val cols = n.get("cols").properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> ColSketch(
          java.util.Base64.getDecoder.decode(v.get("sk").asText()),
          if (v.hasNonNull("ls")) v.get("ls").asLong() else -1L,
          if (v.hasNonNull("lm")) v.get("lm").asLong() else -1L,
          if (v.hasNonNull("lc")) v.get("lc").asLong() else -1L)
      }.toMap
      val fs = FileSketches(n.get("id").asText(), n.get("rows").asLong(), cols)
      fs.id -> fs
    }.toMap
  }

  /** The delta-proportional ANALYZE: scan only live file identities
    * missing from the sketch cache, merge everything live, prune the
    * rest. Returns the stats and how many files were actually read. */
  def analyzeIncremental(spark: SparkSession, tableRoot: String): (TableColStats, Int) = {
    import org.apache.spark.sql.functions._
    val meta = JsonlStats.readTableMeta(tableRoot)
    val statsCol = meta.statsCol.getOrElse(JsonlStats.statsColumn)
    def mkReader = {
      var r = spark.read.format("graft-jsonl-stats")
        .option("path", tableRoot).option("statsColumn", statsCol)
      meta.schema.foreach(s => r = r.schema(s))
      r
    }
    val schema = mkReader.load().schema
    val physOf: Map[String, String] =
      schema.fields.map(f => f.name -> meta.columnMapping.getOrElse(f.name, f.name)).toMap
    // TOCTOU guard (ADVICE r15, same discipline as ChangeFeed.statsAt):
    // version, manifest and eq-deletes are three separate live reads —
    // a commit racing them could pair version N with version N+1's
    // file set (or a torn manifest), recording a misleading
    // analyzed_version over a mixed identity set. Re-check the version
    // AFTER reading; if the table advanced, re-read at the new head —
    // each retry observes a strictly newer version, so this terminates
    // as soon as no commit races the read.
    @annotation.tailrec
    def liveAtOneVersion(): (Int, Seq[JsonlStats.FileStats],
        Seq[JsonlEqualityDeletes.EqDelete]) = {
      val v = JsonlStats.currentVersion(tableRoot)
      val stats = JsonlStats.readStats(tableRoot)
      val eqs = JsonlEqualityDeletes.readEqDeletes(tableRoot, "_stats.jsonl")
      if (JsonlStats.currentVersion(tableRoot) != v) liveAtOneVersion()
      else (v, stats, eqs)
    }
    val (version, stats, eqs) = liveAtOneVersion()
    def identOf(s: JsonlStats.FileStats): String =
      s.file + "|" + s.dvs.sorted.mkString(",") + "|" +
        eqs.filter(_.seq > s.seq).map(_.file).sorted.mkString(",")
    val live: Seq[(JsonlStats.FileStats, String)] = stats.map(s => (s, identOf(s)))
    // a cached line is usable only if it covers every CURRENT column
    // (schema evolution invalidates per-file state the cheap way: that
    // file re-sketches)
    val cache = readFileSketches(tableRoot).filter { case (_, fs) =>
      physOf.values.forall(fs.cols.contains)
    }
    val missing = live.filterNot { case (_, id) => cache.contains(id) }
    val fresh: Map[String, FileSketches] = if (missing.isEmpty) Map.empty else {
      val name = s"_cdf/colstats_${java.util.UUID.randomUUID().toString.take(8)}.jsonl"
      Files.createDirectories(Paths.get(tableRoot, "_cdf"))
      Files.write(Paths.get(tableRoot, name),
        (missing.map(m => JsonlStats.statsLine(m._1)) ++
          eqs.map(JsonlEqualityDeletes.line)).asJava,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      try {
        val df = mkReader.option("manifest", name).load()
        val aggs = schema.fields.flatMap { f =>
          // NDV over the 64-bit column hash: uniform across types
          // (doubles/timestamps/decimals have no native sketch input),
          // null-guarded so nulls never count as a value
          val sk = hll_sketch_agg(
            when(col(f.name).isNotNull, xxhash64(col(f.name))), lit(LgK))
            .as(s"sk_${f.name}")
          f.dataType match {
            case StringType => Seq(sk,
              sum(length(col(f.name))).cast("long").as(s"ls_${f.name}"),
              max(length(col(f.name))).cast("long").as(s"lm_${f.name}"),
              count(col(f.name)).as(s"lc_${f.name}"))
            case _ => Seq(sk)
          }
        }
        val perFile = df.groupBy(col(JsonlStats.FileMeta).as("__f"))
          .agg(count(lit(1)).as("__rows"), aggs.toIndexedSeq: _*).collect()
        val byAbs = missing.map { case (s, id) =>
          Paths.get(tableRoot, s.file).toAbsolutePath.normalize.toString -> id }.toMap
        def colsOf(r: org.apache.spark.sql.Row): Map[String, ColSketch] =
          schema.fields.map { f =>
            def longAt(n: String): Long = {
              val i = r.fieldIndex(n); if (r.isNullAt(i)) -1L else r.getLong(i)
            }
            val ski = r.fieldIndex(s"sk_${f.name}")
            val sk = if (r.isNullAt(ski)) Array.emptyByteArray
              else r.getAs[Array[Byte]](ski)
            val (ls, lm, lc) = f.dataType match {
              case StringType =>
                (math.max(0L, longAt(s"ls_${f.name}")), longAt(s"lm_${f.name}"),
                  longAt(s"lc_${f.name}"))
              case _ => (-1L, -1L, -1L)
            }
            physOf(f.name) -> ColSketch(sk, ls, lm, lc)
          }.toMap
        val scanned = perFile.map { r =>
          val id = byAbs(Paths.get(r.getString(r.fieldIndex("__f")))
            .toAbsolutePath.normalize.toString)
          id -> FileSketches(id, r.getAs[Long]("__rows"), colsOf(r))
        }.toMap
        // fully-masked files produce no group row — record them empty
        // so they never rescan
        val emptyCols = schema.fields.map(f => physOf(f.name) ->
          ColSketch(Array.emptyByteArray,
            if (f.dataType == StringType) 0L else -1L,
            -1L, if (f.dataType == StringType) 0L else -1L)).toMap
        missing.map { case (_, id) =>
          id -> scanned.getOrElse(id, FileSketches(id, 0L, emptyCols))
        }.toMap
      } finally Files.deleteIfExists(Paths.get(tableRoot, name))
    }
    val all: Seq[FileSketches] = live.map { case (_, id) =>
      cache.getOrElse(id, fresh(id)) }
    val totalRows = all.map(_.rows).sum
    import org.apache.datasketches.hll.{HllSketch, Union}
    val cols = schema.fields.map { f =>
      val phys = physOf(f.name)
      val states = all.map(_.cols(phys))
      val u = new Union(LgK)
      states.filter(_.sk.nonEmpty).foreach(b => u.update(HllSketch.heapify(b.sk)))
      val ndv = Math.round(u.getEstimate)
      val (a, m) = f.dataType match {
        case StringType =>
          val cnt = states.map(s => math.max(0L, s.lenCnt)).sum
          val sumL = states.map(s => math.max(0L, s.lenSum)).sum
          val maxL = states.map(_.lenMax).max
          (if (cnt > 0) math.ceil(sumL.toDouble / cnt.toDouble).toLong else -1L,
            if (maxL >= 0) maxL else -1L)
        case _ => (-1L, -1L)
      }
      phys -> ColStat(ndv, a, m, None)
    }.toMap
    writeFileSketches(tableRoot, all)
    val s = TableColStats(version, System.currentTimeMillis(), totalRows, cols)
    write(tableRoot, s)
    (s, missing.size)
  }

  /** ONE distributed pass over the live table: HLL++ NDV (relative
    * error ~2.5% at rsd=0.025 — the tradeoff every warehouse ANALYZE
    * makes; exact NDV is a full shuffle of every distinct value) plus
    * string length moments, all map-side-combinable aggregates in a
    * single scan whatever the column count. Masked rows (DVs, equality
    * deletes) are excluded by construction — the scan IS the read
    * path. Since r15 this full pass serves the HISTOGRAM request (a
    * bounded second pass per column, inherently non-incremental);
    * plain ANALYZE routes through [[analyzeIncremental]]. */
  def analyze(spark: SparkSession, tableRoot: String,
              histogram: Boolean = false, histBins: Int = 32,
              histCols: Option[Seq[String]] = None): TableColStats = {
    if (!histogram) return analyzeIncremental(spark, tableRoot)._1
    import org.apache.spark.sql.functions._
    val meta = JsonlStats.readTableMeta(tableRoot)
    val statsCol = meta.statsCol.getOrElse(JsonlStats.statsColumn)
    var reader = spark.read.format("graft-jsonl-stats")
      .option("path", tableRoot).option("statsColumn", statsCol)
    meta.schema.foreach(s => reader = reader.schema(s))
    val df = reader.load()
    val version = JsonlStats.currentVersion(tableRoot)
    val aggs = df.schema.fields.flatMap { f =>
      val base = Seq(approx_count_distinct(col(f.name), 0.025).as(s"ndv_${f.name}"))
      f.dataType match {
        case StringType => base ++ Seq(
          ceil(avg(length(col(f.name)))).cast("long").as(s"avg_${f.name}"),
          max(length(col(f.name))).cast("long").as(s"max_${f.name}"))
        case _ => base
      }
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs.toIndexedSeq: _*).head()
    def longOf(name: String): Long =
      if (row.isNullAt(row.fieldIndex(name))) -1L else row.getLong(row.fieldIndex(name))
    // EQUI-HEIGHT HISTOGRAMS (opt-in — a second bounded pass per numeric
    // column, the cost Spark's own ANALYZE ... FOR COLUMNS pays):
    // approximate quantiles cut the value domain into equal-mass bins,
    // then one group-by counts each bin's NDV — FilterEstimation can
    // then interpolate range selectivity inside a bin instead of
    // assuming uniformity over [min, max], which is what makes skewed
    // predicates (hot user, recent day) estimate honestly.
    def histOf(f: StructField): Option[(Double, Seq[(Double, Double, Long)])] = {
      if (!histogram) return None
      if (histCols.exists(cs => !cs.contains(f.name))) return None
      if (f.dataType != LongType && f.dataType != DoubleType) return None
      val probs = (0 to histBins).map(_.toDouble / histBins).toArray
      val cuts = df.stat.approxQuantile(f.name, probs, 0.001)
      if (cuts.length < 2) return None
      val nonNull = df.filter(col(f.name).isNotNull)
      val n = nonNull.count()
      if (n == 0) return None
      // merge duplicate cuts (constant stretches) — bins must be
      // non-degenerate for the bucketizer below
      val edges = cuts.distinct.sorted
      if (edges.length < 2) {
        // single-valued column: one bin holding everything
        return Some((n.toDouble, Seq((edges.head, edges.head, 1L))))
      }
      // bucket index: the last edge is inclusive (standard equi-height)
      val c = col(f.name).cast("double")
      val idx = edges.toSeq.sliding(2).zipWithIndex.foldLeft(lit(edges.length - 2)) {
        case (acc, (Seq(lo, hi), i)) =>
          when(c >= lit(lo) && c < lit(hi), lit(i)).otherwise(acc)
      }
      val perBin = nonNull.groupBy(idx.as("__bin"))
        .agg(approx_count_distinct(col(f.name), 0.025).as("__ndv"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val bins = edges.sliding(2).zipWithIndex.map { case (Array(lo, hi), i) =>
        (lo, hi, math.max(1L, perBin.getOrElse(i, 0L)))
      }.toSeq
      Some((n.toDouble / bins.length, bins))
    }
    val cols = df.schema.fields.map { f =>
      val phys = meta.columnMapping.getOrElse(f.name, f.name)
      val (a, m) = f.dataType match {
        case StringType => (longOf(s"avg_${f.name}"), longOf(s"max_${f.name}"))
        case _          => (-1L, -1L)
      }
      phys -> ColStat(longOf(s"ndv_${f.name}"), a, m, histOf(f))
    }.toMap
    val s = TableColStats(version, System.currentTimeMillis(), row.getAs[Long]("n_rows"), cols)
    write(tableRoot, s)
    s
  }
}
