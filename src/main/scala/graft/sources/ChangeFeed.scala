package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Change data feed over the manifest protocol — "what changed between
  * version F and version T" as a DataFrame, the Delta
  * `table_changes` / Iceberg incremental-read shape rebuilt on this
  * engine's commit primitives (reference pipeline motivation:
  * `/root/reference/Assets/Jobs/dag_streamflow_warehouse.py:118-126`'s
  * MERGE-refresh consumers, which want deltas, not full re-reads).
  *
  * Why it scales: a generation diff at the FILE level is pure manifest
  * arithmetic (metadata-sized, on the driver — the same trust-the-
  * manifest stance as planning). Files present in both versions are
  * untouched by construction (data files are immutable; every write
  * path publishes new names), so the row-level work — a full-outer
  * join keyed on the table's unique key — runs over ONLY the rows of
  * files that entered or left the manifest: cost is proportional to
  * the CHANGED data, never to table size. Copy-on-write noise (a
  * rewritten file re-emits its untouched rows) cancels in the join:
  * rows whose pre and post images agree are dropped.
  *
  * The diff file-sets are materialized as two derived manifests under
  * `_cdf/` (deterministic names, overwritten per call) and read back
  * through the connector itself via its `manifest` option — so column
  * pruning, byte-range splits and residual filters all apply to the
  * change scan like any other. */
object ChangeFeed {

  /** Resolve version v of the table rooted at `root` to its manifest
    * path (relative to root), failing with the retention story when
    * the generation was vacuumed. */
  private[sources] def manifestOf(root: String, v: Int): String = {
    val current = JsonlStats.currentVersion(root)
    require(v >= 1 && v <= current, s"no version $v of $root (versions 1..$current)")
    if (v == current) "_stats.jsonl"
    else {
      val m = s"${JsonlStats.HistoryDir}/v$v.jsonl"
      if (!Files.exists(Paths.get(root, m)))
        throw new IllegalArgumentException(
          s"version $v of $root has been vacuumed (oldest available: " +
            s"${JsonlStats.readVacuumHorizon(root).map(_.minVersion).getOrElse(current)})")
      m
    }
  }

  /** Version v's manifest entries (file stats + equality-delete lines)
    * with a TOCTOU guard: when v resolves to the LIVE `_stats.jsonl`, a
    * commit racing the read can overwrite the file mid-read — so after
    * reading, re-check the current version; if the table advanced, v's
    * content is now frozen in its immutable `_history/vN.jsonl` and the
    * re-resolve reads that instead. One retry suffices: history files
    * never change after publication. */
  private def statsAt(root: String, v: Int)
      : (Seq[JsonlStats.FileStats], Seq[JsonlEqualityDeletes.EqDelete]) = {
    val m = manifestOf(root, v)
    val stats = JsonlStats.readStats(root, m)
    val eqs = JsonlEqualityDeletes.readEqDeletes(root, m)
    if (m == "_stats.jsonl" && JsonlStats.currentVersion(root) != v) statsAt(root, v)
    else (stats, eqs)
  }

  /** Version `v` of the table as a DataFrame over a PRIVATE manifest
    * snapshot materialized under `_cdf/` (ADVICE r14): reading the live
    * `_stats.jsonl` cannot pin anything — a source commit racing the
    * caller advances the scanned file set between planning and
    * execution. This copy is immutable, so the incremental MV refresh
    * version-pins EVERY leaf occurrence on it and the executed delta
    * exactly matches the versions it records. Callers sweep the file
    * via [[pinnedManifest]] once the plan has been consumed. */
  def pinnedScan(spark: SparkSession, root: String, v: Int, nonce: String): DataFrame = {
    val (stats, eqs) = statsAt(root, v)
    val name = s"_cdf/v${v}_pin$nonce.jsonl"
    Files.createDirectories(Paths.get(root, "_cdf"))
    Files.write(Paths.get(root, name),
      scala.jdk.CollectionConverters.SeqHasAsJava(
        stats.map(JsonlStats.statsLine) ++ eqs.map(JsonlEqualityDeletes.line)).asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val schema = JsonlStats.readTableMeta(root).schema.getOrElse(JsonlStats.schema)
    spark.read.format("graft-jsonl-stats").schema(schema)
      .option("path", root).option("manifest", name).load()
  }

  /** The derived manifest a [[pinnedScan]] call with this (version,
    * nonce) wrote — callers delete it once the pinned plan is spent. */
  def pinnedManifest(root: String, v: Int, nonce: String): java.nio.file.Path =
    Paths.get(root, s"_cdf/v${v}_pin$nonce.jsonl")

  /** SIGNED multiset delta from version `fromV` to `toV` — the change
    * feed shape incremental AGGREGATE maintenance wants (r13): every
    * row of a file-identity that LEFT the manifest at `_sign` = -1
    * (read under the FROM version's dv/eqdel masks) unioned with every
    * row of an identity that ENTERED at `_sign` = +1 (under the TO
    * masks). No unique key needed: distributive aggregates consume the
    * delta arithmetically, and copy-on-write noise (a rewrite re-emits
    * its untouched rows) CANCELS inside SUM/COUNT — each untouched row
    * appears once at -1 and once at +1, contributing exactly zero.
    * That is the same cancellation [[tableChanges]] buys with its
    * image-comparing full-outer join, obtained for free from the
    * algebra, which is why this leg needs no keyCols. Cost is
    * proportional to the CHANGED files, never table size — the same
    * manifest-arithmetic scaling argument as tableChanges. */
  def signedChanges(spark: SparkSession, root: String,
                    fromV: Int, toV: Int, nonce: String = ""): DataFrame = {
    require(fromV < toV, s"fromV $fromV must precede toV $toV")
    // a source column literally named `_sign` would be silently REPLACED
    // by the tag below — the delta aggregate would then replay the tag
    // where the body meant the data column. Decline loudly; the IVM
    // caller catches and falls back to the always-correct full rebuild.
    val schema = JsonlStats.readTableMeta(root).schema.getOrElse(JsonlStats.schema)
    require(!schema.fieldNames.contains("_sign"),
      s"table at $root has a column named '_sign' — the signed change feed " +
        "reserves that name for its multiset tag")
    val (pre, post) = diffLegs(spark, root, fromV, toV, tag = s"ivm$nonce")
    pre.withColumn("_sign", lit(-1)).unionByName(post.withColumn("_sign", lit(1)))
  }

  /** The two derived `_cdf` manifests a [[signedChanges]] call with this
    * (window, nonce) wrote — callers delete them once the delta has been
    * consumed (an incremental refresh would otherwise accrue one pair
    * per window that vacuum knows nothing about). */
  def signedManifests(root: String, fromV: Int, toV: Int,
                      nonce: String = ""): Seq[java.nio.file.Path] =
    Seq("removed", "added").map(leg =>
      Paths.get(root, s"_cdf/v${fromV}_v${toV}_ivm$nonce$leg.jsonl"))

  /** Is the (fromV, toV] window INSERT-ONLY — no file-identity left the
    * manifest? Pure manifest arithmetic (no data IO). A removal means
    * rows disappeared or changed (COW rewrite, DV growth, eqdel upsert,
    * compaction all change identities), which is what decides whether
    * MIN/MAX aggregates can maintain incrementally: inserts only ever
    * extend an extremum, deletions can retract one. */
  def windowInsertOnly(root: String, fromV: Int, toV: Int): Boolean = {
    val (fromStats, eqFrom) = statsAt(root, fromV)
    val (toStats, eqTo) = statsAt(root, toV)
    def ident(eqs: Seq[JsonlEqualityDeletes.EqDelete])(
        s: JsonlStats.FileStats): (String, Seq[String], Seq[String]) =
      (s.file, s.dvs, eqs.filter(_.seq > s.seq).map(_.file).sorted)
    val toKeys = toStats.map(ident(eqTo)).toSet
    fromStats.forall(s => toKeys.contains(ident(eqFrom)(s)))
  }

  /** The (removed, added) file-identity legs of a version window, each
    * as a DataFrame over a derived manifest carrying its own version's
    * dv/eqdel masks — shared by [[tableChanges]] and
    * [[signedChanges]]. */
  private def diffLegs(spark: SparkSession, root: String,
                       fromV: Int, toV: Int, tag: String): (DataFrame, DataFrame) = {
    val (fromStats, eqFrom) = statsAt(root, fromV)
    val (toStats, eqTo) = statsAt(root, toV)
    def ident(eqs: Seq[JsonlEqualityDeletes.EqDelete])(
        s: JsonlStats.FileStats): (String, Seq[String], Seq[String]) =
      (s.file, s.dvs, eqs.filter(_.seq > s.seq).map(_.file).sorted)
    val fromKeys = fromStats.map(ident(eqFrom)).toSet
    val toKeys = toStats.map(ident(eqTo)).toSet
    val removed = fromStats.filterNot(s => toKeys.contains(ident(eqFrom)(s)))
    val added = toStats.filterNot(s => fromKeys.contains(ident(eqTo)(s)))
    val cdfDir = Paths.get(root, "_cdf")
    Files.createDirectories(cdfDir)
    def derived(leg: String, entries: Seq[JsonlStats.FileStats],
                eqs: Seq[JsonlEqualityDeletes.EqDelete]): String = {
      val name = s"_cdf/v${fromV}_v${toV}_$tag$leg.jsonl"
      Files.write(Paths.get(root, name),
        scala.jdk.CollectionConverters.SeqHasAsJava(
          entries.map(JsonlStats.statsLine) ++
            eqs.map(JsonlEqualityDeletes.line)).asJava,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      name
    }
    val schema = JsonlStats.readTableMeta(root).schema.getOrElse(JsonlStats.schema)
    def readSet(manifest: String): DataFrame =
      spark.read.format("graft-jsonl-stats")
        .schema(schema)
        .option("path", root).option("manifest", manifest).load()
    (readSet(derived("removed", removed, eqFrom)),
      readSet(derived("added", added, eqTo)))
  }

  /** Row-level changes from version `fromV` (exclusive base) to
    * `toV`: one row per inserted, deleted or updated key, with the
    * before/after images side by side.
    *
    * Output: keyCols, `change_type` ('insert' | 'delete' | 'update'),
    * then `before_<c>` / `after_<c>` for every non-key column.
    * `keyCols` must be unique per row in both versions (the table's
    * logical key — for the event feed, `event_id`); a duplicated key
    * would cross-join its images. */
  def tableChanges(spark: SparkSession, root: String,
                   fromV: Int, toV: Int,
                   keyCols: Seq[String]): DataFrame = {
    require(fromV < toV, s"fromV $fromV must precede toV $toV")
    require(keyCols.nonEmpty, "keyCols must name the table's unique key")
    // immutable data files ⇒ same name = same BYTES; but the LOGICAL
    // content is (file, deletion vectors, applicable equality deletes)
    // — a merge-on-read DELETE changes a file's dv list without
    // touching its bytes (r7c), and an UPSERT changes which eq-deletes
    // mask it without touching anything of the entry but the table's
    // eqdel set (r9b) — so identity must include both. A re-imaged
    // file's entries carry their dv lists — and each derived manifest
    // carries its VERSION's eqdel lines — so the before side reads the
    // old masked view and the after side the new one; surviving rows
    // cancel in the join, masked ones surface as deletes/updates.
    val (pre, post) = diffLegs(spark, root, fromV, toV, tag = "")
    val schema = JsonlStats.readTableMeta(root).schema.getOrElse(JsonlStats.schema)
    val dataCols = schema.fieldNames.toSeq.filterNot(keyCols.contains)
    def tagged(df: DataFrame, prefix: String): DataFrame =
      dataCols.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
        .withColumn(s"${prefix}present", lit(true))
    val joined = tagged(pre, "before_")
      .join(tagged(post, "after_"), keyCols, "full_outer")
    def img(prefix: String): Column =
      struct(dataCols.map(c => col(s"$prefix$c")): _*)
    joined
      .withColumn("change_type",
        when(col("before_present").isNull, lit("insert"))
          .when(col("after_present").isNull, lit("delete"))
          .when(img("before_") <=> img("after_"), lit("unchanged"))
          .otherwise(lit("update")))
      // copy-on-write noise: rewritten files re-emit untouched rows
      .filter(col("change_type") =!= "unchanged")
      .drop("before_present", "after_present")
      .select((keyCols.map(col) :+ col("change_type")) ++
        dataCols.flatMap(c => Seq(col(s"before_$c"), col(s"after_$c"))): _*)
  }
}
