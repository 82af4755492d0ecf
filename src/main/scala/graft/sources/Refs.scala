package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Named refs over the manifest protocol — the Iceberg branch/tag model
  * (ref: Iceberg spec "Snapshot References"; reference behavior:
  * Group5's promote-on-validate publish flow,
  * `Assets/Jobs/etl_silver_to_gold.py` gate-then-publish) re-expressed
  * on this table format's own primitives.
  *
  * A ref is ONE file under `_refs/`, atomically created and atomically
  * replaced, holding a HEADER line followed by a full manifest snapshot:
  *
  *   - `_refs/tag.<name>.jsonl` — an IMMUTABLE named snapshot. The tag
  *     pins the manifest CONTENT (not a version number), so it stays
  *     readable whatever happens to `_history/` — tag retention is a
  *     property of refcounting, not a retention-policy special case:
  *     [[GraftProcedures.vacuum]] counts ref manifests among the live
  *     roots, so data files a tag references survive snapshot expiry
  *     and die exactly when the last ref to them is dropped. Tagging a
  *     HISTORICAL version resolves delta-encoded archives on the way in
  *     ([[JsonlStats.readManifestLines]]), so a tag is always
  *     self-contained — `compact_history` and `vacuum` never need to
  *     know tags exist.
  *
  *   - `_refs/branch.<name>.jsonl` — a MUTABLE line of development
  *     forked from the live manifest. The header records the fork point
  *     (`base_version` for reporting, `base_hash` — SHA-256 over the
  *     sorted fork entries — for the publish-time ancestry proof).
  *     Writes route to the branch head via the catalog identifier
  *     `<table>.branch_<name>` (the Iceberg Spark idiom); appends and
  *     TRUNCATE rebase the branch file in place, and main NEVER sees
  *     branch entries until `CALL fast_forward` publishes them through
  *     [[JsonlStats.commitAtomic]] — one OCC commit whose rebase
  *     demands main's entries still hash to `base_hash` (no commit on
  *     main since the fork = the fast-forward precondition; a diverged
  *     main CONFLICTS loudly, same family as every other rebase
  *     conflict). Published entries then time-travel, CDF and vacuum
  *     exactly like any other commit's.
  *
  * Together these are WRITE-AUDIT-PUBLISH: stage a load on a branch,
  * audit the branch (same scan machinery, frozen file list), publish by
  * fast-forward — a failed audit costs `drop_branch` plus an orphan
  * sweep, and main never served a single unaudited row.
  *
  * Concurrency: ref CREATION is exclusive (hard-link CAS — two racing
  * creators cannot both win). Branch HEAD updates serialize in-JVM via
  * [[refsLock]] with an atomic-move publish; cross-process branch
  * writers are last-writer-wins, documented as the single-stager-per-
  * branch assumption WAP already makes (one load job owns its staging
  * branch). Publication to MAIN carries full OCC either way.
  */
object Refs {
  val RefsDir = "_refs"

  /** Ref names become file-name components: keep them path-safe. */
  private val NamePat = "[A-Za-z0-9][A-Za-z0-9_-]*".r
  def requireValidName(name: String): Unit =
    require(NamePat.pattern.matcher(name).matches() && name.length <= 64,
      s"ref name must match ${NamePat.pattern} (max 64 chars), got '$name'")

  final case class RefInfo(name: String, kind: String, baseVersion: Int,
                           createdMs: Long, baseHash: Option[String],
                           entries: Seq[String])

  def tagManifest(name: String): String = s"$RefsDir/tag.$name.jsonl"
  def branchManifest(name: String): String = s"$RefsDir/branch.$name.jsonl"

  private def refPath(root: String, manifest: String): Path = Paths.get(root, manifest)

  /** In-JVM serialization of branch-head read-modify-write (the same
    * posture as [[JsonlStats.metaLock]] for `_table.json`). */
  val refsLock = new Object

  private def headerLine(kind: String, baseVersion: Int, baseHash: Option[String]): String = {
    val n = new ObjectMapper().createObjectNode()
    n.put("ref", kind)
    n.put("base_version", baseVersion)
    n.put("created_ms", System.currentTimeMillis())
    baseHash.foreach(n.put("base_hash", _))
    n.toString
  }

  /** SHA-256 over the SORTED entry lines — the ancestry fingerprint
    * fast_forward compares against main's then-current entries. Sorted
    * because [[JsonlStats.commitAtomic]] publishes entries sorted, so
    * byte order is not part of manifest identity. */
  def entriesHash(entries: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    entries.filter(_.nonEmpty).sorted.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Non-txn manifest lines of the LIVE table — what a ref pins. Txn
    * watermarks stay main-only: they ledger main's streaming sinks, and
    * a ref that carried them would re-publish stale epochs at
    * fast-forward. */
  private def liveEntries(root: String): Seq[String] = {
    val mapper = new ObjectMapper()
    // counter lines stripped too (r10): the row-id high-watermark is
    // commitAtomic's protocol state, not part of a snapshot's identity
    // — a ref that carried it would fake divergence at fast-forward
    JsonlStats.stripCounter(JsonlStats.readManifestLines(root, "_stats.jsonl")
      .filter(_.nonEmpty)
      .filterNot(l => mapper.readTree(l).hasNonNull("txn")))
  }

  /** Exclusive create: temp + hard link, the same two-property publish
    * as the version-slot CAS (never partial, never double-won). */
  private def createRef(root: String, manifest: String, lines: Seq[String]): Unit = {
    val target = refPath(root, manifest)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s"${target.getFileName}.tmp-cas-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"ref already exists: ${target.getFileName} (drop it first)")
    }
    finally Files.deleteIfExists(tmp)
  }

  /** Create a tag of the live table, or of archived `VERSION AS OF v`
    * when `atVersion` is given (delta-encoded archives materialize on
    * the way in, so the tag never depends on its bases surviving). */
  def createTag(root: String, name: String, atVersion: Option[Int] = None): Int = {
    requireValidName(name)
    val (version, entries) = atVersion match {
      case None => (JsonlStats.currentVersion(root), liveEntries(root))
      case Some(v) =>
        val current = JsonlStats.currentVersion(root)
        if (v == current) (v, liveEntries(root))
        else {
          val m = s"${JsonlStats.HistoryDir}/v$v.jsonl"
          require(v >= 1 && v < current, s"no version $v (versions 1..$current)")
          require(Files.exists(Paths.get(root, m)),
            s"version $v has been vacuumed; tag a surviving version")
          val mapper = new ObjectMapper()
          (v, JsonlStats.stripCounter(JsonlStats.readManifestLines(root, m)
            .filter(_.nonEmpty)
            .filterNot(l => mapper.readTree(l).hasNonNull("txn"))))
        }
    }
    createRef(root, tagManifest(name), headerLine("tag", version, None) +: entries)
    version
  }

  /** Fork a branch from the live manifest. The header's `base_hash`
    * freezes the fork-point entry set — the fast-forward precondition. */
  def createBranch(root: String, name: String): Int = {
    requireValidName(name)
    val version = JsonlStats.currentVersion(root)
    val entries = liveEntries(root)
    createRef(root, branchManifest(name),
      headerLine("branch", version, Some(entriesHash(entries))) +: entries)
    version
  }

  def dropRef(root: String, manifest: String): Unit = {
    val p = refPath(root, manifest)
    if (!Files.deleteIfExists(p))
      throw new IllegalArgumentException(s"no such ref: ${p.getFileName}")
  }

  /** Read a ref file back: header parsed, entry lines verbatim. */
  def readRef(root: String, manifest: String): RefInfo = {
    val p = refPath(root, manifest)
    require(Files.exists(p), s"no such ref: ${p.getFileName}")
    val lines = Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
    val mapper = new ObjectMapper()
    val h = mapper.readTree(lines.head)
    require(h.hasNonNull("ref"), s"ref file ${p.getFileName} has no header line")
    val fn = p.getFileName.toString
    val name = fn.stripSuffix(".jsonl").dropWhile(_ != '.').drop(1)
    RefInfo(name, h.get("ref").asText(), h.get("base_version").asInt(),
      h.get("created_ms").asLong(),
      if (h.hasNonNull("base_hash")) Some(h.get("base_hash").asText()) else None,
      lines.tail)
  }

  /** Resolve a ref NAME (tag first, then branch — the two namespaces
    * are disjoint on disk but a bare name in `VERSION AS OF` names
    * either). Returns the manifest path relative to the table root. */
  def resolveName(root: String, name: String): Option[String] = {
    if (Files.exists(refPath(root, tagManifest(name)))) Some(tagManifest(name))
    else if (Files.exists(refPath(root, branchManifest(name)))) Some(branchManifest(name))
    else None
  }

  def listRefs(root: String): Seq[RefInfo] = {
    val dir = Paths.get(root, RefsDir)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      val names =
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => (n.startsWith("tag.") || n.startsWith("branch.")) &&
            n.endsWith(".jsonl"))
          .toSeq.sorted
        finally s.close()
      names.map(n => readRef(root, s"$RefsDir/$n"))
    }
  }

  /** Rebase-update the branch HEAD (append or truncate commit from the
    * branch write path). Atomic-move publish; in-JVM serialized. */
  def commitBranch(root: String, name: String,
                   rebase: Seq[String] => Seq[String]): Unit = refsLock.synchronized {
    val manifest = branchManifest(name)
    val p = refPath(root, manifest)
    require(Files.exists(p), s"no such branch: $name (create_branch first)")
    val lines = Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
    val rebased = lines.head +: rebase(lines.tail).sorted
    val tmp = p.resolveSibling(
      s"${p.getFileName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, rebased.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** PUBLISH: fast-forward main to the branch head — one OCC commit
    * whose rebase proves ancestry (main's entries still hash to the
    * fork point) and then REPLACES them with the branch's. A main that
    * committed since the fork conflicts loudly: fast-forward is
    * append-only history, never a silent merge. Returns the superseded
    * main version. The branch ref survives the publish (dropping it is
    * the caller's cleanup decision, like Iceberg's). */
  def fastForward(root: String, name: String, queryId: String): Int = {
    val ref0 = readRef(root, branchManifest(name))
    require(ref0.kind == "branch", s"$name is a ${ref0.kind}, not a branch")
    ref0.baseHash.getOrElse(
      throw new IllegalStateException(s"branch $name has no fork hash"))
    JsonlStats.commitAtomic(root, queryId, base => {
      // re-read the branch head EACH attempt (r12): a branch commit
      // (append, DML) landing between the publish's first read and its
      // commit must be IN the published image — fast-forward serializes
      // with branch commits instead of publishing a stale snapshot of
      // the head (the branch's fork hash never moves under rebases, so
      // the ancestry check is unaffected by the re-read).
      val ref = readRef(root, branchManifest(name))
      val forkHash = ref.baseHash.getOrElse(
        throw new IllegalStateException(s"branch $name has no fork hash"))
      if (entriesHash(base) != forkHash)
        JsonlStats.conflict(
          s"main diverged since branch '$name' forked (base_version=${ref.baseVersion}); " +
            "fast-forward requires an unchanged main — re-stage on a fresh branch")
      ref.entries
    })
  }

  /** Non-txn entry lines of version `v` (live or archived), with the
    * retention story on a vacuumed generation. Delta-encoded archives
    * materialize transparently ([[JsonlStats.readManifestLines]]). */
  private def versionEntries(root: String, v: Int, why: String): Seq[String] = {
    val current = JsonlStats.currentVersion(root)
    require(v >= 1 && v <= current, s"no version $v (versions 1..$current)")
    val m = if (v == current) "_stats.jsonl" else s"${JsonlStats.HistoryDir}/v$v.jsonl"
    require(v == current || Files.exists(refPath(root, m)),
      s"version $v has been vacuumed (oldest available: " +
        s"${JsonlStats.readVacuumHorizon(root).map(_.minVersion).getOrElse(current)}); $why")
    val mapper = new ObjectMapper()
    JsonlStats.stripCounter(JsonlStats.readManifestLines(root, m).filter(_.nonEmpty)
      .filterNot(l => mapper.readTree(l).hasNonNull("txn")))
  }

  /** ROLLBACK: set main to an earlier image — a TAG's pinned snapshot
    * or an archived VERSION — in ONE serializable OCC commit
    * (Iceberg's `rollback_to_snapshot`: the restore is metadata, never
    * a data copy; the bad commits stay in `_history/` as evidence).
    * The entry set is restored VERBATIM (data, DV and eqdel lines, seq
    * stamps, spec stamps — the full logical image); a concurrent
    * commit conflicts loudly ([[JsonlStats.rebaseOverwrite]] — a
    * rollback logically read the whole table). Streaming txn
    * watermarks deliberately do NOT roll back: an epoch stays SPENT
    * (commitAtomic carries base watermarks forward), so a running sink
    * replaying it cannot double-land its files on the restored image —
    * re-ingesting rolled-back epochs needs a fresh txnAppId, stated.
    * Restored entries' files still exist by the retention contract:
    * the tag or archive that served them is exactly what vacuum
    * refcounts. Returns the superseded main version. */
  def rollbackTo(root: String, target: String, queryId: String): Int = {
    val entries: Seq[String] =
      if (target.nonEmpty && target.forall(_.isDigit))
        versionEntries(root, target.toInt, "roll back to a surviving version")
      else resolveName(root, target) match {
        case Some(m) =>
          val ref = readRef(root, m)
          require(ref.kind == "tag",
            s"rollback target must be a tag or version; '$target' is a ${ref.kind} " +
              "(publish a branch with fast_forward)")
          ref.entries
        case None =>
          throw new IllegalArgumentException(
            s"no tag '$target' and not a version number " +
              s"(tags: ${listRefs(root).filter(_.kind == "tag").map(_.name).mkString(", ")})")
      }
    val planned = liveEntries(root)
    JsonlStats.commitAtomic(root, queryId, JsonlStats.rebaseOverwrite(planned, entries))
  }

  /** CHERRY-PICK: re-apply one version's delta onto the CURRENT main —
    * the redo half of rollback-undo (Iceberg's `cherrypick_snapshot`,
    * same restriction: only APPEND-SHAPED versions, because a COW
    * rewrite/DV-attach delta is defined against files main may no
    * longer hold). The delta of v vs v-1 is manifest arithmetic:
    * data entries and eqdel lines present in v and absent in v-1; a
    * version that removed or MODIFIED a pre-existing entry refuses
    * loudly. Sequence stamps are RE-ISSUED against the live base
    * (Iceberg assigns picked snapshots a fresh sequence number): a
    * picked upsert takes maxSeq+1 for its data AND its retraction —
    * replaying the upsert semantics against today's table, not v-1's
    * — while a plain append under outstanding eqdels stamps at maxSeq
    * so existing deletes never retract re-applied rows. Blind-append
    * rebase: commutes with concurrent appends, conflicts if any picked
    * file is already live (picked twice). Returns the superseded
    * version. */
  def cherryPick(root: String, v: Int, queryId: String): Int = {
    val vLines = versionEntries(root, v, "cherry-pick a surviving version")
    val pLines = if (v == 1) Seq.empty[String]
      else versionEntries(root, v - 1, s"cherry_pick needs v$v's predecessor to derive the delta")
    val vData = JsonlStats.parseStatsLines(vLines)
    val pData = JsonlStats.parseStatsLines(pLines)
    val pFiles = pData.map(_.file).toSet
    val removed = pFiles.diff(vData.map(_.file).toSet)
    if (removed.nonEmpty) throw new UnsupportedOperationException(
      s"cherry_pick v$v: not append-shaped — it removed ${removed.size} file(s) " +
        s"(first: ${removed.head}); only appends and upserts re-apply")
    val pNorm = pData.map(s => s.file -> JsonlStats.statsLine(s)).toMap
    val changed = vData.filter(s => pNorm.get(s.file).exists(_ != JsonlStats.statsLine(s)))
    if (changed.nonEmpty) throw new UnsupportedOperationException(
      s"cherry_pick v$v: not append-shaped — it modified ${changed.size} pre-existing " +
        s"entr${if (changed.size == 1) "y" else "ies"} (first: ${changed.head.file}); " +
        "only appends and upserts re-apply")
    val pickedData = vData.filterNot(s => pFiles.contains(s.file))
    val pEqFiles = JsonlEqualityDeletes.parseLines(pLines).map(_.file).toSet
    val pickedEq = JsonlEqualityDeletes.parseLines(vLines).filterNot(d => pEqFiles.contains(d.file))
    require(pickedData.nonEmpty || pickedEq.nonEmpty,
      s"cherry_pick v$v: empty delta vs v${v - 1} (a duplicate snapshot from a lost " +
        "commit race carries no change)")
    // protocol stamp BEFORE the swap (the write-path pattern): picking
    // a retraction onto an eqdel-free table makes it eqdel-bearing
    if (pickedEq.nonEmpty) JsonlStats.stampFeature(root, JsonlStats.FeatureEqDeletes)
    JsonlStats.commitAtomic(root, queryId, base => {
      val baseFiles = JsonlStats.parseStatsLines(base).map(_.file).toSet
      val dup = pickedData.map(_.file).filter(baseFiles.contains)
      if (dup.nonEmpty) JsonlStats.conflict(
        s"cherry_pick v$v: ${dup.size} picked file(s) already live " +
          s"(first: ${dup.head}) — already applied?")
      val baseEqFiles = JsonlEqualityDeletes.parseLines(base).map(_.file).toSet
      val dupEq = pickedEq.map(_.file).filter(baseEqFiles.contains)
      if (dupEq.nonEmpty) JsonlStats.conflict(
        s"cherry_pick v$v: ${dupEq.size} picked delete file(s) already live " +
          s"(first: ${dupEq.head}) — already applied?")
      val m = JsonlEqualityDeletes.maxSeq(base)
      val s = if (pickedEq.nonEmpty) m + 1 else m
      val stampedData =
        if (s == 0L) pickedData.map(JsonlStats.statsLine)
        else pickedData.map(d => JsonlStats.statsLine(d.copy(seq = s)))
      base ++ stampedData ++ pickedEq.map(d => JsonlEqualityDeletes.line(d.copy(seq = s)))
    })
  }

  /** Data + DV files every ref still references — vacuum's extra live
    * roots ([[GraftProcedures.vacuum]]): a branch-staged or tag-pinned
    * file is NOT an orphan and NOT expirable, whatever `_history/`
    * says. */
  def referencedFiles(root: String): Set[String] =
    listRefs(root).flatMap(r =>
      JsonlStats.parseStatsLines(r.entries).flatMap(s => s.file +: s.dvs) ++
        JsonlEqualityDeletes.filesOf(r.entries)).toSet

  /** WAREHOUSE transactions (r11): an atomic MULTI-TABLE publish — the
    * Iceberg-REST-catalog multi-table-commit shape on this catalog's
    * own primitives. The crash gap it closes: publishing fact + agg as
    * two independent `fast_forward`s can die between them and leave a
    * torn warehouse (fact new, agg old) forever.
    *
    * Protocol: both branches' preconditions validate first; then ONE
    * exclusively-created marker (`_wtxn.json` at the CATALOG root,
    * hard-link CAS — the commitment point) records every leg; then the
    * legs apply one by one; then the marker deletes. Recovery is
    * ROLL-FORWARD: [[GraftCatalog.loadTable]] consults the marker
    * before serving any table, so a catalog-routed reader can never
    * observe the torn middle — it either finds no marker (all-or-none
    * already settled) or completes the remaining legs itself first.
    * Leg application is idempotent (a leg whose table already equals
    * the branch content is a content-no-op), so racing recoverers are
    * harmless. A rival commit that diverges a table between the marker
    * and its leg WEDGES the transaction LOUDLY (the single-publisher
    * assumption WAP already makes; the error names the marker) — the
    * contract is both-or-neither-or-loud, never silently torn. Path
    * reads that bypass the catalog bypass recovery too, exactly as in
    * Iceberg, where multi-table atomicity is a catalog property. */
  object Wtxn {
    val Marker = "_wtxn.json"

    final case class Leg(table: String, branch: String, forkHash: String)

    def read(catalogRoot: String): Seq[Leg] = {
      val p = Paths.get(catalogRoot, Marker)
      if (!Files.exists(p)) return Nil
      val mapper = new ObjectMapper()
      val n = mapper.readTree(String.join("\n", Files.readAllLines(p)))
      n.get("legs").elements().asScala.map(l =>
        Leg(l.get("table").asText(), l.get("branch").asText(),
          l.get("fork_hash").asText())).toSeq
    }

    /** Entry-set fingerprint MODULO row-lineage stamping: publishing a
      * branch stamps its fresh entries (frid/luv/runs), so "is this
      * leg already applied?" must compare the lineage-free image of
      * main against the branch's unstamped lines. */
    private def lineageFreeHash(lines: Seq[String]): String = {
      val mapper = new ObjectMapper()
      entriesHash(lines.filter(_.nonEmpty).map { l =>
        val n = mapper.readTree(l)
        if (n.hasNonNull("file"))
          JsonlStats.statsLine(JsonlStats.parseStatsLines(Seq(l)).head
            .copy(frid = -1L, luv = 0L, runs = Nil))
        else l
      })
    }

    /** Publish every (table, branch) leg atomically-at-the-catalog:
      * validate all preconditions, CAS the marker, roll forward,
      * delete the marker. Returns the number of legs applied live
      * (vs found already applied). */
    def publish(catalogRoot: String, legs: Seq[(String, String)],
                queryId: String): Int = {
      require(legs.nonEmpty && legs.map(_._1).distinct.size == legs.size,
        s"wtxn legs must name distinct tables: ${legs.map(_._1).mkString(", ")}")
      val resolved = legs.map { case (t, b) =>
        val dir = Paths.get(catalogRoot, t).toString
        val ref = readRef(dir, branchManifest(b))
        require(ref.kind == "branch", s"$b is a ${ref.kind}, not a branch")
        val fork = ref.baseHash.getOrElse(
          throw new IllegalStateException(s"branch $b of $t has no fork hash"))
        // validate BEFORE the commitment point: a diverged table fails
        // the whole publish with nothing applied
        require(entriesHash(liveEntries(dir)) == fork ||
            lineageFreeHash(liveEntries(dir)) == lineageFreeHash(ref.entries),
          s"main of $t diverged since branch '$b' forked — " +
            "re-stage before the two-table publish")
        Leg(t, b, fork)
      }
      val mapper = new ObjectMapper()
      val n = mapper.createObjectNode()
      n.put("id", java.util.UUID.randomUUID().toString)
      val a = n.putArray("legs")
      resolved.foreach { l =>
        val o = a.addObject()
        o.put("table", l.table); o.put("branch", l.branch); o.put("fork_hash", l.forkHash)
      }
      val target = Paths.get(catalogRoot, Marker)
      val tmp = target.resolveSibling(
        s"$Marker.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(tmp, java.util.List.of(n.toString),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      try Files.createLink(target, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"a warehouse transaction is already in flight ($Marker exists) — " +
              "let recovery settle it (any catalog access) before publishing again")
      }
      finally Files.deleteIfExists(tmp)
      recover(catalogRoot, queryId)
    }

    /** Roll the marker's remaining legs forward and delete it. Safe to
      * race: applied legs are content-no-ops, the delete is idempotent. */
    def recover(catalogRoot: String, queryId: String = "wtxn-recover"): Int = {
      val legs = read(catalogRoot)
      if (legs.isEmpty) return 0
      var applied = 0
      legs.foreach { l =>
        val dir = Paths.get(catalogRoot, l.table).toString
        // a leg naming a branch that no longer exists (dropped, or a
        // crash before the branch file landed) must not brick EVERY
        // catalog access with a bare 'no such ref' (r12, ADVICE r11
        // low): fail with the wedge-style message that names the
        // marker and the delete-to-abandon remediation.
        val ref =
          try readRef(dir, branchManifest(l.branch))
          catch {
            case e: IllegalArgumentException =>
              throw new IllegalStateException(
                s"warehouse transaction wedged: leg '${l.table}' names branch " +
                  s"'${l.branch}' which does not exist (${e.getMessage}) — delete " +
                  s"$Marker at $catalogRoot to abandon the transaction", e)
          }
        // an applied leg's main is the STAMPED image of the branch —
        // compare modulo lineage, then let fastForward's own OCC
        // rebase prove ancestry for the unapplied ones
        if (lineageFreeHash(liveEntries(dir)) != lineageFreeHash(ref.entries)) {
          try fastForward(dir, l.branch, s"$queryId-${l.table}")
          catch {
            case e: java.util.ConcurrentModificationException =>
              // racing recoverers are the COMMON case (every loadTable
              // runs recover while the marker exists): the OCC loser
              // must re-read main — if a racer settled the leg, main
              // now equals the branch image and this leg is done; only
              // a GENUINE divergence surfaces the wedge (r12, ADVICE
              // r11 medium).
              if (lineageFreeHash(liveEntries(dir)) != lineageFreeHash(ref.entries))
                JsonlStats.conflict(
                  s"warehouse transaction wedged: main of ${l.table} diverged under " +
                    s"the multi-table publish (see $Marker at $catalogRoot) — restore " +
                    s"${l.table} to the fork point or delete the marker to abandon " +
                    s"(${e.getMessage})")
          }
          applied += 1
        }
      }
      Files.deleteIfExists(Paths.get(catalogRoot, Marker))
      applied
    }
  }
}
