package graft

import graft.sources.{GraftCatalog, JsonlStats}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Laws of ROW LINEAGE (r10 — the Iceberg-v3 row-lineage idea on the
  * manifest protocol; [[graft.sources.JsonlStats.Lineage]]).
  *
  * The contract under test: `_row_id` is a table-unique identity
  * assigned by the COMMIT (manifest arithmetic: per-file `frid` +
  * physical position, allocated from a monotone `next_row_id` counter
  * line), `_last_updated_version` is the manifest version that last
  * (re)wrote the row, and both survive the engine's own mutations:
  * merge-on-read deletes/upserts preserve survivor ids by masking,
  * maintenance rewrites carry them (compaction as manifest runs,
  * rewrite_deletes as materialized in-row fields), and the counter
  * never reissues a retired id. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  /** Fresh connector table: 4 event_id-ranged, sorted files so row ids
    * are the global event_id rank (writer file names embed the
    * zero-padded partition index; commit stamping sorts by file name).
    * Returns (catalog, tableName, tableDir, expected (event_id → rank-1)). */
  private def scratch(tag: String, deleteMode: Option[String] = None): (String, String, String) = {
    val dir = Files.createTempDirectory(s"lineage_$tag").toString
    var w = graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .repartitionByRange(4, $"event_id")
      .sortWithinPartitions($"event_id")
      .write.format("graft-jsonl-stats").option("path", dir)
    w.mode("overwrite").save()
    deleteMode.foreach { m =>
      val m0 = JsonlStats.readTableMeta(dir)
      JsonlStats.writeTableMeta(dir, m0.copy(deleteMode = Some(m)))
    }
    val cat = s"graft_lin_${tag}_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    (cat, Paths.get(dir).getFileName.toString, dir)
  }

  private def idsOf(cat: String, t: String): Map[Long, (Long, Long)] =
    spark.sql(s"SELECT event_id, _row_id, _last_updated_version FROM $cat.`$t`")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("fresh table: ids are the global sort rank, dense from 0, all at version 1") {
    val (cat, t, dir) = scratch("fresh")
    val got = spark.sql(
      s"SELECT event_id, _row_id, _last_updated_version FROM $cat.`$t` ORDER BY event_id")
      .collect()
    assert(got.nonEmpty)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) === i.toLong, s"row $i (event ${r.getLong(0)}) id ${r.getLong(1)}")
      assert(r.getLong(2) === 1L, "first commit stamps version 1")
    }
    // the manifest's counter equals the row count
    val lines = Files.readAllLines(Paths.get(dir, "_stats.jsonl"))
    val cnt = lines.toArray.map(_.toString).find(_.contains("next_row_id"))
    assert(cnt.isDefined && cnt.get.contains(s"${got.length}"), s"counter line: $cnt")
  }

  test("append continues from the high-watermark at the next version; old ids untouched") {
    val (cat, t, _) = scratch("append")
    val before = idsOf(cat, t)
    val n = before.size.toLong
    Seq((900001L, 1L, "x", 1.0), (900002L, 2L, "y", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1).sortWithinPartitions("event_id")
      .write.format("graft-jsonl-stats").option("path",
        Paths.get(spark.conf.get(s"spark.sql.catalog.$cat.root"), t).toString)
      .mode("append").save()
    val after = idsOf(cat, t)
    before.foreach { case (k, v) => assert(after(k) === v, s"pre-append row $k changed") }
    assert(after(900001L) === ((n, 2L)) && after(900002L) === ((n + 1L, 2L)),
      s"appended ids must continue densely from $n at version 2: ${after(900001L)}, ${after(900002L)}")
  }

  test("merge-on-read DELETE: survivors keep their ids and versions (gaps where rows died)") {
    val (cat, t, _) = scratch("mordel", deleteMode = Some("merge-on-read"))
    val before = idsOf(cat, t)
    val victims = before.keys.toSeq.sorted.take(5)
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id IN (${victims.mkString(",")})")
    val after = idsOf(cat, t)
    assert(after.size === before.size - victims.size)
    after.foreach { case (k, v) => assert(before(k) === v, s"survivor $k drifted: $v") }
    victims.foreach(k => assert(!after.contains(k)))
  }

  test("equality-delete upsert: replaced keys get FRESH ids, untouched rows keep theirs") {
    val (cat, t, dir) = scratch("upsert")
    val before = idsOf(cat, t)
    val n = before.size.toLong
    val hit = before.keys.min
    Seq((hit, 99L, "rewritten", 9.9))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-jsonl-stats").option("path", dir)
      .option("upsertKeys", "event_id").mode("append").save()
    val after = idsOf(cat, t)
    assert(after.size === before.size)
    assert(after(hit)._1 === n, s"upserted row is a NEW row: id $n, got ${after(hit)._1}")
    assert(after(hit)._2 === 2L)
    (before - hit).foreach { case (k, v) => assert(after(k) === v) }
  }

  test("WAP: branch-staged rows serve NULL ids; fast_forward stamps them on main") {
    val (cat, t, dir) = scratch("wap")
    val n = idsOf(cat, t).size.toLong
    spark.sql(s"CALL $cat.create_branch('$t', 'audit')")
    Seq((910001L, 7L, "staged", 3.0)).toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-jsonl-stats").option("path", dir)
      .option("branch", "audit").mode("append").save()
    val staged = spark.sql(
      s"SELECT _row_id FROM $cat.`$t`.branch_audit WHERE event_id = 910001").collect()
    assert(staged.length === 1 && staged.head.isNullAt(0),
      "ids are assigned by MAIN commits — a staged row has none yet")
    spark.sql(s"CALL $cat.fast_forward('$t', 'audit')")
    val landed = idsOf(cat, t)
    assert(landed(910001L) === ((n, spark.sql(s"SELECT max(_last_updated_version) FROM $cat.`$t`").head().getLong(0))),
      s"fast_forward must stamp the staged row at the watermark $n: ${landed(910001L)}")
  }

  test("concurrent appends allocate disjoint dense ranges (OCC rebase + stamp are one swap)") {
    val (cat, t, dir) = scratch("occ")
    val n = idsOf(cat, t).size.toLong
    val writers = (0 until 4).map { w =>
      new Thread(() => {
        Seq.tabulate(10)(i => (920000L + w * 100 + i, w.toLong, s"w$w", i.toDouble))
          .toDF("event_id", "user_id", "event_type", "value")
          .coalesce(1)
          .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    val after = idsOf(cat, t)
    val fresh = after.filter(_._1 >= 920000L).values.map(_._1).toSeq.sorted
    assert(fresh.size === 40)
    assert(fresh === (n until n + 40L).toSeq,
      s"four racing appends must produce one dense, disjoint range: $fresh")
  }

  test("rollback then cherry_pick restore ids verbatim; the counter never reissues") {
    val (cat, t, dir) = scratch("undo")
    val n = idsOf(cat, t).size.toLong
    Seq((930001L, 1L, "picked", 1.0)).toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    val vAdd = JsonlStats.currentVersion(dir)
    val idPicked = idsOf(cat, t)(930001L)
    spark.sql(s"CALL $cat.rollback('$t', '${vAdd - 1}')")
    // a post-rollback append must NOT reuse the retired id
    Seq((930002L, 2L, "later", 2.0)).toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    val idLater = idsOf(cat, t)(930002L)
    assert(idLater._1 === n + 1L,
      s"rollback retired id $n; the counter must not reissue it: got ${idLater._1}")
    spark.sql(s"CALL $cat.cherry_pick('$t', $vAdd)")
    assert(idsOf(cat, t)(930001L)._1 === idPicked._1,
      "cherry_pick re-applies the original file — original id restored")
  }

  test("compaction carries ids as manifest runs: zero data rewrites, identical id map") {
    val (cat, t, dir) = scratch("compact")
    // three more small appends -> seven files to bin-pack
    (0 until 3).foreach { j =>
      Seq((940000L + j, j.toLong, "pad", j.toDouble))
        .toDF("event_id", "user_id", "event_type", "value")
        .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    }
    val before = idsOf(cat, t)
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    val entries = JsonlStats.readStats(dir)
    assert(entries.size < 7, s"compaction must merge: ${entries.size} files")
    assert(entries.exists(_.runs.nonEmpty),
      "a merged entry must carry its members' id ranges as runs")
    assert(idsOf(cat, t) === before, "compaction must not move a single id")
  }

  test("rewrite_deletes materializes survivor ids in-row; entry marked frid=-2") {
    val (cat, t, dir) = scratch("rwdel", deleteMode = Some("merge-on-read"))
    val before = idsOf(cat, t)
    val victims = before.keys.toSeq.sorted.take(7)
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id IN (${victims.mkString(",")})")
    val masked = idsOf(cat, t)
    spark.sql(s"CALL $cat.rewrite_deletes('$t')").collect()
    val entries = JsonlStats.readStats(dir)
    assert(entries.forall(_.dvs.isEmpty), "collapse must drop every DV")
    assert(entries.exists(_.frid == -2L),
      s"rewritten files carry in-row ids (frid = -2): ${entries.map(_.frid)}")
    assert(idsOf(cat, t) === masked,
      "the collapse must preserve every survivor's id and version")
    // and the files really carry the fields
    val rw = entries.find(_.frid == -2L).get
    val ln = Files.readAllLines(Paths.get(dir, rw.file)).get(0)
    assert(ln.contains("\"_row_id\":") && ln.contains("\"_luv\":"), ln.take(120))
  }

  test("zorder scatters rows but ids ride through as materialized fields") {
    val (cat, t, dir) = scratch("zorder")
    val before = idsOf(cat, t)
    spark.sql(s"CALL $cat.zorder('$t', 'user_id', 'value', ${1L * 1024 * 1024})")
    val after = idsOf(cat, t)
    assert(after === before, "a clustering rewrite must not change a single id")
    val entries = JsonlStats.readStats(dir)
    assert(entries.forall(_.frid == -2L),
      s"every clustered file holds in-row lineage: ${entries.map(_.frid)}")
    // the table contract never leaks the carrier fields
    val meta = JsonlStats.readTableMeta(dir)
    assert(!meta.schema.get.fieldNames.contains("_row_id"),
      "materialized lineage fields must not enter the table schema")
    // and column stats ignore them
    assert(entries.forall(e => !e.cols.contains("_row_id") && !e.cols.contains("_luv")))
  }

  test("compacting a materialized file composes: runs for stamped members, in-row for the rest") {
    val (cat, t, dir) = scratch("compose", deleteMode = Some("merge-on-read"))
    val before = idsOf(cat, t)
    val victim = before.keys.min
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id = $victim")
    spark.sql(s"CALL $cat.rewrite_deletes('$t')").collect()
    // one more fresh append, then compact everything together
    Seq((950001L, 5L, "tail", 1.0)).toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    val pre = idsOf(cat, t)
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    assert(idsOf(cat, t) === pre,
      "a bin mixing materialized and stamped members must preserve both id sources")
  }

  test("luv predicate over a MIXED compaction bin keeps the in-row rows (r11, ADVICE r10 high)") {
    // shape: runs cover only the stamped members; the materialized
    // member's rows answer from IN-ROW _luv fields at positions no run
    // covers. A version predicate matching ONLY those in-row versions
    // must not prune the file.
    val (cat, t, dir) = scratch("mixluv", deleteMode = Some("merge-on-read"))
    // v2: fresh two-row append (luv = 2)
    Seq((990001L, 1L, "fresh", 1.0), (990002L, 2L, "fresh", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1).write.format("graft-jsonl-stats").option("path", dir)
      .mode("append").save()
    // v3: DV lands on the v2 file only; v4: materialize it (in-row _luv = 2)
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id = 990001")
    spark.sql(s"CALL $cat.rewrite_deletes('$t')").collect()
    val pre = idsOf(cat, t)
    // v5: one bin holding 4 stamped members (runs, luv = 1) + the
    // materialized survivor (gap, in-row _luv = 2)
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    val entries = JsonlStats.readStats(dir)
    // r12 shape: the materialized member contributes a luv-only run
    // (firstId = -1) — ids stay in-row, the run is the null-luv
    // fallback carrier. The keep-law is the same: in-row versions are
    // not the runs' story, so the file must survive luv pruning.
    assert(entries.size === 1 && entries.head.frid === -1L && entries.head.runs.nonEmpty &&
      entries.head.runs.exists(_._2 == -1L),
      s"fixture must hold a luv-only run beside the stamped ones: ${entries.map(e => (e.frid, e.runs, e.rows))}")
    assert(idsOf(cat, t) === pre)
    val got = spark.sql(
      s"SELECT event_id FROM $cat.`$t` WHERE _last_updated_version = 2").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(990002L),
      "the version-2 row lives in the run GAP — planning must keep the mixed bin")
  }

  test("clone of a fully-materialized table carries the id counter (r11, ADVICE r10 medium)") {
    val (cat, t, dir) = scratch("clonecnt")
    val n = idsOf(cat, t).size.toLong
    // zorder materializes EVERY file (frid = -2): the floor pass sees
    // nothing, so only the carried counter line protects the clone
    spark.sql(s"CALL $cat.zorder('$t', 'user_id', 'value', ${64L * 1024 * 1024})")
    assert(JsonlStats.readStats(dir).forall(_.frid == -2L))
    val t2 = s"${t}_c"
    spark.sql(s"CALL $cat.clone('$t', '$t2')").collect()
    assert(idsOf(cat, t2) === idsOf(cat, t), "clone serves identical lineage")
    Seq((995001L, 1L, "post", 1.0)).toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-jsonl-stats").option("path",
        Paths.get(dir).getParent.resolve(t2).toString)
      .mode("append").save()
    val after = idsOf(cat, t2)
    assert(after(995001L)._1 === n,
      s"the clone's first append must continue from the source watermark $n, got ${after(995001L)._1}")
    assert(after.values.map(_._1).toSeq.distinct.size === after.size,
      "ids stay table-unique on the clone")
  }

  test("incremental-by-version scans prune files at planning time (the Iceberg incremental-scan shape)") {
    val (cat, t, dir) = scratch("incprune")
    (0 until 3).foreach { j =>
      Seq((960000L + j, j.toLong, "delta", j.toDouble))
        .toDF("event_id", "user_id", "event_type", "value")
        .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    }
    // versions: 1 = the 4-file CTAS, 2..4 = one single-file append each
    val df = spark.sql(
      s"SELECT event_id, _row_id FROM $cat.`$t` WHERE _last_updated_version > 3")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(960002L), "only the v4 row changed since v3")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val scans = nodes(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val planned = scans.head.scan.asInstanceOf[graft.sources.JsonlStatsScan]
      .toBatch.planInputPartitions().length
    assert(planned === 1,
      s"a luv > 3 predicate must plan ONLY the files commits 4+ produced: planned $planned of 7")
  }

  test("copy-on-write DELETE preserves every survivor's id and version (r11)") {
    // Spark 4.1's row-level metadata machinery: the operation requires
    // `_row_id`/`_last_updated_version`, ReplaceData carries them as a
    // metadata projection beside the data rows, and the writer
    // materializes them in-row (frid = -2) — so a COW rewrite no
    // longer re-stamps. The r10 residual, closed.
    val (cat, t, dir) = scratch("cow") // default delete mode = COW file rewrite
    val before = idsOf(cat, t)
    val victims = before.keys.toSeq.sorted.take(5)
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id IN (${victims.mkString(",")})")
    val after = idsOf(cat, t)
    assert(after.size === before.size - victims.size)
    after.foreach { case (k, v) =>
      assert(before(k) === v, s"survivor $k drifted through the COW rewrite: $v") }
    victims.foreach(k => assert(!after.contains(k)))
  }

  test("copy-on-write UPDATE keeps the row's id and restamps its version (r11)") {
    val (cat, t, dir) = scratch("cowup")
    val before = idsOf(cat, t)
    val hit = before.keys.min
    spark.sql(s"UPDATE $cat.`$t` SET event_type = 'patched' WHERE event_id = $hit")
    val after = idsOf(cat, t)
    assert(after.size === before.size)
    assert(after(hit)._1 === before(hit)._1,
      "an UPDATE rewrites the row IMAGE — the identity must ride through")
    assert(after(hit)._2 === 2L, "the updated row's version is the update commit")
    (after - hit).foreach { case (k, v) =>
      assert(before(k) === v, s"carried row $k must keep (id, version) exactly: $v") }
    assert(spark.sql(
      s"SELECT event_type FROM $cat.`$t` WHERE event_id = $hit").head().getString(0)
      === "patched")
  }

  test("copy-on-write MERGE: matched rows keep ids at the merge version, inserts mint fresh (r11)") {
    import spark.implicits._
    val (cat, t, dir) = scratch("cowmrg")
    val before = idsOf(cat, t)
    val n = before.size.toLong
    val hit = before.keys.min
    Seq((hit, "merged"), (990777L, "minted")).toDF("event_id", "event_type")
      .createOrReplaceTempView("cow_merge_src")
    spark.sql(
      s"""MERGE INTO $cat.`$t` g USING cow_merge_src s ON g.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET g.event_type = s.event_type
         |WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type, value)
         |  VALUES (s.event_id, 0, s.event_type, 0.0)""".stripMargin)
    val after = idsOf(cat, t)
    assert(after.size === before.size + 1)
    assert(after(hit) === ((before(hit)._1, 2L)),
      s"matched row keeps its id at the merge version: ${after(hit)}")
    assert(after(990777L)._1 >= n && after(990777L)._2 === 2L,
      s"inserted row mints a fresh id past the watermark $n: ${after(990777L)}")
    (after - hit - 990777L).foreach { case (k, v) =>
      assert(before(k) === v, s"carried row $k must keep (id, version): $v") }
    assert(after.values.map(_._1).toSeq.distinct.size === after.size)
  }

  test("COW-updated versions survive a mixed compaction bin (r12, ADVICE r11 high)") {
    // the r11 hole: a COW UPDATE's images carry in-row ids with NULL
    // `_luv` (the entry luv backed them). Compacting that file into a
    // bin with stamped members used to produce frid = -1 + runs whose
    // gaps served the in-row NULL — `WHERE _last_updated_version > K`
    // silently dropped every updated row. r12 records a luv-only run
    // (firstId = -1) so the fallback rides through the concat.
    val (cat, t, dir) = scratch("cowcompact")
    val before = idsOf(cat, t)
    val hit = before.keys.min
    spark.sql(s"UPDATE $cat.`$t` SET event_type = 'patched' WHERE event_id = $hit") // v2, COW
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    val entries = JsonlStats.readStats(dir)
    assert(entries.size === 1 && entries.head.runs.exists(_._2 == -1L),
      s"the COW member must contribute a luv-only run: ${entries.map(e => (e.frid, e.runs))}")
    val after = idsOf(cat, t)
    assert(after(hit) === ((before(hit)._1, 2L)),
      s"the updated row's (id, version) must survive the bin: ${after(hit)}")
    (after - hit).foreach { case (k, v) =>
      assert(before(k) === v, s"carried row $k drifted through the bin: $v") }
    // the incremental shape the advice named: changed-since must find
    // the updated row, and ONLY it
    val inc = spark.sql(
      s"SELECT event_id FROM $cat.`$t` WHERE _last_updated_version > 1").collect()
    assert(inc.map(_.getLong(0)).toSeq === Seq(hit),
      "WHERE _last_updated_version > K must keep serving COW-updated rows post-compact")
  }

  test("rewrite_deletes materializes the COW fallback in-row; version never drifts (r12, ADVICE r11 high)") {
    // the other maintenance leg: the collapse used to emit a luv-less
    // frid = -2 entry that the commit restamped with the MAINTENANCE
    // version, drifting fallback-served rows forward. r12 splices the
    // backing luv into each null-luv survivor and carries the entry luv.
    val (cat, t, dir) = scratch("cowrw")
    val before = idsOf(cat, t)
    val hit = before.keys.min
    spark.sql(s"UPDATE $cat.`$t` SET event_type = 'patched' WHERE event_id = $hit") // v2, COW
    // flip to merge-on-read so the next DELETE lands a DV on the COW file
    val m0 = JsonlStats.readTableMeta(dir)
    JsonlStats.writeTableMeta(dir, m0.copy(deleteMode = Some("merge-on-read")))
    val victim = spark.sql(
      s"SELECT event_id FROM $cat.`$t` WHERE event_id <> $hit ORDER BY event_id LIMIT 1")
      .head().getLong(0)
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id = $victim") // v3, DV
    val pre = idsOf(cat, t)
    assert(pre(hit)._2 === 2L)
    spark.sql(s"CALL $cat.rewrite_deletes('$t')").collect() // v4, the collapse
    val after = idsOf(cat, t)
    assert(after === pre,
      "the collapse must not drift a single (id, version) — fallback versions included")
    // and the fix is STRUCTURAL: the updated row's version now lives
    // in its bytes, immune to any later maintenance generation
    val rw = JsonlStats.readStats(dir).filter(_.frid == -2L)
    val materialized = rw.flatMap(e =>
      Files.readAllLines(Paths.get(dir, e.file)).toArray.map(_.toString))
      .filter(_.contains("\"event_type\":\"patched\""))
    assert(materialized.nonEmpty && materialized.forall(_.contains("\"_luv\":2")),
      s"the COW row's fallback version must be spliced in-row: ${materialized.map(_.take(120))}")
  }

  test("keyed-layout COW DML preserves lineage AND the pkey'd layout (r11)") {
    // identity-keyed table: one file per event_type run; the COW
    // rewrite must re-key its output (SPJ contract) while the carried
    // rows keep their commit-assigned identity
    val dir = Files.createTempDirectory("lineage_keyed").toString
    graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .orderBy($"event_type", $"event_id").coalesce(1)
      .write.format("graft-jsonl-stats").option("path", dir)
      .option("statsColumn", "event_id").option("partitionColumn", "event_type")
      .mode("overwrite").save()
    val cat = "graft_link_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    val before = idsOf(cat, t)
    val hit = before.keys.min
    spark.sql(s"UPDATE $cat.`$t` SET value = -1.0 WHERE event_id = $hit")
    val after = idsOf(cat, t)
    assert(after.size === before.size)
    assert(after(hit) === ((before(hit)._1, 2L)),
      s"the keyed UPDATE must keep the id and restamp the version: ${after(hit)}")
    (after - hit).foreach { case (k, v) => assert(before(k) === v, s"carried row $k drifted") }
    // the layout contract survives: every live entry still carries a
    // pkey, so the table keeps reporting KeyGroupedPartitioning
    val entries = JsonlStats.readStats(dir)
    assert(entries.forall(_.pkey.isDefined),
      s"replacement files must re-key: ${entries.map(e => (e.file, e.pkey))}")
  }

  test("compacting ALL-materialized members keeps in-row ids - no re-stamp (r10 review)") {
    val (cat, t, dir) = scratch("allmat", deleteMode = Some("merge-on-read"))
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id % 10 = 3") // dirties every file
    assert(JsonlStats.readStats(dir).forall(_.dvs.nonEmpty), "every file must carry a DV")
    spark.sql(s"CALL $cat.rewrite_deletes('$t')").collect()
    assert(JsonlStats.readStats(dir).forall(_.frid == -2L), "all files materialized")
    val before = idsOf(cat, t)
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    val entries = JsonlStats.readStats(dir)
    // r12 shape: each materialized member carried an entry luv, so the
    // bin records one luv-only run (firstId = -1) per member — ids are
    // STILL served from the rows; the runs only carry the null-luv
    // version fallback through the concat. The commit must not
    // re-stamp either way ("frids" declared ⇒ never restamped).
    assert(entries.size === 1 && entries.head.runs.forall(_._2 == -1L) &&
      (entries.head.frid === -2L || entries.head.runs.nonEmpty),
      s"an all-materialized bin declares in-row lineage: ${entries.map(e => (e.frid, e.runs))}")
    assert(idsOf(cat, t) === before,
      "the commit must not re-stamp a bin whose ids live in its rows")
  }

  test("adjacent same-commit runs coalesce: one run per commit, not per member (r12)") {
    // scratch writes FOUR files in ONE commit: same luv, densely
    // consecutive ids across file boundaries — the compaction product
    // must publish ONE coalesced run, not four
    val (cat, t, dir) = scratch("coalesce")
    val before = idsOf(cat, t)
    assert(JsonlStats.readStats(dir).size === 4)
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    val entries = JsonlStats.readStats(dir)
    assert(entries.size === 1 && entries.head.runs.size === 1,
      s"four same-commit members must coalesce to one run: ${entries.head.runs}")
    assert(idsOf(cat, t) === before, "coalescing is pure arithmetic — no id moves")
  }

  test("run-count ceiling: a runaway bin MATERIALIZES lineage in-row; versions exact (r12)") {
    // one file per COMMIT (distinct luv every time) — the shape rolling
    // compaction accretes: pre-r12 each generation's entry grew one run
    // per member, linear in cadence. Past MaxRunsPerEntry the bin now
    // splices ids+luvs into the bytes and publishes frid = -2, zero runs.
    val dir = Files.createTempDirectory("lineage_ceiling").toString
    val n = JsonlStats.MaxRunsPerEntry + 3
    (0 until n).foreach { j =>
      Seq((j.toLong, j.toLong, s"c$j", j.toDouble))
        .toDF("event_id", "user_id", "event_type", "value")
        .coalesce(1)
        .write.format("graft-jsonl-stats").option("path", dir)
        .option("statsColumn", "event_id")
        .mode(if (j == 0) "overwrite" else "append").save()
    }
    val cat = "graft_ceil_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    val before = idsOf(cat, t)
    // the fixture really would have blown the ceiling: n distinct luvs
    assert(before.values.map(_._2).toSet.size === n)
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    val entries = JsonlStats.readStats(dir)
    assert(entries.size === 1 && entries.head.frid === -2L && entries.head.runs.isEmpty,
      s"past the ceiling the entry must hold ZERO runs: ${entries.map(e => (e.frid, e.runs.size))}")
    assert(idsOf(cat, t) === before,
      "every (id, version) must survive the splice bit-for-bit — versions are per-commit")
    // and the bytes really carry them (no manifest carrier left):
    // append j landed at version j+1, so the event_id = n-1 row holds
    // _luv = n in its own bytes
    val ln = Files.readAllLines(Paths.get(dir, entries.head.file)).toArray
      .map(_.toString).find(_.contains(s""""event_id":${n - 1},""")).get
    assert(ln.contains("\"_row_id\":") && ln.contains(s"\"_luv\":$n"), ln.take(120))
  }

  test("next_row_id survives compact_history: watermark holds, archived ids serve verbatim (r11)") {
    val (cat, t, dir) = scratch("histcnt")
    val n0 = idsOf(cat, t).size.toLong
    // versions 2..9: eight single-row appends — enough history for the
    // delta encoder to have non-trivial work
    (0 until 8).foreach { j =>
      Seq((985000L + j, j.toLong, "h", j.toDouble))
        .toDF("event_id", "user_id", "event_type", "value")
        .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    }
    val vMid = 5 // will be delta-encoded (not keep-recent, not a full anchor)
    val midIds = spark.sql(
      s"SELECT event_id, _row_id FROM $cat.`$t` VERSION AS OF $vMid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val res = spark.sql(
      s"CALL $cat.compact_history('$t', keep_recent => 2, full_every => 4)").head()
    assert(res.getInt(0) > 0, "fixture must actually delta-encode some versions")
    // the counter is commit protocol: the delta encoding of archived
    // manifests must not perturb it — the next append continues densely
    Seq((986000L, 9L, "post", 9.0)).toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    assert(idsOf(cat, t)(986000L)._1 === n0 + 8L,
      "the watermark must ride through compact_history")
    // a delta-encoded archive still serves its ORIGINAL ids (the
    // counter line and frid stamps materialize through the delta chain)
    val midAgain = spark.sql(
      s"SELECT event_id, _row_id FROM $cat.`$t` VERSION AS OF $vMid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(midAgain === midIds,
      "time travel across delta-encoded history must serve identical lineage")
  }

  test("t.files exposes lineage posture: kinds + first_row_id/version arithmetic") {
    val (cat, t, dir) = scratch("filesmeta")
    val f0 = spark.sql(
      s"""SELECT file, rows, lineage, first_row_id, last_updated_version
         |FROM $cat.`$t`.files ORDER BY file""".stripMargin).collect()
    assert(f0.forall(_.getString(2) == "stamped"))
    // files are stamped in name order: first_row_id = running row sum
    f0.foldLeft(0L) { (acc, r) =>
      assert(r.getLong(3) === acc, s"${r.getString(0)} first_row_id")
      assert(r.getLong(4) === 1L)
      acc + r.getLong(1)
    }
    spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})")
    val f1 = spark.sql(s"SELECT lineage, first_row_id FROM $cat.`$t`.files").collect()
    assert(f1.length === 1 && f1.head.getString(0) === "runs" && f1.head.isNullAt(1),
      "a compaction product answers per-run - kind 'runs', no single first_row_id")
  }

  test("compaction racing an append: both stamp inside their own OCC swap, ids stay unique") {
    val (cat, t, dir) = scratch("race")
    // a couple of extra small files so the compactor has real work
    (0 until 2).foreach { j =>
      Seq((970000L + j, j.toLong, "pad", j.toDouble))
        .toDF("event_id", "user_id", "event_type", "value")
        .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    }
    val n = idsOf(cat, t).size.toLong
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val compactor = new Thread(() => {
      try spark.sql(s"CALL $cat.compact('$t', ${64L * 1024 * 1024})").collect()
      catch { case e: Throwable => err.set(e) }
    })
    val appender = new Thread(() => {
      try Seq.tabulate(10)(i => (980000L + i, 9L, "race", i.toDouble))
        .toDF("event_id", "user_id", "event_type", "value")
        .coalesce(1)
        .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
      catch { case e: Throwable => err.set(e) }
    })
    compactor.start(); appender.start(); compactor.join(); appender.join()
    assert(err.get() == null, s"racing maintenance/ingest must both land: ${err.get()}")
    val after = idsOf(cat, t)
    assert(after.size.toLong === n + 10)
    assert(after.values.map(_._1).toSeq.distinct.size === after.size,
      "ids stay table-unique across the race")
    val fresh = after.filter(_._1 >= 980000L).values.map(_._1).toSeq.sorted
    assert(fresh === (fresh.min until fresh.min + 10L).toSeq, "appended range stays dense")
  }

  test("streaming reads serve the same ids as batch (lineage rides the stream partitions)") {
    val (cat, t, dir) = scratch("stream")
    val batchIds = idsOf(cat, t)
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val ckpt = Files.createTempDirectory("lineage_stream_ckpt").toString
    val q = spark.readStream.format("graft-jsonl-stats").option("path", dir)
      .load()
      .selectExpr("event_id", "_row_id", "_last_updated_version")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          df.collect().foreach(r => got(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
        }: Unit)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.toMap === batchIds,
      "a streaming consumer must see the identical (_row_id, version) map the batch scan serves")
  }
}
