package graft

import graft.sources.{JsonlDvBatchWrite, JsonlStats}
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Optimistic concurrency control on the manifest protocol (r8).
  *
  * The commit loop ([[JsonlStats.commitAtomic]]) is the Delta/Iceberg
  * posture re-derived on the connector's own primitives: reserve the
  * version slot by EXCLUSIVE hard-link creation (link(2) is the CAS —
  * atomic, fails EEXIST), rebase the commit's logical action against
  * the proven-current base, swap. The laws:
  *
  *   - blind appends ALWAYS commute (Delta's append-never-conflicts);
  *   - file rewrites (DV deletes, COW, compaction, rewrite_deletes)
  *     commute with everything that left their planned entries
  *     verbatim, and CONFLICT loudly otherwise (ConcurrentDeleteDelete);
  *   - overwrites (truncate, replaceWhere) demand an unchanged base;
  *   - a reserved-but-unswapped slot (winner crashed mid-commit)
  *     stalls nobody;
  *   - streaming-txn watermarks survive whichever base wins.
  *
  * Reference: Delta's OptimisticTransaction conflict matrix (public
  * delta-io/delta `ConflictChecker.scala`), Iceberg's commit retry on
  * `rewrite_data_files`. */
class ConcurrencySpec extends SparkSpec {

  private def entry(name: String, lo: Double = 0.0, hi: Double = 1.0, rows: Long = 1L): String =
    JsonlStats.statsLine(JsonlStats.FileStats(name, lo, hi, rows))

  private def liveEntries(root: String): Set[String] =
    JsonlStats.readStats(root).map(JsonlStats.statsLine).toSet

  test("threaded append storm: every writer's entries survive, snapshots chain") {
    val root = Files.createTempDirectory("occ_storm").toString
    val threads = 8; val perThread = 3
    val pool = Executors.newFixedThreadPool(threads)
    val barrier = new CyclicBarrier(threads)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            barrier.await(20, TimeUnit.SECONDS)
            (0 until perThread).foreach { i =>
              val line = entry(f"part-t$t-$i.jsonl", t, t + 1, 10L * t + i)
              JsonlStats.commitAtomic(root, s"storm-$t-$i", base => base :+ line)
            }
          } catch { case e: Throwable => errs.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"storm writer failed: ${Option(errs.peek()).map(_.toString)}")
    val finalSet = liveEntries(root)
    assert(finalSet.size === threads * perThread,
      "every concurrent append's entry must survive — the lost-update law")
    // snapshot chain: append-only history means each archived version's
    // entry set is a subset of every later one and of the live set
    val versions = JsonlStats.historyVersions(root)
    val chain = versions.map(v =>
      JsonlStats.readStats(root, s"${JsonlStats.HistoryDir}/v$v.jsonl")
        .map(JsonlStats.statsLine).toSet)
    chain.sliding(2).foreach {
      case Seq(a, b) => assert(a.subsetOf(b), "append-only snapshots must nest")
      case _ =>
    }
    chain.lastOption.foreach(last => assert(last.subsetOf(finalSet)))
  }

  test("first generation: concurrent table creation is CAS'd, both writers' entries land") {
    val root = Files.createTempDirectory("occ_firstgen").toString
    val barrier = new CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val ts = (0 until 2).map { t =>
      new Thread(() => {
        barrier.await()
        results.add(JsonlStats.commitAtomic(root, s"first-$t",
          base => base :+ entry(s"part-first-$t.jsonl")))
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(30000))
    assert(liveEntries(root).size === 2)
    // exactly one commit CREATED the table (returned version 0)
    assert(results.asScala.toSeq.map(_.toInt).sorted === Seq(0, 1))
  }

  test("a reserved-but-unswapped slot (crashed winner) does not stall the next commit") {
    val root = Files.createTempDirectory("occ_stall").toString
    JsonlStats.commitAtomic(root, "seed", _ => Seq(entry("part-seed.jsonl")))
    // simulate a winner that reserved v1 and died before swapping: the
    // slot holds exactly the live bytes
    val hist = Paths.get(root, JsonlStats.HistoryDir)
    Files.createDirectories(hist)
    Files.copy(Paths.get(root, "_stats.jsonl"), hist.resolve("v1.jsonl"))
    val t0 = System.nanoTime()
    JsonlStats.commitAtomic(root, "next", base => base :+ entry("part-next.jsonl"),
      spinMs = 100)
    assert(liveEntries(root).size === 2, "the commit must land despite the dead reservation")
    assert(JsonlStats.currentVersion(root) >= 3,
      "the stalled slot is skipped, not reused")
    assert((System.nanoTime() - t0) < 5L * 1000 * 1000 * 1000)
  }

  test("a late swap after lease expiry cannot clobber the rival's commit (second CAS check, r8 advice)") {
    val root = Files.createTempDirectory("occ_late").toString
    JsonlStats.commitAtomic(root, "seed", _ => Seq(entry("seed.jsonl")))
    val rival = entry("rival.jsonl", 2, 3, 7L)
    @volatile var fired = false
    JsonlStats.commitAtomic(root, "slow",
      base => base :+ entry("slow.jsonl", 1, 2, 5L),
      onReserved = _ => if (!fired) {
        fired = true
        // simulate the rival that expired THIS committer's lease between
        // its reserve and swap, and committed over the reserved base —
        // the exact lost-update window the lease re-opened
        val live = Paths.get(root, "_stats.jsonl")
        val lines = (Files.readAllLines(live).asScala.toSeq :+ rival).sorted
        Files.write(live, lines.asJava, StandardOpenOption.TRUNCATE_EXISTING)
      })
    val fin = liveEntries(root)
    assert(fin.exists(_.contains("rival.jsonl")),
      "the rival's commit must survive the late swap (stillLive re-verify)")
    assert(fin.exists(_.contains("slow.jsonl")),
      "the slow committer retries on the new base and lands too")
    assert(fin.size === 3)
  }

  test("crash debris older than the lease is expired by AGE: a new committer pays no spin") {
    val root = Files.createTempDirectory("occ_debris").toString
    JsonlStats.commitAtomic(root, "seed", _ => Seq(entry("part-seed.jsonl")))
    val hist = Paths.get(root, JsonlStats.HistoryDir)
    Files.createDirectories(hist)
    val slot = hist.resolve("v1.jsonl")
    Files.copy(Paths.get(root, "_stats.jsonl"), slot)
    // age the debris past any lease: a caller must not wait even once
    // (pre-fix each NEW commitAtomic call paid one full spin apiece)
    Files.setLastModifiedTime(slot,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000L))
    val t0 = System.nanoTime()
    JsonlStats.commitAtomic(root, "next", base => base :+ entry("part-next.jsonl"),
      spinMs = 3000)
    assert((System.nanoTime() - t0) < 2L * 1000 * 1000 * 1000,
      "aged debris must be skipped without a lease wait")
    assert(liveEntries(root).size === 2)
  }

  test("rebaseRewrite: commutes with concurrent appends, conflicts on a changed member") {
    val a = entry("a.jsonl", 0, 1, 5); val b = entry("b.jsonl", 1, 2, 5)
    val c = entry("c.jsonl", 2, 3, 5); val appended = entry("new.jsonl", 9, 10, 1)
    val bin = entry("bin-ab.jsonl", 0, 2, 10)
    // concurrent append rides through the rewrite untouched
    assert(JsonlStats.rebaseRewrite(Seq(a, b), Seq(bin))(Seq(a, b, c, appended)).toSet ===
      Set(c, appended, bin))
    // a member that changed under the rewrite (here: grew a DV) conflicts
    val aWithDv = JsonlStats.statsLine(JsonlStats.parseStatsLines(Seq(a)).head
      .copy(dvs = Seq("_deletes/a.dv"), dels = 2))
    intercept[java.util.ConcurrentModificationException] {
      JsonlStats.rebaseRewrite(Seq(a, b), Seq(bin))(Seq(aWithDv, b, c))
    }
    // a member that vanished (another rewrite took it) conflicts too
    intercept[java.util.ConcurrentModificationException] {
      JsonlStats.rebaseRewrite(Seq(a, b), Seq(bin))(Seq(b, c))
    }
  }

  test("rebaseOverwrite: any concurrent commit under a truncate/replace conflicts") {
    val a = entry("a.jsonl"); val b = entry("b.jsonl"); val x = entry("x.jsonl")
    assert(JsonlStats.rebaseOverwrite(Seq(a), Seq(x))(Seq(a)) === Seq(x))
    intercept[java.util.ConcurrentModificationException] {
      JsonlStats.rebaseOverwrite(Seq(a), Seq(x))(Seq(a, b))
    }
  }

  test("concurrent DV deletes: disjoint files compose, same file conflicts") {
    val root = Files.createTempDirectory("occ_dv").toString
    JsonlStats.commitAtomic(root, "seed",
      _ => Seq(entry("f1.jsonl", 0, 1, 10), entry("f2.jsonl", 1, 2, 10)))
    // a DEFINED table (every real write path publishes the sidecar
    // before any DV lands): the feature stamp refuses schema-less
    // tables loudly since the r9c review
    JsonlStats.writeTableMeta(root, JsonlStats.statsColumn, None, JsonlStats.schema)
    def dvCommit(file: String, dv: String, dels: Long) =
      Array[WriterCommitMessage](graft.sources.JsonlDvCommit(Seq((file, dv, dels))))
    // both writes constructed against the SAME snapshot (their planned
    // references agree), then committed one after the other
    val onF1 = new JsonlDvBatchWrite(root, "del-f1")
    val onF2 = new JsonlDvBatchWrite(root, "del-f2")
    onF2.commit(dvCommit("f2.jsonl", "_deletes/f2-a.dv", 3))
    onF1.commit(dvCommit("f1.jsonl", "_deletes/f1-a.dv", 2))
    val byFile = JsonlStats.readStats(root).map(s => s.file -> s).toMap
    assert(byFile("f1.jsonl").dels === 2 && byFile("f2.jsonl").dels === 3,
      "disjoint concurrent deletes must both land")
    // same-file race: two ops planned against the same snapshot, the
    // second to commit would double-mask -> ConcurrentDeleteDelete
    val lateA = new JsonlDvBatchWrite(root, "del-f1-a")
    val lateB = new JsonlDvBatchWrite(root, "del-f1-b")
    lateA.commit(dvCommit("f1.jsonl", "_deletes/f1-b.dv", 1))
    intercept[java.util.ConcurrentModificationException] {
      lateB.commit(dvCommit("f1.jsonl", "_deletes/f1-c.dv", 1))
    }
    assert(JsonlStats.readStats(root).find(_.file == "f1.jsonl").get.dels === 3,
      "the losing delete must not have double-counted dels")
  }

  test("live-manifest snapshot cache: identity hits, every mutation visible (r12)") {
    val root = Files.createTempDirectory("snapcache").toString
    JsonlStats.commitAtomic(root, "a", _ => Seq(entry("a.jsonl", 0, 1, 5)))
    val s1 = JsonlStats.readStats(root)
    // same manifest identity -> the cache serves the SAME parsed
    // snapshot instance (reference equality is the hit's witness)
    assert(JsonlStats.readStats(root) eq s1, "unchanged manifest must hit the cache")
    // a commit swaps a fresh inode in -> new snapshot, immediately
    JsonlStats.commitAtomic(root, "b", base => base :+ entry("b.jsonl", 1, 2, 5))
    val s2 = JsonlStats.readStats(root)
    assert(s2.map(_.file).toSet === Set("a.jsonl", "b.jsonl"))
    // even an IN-PLACE edit (same inode — the crash-injection shape,
    // not a protocol write) changes size/mtime and must be visible
    val live = Paths.get(root, "_stats.jsonl")
    val lines = (Files.readAllLines(live).asScala.toSeq :+ entry("c.jsonl", 2, 3, 5)).sorted
    Files.write(live, lines.asJava, StandardOpenOption.TRUNCATE_EXISTING)
    assert(JsonlStats.readStats(root).map(_.file).toSet ===
      Set("a.jsonl", "b.jsonl", "c.jsonl"), "in-place mutation must invalidate")
  }

  test("branch-head DML: disjoint rewrites compose, a same-member race conflicts, main appends commute then wedge the publish (r12)") {
    import graft.sources.Refs
    val root = Files.createTempDirectory("occ_branch").toString
    JsonlStats.commitAtomic(root, "seed",
      _ => Seq(entry("a.jsonl", 0, 1, 5), entry("b.jsonl", 1, 2, 5)))
    val mainLines = JsonlStats.readStats(root).map(JsonlStats.statsLine).sorted
    Refs.createBranch(root, "fix")
    def headLine(file: String): String =
      Refs.readRef(root, Refs.branchManifest("fix")).entries
        .find(_.contains("\"" + file + "\"")).get
    def headFiles: Set[String] =
      JsonlStats.parseStatsLines(
        Refs.readRef(root, Refs.branchManifest("fix")).entries).map(_.file).toSet
    // stage a load, then two row-level fixes planned against the same
    // branch head touching DISJOINT members: both compose — the exact
    // main-side rewrite law, applied to the branch file
    Refs.commitBranch(root, "fix", base => base :+ entry("staged.jsonl", 2, 3, 4))
    val aLine = headLine("a.jsonl"); val stagedLine = headLine("staged.jsonl")
    Refs.commitBranch(root, "fix",
      JsonlStats.rebaseRewrite(Seq(aLine), Seq(entry("a-cow.jsonl", 0, 1, 4))))
    Refs.commitBranch(root, "fix",
      JsonlStats.rebaseRewrite(Seq(stagedLine), Seq(entry("staged-cow.jsonl", 2, 3, 3))))
    assert(headFiles === Set("a-cow.jsonl", "b.jsonl", "staged-cow.jsonl"))
    // a rival that planned against the SUPERSEDED head (its member was
    // rewritten under it) conflicts loudly — never applies twice
    intercept[java.util.ConcurrentModificationException] {
      Refs.commitBranch(root, "fix",
        JsonlStats.rebaseRewrite(Seq(stagedLine), Seq(entry("late.jsonl", 2, 3, 1))))
    }
    assert(headFiles === Set("a-cow.jsonl", "b.jsonl", "staged-cow.jsonl"),
      "the losing DML must leave the head untouched")
    // every branch mutation left main byte-identical (isolation)
    assert(JsonlStats.readStats(root).map(JsonlStats.statsLine).sorted === mainLines)
    // a rival append to MAIN post-fork commutes with branch DML — both
    // histories advance — and the PUBLISH then wedges loudly (WAP:
    // fast-forward is append-only ancestry, never a silent merge)
    JsonlStats.commitAtomic(root, "rival", base => base :+ entry("rival.jsonl", 9, 10, 1))
    val ex = intercept[java.util.ConcurrentModificationException] {
      Refs.fastForward(root, "fix", "publish")
    }
    assert(ex.getMessage.contains("diverged"))
    assert(JsonlStats.readStats(root).map(_.file).toSet === Set("a.jsonl", "b.jsonl", "rival.jsonl"),
      "failed publish must not touch main")
    assert(headFiles === Set("a-cow.jsonl", "b.jsonl", "staged-cow.jsonl"),
      "failed publish must not touch the branch")
  }

  test("fast_forward serializes with racing branch commits: published main is never a lost-update head (r12)") {
    import graft.sources.Refs
    (0 until 10).foreach { i =>
      val root = Files.createTempDirectory(s"occ_ffrace$i").toString
      JsonlStats.commitAtomic(root, "seed", _ => Seq(entry("base.jsonl", 0, 1, 5)))
      Refs.createBranch(root, "stage")
      Refs.commitBranch(root, "stage", base => base :+ entry("staged.jsonl", 1, 2, 3))
      val pool = Executors.newFixedThreadPool(2)
      val barrier = new CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      pool.submit(new Runnable { override def run(): Unit =
        try { barrier.await(20, TimeUnit.SECONDS); Refs.fastForward(root, "stage", s"ff-$i") }
        catch { case e: Throwable => errs.add(e) } })
      pool.submit(new Runnable { override def run(): Unit =
        try {
          barrier.await(20, TimeUnit.SECONDS)
          Refs.commitBranch(root, "stage", base => base :+ entry("late.jsonl", 2, 3, 1))
        } catch { case e: Throwable => errs.add(e) } })
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(errs.isEmpty, s"racer failed: ${Option(errs.peek()).map(_.toString)}")
      val head = JsonlStats.parseStatsLines(
        Refs.readRef(root, Refs.branchManifest("stage")).entries).map(_.file).toSet
      val main = JsonlStats.readStats(root).map(_.file).toSet
      // the branch commit is NEVER lost from the head…
      assert(head === Set("base.jsonl", "staged.jsonl", "late.jsonl"))
      // …and main is the branch head AS OF the publish's commit — with
      // the late commit when it serialized first, without it when the
      // publish won; never anything else (the pre-r12 stale-snapshot
      // read could publish neither).
      assert(main === head || main === head - "late.jsonl",
        s"published main must be a branch head, got $main")
      // a publish that missed the late commit is not a silent drop:
      // the re-publish says so loudly (main moved past the fork)
      if (main != head)
        assert(intercept[java.util.ConcurrentModificationException] {
          Refs.fastForward(root, "stage", s"ff2-$i")
        }.getMessage.contains("diverged"))
    }
  }

  test("streaming-txn watermarks survive whichever base wins") {
    val root = Files.createTempDirectory("occ_txn").toString
    JsonlStats.commitAtomic(root, "seed", _ => Seq(entry("seed.jsonl")),
      ownTxns = Seq(JsonlStats.txnLine("appX", 5)))
    JsonlStats.commitAtomic(root, "y1", base => base :+ entry("y1.jsonl"),
      ownTxns = Seq(JsonlStats.txnLine("appY", 1)))
    assert(JsonlStats.readTxns(root) === Map("appX" -> 5L, "appY" -> 1L))
    JsonlStats.commitAtomic(root, "y2", base => base :+ entry("y2.jsonl"),
      ownTxns = Seq(JsonlStats.txnLine("appY", 2)))
    assert(JsonlStats.readTxns(root) === Map("appX" -> 5L, "appY" -> 2L),
      "own app's watermark replaces; every other app's carries forward")
  }

  test("SQL level: concurrent INSERT INTO appenders through the catalog all survive") {
    import spark.implicits._
    val dir = Files.createTempDirectory("occ_sql_table").toString
    spark.range(10).select(
        $"id".as("event_id"), ($"id" % 3).as("user_id"),
        lit("seed").as("event_type"), ($"id" * 1.0).as("value"))
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    val cat = "graft_occ_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      Paths.get(dir).getParent.toString)
    val table = Paths.get(dir).getFileName.toString
    val threads = 4; val perThread = 2
    val pool = Executors.newFixedThreadPool(threads)
    val barrier = new CyclicBarrier(threads)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            barrier.await(20, TimeUnit.SECONDS)
            (0 until perThread).foreach { i =>
              val id = 1000 + t * 10 + i
              spark.sql(
                s"INSERT INTO $cat.$table VALUES ($id, ${t}L, 'ins', ${t}.5)")
            }
          } catch { case e: Throwable => errs.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"concurrent INSERT failed: ${Option(errs.peek()).map(_.toString)}")
    val got = spark.sql(s"SELECT event_id FROM $cat.$table WHERE event_type = 'ins'")
      .as[Long].collect().toSet
    val want = (for (t <- 0 until threads; i <- 0 until perThread)
      yield 1000L + t * 10 + i).toSet
    assert(got === want, "every concurrent INSERT's rows must be readable — no lost update")
    assert(spark.sql(s"SELECT count(*) FROM $cat.$table").head().getLong(0) === 10L + threads * perThread)
  }

  test("dynamic partition overwrite OCC: appends to untouched keys commute, " +
    "a replaced-key racer conflicts loudly, branch routing isolates main (r13)") {
    import graft.sources.{JsonlBatchWrite, JsonlFileCommit, Refs}
    import org.apache.spark.sql.types.{DoubleType, StringType, StructType}
    val root = Files.createTempDirectory("occ_dynover").toString
    val schema = new StructType().add("k", StringType).add("v", DoubleType)
    def keyed(name: String, k: String): String =
      JsonlStats.statsLine(JsonlStats.FileStats(name, 0.0, 1.0, 5L,
        pkey = Some(k), pspec = Some("k")))
    def msg(name: String, k: String): Array[WriterCommitMessage] =
      Array(JsonlFileCommit(name, 0.0, 1.0, 5L, pkey = Some(k)))
    def mkWrite(qid: String, branch: Option[String] = None) =
      new JsonlBatchWrite(root, schema, qid, false, "v",
        partitionCol = Some("k"), branch = branch, dynamicOverwrite = true)
    JsonlStats.commitAtomic(root, "seed",
      _ => Seq(keyed("a1.jsonl", "a"), keyed("b1.jsonl", "b")))
    // 1. racer on an UNTOUCHED key lands between plan and commit: both
    // survive — the overwrite stays per-key blind outside its keys
    val w1 = mkWrite("dyn-1") // plans the base NOW
    JsonlStats.commitAtomic(root, "racer-c", base => base :+ keyed("c1.jsonl", "c"))
    w1.commit(msg("b2.jsonl", "b"))
    assert(liveEntries(root).map(l => JsonlStats.parseStatsLines(Seq(l)).head.file)
      === Set("a1.jsonl", "c1.jsonl", "b2.jsonl"),
      "untouched-key racer must commute; replaced key must swap")
    // 2. racer on a REPLACED key: its data was never seen by the
    // overwrite job — the swap would silently destroy it, so the
    // overwrite must conflict loudly and leave the table untouched
    val w2 = mkWrite("dyn-2")
    JsonlStats.commitAtomic(root, "racer-a", base => base :+ keyed("a9.jsonl", "a"))
    val before = liveEntries(root)
    val ex = intercept[java.util.ConcurrentModificationException] {
      w2.commit(msg("a2.jsonl", "a"))
    }
    assert(ex.getMessage.contains("a9.jsonl"), ex.getMessage)
    assert(liveEntries(root) === before, "the losing overwrite must change nothing")
    // 3. branch routing: the overwrite rebases the BRANCH head; main
    // stays byte-identical until fast_forward publishes
    Refs.createBranch(root, "reload")
    val mainBefore = liveEntries(root)
    val wb = mkWrite("dyn-b", branch = Some("reload"))
    wb.commit(msg("a3.jsonl", "a"))
    val headFiles = JsonlStats.parseStatsLines(
      Refs.readRef(root, Refs.branchManifest("reload")).entries).map(_.file).toSet
    assert(headFiles === Set("a3.jsonl", "b2.jsonl", "c1.jsonl"),
      "branch overwrite must replace the key AT the branch")
    assert(liveEntries(root) === mainBefore, "main must be untouched by branch DML")
  }
}
