package graft

import graft.gold.Incremental
import graft.ingest.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The batch ledger is what makes additive refresh exactly-once; prove
  * both directions. */
class IncrementalSpec extends SparkSpec {

  test("additive refresh: replayed batch id is a no-op, new batch id adds") {
    val gold = {
      val t = Files.createTempDirectory("graft_gold_inc").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val delta = Incremental.toGoldGrain(
      Tables.events(spark, sfDir).filter(dayofmonth(col("ts")) <= 7))
    def total(): Long =
      spark.read.parquet(gold).agg(sum("n_events")).head.getLong(0)
    Incremental.refreshAdditive(gold, delta, "b1")
    val once = total()
    // at-least-once delivery: the SAME batch replayed must not double-count
    Incremental.refreshAdditive(gold, delta, "b1")
    assert(total() === once, "replay of an applied batch must be a no-op")
    // but a genuinely new batch (new id) does add — the batch stamp is
    // the guard, not accidental idempotence of the data
    Incremental.refreshAdditive(gold, delta, "b2")
    assert(total() === 2 * once)
  }

  test("crash between table swap and ledger marker: replay does not double-count") {
    val gold = {
      val t = Files.createTempDirectory("graft_gold_crash").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val delta = Incremental.toGoldGrain(
      Tables.events(spark, sfDir).filter(dayofmonth(col("ts")) <= 7))
    def total(): Long =
      spark.read.parquet(gold).agg(sum("n_events")).head.getLong(0)
    Incremental.refreshAdditive(gold, delta, "hist")
    val once = total()
    // apply b1 fully, then simulate the crash window: the table swap
    // committed but the process died before the ledger marker landed
    Incremental.refreshAdditive(gold, delta, "b1")
    val applied = total()
    assert(applied === 2 * once)
    Files.delete(java.nio.file.Paths.get(gold + "__applied_b1"))
    // restart replays the batch — the in-row batch stamp must absorb it
    Incremental.refreshAdditive(gold, delta, "b1")
    assert(total() === applied, "crash-window replay must not double-count")
    // and the replay re-commits the marker, so the ledger heals
    assert(Files.exists(java.nio.file.Paths.get(gold + "__applied_b1")))
  }

  test("torn data phase: other batches' files untouched byte-for-byte; replay converges") {
    val gold = {
      val t = Files.createTempDirectory("graft_gold_torn").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val ev = Tables.events(spark, sfDir)
    val delta = Incremental.toGoldGrain(ev.filter(dayofmonth(col("ts")) <= 7))
    def total(): Long =
      spark.read.parquet(gold).agg(sum("n_events")).head.getLong(0)
    def filesOf(batch: String): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(gold)).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.contains(s"batch_id=$batch"))
        .map(p => p.toString -> Files.size(p)).toMap
    }
    Incremental.refreshAdditive(gold, delta, "hist")
    val once = total()
    val histFiles = filesOf("hist")
    Incremental.refreshAdditive(gold, delta, "b1")
    val applied = total()
    assert(applied === 2 * once)
    // per-batch partitioning: applying b1 must not have rewritten a
    // single hist file (the crash-isolation property — the old
    // base-union design rewrote whole date partitions)
    assert(filesOf("hist") === histFiles,
      "applying b1 touched hist's files — batch isolation broken")
    // simulate a crash that tore b1's own data phase: one of ITS leaf
    // dirs vanishes, the marker never landed
    import spark.implicits._
    val someDate = spark.read.parquet(gold)
      .filter($"batch_id" === "b1")
      .select($"event_date").distinct().orderBy($"event_date").head.get(0)
    graft.util.Fs.deleteRecursively(gold + s"/event_date=$someDate/batch_id=b1")
    Files.delete(java.nio.file.Paths.get(gold + "__applied_b1"))
    assert(total() < applied, "tear must have removed some of b1")
    // restart replays b1: its partitions are rewritten in full, hist
    // stays byte-identical — exactly once
    Incremental.refreshAdditive(gold, delta, "b1")
    assert(total() === applied, "torn-phase replay must converge to exactly-once")
    assert(filesOf("hist") === histFiles,
      "replaying b1 touched hist's files — batch isolation broken")
  }

  test("unpublished batch is invisible to the published (ledger-filtered) read") {
    val gold = {
      val t = Files.createTempDirectory("graft_gold_pub").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val delta = Incremental.toGoldGrain(
      Tables.events(spark, sfDir).filter(dayofmonth(col("ts")) <= 7))
    def publishedTotal(): Long = {
      import spark.implicits._
      spark.read.parquet(gold)
        .filter($"batch_id".isin(Incremental.appliedBatches(gold): _*))
        .agg(sum("n_events")).head.getLong(0)
    }
    Incremental.refreshAdditive(gold, delta, "hist")
    val once = publishedTotal()
    // b1's data phase lands but the publish phase does not (crash
    // between the two): readers must not see b1
    Incremental.refreshAdditive(gold, delta, "b1")
    Files.delete(java.nio.file.Paths.get(gold + "__applied_b1"))
    assert(Incremental.appliedBatches(gold) === Seq("hist"))
    assert(publishedTotal() === once,
      "an unpublished batch leaked into the published read")
    // replay publishes; now it counts
    Incremental.refreshAdditive(gold, delta, "b1")
    assert(publishedTotal() === 2 * once)
  }

  test("ledgered fold: reads identical across fold + vacuum; folded-batch replay stays a no-op") {
    import spark.implicits._
    val gold = {
      val t = Files.createTempDirectory("graft_gold_fold").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val ev = Tables.events(spark, sfDir)
    val d1 = Incremental.toGoldGrain(ev.filter(dayofmonth(col("ts")) <= 7))
    val d2 = Incremental.toGoldGrain(ev.filter(dayofmonth(col("ts")) === 8))
    def read(): Seq[org.apache.spark.sql.Row] = {
      val eff = Incremental.effectiveBatches(gold)
      spark.read.parquet(gold)
        .filter($"batch_id".isin(eff: _*))
        .groupBy($"event_date", $"event_type")
        .agg(sum($"n_events").as("n_events"), sum($"total_dec").as("total_dec"))
        .orderBy($"event_date", $"event_type").collect().toSeq
    }
    Incremental.refreshAdditive(gold, d1, "b1")
    Incremental.refreshAdditive(gold, d2, "b2")
    val before = read()
    // fold the two published batches into one generation
    Incremental.foldPublished(spark, gold, "fold-1")
    assert(Incremental.appliedBatches(gold).toSet === Set("b1", "b2", "fold-1"))
    assert(Incremental.effectiveBatches(gold) === Seq("fold-1"),
      "fold must retire its inputs from the effective frontier")
    assert(read() === before, "read changed across the fold")
    // replay of the FOLDED batch: its own marker is still on disk, so
    // the upstream redelivery hits the fast path and nothing changes
    Incremental.refreshAdditive(gold, d1, "b1")
    assert(read() === before, "replay of a folded batch was not a no-op")
    // fold replay is itself a no-op
    Incremental.foldPublished(spark, gold, "fold-1")
    assert(read() === before)
    // vacuum removes the retired leaves; the read resolves identically
    Incremental.vacuumRetired(gold)
    assert(read() === before, "read changed after vacuuming retired leaves")
    assert(spark.read.parquet(gold).select($"batch_id").distinct()
      .collect().map(_.getString(0)).toSet === Set("fold-1"),
      "vacuum left retired batch directories behind")
    // a NEW batch after the fold adds on top of the folded generation
    Incremental.refreshAdditive(gold, d2, "b3")
    val withB3 = read()
    assert(withB3.map(_.getAs[Long]("n_events")).sum ===
      before.map(_.getAs[Long]("n_events")).sum +
        d2.agg(sum($"n_events")).head.getLong(0))
    // and a SECOND fold folds the fold + the new batch; reads still fixed
    Incremental.foldPublished(spark, gold, "fold-2")
    assert(Incremental.effectiveBatches(gold) === Seq("fold-2"),
      "fold-of-fold must retire both fold-1 and b3")
    assert(read() === withB3, "read changed across the second fold")
  }

  test("torn fold data phase is invisible; fold replay converges") {
    import spark.implicits._
    val gold = {
      val t = Files.createTempDirectory("graft_gold_foldtear").toString
      graft.util.Fs.deleteRecursively(t); t
    }
    val ev = Tables.events(spark, sfDir)
    val d1 = Incremental.toGoldGrain(ev.filter(dayofmonth(col("ts")) <= 7))
    def read(): Seq[org.apache.spark.sql.Row] = {
      val eff = Incremental.effectiveBatches(gold)
      spark.read.parquet(gold)
        .filter($"batch_id".isin(eff: _*))
        .groupBy($"event_date", $"event_type")
        .agg(sum($"n_events").as("n_events"))
        .orderBy($"event_date", $"event_type").collect().toSeq
    }
    Incremental.refreshAdditive(gold, d1, "b1")
    val before = read()
    // simulate the crash window: the fold's DATA phase lands (its leaves
    // exist) but the marker never does — readers must not see the fold,
    // and b1 stays effective
    val folded = spark.read.parquet(gold).filter($"batch_id" === "b1")
      .groupBy($"event_date", $"event_type")
      .agg(sum($"n_events").as("n_events"),
        sum($"total_dec").cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("total_dec"))
    Incremental.writePartials(gold, folded, "fold-1")
    assert(Incremental.effectiveBatches(gold) === Seq("b1"),
      "an unpublished fold leaked into the frontier")
    assert(read() === before, "a torn fold changed the read")
    // restart replays the fold: data phase rewrites its own leaves in
    // full, the marker lands atomically, frontier flips to the fold
    Incremental.foldPublished(spark, gold, "fold-1")
    assert(Incremental.effectiveBatches(gold) === Seq("fold-1"))
    assert(read() === before, "fold replay did not converge")
  }

  test("cross-table txn: a torn pair write is invisible in BOTH tables; replay completes atomically") {
    import spark.implicits._
    val (a, b) = Incremental.ensureGoldPair(spark, sfDir)
    // read at the current frontier WITHOUT the ensure: ensureGoldPair's
    // self-heal would wipe the extra transaction this test publishes
    def snapshot() = Incremental.readPair(spark, a, b).collect().toSeq
    val before = snapshot()
    // every published day must satisfy the pair invariant
    assert(before.forall(_.getAs[Boolean]("consistent")),
      "published snapshot violates the cross-table invariant")
    // torn transaction: batch b2's data lands in table A only — no
    // marker, table B untouched (the crash window between the phases).
    // try/finally: a failed assertion must not strand the b2 residue —
    // ensureGoldPair would heal it anyway (any txn outside {hist, b1}
    // triggers a rebuild), but the spec cleans up after itself.
    try {
      val b2 = Incremental.toGoldGrain(
        Tables.events(spark, sfDir).filter(dayofmonth(col("ts")) === 8))
      Incremental.writePartials(a, b2, "b2")
      assert(Incremental.appliedTxns(a) === Seq("b1", "hist"))
      assert(snapshot() === before,
        "a torn cross-table transaction leaked into the consistent read")
      // replay runs BOTH data phases (A's idempotent rewrite, B's first
      // write) and publishes; the new frontier is consistent again
      Incremental.refreshPair(a, b,
        Tables.events(spark, sfDir).filter(dayofmonth(col("ts")) === 8), "b2")
      val after = snapshot()
      assert(Incremental.appliedTxns(a) === Seq("b1", "b2", "hist"))
      assert(after.forall(_.getAs[Boolean]("consistent")))
      assert(after.map(_.getAs[Long]("n_events_types")).sum >
        before.map(_.getAs[Long]("n_events_types")).sum,
        "the completed transaction added no rows")
    } finally {
      // remove b2 so the fixture stays two-batch for q141 runs
      graft.util.Fs.deleteRecursively(a); graft.util.Fs.deleteRecursively(b)
      Seq("hist", "b1", "b2").foreach(t =>
        Files.deleteIfExists(java.nio.file.Paths.get(a + s"__txn_$t")))
    }
  }

  test("q201 join IVM: the four delta-algebra terms partition the full join exactly") {
    import spark.implicits._
    val o = graft.ingest.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val c = graft.ingest.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey")
    val full = o.join(c, $"o_custkey" === $"c_custkey")
    val oBase = o.filter($"o_orderkey" % 10 =!= 7)
    val oDelta = o.filter($"o_orderkey" % 10 === 7)
    val cBase = c.filter($"c_custkey" % 10 =!= 3)
    val cDelta = c.filter($"c_custkey" % 10 === 3)
    val terms = Seq(
      oBase.join(cBase, $"o_custkey" === $"c_custkey"),
      oDelta.join(cBase, $"o_custkey" === $"c_custkey"),
      oBase.join(cDelta, $"o_custkey" === $"c_custkey"),
      oDelta.join(cDelta, $"o_custkey" === $"c_custkey"))
    // disjoint terms whose union is the full join, row-exactly — the
    // identity that makes the delta refresh EQUAL the recompute, not
    // approximate it
    val counts = terms.map(_.count())
    assert(counts.sum === full.count(), s"terms must partition the join: $counts")
    val union = terms.map(_.select($"o_orderkey", $"c_custkey")).reduce(_ unionByName _)
    assert(union.exceptAll(full.select($"o_orderkey", $"c_custkey")).isEmpty &&
      full.select($"o_orderkey", $"c_custkey").exceptAll(union).isEmpty)
    // each incremental term is delta-sized: strictly smaller than the
    // base-base term (the refresh never re-joins the base)
    assert(counts.tail.forall(_ < counts.head),
      s"incremental terms must be delta-sized: $counts")
    // and the registered query equals the monolithic aggregate
    val ivm = graft.gold.Incremental.joinIvm(spark, sfDir)
    val mono = full.groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        graft.util.Det.msum($"o_totalprice").as("revenue"))
      .orderBy($"c_nationkey")
    assert(ivm.exceptAll(mono).isEmpty && mono.exceptAll(ivm).isEmpty)
  }

  test("q229 CDF->IVM: deltas are change-feed rows and the refresh reads only changed files (r8)") {
    import spark.implicits._
    import graft.sources.{ChangeFeed, JsonlStats}
    val (oDir, cDir) = graft.gold.Incremental.ensureCdfIvmTables(spark, sfDir)
    // the file-level law: v2 strictly extends v1 (append-only delta),
    // and the CDF's derived manifests name EXACTLY the difference -
    // nothing removed, nothing re-imaged
    for ((root, key) <- Seq((oDir, "o_orderkey"), (cDir, "c_custkey"))) {
      val v1 = JsonlStats.readStats(root, s"${JsonlStats.HistoryDir}/v1.jsonl").map(_.file).toSet
      val v2 = JsonlStats.readStats(root).map(_.file).toSet
      assert(v1.subsetOf(v2) && (v2 -- v1).nonEmpty, s"$root: v2 must extend v1")
      ChangeFeed.tableChanges(spark, root, 1, 2, Seq(key)).collect() // materializes _cdf
      val added = JsonlStats.readStats(root, "_cdf/v1_v2_added.jsonl").map(_.file).toSet
      val removed = JsonlStats.readStats(root, "_cdf/v1_v2_removed.jsonl").map(_.file).toSet
      assert(added === (v2 -- v1), s"$root: CDF added-set must be exactly the new files")
      assert(removed.isEmpty, s"$root: an append-only delta removes nothing")
      // the refresh's delta-scan cost IS the added files' rows: the CDF
      // row count equals the rows of the added manifest alone
      val addedRows = JsonlStats.readStats(root, "_cdf/v1_v2_added.jsonl").map(_.rows).sum
      val cdfRows = ChangeFeed.tableChanges(spark, root, 1, 2, Seq(key)).count()
      assert(cdfRows === addedRows,
        s"$root: CDF must surface exactly the changed-file rows ($cdfRows vs $addedRows)")
    }
    // every CDF row is an insert image (no DV/update noise in this feed)
    val oCdf = ChangeFeed.tableChanges(spark, oDir, 1, 2, Seq("o_orderkey"))
    assert(oCdf.filter($"change_type" =!= "insert").isEmpty)
    // end to end: the CDF-driven refresh equals the monolithic recompute
    val got = graft.gold.Incremental.cdfJoinIvm(spark, sfDir)
    val o = graft.ingest.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val c = graft.ingest.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey".cast("long").as("c_nationkey"))
    val mono = o.join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        graft.util.Det.msum($"o_totalprice").as("revenue"))
      .orderBy($"c_nationkey")
    assert(got.exceptAll(mono).isEmpty && mono.exceptAll(got).isEmpty)
  }
}
