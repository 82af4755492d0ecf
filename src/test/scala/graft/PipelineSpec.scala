package graft

import graft.ingest.{Landing, Sinks, Tables}
import graft.schemas.Schemas
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Ingest/sink/streaming behaviors the oracle can't check: graceful
  * entity skip (P3), bucketed-table writes (S6), stateful streaming
  * sessionization across micro-batches. */
class PipelineSpec extends SparkSpec {

  test("S8: parallelism-matched layout is pure layout — split tables equal the source rows") {
    // the invariant every query now rests on: Tables.lineitem/orders/
    // documents/embeddings read a multi-file re-layout, which must be
    // row-identical to the driver's single-file original
    for (t <- Seq("lineitem", "orders", "documents", "embeddings")) {
      val direct = ingest.Tables.table(spark, sfDir, t)
      val split = t match {
        case "lineitem"   => ingest.Tables.lineitem(spark, sfDir)
        case "orders"     => ingest.Tables.orders(spark, sfDir)
        case "documents"  => ingest.Tables.documents(spark, sfDir)
        case "embeddings" => ingest.Tables.embeddings(spark, sfDir)
      }
      assert(split.exceptAll(direct).count() === 0, s"$t: split has extra rows")
      assert(direct.exceptAll(split).count() === 0, s"$t: split lost rows")
      assert(split.rdd.getNumPartitions > 1, s"$t: layout did not split")
    }
  }

  test("P3: missing entity glob skips cleanly instead of failing") {
    val empty = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val r = silver.ReferenceEtl.processEntity(
      spark, empty, "transaction", Schemas.transactionEvents, "transaction_type")
    assert(r.isEmpty)
  }

  test("P3: present entity with required column passes the gate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_landing").toString
    Seq(("t1", "purchase"), ("t2", "refund"))
      .toDF("transaction_id", "transaction_type")
      .write.mode("overwrite").json(s"$dir/sub")
    // route with the reference-style glob (entity prefix)
    val hits = spark.read.json(s"$dir/sub/part-*.json")
    assert(hits.columns.contains("transaction_type"))
    val gated = silver.ReferenceEtl.processEntity(
      spark, s"$dir/sub", "part", // files are part-*.json
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("transaction_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("transaction_type", org.apache.spark.sql.types.StringType))),
      "transaction_type")
    assert(gated.isDefined && gated.get.count() === 2)
  }

  test("P3: entity whose wire records lack the required column is SKIPPED") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_landing_miss").toString
    // files exist, records parse — but no record carries transaction_type
    Seq("t1", "t2").toDF("transaction_id")
      .write.mode("overwrite").json(s"$dir/sub")
    val gated = silver.ReferenceEtl.processEntity(
      spark, s"$dir/sub", "part",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("transaction_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("transaction_type", org.apache.spark.sql.types.StringType))),
      "transaction_type")
    // the imposed schema DECLARES the column; the gate must still skip,
    // because the wire data never carries it (the reference's inferred-
    // frame check would have skipped too)
    assert(gated.isEmpty, "gate passed a frame whose wire data lacks the required column")
  }

  test("S6: bucketed table write → table readable, bucket metadata present") {
    import spark.implicits._
    val df = Tables.customer(spark, sfDir).select($"c_custkey", $"c_acctbal")
    Sinks.bucketedTable(df, 4, "c_custkey", "bucketed_customers_test")
    val back = spark.table("bucketed_customers_test")
    assert(back.count() === df.count())
    val desc = spark.sql("DESCRIBE EXTENDED bucketed_customers_test")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(desc.contains("c_custkey"))
    spark.sql("DROP TABLE bucketed_customers_test")
  }

  test("S5: CSV sink round-trips the gold daily aggregate losslessly") {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(graft.util.Det.msum($"o_totalprice").as("revenue"))
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Sinks.csvSink(daily, dir)
    val back = Sinks.readCsv(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("day", org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("revenue", org.apache.spark.sql.types.DoubleType))))
    assert(back.exceptAll(daily).isEmpty && daily.exceptAll(back).isEmpty)
    // single file + header, per the reference gold contract
    val csvFiles = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(csvFiles.length === 1)
  }

  test("stateful sessionization counts sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StatefulSessions.sessionCounts(input.toDS())
      .writeStream.format("memory").queryName("sess_test").outputMode("update").start()
    val us = 1000000L
    // batch 1: user 1 — two events 10s apart (one session)
    input.addData(Ev(1L, 0L), Ev(1L, 10 * us))
    query.processAllAvailable()
    // batch 2: user 1 — an event 31 minutes later (new session);
    //          user 2 — first event (first session)
    input.addData(Ev(1L, 10 * us + 31 * 60 * us), Ev(2L, 0L))
    query.processAllAvailable()
    val res = spark.table("sess_test")
      .groupBy($"user_id").agg(max($"n_sessions").as("n_sessions"), max($"n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    query.stop()
    assert(res(1L) === ((2L, 3L)), "user 1: 2 sessions over 3 events")
    assert(res(2L) === ((1L, 1L)), "user 2: 1 session")
  }

  test("stream left-outer join exercises BOTH arms inside the certainty horizon") {
    import spark.implicits._
    // the oracle proves equality with the batch left join; this pins that
    // the result is not vacuously inner (null-extended rows exist) nor
    // vacuously unmatched (real pairs exist) — outer semantics live
    val res = graft.streaming.MicroBatch.streamOuterJoin(spark, sfDir)
      .agg(sum($"n_clean").as("clean"), sum($"n_pairs").as("pairs")).first()
    assert(res.getLong(0) > 0L, "no null-extended purchases — outer arm never exercised")
    assert(res.getLong(1) > 0L, "no matched pairs — join arm never exercised")
  }

  test("stream full-outer join exercises ALL THREE arms inside its per-perspective horizon") {
    import spark.implicits._
    // the oracle proves equality with the batch full join; this pins
    // that every row class exists: matched pairs, purchases with no
    // preceding-hour error, AND orphan errors no purchase followed —
    // the arm only a full outer join can produce
    val res = graft.streaming.MicroBatch.streamFullOuterJoin(spark, sfDir)
      .agg(sum($"n_matched").as("m"), sum($"n_clean_purchases").as("c"),
        sum($"n_orphan_errors").as("o")).first()
    assert(res.getLong(0) > 0L, "no matched pairs — join arm never exercised")
    assert(res.getLong(1) > 0L, "no clean purchases — left-outer arm never exercised")
    assert(res.getLong(2) > 0L, "no orphan errors — right-outer arm never exercised")
  }

  test("outer-join certainty horizon: degenerate corpus (one side absent) yields empty, not NPE") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    val probe = Seq(("p1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("purchase_id", "p_ts")
    // no error events ever arrived → no global watermark → nothing certain
    assert(probe.filter(graft.streaming.MicroBatch.outerHorizonCond(Some(ts), None)).count() === 0L)
    assert(probe.filter(graft.streaming.MicroBatch.outerHorizonCond(None, Some(ts))).count() === 0L)
    assert(probe.filter(graft.streaming.MicroBatch.outerHorizonCond(None, None)).count() === 0L)
    // both sides present: the purchase 12h before the horizon IS certain
    assert(probe.filter(graft.streaming.MicroBatch.outerHorizonCond(Some(ts), Some(ts))).count() === 1L)
  }

  test("streaming near-dup: batched discovery equals the batch full-pass, and a re-drain adds nothing") {
    import spark.implicits._
    val first = graft.streaming.StreamNearDup.streamNearDup(spark, sfDir).collect().toSeq
    val batchPass = graft.ext.DedupMinHash.minhashNearDupPairs(spark, sfDir).collect().toSeq
    // batch-cut independence: every pair is found exactly when its later
    // document's micro-batch arrives, so the streamed set ≡ the full pass
    assert(first === batchPass, "streamed pair set diverged from the batch full-pass")
    assert(first.nonEmpty, "law vacuous: corpus has no near-dup pairs")
    // exactly-once: draining again against the checkpoint processes zero
    // files and the persisted pair set is byte-stable
    val second = graft.streaming.StreamNearDup.streamNearDup(spark, sfDir).collect().toSeq
    assert(second === first, "re-drain changed the committed pair set")
  }

  test("streaming near-dup: an uncommitted-batch replay (crash between sink write and commit) converges") {
    import spark.implicits._
    // ensure drained
    val before = graft.streaming.StreamNearDup.streamNearDup(spark, sfDir).collect().toSeq
    // simulate the crash window: the last batch's sink writes landed but
    // its checkpoint commit did not — delete the newest commit marker so
    // the engine replays that batch (at-least-once) on the next drain
    val commits = java.nio.file.Paths.get(
      graft.ingest.Landing.fixtureDir(sfDir, "stream_neardup"), "ckpt", "commits")
    val files = java.nio.file.Files.list(commits)
    val newest = try files.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
      finally files.close()
    java.nio.file.Files.delete(newest)
    // the local FS keeps a checksum sidecar per commit file; a stale one
    // blocks the replayed batch's re-commit rename
    java.nio.file.Files.deleteIfExists(
      newest.resolveSibling("." + newest.getFileName.toString + ".crc"))
    val after = graft.streaming.StreamNearDup.streamNearDup(spark, sfDir).collect().toSeq
    // the replayed batch overwrites its own batch=<id> paths and probes
    // only the batches before it — no duplicate pairs, no lost pairs
    assert(after === before, "replay of the uncommitted batch must converge, not duplicate")
  }

  test("timer-driven session close: emission happens on the watermark, not on a next record") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[StatefulSessions.TimedEv]
      val query = input.toDS().withWatermark("ts", "0 seconds")
        .groupByKey(_.user_id)
        .transformWithState(
          new StatefulSessions.TimerSessionProcessor(StatefulSessions.defaultGapUs),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .writeStream.format("memory").queryName("timer_sess_test")
        .outputMode("update").start()
      val us = 1000000L
      // offset well past epoch 0: the initial watermark IS 0, so a
      // 1970-adjacent event arrives "late" and is dropped before the
      // stateful operator ever sees it
      val t0 = 1704067200L * us // 2024-01-01T00:00:00Z
      def ev(uid: Long, usTs: Long) =
        StatefulSessions.TimedEv(uid, usTs, new java.sql.Timestamp(usTs / 1000))
      // batch 1: user 1 only — two events 10 s apart; watermark = t0+10s,
      // far below the session's close horizon → nothing emitted
      input.addData(ev(1L, t0), ev(1L, t0 + 10 * us))
      query.processAllAvailable()
      assert(spark.table("timer_sess_test").count() === 0L,
        "session emitted before its idle horizon")
      // batch 2: only USER 2 speaks, 2 h later — the watermark advance
      // (not any user-1 record) must close user 1's idle session
      input.addData(ev(2L, t0 + 2 * 3600 * us))
      query.processAllAvailable()
      val rows = spark.table("timer_sess_test")
        .as[StatefulSessions.ClosedSession].collect()
      query.stop()
      assert(rows.toSeq === Seq(StatefulSessions.ClosedSession(1L, t0, t0 + 10 * us, 2L)),
        "user 1's trailing session must close by timer, with no user-1 event in batch 2")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("timer boundary: a timer expiring exactly AT the watermark fires (inclusive horizon)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[StatefulSessions.TimedEv]
      val query = input.toDS().withWatermark("ts", "0 seconds")
        .groupByKey(_.user_id)
        .transformWithState(
          new StatefulSessions.TimerSessionProcessor(StatefulSessions.defaultGapUs),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .writeStream.format("memory").queryName("timer_boundary_test")
        .outputMode("update").start()
      val us = 1000000L
      val t0 = 1704067200L * us
      def ev(uid: Long, usTs: Long) =
        StatefulSessions.TimedEv(uid, usTs, new java.sql.Timestamp(usTs / 1000))
      // user 1's timer lands at t0 + 30 min; user 2's event sets the
      // watermark to EXACTLY that instant — the q147 oracle's ms-granular
      // `close_horizon <= max_ts` comparison is only correct if the
      // engine fires at equality, which this pins
      input.addData(ev(1L, t0))
      query.processAllAvailable()
      input.addData(ev(2L, t0 + 30 * 60 * us))
      query.processAllAvailable()
      val users = spark.table("timer_boundary_test")
        .as[StatefulSessions.ClosedSession].collect().map(_.user_id).toSeq
      query.stop()
      assert(users === Seq(1L),
        "timer at exactly the watermark must fire — the oracle horizon is inclusive")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("state TTL evicts idle per-key state; a long TTL control persists it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(ttl: java.time.Duration, name: String, sleepMs: Long): Seq[Long] = {
        val input = MemoryStream[Ev]
        val query = input.toDS().groupByKey(_.user_id)
          .transformWithState(
            new StatefulSessions.TtlCountProcessor(ttl),
            org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .writeStream.format("memory").queryName(name).outputMode("update").start()
        // NO processAllAvailable here: under TimeMode.ProcessingTime the
        // engine keeps scheduling batches (processing time always
        // advances), so the stream never quiesces — poll the sink for the
        // expected row count instead (learned the hard way: a 25-minute
        // spin inside processAllAvailable).
        def awaitRows(n: Long): Unit = {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (spark.table(name).count() < n) {
            if (System.nanoTime() > deadline) fail(s"timeout waiting for $n rows in $name")
            Thread.sleep(100)
          }
        }
        input.addData(Ev(1L, 0L))
        awaitRows(1L)
        Thread.sleep(sleepMs)
        input.addData(Ev(1L, 1L))
        awaitRows(2L)
        val counts = spark.table(name).as[StatefulSessions.Seen]
          .collect().toSeq.map(_.n).sorted
        query.stop()
        counts
      }
      // 50 ms TTL + 2 s idle: the counter state is evicted between
      // batches, so the second batch restarts at 1 — engine-managed
      // eviction, no timeout bookkeeping in the processor
      assert(run(java.time.Duration.ofMillis(50), "ttl_short_test", 2000L) === Seq(1L, 1L))
      // 1 h TTL control: state survives the same idle gap
      assert(run(java.time.Duration.ofHours(1), "ttl_long_test", 2000L) === Seq(1L, 2L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState carries session state across micro-batches (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val query = input.toDS().groupByKey(_.user_id)
        .transformWithState(
          new StatefulSessions.SessionProcessor(StatefulSessions.defaultGapUs),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .writeStream.format("memory").queryName("tws_test").outputMode("update").start()
      val us = 1000000L
      // same script as the mapGroupsWithState test above — the two
      // arbitrary-state APIs must walk the same state machine
      input.addData(Ev(1L, 0L), Ev(1L, 10 * us))
      query.processAllAvailable()
      input.addData(Ev(1L, 10 * us + 31 * 60 * us), Ev(2L, 0L))
      query.processAllAvailable()
      val res = spark.table("tws_test")
        .groupBy($"user_id").agg(max($"n_sessions").as("n_sessions"), max($"n_events").as("n_events"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      query.stop()
      assert(res(1L) === ((2L, 3L)), "user 1: 2 sessions over 3 events")
      assert(res(2L) === ((1L, 1L)), "user 2: 1 session")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("bucketed join plans with NO shuffle exchange on either side") {
    // disable auto-broadcast so the tiny test tables take the
    // shuffled-join path whose exchange elision we are asserting
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      checkBucketedPlan()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def checkBucketedPlan(): Unit = {
    import spark.implicits._
    // materialize (also creates the bucketed tables on first run)
    ingest.PipelineQueries.bucketedJoin(spark, sfDir).collect()
    val (ordersT, custT) = ingest.PipelineQueries.bucketedTableNames(sfDir)
    // bare bucketed-table join: no agg, no sort — with both sides
    // pre-bucketed on the key, the final plan must contain NO Exchange
    val j = spark.table(ordersT)
      .join(spark.table(custT), $"o_custkey" === $"c_custkey")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled-family join over bucketed tables:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not re-shuffle:\n$plan")
  }

  test("salted join is row-identical to the plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a tail: the salted plan must agree exactly
    val left = spark.range(0, 10000)
      .select((when($"id" < 9000, 1L).otherwise($"id")).as("k"), $"id".as("row_id"))
    val right = Seq((1L, "hot"), (9500L, "cold"), (42L, "unmatched-on-left-tail")).toDF("k", "v")
    val plain = left.join(right, "k").select($"k", $"row_id", $"v")
    val salted = graft.util.Skew.saltedEquiJoin(left, right, "k", $"row_id", 8)
      .select($"k", $"row_id", $"v")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === plain.count())
  }

  test("lineage load quarantines corrupt rows without dropping good ones") {
    import spark.implicits._
    val out = ingest.PipelineQueries.lineageLoad(spark, sfDir)
    val corrupt = out.filter($"event_type" === "corrupt").first()
    assert(corrupt.getAs[Long]("n_corrupt") === 1L && corrupt.getAs[Long]("n_good") === 0L)
    assert(out.filter($"event_type" =!= "corrupt").agg(sum($"n_corrupt")).first().getLong(0) === 0L)
  }
}
