package graft

import graft.sources.{GraftCatalog, JsonlEqualityDeletes, JsonlStats}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Laws of the EQUALITY-DELETE tier (r9b — streaming-upsert merge-on-
  * read; [[graft.sources.JsonlEqualityDeletes]]). */
class EqualityDeletesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"eqdel_$tag").toString

  /** Base table: 6 rows over 3 user_ids, two value-ranged files. */
  private def writeBase(dir: String): Unit =
    Seq((1L, 10L, "a", 1.0), (2L, 10L, "a", 2.0),
        (3L, 20L, "b", 3.0), (4L, 20L, "b", 4.0),
        (5L, 30L, "c", 5.0), (6L, 30L, "c", 6.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .repartitionByRange(2, $"value")
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()

  private def upsert(dir: String, rows: Seq[(Long, Long, String, Double)]): Unit =
    rows.toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1)
      .write.format("graft-jsonl-stats").option("path", dir)
      .option("upsertKeys", "user_id").mode("append").save()

  private def readBack(dir: String) =
    spark.read.format("graft-jsonl-stats").option("path", dir).load()

  test("upsert retracts older rows by key and inserts its own in one commit") {
    val dir = freshDir("rt")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 100.0), (101L, 40L, "new", 101.0)))
    val got = readBack(dir).select($"event_id", $"user_id").as[(Long, Long)]
      .collect().toSet
    // user 10's two old rows retracted; users 20/30 untouched; the
    // upsert's OWN rows (same commit, same seq) survive its retraction
    assert(got === Set((3L, 20L), (4L, 20L), (5L, 30L), (6L, 30L),
      (100L, 10L), (101L, 40L)))
    // protocol: eqdel line with seq 1, fresh data stamped seq 1,
    // feature read-gates
    val eqs = JsonlEqualityDeletes.readEqDeletes(dir, "_stats.jsonl")
    assert(eqs.size === 1 && eqs.head.seq === 1L && eqs.head.cols === Seq("user_id")
      && eqs.head.nKeys === 2L)
    val stats = JsonlStats.readStats(dir)
    assert(stats.filter(_.seq === 1L).map(_.rows).sum === 2L,
      "the upsert's data entries must stamp the commit seq")
    assert(JsonlStats.readTableMeta(dir).features.contains(JsonlStats.FeatureEqDeletes))
  }

  test("sequential upserts: the newest key image wins; appends are never retracted") {
    val dir = freshDir("seq")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up1", 1.0)))
    upsert(dir, Seq((200L, 10L, "up2", 2.0)))
    assert(readBack(dir).filter($"user_id" === 10L).select($"event_id")
      .as[Long].collect().toSeq === Seq(200L),
      "the second upsert's seq must retract the first's row")
    // a PLAIN append after upserts stamps at maxSeq: existing deletes
    // must not swallow new rows of the same key
    Seq((300L, 10L, "late", 3.0)).toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1)
      .write.format("graft-jsonl-stats").option("path", dir).mode("append").save()
    assert(readBack(dir).filter($"user_id" === 10L).select($"event_id")
      .as[Long].collect().toSet === Set(200L, 300L),
      "appended rows must survive pre-existing equality deletes")
  }

  test("manifest aggregate pushdown declines under eqdels; rewrite_deletes re-arms it") {
    val dir = freshDir("agg")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 100.0)))
    // physical rows 6+1, live rows 5: COUNT must come from the masked
    // scan, not manifest arithmetic
    assert(readBack(dir).count() === 5L)
    val plan = readBack(dir).groupBy().count().queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregates") || !plan.contains("COUNT"),
      s"manifest COUNT pushdown must decline while eqdels exist:\n$plan")
    // materialize: eqdel lines leave, content identical, pushdown legal
    val cat = "graft_eq_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    spark.sql(s"CALL $cat.rewrite_deletes('$t')").collect()
    assert(JsonlEqualityDeletes.readEqDeletes(dir, "_stats.jsonl").isEmpty,
      "rewrite_deletes must drop the materialized eqdel lines")
    assert(readBack(dir).count() === 5L, "materialization must not change content")
    assert(JsonlStats.readStats(dir).map(_.rows).sum === 5L,
      "rewritten physical rows = live rows")
    assert(readBack(dir).select($"event_id").as[Long].collect().toSet ===
      Set(3L, 4L, 5L, 6L, 100L))
  }

  test("batch CDF over an upsert window: retraction surfaces as update/delete images") {
    val dir = freshDir("cdf")
    writeBase(dir) // v1
    upsert(dir, Seq((100L, 10L, "up", 100.0))) // v2: retract user 10, insert 100
    val ch = graft.sources.ChangeFeed.tableChanges(spark, dir, 1, 2, Seq("event_id"))
      .select($"event_id", $"change_type").as[(Long, String)].collect().toMap
    // old rows of user 10 (event 1, 2) leave; event 100 arrives; users
    // 20/30 cancel in the join (no spurious changes)
    assert(ch === Map(1L -> "delete", 2L -> "delete", 100L -> "insert"),
      s"got $ch")
  }

  test("streaming CDF refuses an upsert window loudly") {
    val dir = freshDir("cdfs")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 100.0)))
    val ckpt = Files.createTempDirectory("eqdel_cdfs_ckpt").toString
    val ex = intercept[Exception] {
      val q = spark.readStream.format("graft-jsonl-stats")
        .option("path", dir).option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
        .writeStream.format("memory").queryName("eqdel_cdf_stream")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("equality")), s"got: ${ex.getMessage}")
  }

  test("streaming upsert sink: one epoch retracts the batch base exactly-once") {
    val src = freshDir("stream_src")
    writeBase(src)
    val sink = freshDir("stream_sink")
    writeBase(sink)
    // stream the source INTO the sink as an upsert: every user_id of
    // the base is re-keyed, so the final table is exactly the source
    // image (plus nothing), however tasks split the epoch
    val q = spark.readStream.format("graft-jsonl-stats").option("path", src).load()
      .writeStream.format("graft-jsonl-stats")
      .option("path", sink)
      .option("upsertKeys", "user_id")
      .option("checkpointLocation", s"$sink/_ckpt")
      .option("txnAppId", "eqdel_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = readBack(sink)
    assert(got.count() === 6L, "retraction + insert must land in the epoch commits")
    assert(got.select($"user_id").distinct().count() === 3L)
    // the txn watermark rode the same commits (exactly-once preserved)
    assert(JsonlStats.readTxns(sink).contains("eqdel_stream"))
  }

  test("streamed READ of an upsert table masks retracted rows (planning-time eqdels)") {
    val dir = freshDir("stream_read")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 100.0)))
    val ckpt = Files.createTempDirectory("eqdel_read_ckpt").toString
    spark.readStream.format("graft-jsonl-stats").option("path", dir).load()
      .writeStream.format("memory").queryName("eqdel_masked_read")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val ids = spark.table("eqdel_masked_read").select($"event_id").as[Long]
      .collect().toSet
    assert(ids === Set(3L, 4L, 5L, 6L, 100L),
      s"streamed read must apply planning-time eq masks, got $ids")
  }

  test("refusals: float keys, truncate+upsert, replaceWhere+upsert") {
    val dir = freshDir("refuse")
    writeBase(dir)
    val floatKey = intercept[Exception] {
      Seq((9L, 10L, "x", 1.0)).toDF("event_id", "user_id", "event_type", "value")
        .write.format("graft-jsonl-stats").option("path", dir)
        .option("upsertKeys", "value").mode("append").save()
    }
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(floatKey).exists(t => t.getMessage != null &&
      t.getMessage.contains("long or string")))
    val trunc = intercept[Exception] {
      Seq((9L, 10L, "x", 1.0)).toDF("event_id", "user_id", "event_type", "value")
        .write.format("graft-jsonl-stats").option("path", dir)
        .option("upsertKeys", "user_id").mode("overwrite").save()
    }
    assert(chain(trunc).exists(t => t.getMessage != null &&
      t.getMessage.contains("upsertKeys")))
  }

  test("vacuum refcounts eqdel files; they die with their last manifest") {
    val dir = freshDir("vac")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 100.0)))
    val eqFile = JsonlEqualityDeletes.readEqDeletes(dir, "_stats.jsonl").head.file
    val cat = "graft_eqv_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    // referenced by the LIVE manifest: the zero-grace orphan sweep must
    // spare it
    spark.sql(s"CALL $cat.vacuum('$t', retain_last => 1, orphan_grace_ms => 0)")
    assert(Files.exists(Paths.get(dir, eqFile)), "live-referenced eqdel file swept")
    // materialize, expire the generations that referenced it → swept
    spark.sql(s"CALL $cat.rewrite_deletes('$t')").collect()
    spark.sql(s"CALL $cat.vacuum('$t', retain_last => 1, orphan_grace_ms => 0)")
    assert(!Files.exists(Paths.get(dir, eqFile)),
      "unreferenced eqdel file must be vacuumable")
    assert(readBack(dir).count() === 5L)
  }

  test("replaceWhere under outstanding eqdels: replacement rows are never masked (r9c review)") {
    val dir = freshDir("rw")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 1.5)))
    val cat = "graft_eqrw_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    // replace the low-value file (all-match by bounds) with a fresh
    // image INCLUDING retracted user 10 — the kept seq-1 delete must
    // not apply to seq-stamped replacement rows
    spark.sql(s"INSERT INTO $cat.`$t` REPLACE WHERE value <= 3.5 " +
      "VALUES (200, 10, 'rep', 1.0), (201, 20, 'rep', 2.0)")
    val got = readBack(dir).select($"event_id", $"user_id").as[(Long, Long)].collect().toSet
    assert(got.contains((200L, 10L)),
      s"kept eqdel re-retracted the replacement row: $got")
    assert(!got.contains((1L, 10L)) && !got.contains((2L, 10L)),
      "pre-upsert rows of the replaced file must be gone")
    assert(got.contains((5L, 30L)) && got.contains((6L, 30L)), "untouched file intact")
  }

  test("canonical keys are injection-proof: separator bytes in values cannot forge keys (r9c review)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def key(a: String, b: String): String = {
      val n = mapper.createObjectNode(); n.put("a", a); n.put("b", b)
      JsonlEqualityDeletes.canonicalKey(n, Seq("a", "b"))
    }
    val sep = "\u0001"
    val adversarial = Seq(
      ("x", "y"), (s"x${sep}s:1:y", ""), ("", s"x${sep}s:1:y"),
      (s"x$sep", "s:1:y"), ("x", s"${sep}y"), (s"x${sep}y", ""), ("", s"x${sep}y"))
    val encoded = adversarial.map { case (a, b) => key(a, b) }
    assert(encoded.distinct.size === encoded.size,
      s"distinct tuples must encode distinctly: ${encoded.mkString(" | ")}")
  }

  test("a FIRST-generation upsert still stamps the read gate (r9c review)") {
    val dir = freshDir("gen1")
    // the very first write is the upsert: the defining meta write must
    // land first, then the feature stamp — never silently skipped
    upsert(dir, Seq((1L, 10L, "up", 1.0)))
    val meta = JsonlStats.readTableMeta(dir)
    assert(meta.features.contains(JsonlStats.FeatureEqDeletes),
      s"first-generation upsert published ungated eqdel lines: ${meta.features}")
    assert(readBack(dir).count() === 1L)
  }

  test("files metadata surfaces the eqdel debt; rewrite_deletes reports materialized rows") {
    val dir = freshDir("meta")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 100.0)))
    val cat = "graft_eqm_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    val files = spark.table(s"$cat.`$t`.files")
      .select($"file", $"eqdels_applicable").as[(String, Int)].collect().toMap
    assert(files.values.count(_ == 1) === 2 && files.values.count(_ == 0) === 1,
      s"base files carry the debt, the upsert's own file does not: $files")
    // rows_dropped counts the eq-materialized rows (user 10's two),
    // not just DV cardinalities (zero here)
    val res = spark.sql(s"CALL $cat.rewrite_deletes('$t')").head()
    assert(res.getLong(2) === 2L, s"rows_dropped must count eq-masked rows: $res")
    assert(spark.table(s"$cat.`$t`.files")
      .filter($"eqdels_applicable" > 0).count() === 0, "debt cleared after rewrite")
  }

  test("compaction bins by sequence number: merged upsert rows keep surviving their retraction") {
    val dir = freshDir("cmp")
    writeBase(dir)
    // upsert lands seq-1 data + seq-1 delete; base files stay seq 0
    upsert(dir, Seq((100L, 10L, "up", 100.0), (101L, 10L, "up", 101.0)))
    val cat = "graft_eqc_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    val before = readBack(dir).select($"event_id").as[Long].collect().sorted
    spark.sql(s"CALL $cat.compact('$t', ${1L << 20})").collect()
    // a seq-0/seq-1 merge would stamp one seq for both member sets and
    // either re-retract the upsert's rows or resurrect user 10's
    val after = readBack(dir).select($"event_id").as[Long].collect().sorted
    assert(after === before, s"compaction changed visible rows: ${after.toSeq} vs ${before.toSeq}")
    val stats = JsonlStats.readStats(dir)
    assert(stats.map(_.seq).distinct.sorted === Seq(0L, 1L),
      "bins must not merge across sequence numbers")
  }

  test("clone carries outstanding equality deletes: no key resurrects in the copy") {
    val dir = freshDir("cln")
    writeBase(dir)
    upsert(dir, Seq((100L, 10L, "up", 100.0)))
    val cat = "graft_eql_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    spark.sql(s"CALL $cat.clone('$t', '${t}_copy')").collect()
    val copy = Paths.get(Paths.get(dir).getParent.toString, s"${t}_copy").toString
    val src = readBack(dir).select($"event_id").as[Long].collect().sorted
    val dst = readBack(copy).select($"event_id").as[Long].collect().sorted
    assert(dst === src,
      s"clone diverged: ${dst.toSeq} vs ${src.toSeq} (user 10's retracted rows must stay dead)")
    assert(JsonlEqualityDeletes.readEqDeletes(copy, "_stats.jsonl").nonEmpty,
      "the clone's manifest must carry the eqdel lines")
  }
}
