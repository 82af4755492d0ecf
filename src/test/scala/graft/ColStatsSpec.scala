package graft

import graft.sources.{ColStats, GraftCatalog, JsonlStats}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/** Laws of the ANALYZE / column-statistics tier (r9c —
  * [[graft.sources.ColStats]] + the scan's `columnStats()` leg): the
  * sidecar's numbers are honest, the manifest-served legs are exact,
  * Spark's CBO actually CONSUMES them (attribute stats on the scan,
  * cardinality on the join), and staleness degrades to capped
  * estimates, never errors. */
class ColStatsSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(tag: String): (String, String) = {
    val dir = Files.createTempDirectory(s"colstats_$tag").toString
    graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .repartitionByRange(4, $"event_id")
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    val cat = s"graft_cs_${tag}_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    (cat, dir)
  }

  private def withCbo[A](body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "true"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def scanStats(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.stats
    }.head

  test("analyze writes honest numbers: NDV within HLL tolerance, sidecar round-trips") {
    val (cat, dir) = scratch("an")
    val out = spark.sql(s"CALL $cat.analyze_table('${Paths.get(dir).getFileName}')").head()
    assert(out.getInt(0) === 4, "four columns analyzed")
    assert(out.getInt(3) === -1, "no prior sidecar")
    val s = ColStats.read(dir).get
    assert(s.rows === spark.read.format("graft-jsonl-stats").option("path", dir).load().count())
    val exact = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .agg(countDistinct($"user_id"), countDistinct($"event_type")).head()
    val ndvU = s.cols("user_id").ndv.toDouble
    assert(math.abs(ndvU - exact.getLong(0)) / exact.getLong(0) < 0.10,
      s"user_id NDV $ndvU vs exact ${exact.getLong(0)} beyond HLL tolerance")
    assert(s.cols("event_type").ndv >= exact.getLong(1) - 1 &&
      s.cols("event_type").ndv <= exact.getLong(1) + 1)
    assert(s.cols("event_type").avgLen > 0 && s.cols("event_type").maxLen > 0)
    assert(s.cols("event_id").avgLen === -1, "length stats are string-only")
  }

  test("ANALYZE is delta-proportional (r15): the first pass sketches every " +
    "file, a post-append re-ANALYZE reads ONLY the new files, a no-change " +
    "re-ANALYZE reads none — and the merged NDV stays within HLL tolerance " +
    "of the exact count; rewritten identities (delete) re-sketch") {
    val (cat, dir) = scratch("inc")
    val t = Paths.get(dir).getFileName.toString
    def analyze() = spark.sql(s"CALL $cat.analyze_table('$t')").head()
    def liveFiles() = JsonlStats.readStats(dir).size
    val first = analyze()
    assert(first.getInt(4) === liveFiles(), "first pass sketches every file")
    // no-change re-ANALYZE: the cache answers everything
    assert(analyze().getInt(4) === 0, "nothing moved, nothing read")
    // append: only the NEW files are read
    val before = liveFiles()
    spark.sql(s"INSERT INTO $cat.$t VALUES (1000001, 42, 'probe', 7.5)")
    val post = analyze()
    val added = liveFiles() - before
    assert(added >= 1 && post.getInt(4) === added,
      s"post-append pass must read only the ${added} new file(s), read ${post.getInt(4)}")
    // merged numbers stay honest: exact rows, NDV within tolerance
    val s = ColStats.read(dir).get
    val df = spark.read.format("graft-jsonl-stats").option("path", dir).load()
    assert(s.rows === df.count())
    val exact = df.agg(countDistinct($"user_id"), countDistinct($"event_type")).head()
    assert(math.abs(s.cols("user_id").ndv.toDouble - exact.getLong(0)) /
      exact.getLong(0) < 0.10, s"merged NDV ${s.cols("user_id").ndv} vs ${exact.getLong(0)}")
    assert(s.cols("event_type").ndv >= exact.getLong(1) - 1 &&
      s.cols("event_type").ndv <= exact.getLong(1) + 1)
    // a DELETE rewrites (or masks) file identities: those re-sketch,
    // untouched identities stay cached, and the counts re-merge exactly
    spark.sql(s"DELETE FROM $cat.$t WHERE event_id % 10 = 3")
    val afterDelete = analyze()
    assert(afterDelete.getInt(4) > 0 && afterDelete.getInt(4) <= liveFiles(),
      s"a delete must re-sketch only the touched identities: ${afterDelete.getInt(4)}")
    assert(ColStats.read(dir).get.rows === df.count())
  }

  test("CBO sees the stats: attribute NDV/min/max/nulls on the scan, cardinality on the join") {
    val (cat, dir) = scratch("cbo")
    val t = Paths.get(dir).getFileName.toString
    // BEFORE analyze, with CBO on: rowCount flows (manifest), NDV absent
    withCbo {
      val pre = scanStats(spark.read.format("graft-jsonl-stats").option("path", dir).load())
      assert(pre.rowCount.isDefined, "manifest row count must reach catalyst")
      assert(pre.attributeStats.forall(_._2.distinctCount.isEmpty),
        "no NDV may be served before analyze")
      spark.sql(s"CALL $cat.analyze_table('$t')")
      val df = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      val st = scanStats(df)
      val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
      assert(byName("user_id").distinctCount.isDefined, "analyzed NDV must reach catalyst")
      assert(byName("event_id").min.isDefined && byName("event_id").max.isDefined,
        "manifest bounds must reach catalyst as attribute min/max")
      assert(byName("user_id").nullCount.exists(_ == 0),
        "manifest non-null counts must reach catalyst")
      // the payoff: JoinEstimation produces a cardinality for an
      // equi-join over analyzed columns — impossible without NDV
      val dim = spark.read.format("graft-jsonl-stats").option("path", dir).load()
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
      val joined = df.join(dim, "user_id")
      val joinStats = joined.queryExecution.optimizedPlan.stats
      assert(joinStats.rowCount.isDefined,
        "join cardinality must be estimable from connector NDV stats")
    }
  }

  test("cost-based join reorder fires on connector tables once analyzed") {
    val (cat, dir) = scratch("jr")
    val t = Paths.get(dir).getFileName.toString
    val root = Paths.get(dir).getParent.toString
    // a TINY dim (few rows, tiny NDV) and a MID dim — written in the
    // worst order (fact ⋈ mid first); CBO should join fact ⋈ tiny first
    val tiny = Paths.get(root, s"${t}_tiny").toString
    val mid = Paths.get(root, s"${t}_mid").toString
    Files.createDirectories(Paths.get(tiny))
    Files.createDirectories(Paths.get(mid))
    spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .select($"event_type").distinct().withColumn("w_t", lit(2L))
      .coalesce(1).write.format("graft-jsonl-stats")
      .option("path", tiny).option("statsColumn", "w_t").mode("overwrite").save()
    spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .select($"user_id").distinct().withColumn("w_m", lit(3L))
      .coalesce(1).write.format("graft-jsonl-stats")
      .option("path", mid).option("statsColumn", "w_m").mode("overwrite").save()
    Seq(t, s"${t}_tiny", s"${t}_mid").foreach(x => spark.sql(s"CALL $cat.analyze_table('$x')"))
    def joinLeafOrder(cboOn: Boolean): Seq[String] = {
      def q = spark.sql(
        s"""SELECT count(*) AS n FROM $cat.`$t` f
           |JOIN $cat.`${t}_mid` m ON f.user_id = m.user_id
           |JOIN $cat.`${t}_tiny` d ON f.event_type = d.event_type""".stripMargin)
      val plan = if (cboOn) withCbo(q.queryExecution.optimizedPlan)
        else q.queryExecution.optimizedPlan
      plan.collect { case r: DataSourceV2ScanRelation => r.name }
    }
    val off = joinLeafOrder(cboOn = false)
    val on = joinLeafOrder(cboOn = true)
    assert(off.size === 3 && on.size === 3)
    assert(on !== off,
      s"cost-based reorder must change the worst-first join order (got $on in both modes)")
    // values are plan-independent, whatever the order
    val nOff = spark.sql(s"SELECT count(*) FROM $cat.`$t` f " +
      s"JOIN $cat.`${t}_mid` m ON f.user_id = m.user_id " +
      s"JOIN $cat.`${t}_tiny` d ON f.event_type = d.event_type").head().getLong(0)
    val nOn = withCbo(spark.sql(s"SELECT count(*) FROM $cat.`$t` f " +
      s"JOIN $cat.`${t}_mid` m ON f.user_id = m.user_id " +
      s"JOIN $cat.`${t}_tiny` d ON f.event_type = d.event_type").head().getLong(0))
    assert(nOff === nOn && nOff > 0)
  }

  test("staleness degrades to a capped estimate: NDV never exceeds live rows") {
    val (cat, dir) = scratch("stale")
    val t = Paths.get(dir).getFileName.toString
    spark.sql(s"CALL $cat.analyze_table('$t')")
    val ndvBefore = ColStats.read(dir).get.cols("event_id").ndv
    // shrink the table far below the analyzed NDV
    val cut = JsonlStats.readStats(dir).map(_.max).max
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id < ${cut * 0.99}")
    val live = spark.read.format("graft-jsonl-stats").option("path", dir).load().count()
    assume(live < ndvBefore, "delete must shrink below analyzed NDV")
    withCbo {
      val st = scanStats(spark.read.format("graft-jsonl-stats").option("path", dir).load())
      val served = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "event_id" => cs.distinctCount }.flatten
      assert(served.isDefined && served.get.toLong <= live,
        s"stale NDV ${served} must be capped at live rows $live")
    }
    // the CALL reports how stale the sidecar had grown
    val re = spark.sql(s"CALL $cat.analyze_table('$t')").head()
    assert(re.getInt(3) >= 1, "re-analyze must report versions elapsed")
  }

  test("equi-height histogram: skewed range selectivity estimates honestly, uniform lies") {
    val dir = Files.createTempDirectory("colstats_hist").toString
    // exponential skew: value = 2^(id mod 20) — the top HALF of the
    // value domain holds ~5% of the rows, so the uniform [min,max]
    // assumption overestimates a top-range filter by ~10×
    spark.range(20000)
      .select($"id".as("event_id"), pow(lit(2.0), ($"id" % 20).cast("double")).as("value"))
      .repartitionByRange(4, $"event_id")
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    val cat = "graft_hist_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    def estimate(): BigInt = withCbo {
      spark.read.format("graft-jsonl-stats").option("path", dir).load()
        .filter($"value" >= 262144.0)
        .queryExecution.optimizedPlan.stats.rowCount.get
    }
    val actual = spark.read.format("graft-jsonl-stats").option("path", dir).load()
      .filter($"value" >= 262144.0).count()
    spark.sql(s"CALL $cat.analyze_table('$t')")
    val uniform = estimate()
    spark.sql(s"CALL $cat.analyze_table('$t', histogram => true, hist_bins => 20)")
    assert(ColStats.read(dir).get.cols("value").hist.isDefined, "histogram must persist")
    val histogrammed = estimate()
    assert(histogrammed < uniform / 3,
      s"histogram must beat the uniform assumption on skew: hist=$histogrammed uniform=$uniform")
    val err = (BigDecimal(histogrammed) - actual).abs / BigDecimal(actual)
    assert(err < 0.5,
      s"histogram estimate $histogrammed must be near actual $actual (uniform said $uniform)")
  }

  test("column mapping: stats survive RENAME (physical keys, logical serving)") {
    val (cat, dir) = scratch("ren")
    val t = Paths.get(dir).getFileName.toString
    spark.sql(s"CALL $cat.analyze_table('$t')")
    spark.sql(s"ALTER TABLE $cat.`$t` RENAME COLUMN user_id TO member_id")
    withCbo {
      val st = scanStats(spark.table(s"$cat.`$t`"))
      val served = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "member_id" => cs.distinctCount }.flatten
      assert(served.isDefined,
        "NDV analyzed under the old name must serve under the new one")
    }
  }
}
