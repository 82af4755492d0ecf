package graft

import graft.ingest.Tables
import org.apache.spark.sql.functions._

/** Algebraic laws of the core operator surface (SURVEY.md §5.2), on the
  * smallest driver tables — complements the driver's oracle-differential
  * gate with structural invariants the oracle can't express. */
class CoreLawsSpec extends SparkSpec {

  test("explode row-count law: exploded rows == sum(size(arrays))") {
    import spark.implicits._
    val nested = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(collect_list(struct($"l_linenumber", $"l_partkey")).as("items"))
    val expected = nested.agg(sum(size($"items"))).first().getLong(0)
    val exploded = nested.select($"l_orderkey", explode($"items")).count()
    assert(exploded === expected)
  }

  test("flatten ∘ nest = identity on lineitem projection") {
    import spark.implicits._
    val plain = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
    val roundtrip = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", struct($"l_linenumber", $"l_partkey", $"l_quantity").as("item"))
      .groupBy($"l_orderkey").agg(collect_list($"item").as("items"))
      .select($"l_orderkey", explode($"items").as("item"))
      .select($"l_orderkey", $"item.l_linenumber", $"item.l_partkey", $"item.l_quantity")
    assert(roundtrip.exceptAll(plain).isEmpty && plain.exceptAll(roundtrip).isEmpty)
  }

  test("left join zero-fills: row count preserved, no null keys dropped") {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val joined = c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
    assert(joined.count() === c.count())
    // customers without orders appear with n_orders = 0, not dropped
    val noOrders = c.join(o.select($"o_custkey"), c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(joined.filter($"n_orders" === 0).count() === noOrders)
  }

  test("set-op duplicate semantics: intersect/except deduplicate (SQL set semantics)") {
    import spark.implicits._
    val a = Seq(1, 1, 2, 2, 3).toDF("k")
    val b = Seq(2, 2, 3, 4).toDF("k")
    assert(a.intersect(b).collect().map(_.getInt(0)).sorted === Array(2, 3))
    assert(a.except(b).collect().map(_.getInt(0)).sorted === Array(1))
    assert(a.unionByName(b).distinct().count() === 4)
  }

  test("semi + anti join partition the left relation") {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val f = Tables.orders(spark, sfDir).filter($"o_orderstatus" === "F").select($"o_custkey")
    val semi = c.join(f, c("c_custkey") === f("o_custkey"), "left_semi").count()
    val anti = c.join(f, c("c_custkey") === f("o_custkey"), "left_anti").count()
    assert(semi + anti === c.count())
  }

  test("funnel stages are monotonically non-increasing") {
    val row = analytics.Funnel.funnel(spark, sfDir).first()
    val users = row.getAs[Long]("n_users")
    val s1 = row.getAs[Long]("stage_view")
    val s2 = row.getAs[Long]("stage_view_click")
    val s3 = row.getAs[Long]("stage_view_click_purchase")
    assert(users >= s1 && s1 >= s2 && s2 >= s3 && s3 >= 0)
  }

  test("derived dim_date covers the fact's full date range (no silent row loss)") {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val joined = o.join(
      gold.Dims.dimDateFor(o, o("o_orderdate")),
      to_date($"o_orderdate") === $"date_key")
    assert(joined.count() === o.count())
  }

  test("mapGroupsWithState sessionizer agrees with the window-function sessionizer") {
    import spark.implicits._
    // two independent formulations of gap-based sessions (q70 vs q59)
    // must produce identical global totals
    val stateful = analytics.Sessions.statefulSessions(spark, sfDir)
      .agg(sum($"n_sessions").as("s"), sum($"n_events").as("e")).first()
    val windowed = analytics.Sessions.sessionize(spark, sfDir).first()
    assert(stateful.getLong(0) === windowed.getAs[Long]("n_sessions"))
    assert(stateful.getLong(1) === windowed.getAs[Long]("n_events_total"))
  }

  test("simhash banding has exact recall at hamming <= 3: every close pair shares a band") {
    import spark.implicits._
    // all-pairs ground truth at sf0.001 scale vs the banded candidate set
    val fps = ext.DedupSimHash.simhashFingerprint(spark, sfDir)
      .select($"doc_id", $"simhash")
    val a = fps.select($"doc_id".as("d1"), $"simhash".as("f1"))
    val b = fps.select($"doc_id".as("d2"), $"simhash".as("f2"))
    val truth = a.crossJoin(b).filter($"d1" < $"d2")
      .filter(bit_count($"f1".bitwiseXOR($"f2")) <= 3)
      .select($"d1", $"d2")
    val banded = ext.DedupSimHash.simhashNearDupPairs(spark, sfDir).select($"d1", $"d2")
    assert(truth.exceptAll(banded).isEmpty)
  }

  test("bucketed interval join equals the brute-force range join") {
    import spark.implicits._
    // q80's theta->equi rewrite must produce exactly the pairs the
    // direct (unbucketed) range predicate produces
    val anchor = to_date(lit("1995-01-01"))
    val campaigns = spark.range(50).toDF("campaign_id")
      .withColumn("cstart", date_add(anchor, ($"campaign_id" * 50).cast("int")))
      .withColumn("cend", date_add($"cstart", 69))
    val o = Tables.orders(spark, sfDir).withColumn("odate", to_date($"o_orderdate"))
    val brute = o.join(campaigns, $"odate" >= $"cstart" && $"odate" <= $"cend")
      .groupBy($"campaign_id").agg(count(lit(1)).as("n"))
    val bucketed = analytics.ExtendedJoins.intervalCampaignJoin(spark, sfDir)
      .select($"campaign_id", $"n_orders".as("n"))
    assert(bucketed.exceptAll(brute).isEmpty && brute.exceptAll(bucketed).isEmpty)
  }

  test("hot-key salted join ≡ plain join for every threshold/bucket split") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
    val users = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    val plain = ev.join(users, Seq("user_id"))
      .select($"user_id", $"event_id", $"value", $"c_mktsegment")
    // threshold 1 = every key hot (degenerates to the uniform salted
    // join); Long.MaxValue = no key hot (degenerates to the plain join);
    // middle values exercise a genuine split — all must be row-identical
    for (threshold <- Seq(1L, 3L, 8L, Long.MaxValue); buckets <- Seq(2, 8)) {
      val salted = graft.util.Skew.hotKeySaltedJoin(
          ev, users, "user_id", $"event_id", buckets, threshold)
        .select($"user_id", $"event_id", $"value", $"c_mktsegment")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"mismatch at threshold=$threshold buckets=$buckets")
    }
  }

  test("pivot matrix row-sums equal the unpivoted per-day counts") {
    import spark.implicits._
    val piv = analytics.Olap.pivotEventMatrix(spark, sfDir)
      .withColumn("total", $"n_click" + $"n_error" + $"n_purchase" + $"n_signup" + $"n_view")
      .select($"day", $"total")
    val flat = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("total"))
    assert(piv.exceptAll(flat).isEmpty && flat.exceptAll(piv).isEmpty)
  }

  test("hopping window fan-out law: with window = 2·slide every event lands in exactly 2 windows") {
    import spark.implicits._
    val hopped = analytics.TimeWindows.hoppingWindowAgg(spark, sfDir)
      .agg(sum($"n_events")).first().getLong(0)
    val n = Tables.events(spark, sfDir).count()
    assert(hopped === 2 * n, s"hopping fan-out $hopped != 2 * $n")
  }

  test("q155 gap fill: dense grid, LOCF carries the last observation, staleness resets") {
    import spark.implicits._
    val g = graft.analytics.TimeSeries.gapFillLocf(spark, sfDir)
    // grid completeness: |priorities| × |span days|, one row each
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderpriority".as("p"), to_date($"o_orderdate").as("day"))
    val nP = o.select("p").distinct().count()
    val span = o.agg(datediff(max($"day"), min($"day"))).first().getInt(0) + 1
    assert(g.count() === nP * span)
    assert(g.select("priority", "day").distinct().count() === nP * span)
    // there are genuine gaps to fill, and every gap after a first
    // observation carries a non-null fill
    assert(g.filter(!$"observed").count() > 0, "fixture must have gaps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"priority").orderBy($"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val seen = g.withColumn("any_obs", max(when($"observed", 1).otherwise(0)).over(w))
    assert(seen.filter($"any_obs" === 1 && $"rev_filled".isNull).count() === 0)
    assert(seen.filter($"any_obs" === 0 &&
      ($"rev_filled".isNotNull || $"staleness_days".isNotNull)).count() === 0)
    // staleness is 0 exactly on observed days and +1 per unobserved day
    assert(g.filter($"observed" =!= ($"staleness_days" === 0L)).count() === 0)
    val lagged = g.withColumn("prev_stale",
      lag($"staleness_days", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy($"priority").orderBy($"day")))
    assert(lagged.filter(!$"observed" && $"prev_stale".isNotNull &&
      $"staleness_days" =!= $"prev_stale" + 1L).count() === 0)
  }

  test("q164 range frame is time-bounded: ≡ the interval self-join, ≠ the rows frame on a gapped series") {
    import spark.implicits._
    val r = graft.analytics.Windows.rangeFrameRevenue(spark, sfDir).cache()
    // frame never exceeds the 7-day span, and the series genuinely has
    // gaps (some frame holds fewer than 7 observations while at least 7
    // prior rows exist — where a ROWS frame would reach back further)
    assert(r.filter($"r7_days" > 7).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"n_name").orderBy($"order_date")
    val withRn = r.withColumn("rn", row_number().over(w))
    assert(withRn.filter($"rn" >= 7 && $"r7_days" < 7).count() > 0,
      "fixture must exercise the gap case that distinguishes RANGE from ROWS")
    // independent derivation: the trailing-6-day interval self-join
    val days = r.select($"n_name", $"order_date", $"revenue")
      .withColumn("ed", datediff($"order_date", lit("1970-01-01")))
    val a = days.select($"n_name", $"order_date", $"ed")
    val b = days.select($"n_name".as("n2"), $"ed".as("ed2"), $"revenue".as("rev2"))
    val byJoin = a.join(b, $"n_name" === $"n2" && $"ed2".between($"ed" - 6, $"ed"))
      .groupBy($"n_name", $"order_date")
      .agg(sum($"rev2").as("join_r7"), count(lit(1)).as("join_days"))
    val cmp = r.join(byJoin, Seq("n_name", "order_date"))
    assert(cmp.filter($"r7_days" =!= $"join_days").count() === 0)
    assert(cmp.filter(abs($"r7_revenue" - $"join_r7") > 1e-6).count() === 0)
    r.unpersist()
  }

  test("q163 sketch join order: decision matches exact costing; result is order-independent") {
    import spark.implicits._
    val out = graft.ext.Sketches.sketchJoinOrder(spark, sfDir).head()
    // exact intermediate sizes, derived independently in Spark
    val o = Tables.orders(spark, sfDir)
    val cj = o.join(Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING"),
      $"o_custkey" === $"c_custkey").count()
    val dj = o.filter(to_date($"o_orderdate")
      .between("1995-01-01", "1995-03-31")).count()
    val exactFirst = if (cj <= dj) "customer" else "date"
    assert(out.getString(0) === exactFirst,
      s"sketch decision ${out.getString(0)} diverges from exact costing (cj=$cj dj=$dj)")
    // the chosen order only changes cost, never the answer: both orders
    // reduce to the same conjunctive filter
    val both = o.join(Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING"),
        $"o_custkey" === $"c_custkey")
      .filter(to_date($"o_orderdate").between("1995-01-01", "1995-03-31"))
    assert(out.getLong(1) === both.count())
  }
}
