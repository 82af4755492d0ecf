package graft

import org.apache.spark.sql.functions._

/** Structural laws of the r7c analytics additions that the row-hash
  * oracle cannot state as invariants: OHLC bounds, skyline
  * non-dominance, rule-measure ranges, Markov row-stochasticity,
  * retention-triangle accounting. */
class AnalyticsLawsSpec extends SparkSpec {

  test("q205 OHLC: low <= open/close <= high, volumes conserve the corpus") {
    import spark.implicits._
    val bars = analytics.TimeSeries.ohlcResample(spark, sfDir).cache()
    assert(bars.filter($"low" > $"high").isEmpty)
    assert(bars.filter($"open" < $"low" || $"open" > $"high").isEmpty)
    assert(bars.filter($"close" < $"low" || $"close" > $"high").isEmpty)
    val n = graft.ingest.Tables.events(spark, sfDir).count()
    assert(bars.agg(sum($"volume")).head().getLong(0) === n,
      "every event must land in exactly one bar")
    bars.unpersist()
  }

  test("q207 skyline: no survivor is dominated; every non-survivor has a dominator") {
    import spark.implicits._
    val p = graft.ingest.Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_retailprice".as("price"), $"p_size".cast("long").as("size"))
    val sky = analytics.Olap.paretoSkyline(spark, sfDir).cache()
    // soundness: no pair of survivors dominates each other
    val bad = sky.as("a").join(sky.as("b"),
      ($"a.price" <= $"b.price" && $"a.size" >= $"b.size" &&
        ($"a.price" < $"b.price" || $"a.size" > $"b.size")))
    assert(bad.isEmpty, "a skyline member dominates another")
    // completeness: every dropped part has a dominator in the skyline
    val dropped = p.join(sky.select($"p_partkey"), Seq("p_partkey"), "left_anti")
    val undominated = dropped.as("d").join(sky.as("s"),
      $"s.price" <= $"d.price" && $"s.size" >= $"d.size" &&
        ($"s.price" < $"d.price" || $"s.size" > $"d.size"), "left_anti")
    assert(undominated.isEmpty, "a dropped part has no skyline dominator")
    sky.unpersist()
  }

  test("q211 rules: confidence <= 1000; symmetric-support lift agrees both directions") {
    import spark.implicits._
    val rules = analytics.GraphOps.associationRules(spark, sfDir).cache()
    assert(rules.filter($"conf_milli" > 1000L || $"conf_milli" < 0L).isEmpty)
    assert(rules.filter($"lift_micro" <= 0L).isEmpty)
    // supp(A,B) is symmetric, so whenever BOTH directions of a pair
    // survive the top-N cut their supports and lifts must be equal
    val both = rules.as("f").join(rules.as("r"),
      $"f.ante" === $"r.cons" && $"f.cons" === $"r.ante")
    assert(both.filter($"f.supp_ab" =!= $"r.supp_ab").isEmpty)
    assert(both.filter($"f.lift_micro" =!= $"r.lift_micro").isEmpty)
    rules.unpersist()
  }

  test("q214 Markov: transition mass conserves events minus per-user lasts; rows near-stochastic") {
    import spark.implicits._
    val t = analytics.Funnel.markovTransitions(spark, sfDir).cache()
    val events = graft.ingest.Tables.events(spark, sfDir)
    val nUsers = events.select($"user_id").distinct().count()
    val total = t.agg(sum($"n")).head().getLong(0)
    assert(total === events.count() - nUsers,
      "transitions = events minus each user's final event")
    // integer milli floors: each from-row sums to (1000 - |types| .. 1000]
    val rowSums = t.groupBy($"from_type")
      .agg(sum($"p_milli").as("s"), count(lit(1)).as("k"))
    assert(rowSums.filter($"s" > 1000L || $"s" <= lit(1000L) - $"k").isEmpty,
      "row-stochastic up to per-cell integer floor")
    t.unpersist()
  }

  test("q215 retention: offset 0 holds the whole cohort; later offsets never exceed it") {
    import spark.implicits._
    val r = analytics.Funnel.cohortRetention(spark, sfDir).cache()
    // by construction every user is active in their first week
    val base = r.filter($"week_offset" === 0L)
      .select($"cohort_week", $"n_users".as("cohort_size"))
    val over = r.join(base, "cohort_week")
      .filter($"n_users" > $"cohort_size")
    assert(over.isEmpty, "an offset cell exceeded its cohort size")
    // cohort sizes sum to the distinct-user universe
    val nUsers = graft.ingest.Tables.events(spark, sfDir)
      .select($"user_id").distinct().count()
    assert(base.agg(sum($"cohort_size")).head().getLong(0) === nUsers)
    r.unpersist()
  }
}
