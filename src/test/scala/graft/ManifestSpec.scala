package graft

import graft.ingest.{StatsManifest, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Laws of the per-file stats manifest (q130) the SQL oracle can't see:
  * the manifest must account for every file and row of the layout, the
  * pruned read must open strictly fewer files than the layout holds
  * (measured from the executed scan's own numFiles metric), and pruning
  * must be lossless for ARBITRARY ranges, not just the registered one. */
class ManifestSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec => q +: nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }

  private def filesRead(df: DataFrame): Long = {
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    qe.executedPlan.execute().count()
    val scans = nodes(qe.executedPlan).collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("manifest accounts for every file and every row of the layout") {
    import spark.implicits._
    val lay = spark.read.parquet(StatsManifest.layoutDir(spark, sfDir))
    val man = StatsManifest.manifest(spark, sfDir)
    // one manifest row per data file, no phantom files
    val layFiles = lay.select(col("_metadata.file_name")).distinct()
    val manFiles = man.select($"file")
    assert(layFiles.exceptAll(manFiles).isEmpty, "a data file is missing from the manifest")
    assert(manFiles.exceptAll(layFiles).isEmpty, "manifest lists a file the layout lacks")
    // row accounting: manifest counts sum to the table
    val total = man.agg(sum($"n_rows")).first().getLong(0)
    assert(total === Tables.lineitem(spark, sfDir).count())
    // stats sanity: min <= max on every file
    assert(man.filter($"mn" > $"mx").isEmpty)
  }

  test("registered scan opens strictly fewer files than the layout and matches the raw filter") {
    import spark.implicits._
    val (lo, hi) = StatsManifest.midThird(spark, sfDir)
    val pruned = StatsManifest.prunedRead(spark, sfDir, lo, hi)
    val nLayout = spark.read.parquet(StatsManifest.layoutDir(spark, sfDir))
      .select(col("_metadata.file_name")).distinct().count()
    val nOpened = filesRead(pruned)
    assert(nOpened < nLayout,
      s"manifest pruned nothing: opened $nOpened of $nLayout files")
    // lossless: pruned read == raw filter on the source table
    val raw = Tables.lineitem(spark, sfDir)
      .filter(to_date($"l_shipdate").between(
        lit(java.sql.Date.valueOf(lo)), lit(java.sql.Date.valueOf(hi))))
    assert(pruned.count() === raw.count())
  }

  test("DPP: the quarter filter on the dim prunes the fact's partitions at runtime") {
    import spark.implicits._
    val df = graft.ingest.DynamicPruning.dppQuarterScan(spark, sfDir)
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    qe.executedPlan.execute().count()
    // the scan must carry a runtime dynamicpruning subquery in its
    // partition filters — not a static month list
    val scans = nodes(qe.executedPlan).collect { case f: FileSourceScanExec => f }
    val factScan = scans.find(_.toString.contains("o_month")).getOrElse(fail("no fact scan"))
    assert(factScan.toString.contains("dynamicpruning"),
      "fact scan has no dynamic pruning subquery in its partition filters")
    // and it must have actually skipped most of the layout: quarter 2 is
    // ~3 of 12 months of files
    // file_path, not file_name: partition dirs can hold same-named files
    val total = spark.read.parquet(
      graft.ingest.Landing.fixtureDir(sfDir, "dpp_orders_bymonth"))
      .select(col("_metadata.file_path")).distinct().count()
    val opened = factScan.metrics("numFiles").value
    assert(opened * 2 < total,
      s"DPP opened $opened of $total files — pruning did not engage")
  }

  test("pruning is lossless for arbitrary ranges (fuzz)") {
    import spark.implicits._
    val man = StatsManifest.manifest(spark, sfDir)
    val row = man.agg(min($"mn"), max($"mx")).first()
    val (mnd, mxd) = (row.getDate(0).toLocalDate, row.getDate(1).toLocalDate)
    val span = java.time.temporal.ChronoUnit.DAYS.between(mnd, mxd)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val a = rnd.nextLong().abs % (span + 1)
      val b = rnd.nextLong().abs % (span + 1)
      val (lo, hi) = (mnd.plusDays(math.min(a, b)), mnd.plusDays(math.max(a, b)))
      val got = StatsManifest.prunedRead(spark, sfDir, lo, hi)
        .groupBy($"l_returnflag").count()
      val want = Tables.lineitem(spark, sfDir)
        .filter(to_date($"l_shipdate").between(
          lit(java.sql.Date.valueOf(lo)), lit(java.sql.Date.valueOf(hi))))
        .groupBy($"l_returnflag").count()
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"pruned read diverges from raw filter on [$lo, $hi]")
    }
    // out-of-span range: every file's stats miss it — must be empty, not a crash
    val far = mxd.plusYears(50)
    assert(StatsManifest.prunedRead(spark, sfDir, far, far.plusDays(30)).isEmpty,
      "disjoint range should return zero rows")
  }
}
