package graft

import graft.sources.{GraftCatalog, JsonlStats, JsonlStatsScan}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Laws of TopN / LIMIT pushdown (r9c): ORDER BY c LIMIT k over a
  * range-ordered layout reads a handful of files; LIMIT k reads a file
  * prefix with early-terminating tasks; every guarantee ingredient
  * that goes unknowable (nulls under NULLS FIRST, equality deletes)
  * degrades to no-pruning, never to a wrong drop. */
class TopNLimitSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec => q +: nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val scans = nodes(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan).collect { case b: BatchScanExec => b }
    assert(scans.size === 1, s"expected one scan, got ${scans.size}")
    scans.head.scan.asInstanceOf[JsonlStatsScan].toBatch.planInputPartitions().length
  }

  /** events range-partitioned by event_id into 8 files — the
    * time-series layout (monotone ids ↔ arrival order). */
  private def fixture(tag: String): (String, Int, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory(s"topn_$tag").toString
    graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .repartitionByRange(8, $"event_id")
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    val files = JsonlStats.readStats(dir).size
    (dir, files, graft.ingest.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value"))
  }

  private def readBack(dir: String) =
    spark.read.format("graft-jsonl-stats").option("path", dir).load()

  test("ORDER BY id DESC LIMIT k reads one file of eight on a range-ordered layout") {
    val (dir, files, oracle) = fixture("desc")
    assume(files >= 4)
    val q = readBack(dir).orderBy($"event_id".desc).limit(20)
    assert(plannedFiles(q) < files / 2,
      s"recency query planned ${plannedFiles(q)}/$files files")
    val got = q.select($"event_id").as[Long].collect().toSeq
    val want = oracle.orderBy($"event_id".desc).limit(20)
      .select($"event_id").as[Long].collect().toSeq
    assert(got === want)
  }

  test("ORDER BY id ASC LIMIT k prunes from the other end; a residual filter blocks the push") {
    val (dir, files, oracle) = fixture("asc")
    val q = readBack(dir).orderBy($"event_id".asc).limit(15)
    assert(plannedFiles(q) < files, "ascending topN must prune")
    assert(q.select($"event_id").as[Long].collect().toSeq ===
      oracle.orderBy($"event_id".asc).limit(15).select($"event_id").as[Long].collect().toSeq)
    // this connector keeps every pushed filter residual, so Spark never
    // pushes a topN past one — bounds-based FILE pruning still applies,
    // and exactness holds either way (the defensive decline in
    // topLimitPrune is for a contract change, not this path)
    val mid = oracle.agg(avg($"value")).head().getDouble(0)
    val qs = readBack(dir).filter($"value" >= mid).orderBy($"event_id".desc).limit(10)
    assert(qs.select($"event_id").as[Long].collect().toSeq ===
      oracle.filter($"value" >= mid).orderBy($"event_id".desc).limit(10)
        .select($"event_id").as[Long].collect().toSeq)
  }

  test("LIMIT k plans a file prefix and serves exactly k rows") {
    val (dir, files, _) = fixture("lim")
    val q = readBack(dir).limit(25)
    assert(plannedFiles(q) < files, s"LIMIT planned ${plannedFiles(q)}/$files files")
    assert(q.count() === 25L)
    // larger than the table: everything planned, full count served
    val total = readBack(dir).count()
    val qAll = readBack(dir).limit(10_000_000)
    assert(qAll.count() === total)
  }

  test("nulls in the sort column: NULLS FIRST declines pruning; DESC stays exact") {
    val dir = Files.createTempDirectory("topn_null").toString
    graft.ingest.Tables.events(spark, sfDir)
      .select(when($"event_id" % 97 === 0, lit(null).cast("long"))
        .otherwise($"event_id").as("event_id"), $"value")
      .repartitionByRange(6, $"value")
      .write.format("graft-jsonl-stats").option("path", dir).mode("overwrite").save()
    val files = JsonlStats.readStats(dir).size
    val oracle = graft.ingest.Tables.events(spark, sfDir)
      .select(when($"event_id" % 97 === 0, lit(null).cast("long"))
        .otherwise($"event_id").as("event_id"), $"value")
    // ASC = NULLS FIRST by default: the top-k is nulls, which bounds
    // cannot see — pruning must decline entirely
    val qNf = readBack(dir).orderBy($"event_id".asc).limit(5)
    assert(plannedFiles(qNf) === files, "NULLS FIRST with nulls present must not prune")
    assert(qNf.select($"event_id").as[Option[Long]].collect().forall(_.isEmpty))
    // DESC = NULLS LAST: nulls rank bottom; pruning stays exact
    val qD = readBack(dir).orderBy($"event_id".desc).limit(12)
    assert(qD.select($"event_id").as[Option[Long]].collect().toSeq ===
      oracle.orderBy($"event_id".desc).limit(12)
        .select($"event_id").as[Option[Long]].collect().toSeq)
  }

  test("deletion vectors shrink the guarantees: topN exact after a DELETE in the top file") {
    val (dir, _, _) = fixture("dv")
    val cat = "graft_topn_" + java.lang.Integer.toHexString(dir.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", Paths.get(dir).getParent.toString)
    val t = Paths.get(dir).getFileName.toString
    val maxId = readBack(dir).agg(max($"event_id")).head().getLong(0)
    spark.sql(s"DELETE FROM $cat.`$t` WHERE event_id > ${maxId - 40}")
    val got = readBack(dir).orderBy($"event_id".desc).limit(10)
      .select($"event_id").as[Long].collect().toSeq
    assert(got.head === maxId - 40 || got.head < maxId,
      "deleted top rows must not resurface")
    assert(got.size === 10 && got === got.sorted.reverse)
    assert(got.forall(_ <= maxId - 40))
  }

  test("equality deletes void all guarantees: no pruning, exact results") {
    val (dir, files, _) = fixture("eq")
    Seq((9_000_000L, 5L, "up", 1.0)).toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1).write.format("graft-jsonl-stats").option("path", dir)
      .option("upsertKeys", "user_id").mode("append").save()
    val q = readBack(dir).orderBy($"event_id".desc).limit(5)
    assert(plannedFiles(q) === files + 1,
      "outstanding equality deletes must disable topN file pruning")
    val got = q.select($"event_id").as[Long].collect().toSeq
    assert(got.head === 9_000_000L, "the upserted row is the new max")
    assert(!got.exists(id => readBack(dir).filter($"event_id" === id).isEmpty))
  }
}
