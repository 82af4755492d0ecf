package graft

import graft.sources.{GraftCatalog, JsonlStats}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Laws of the declared WRITE SORT ORDER (r9c — the Iceberg
  * write-order property): the table, not the job, owns the discipline
  * that keeps zone maps and bounds tight. */
class SortOrderSpec extends SparkSpec {
  import spark.implicits._

  test("declared sort makes an UNSORTED append zone-map-effective") {
    def build(sortDeclared: Boolean): String = {
      val dir = Files.createTempDirectory(s"sort_$sortDeclared").toString
      // adversarial input: values SHUFFLED across the single task
      var w = spark.range(120000)
        .select($"id".as("event_id"), ($"id" % 7919).cast("long").as("user_id"),
          concat(lit("t"), $"id" % 5).as("event_type"),
          (($"id" * 2654435761L) % 100000).cast("double").as("value"))
        .coalesce(1)
        .write.format("graft-jsonl-stats").option("path", dir)
      if (sortDeclared) w = w.option("sortColumn", "value")
      w.mode("overwrite").save()
      dir
    }
    def rangesPlanned(dir: String): (Int, Int) = {
      val df = spark.read.format("graft-jsonl-stats")
        .option("path", dir).option("splitBytes", (1L << 20).toString).load()
        .filter($"value" >= 10.0 && $"value" < 900.0)
      val scans = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      val all = spark.read.format("graft-jsonl-stats")
        .option("path", dir).option("splitBytes", (1L << 20).toString).load()
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      (scans.head.scan.asInstanceOf[graft.sources.JsonlStatsScan]
        .toBatch.planInputPartitions().length,
       all.head.scan.asInstanceOf[graft.sources.JsonlStatsScan]
        .toBatch.planInputPartitions().length)
    }
    val sorted = build(sortDeclared = true)
    val unsorted = build(sortDeclared = false)
    val (keptS, totalS) = rangesPlanned(sorted)
    val (keptU, totalU) = rangesPlanned(unsorted)
    assert(totalS > 3, s"fixture must split into several ranges, got $totalS")
    assert(keptS <= 2, s"declared sort: narrow cut must keep <=2 of $totalS ranges, kept $keptS")
    assert(keptU === totalU, "shuffled input without the property prunes nothing")
    // same rows either way
    val a = spark.read.format("graft-jsonl-stats").option("path", sorted).load()
      .agg(count(lit(1)), sum($"value")).head()
    val b = spark.read.format("graft-jsonl-stats").option("path", unsorted).load()
      .agg(count(lit(1)), sum($"value")).head()
    assert(a === b)
  }

  test("sortColumn is a table property: CTAS declares it, later INSERTs obey it") {
    val root = Files.createTempDirectory("sort_cat").toString
    val cat = "graft_sort_" + java.lang.Integer.toHexString(root.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(
      s"""CREATE TABLE $cat.sorted_t TBLPROPERTIES ('sortColumn' = 'value') AS
         |SELECT CAST(id AS BIGINT) AS event_id,
         |  CAST((id * 48271) % 1000 AS DOUBLE) AS value
         |FROM range(50000)""".stripMargin)
    val dir = Paths.get(root, "sorted_t").toString
    assert(JsonlStats.readTableMeta(dir).sortCol === Some("value"), "property must persist")
    // an UNSORTED insert through the catalog: Spark must inject the sort
    spark.sql(
      s"""INSERT INTO $cat.sorted_t
         |SELECT CAST(id + 100000 AS BIGINT), CAST((id * 16807) % 1000 AS DOUBLE)
         |FROM range(50000)""".stripMargin)
    // every file's zone segments are monotone — the written order IS the
    // declared order, whatever the query produced
    JsonlStats.readStats(dir).filter(_.segb.size > 1).foreach { s =>
      s.segb.sliding(2).foreach { case Seq((_, hi1), (lo2, _)) =>
        assert(lo2 >= hi1 - 1e-9, s"segments out of order in ${s.file}: $hi1 then $lo2")
      }
    }
    assert(JsonlStats.readStats(dir).nonEmpty)
  }

  test("the property survives a protocol-feature stamp (meta-preserving rewrite law)") {
    val dir = Files.createTempDirectory("sort_stamp").toString
    spark.range(1000)
      .select($"id".as("event_id"), ($"id" % 10).as("user_id"),
        lit("t").as("event_type"), ($"id" % 97).cast("double").as("value"))
      .coalesce(1).write.format("graft-jsonl-stats")
      .option("path", dir).option("sortColumn", "value").mode("overwrite").save()
    assert(JsonlStats.readTableMeta(dir).sortCol === Some("value"))
    // an upsert stamps the equality-deletes feature through the
    // meta-preserving overload — sortCol must ride through
    Seq((5000L, 3L, "up", 1.0)).toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1).write.format("graft-jsonl-stats").option("path", dir)
      .option("upsertKeys", "user_id").mode("append").save()
    val meta = JsonlStats.readTableMeta(dir)
    assert(meta.features.contains(JsonlStats.FeatureEqDeletes))
    assert(meta.sortCol === Some("value"),
      "feature stamp dropped the sort property — the overload regressed")
  }
}
