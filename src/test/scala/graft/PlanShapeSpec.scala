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
  // offsets — both sides calendar-sized, never data-sized).
  private val allowedNestedLoop = Set(
    "q32_tfidf_top_terms", "q33_cosine_topk_exact", "q65_ann_centroid_probe",
    "q116_recursive_calendar")

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
}
