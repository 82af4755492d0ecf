package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch probe for map-key pushdown (r13) — kept as a tiny
  * reproducible harness; the real laws live in TypedColumnsSpec and
  * q295's oracle. */
object MapPushProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("mapprobe").toString
    spark.conf.set("spark.sql.catalog.mp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mp.root", root)
    // keyed layout: one file per shard, each shard carrying a DISTINCT
    // 'a' value so per-key bounds can prune
    spark.sql("CREATE TABLE mp.t (id BIGINT, shard STRING, props MAP<STRING, BIGINT>) " +
      "USING `graft-jsonl-stats` PARTITIONED BY (shard)")
    spark.sql("INSERT INTO mp.t SELECT id, CAST(id % 8 AS STRING), " +
      "map('a', id % 8, 'b', id) FROM range(800)")
    println("files=" + graft.sources.JsonlStats.readStats(root + "/t").size)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      nodes(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan)
        .collect { case b: BatchScanExec => b.scan }
        .collect { case sc: graft.sources.JsonlStatsScan =>
          sc.toBatch.planInputPartitions().length }.sum
    val df = spark.sql("SELECT count(*) AS n FROM mp.t WHERE props['a'] = 3")
    println("present-key rows=" + df.collect().head.getLong(0) + " planned=" + planned(df))
    val df2 = spark.sql("SELECT count(*) AS n FROM mp.t WHERE props['zz'] > 0")
    println("absent-key rows=" + df2.collect().head.getLong(0) + " planned=" + planned(df2))
    spark.stop()
  }
}
