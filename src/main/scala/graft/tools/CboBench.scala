package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the ANALYZE/CBO tier (r9c) buys in WALL-CLOCK, not
  * just plan shape: a three-table star join WRITTEN in the worst order
  * (fact ⋈ wide-dim first — a fact-sized intermediate — then the
  * selective tiny-dim filter last), timed with CBO off (Spark executes
  * roughly as written) vs CBO+joinReorder on over ANALYZEd connector
  * tables (the estimator sees the tiny dim's NDV and cardinality and
  * reorders the selective join first, collapsing the intermediate).
  *
  * Usage: runMain graft.tools.CboBench — one JSON line.
  */
object CboBench {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // the demonstration is JOIN ORDER, so take broadcast sizing out
      // of the picture: every join is a shuffle join either way
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("cbo").toString
    val cat = "cbobench"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)

    // fact: 8M rows; wide dim: one row per user (200k); tiny dim: 7
    // types of which the query keeps 1 — the selective edge CBO should
    // join first
    spark.sql(
      s"""CREATE TABLE $cat.fact AS
         |SELECT CAST(id AS BIGINT) AS event_id,
         |  CAST(id % 200000 AS BIGINT) AS user_id,
         |  concat('type_', CAST(id % 7 AS STRING)) AS event_type,
         |  CAST(id % 1000 AS DOUBLE) AS value
         |FROM range(8000000)""".stripMargin)
    spark.sql(
      s"""CREATE TABLE $cat.users AS
         |SELECT CAST(id AS BIGINT) AS user_id,
         |  concat('seg_', CAST(id % 50 AS STRING)) AS segment
         |FROM range(200000)""".stripMargin)
    spark.sql(
      s"""CREATE TABLE $cat.types AS
         |SELECT concat('type_', CAST(id AS STRING)) AS event_type,
         |  CAST(id AS BIGINT) AS type_rank
         |FROM range(7)""".stripMargin)
    Seq("fact", "users", "types").foreach(t => spark.sql(s"CALL $cat.analyze_table('$t')"))

    val q =
      s"""SELECT count(*) AS n
         |FROM $cat.fact f
         |JOIN $cat.users u ON f.user_id = u.user_id
         |JOIN $cat.types t ON f.event_type = t.event_type
         |WHERE t.type_rank = 3""".stripMargin

    def run(cbo: Boolean): Double = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      val runs = (1 to 3).map(_ => timed(spark.sql(q).head().getLong(0)))
      require(runs.map(_._1).distinct.size == 1)
      med(runs.map(_._2))
    }
    val off = run(cbo = false)
    val on = run(cbo = true)
    println(s"""{"bench":"cbo_reorder","fact_rows":8000000,"off_sec":${"%.2f".format(off)},""" +
      s""""on_sec":${"%.2f".format(on)},"speedup":${"%.1f".format(off / on)}}""")
    spark.stop()
  }
}
