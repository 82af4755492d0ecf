package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.Tables
import graft.sources.JsonlStatsQueries.ensureCatalog

/** Step-level timing of the MV lifecycle queries (q303/q304/q300/q298):
  * each DDL/DML/refresh/readout step timed separately so optimization
  * work targets the step that actually costs, not the lifecycle as a
  * blob. Run AFTER one untimed warm-up pass (fixture builds excluded),
  * mirroring the bench discipline.
  *
  *   tools/benchrun.sh graft.tools.MvLifecycleProfile /root/testdata/sf0.1 q303
  */
object MvLifecycleProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).headOption.getOrElse("q303")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.graft.mv.profile", sys.env.getOrElse("GRAFT_MV_PROFILE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(pass: Int): Unit = {
      def t[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        if (pass > 0) println(f"  [$which pass$pass] $label%-28s $dt%7.3f s")
        r
      }
      val cat = ensureCatalog(spark, d)
      which match {
        case "q303" =>
          t("drop")(spark.sql(s"DROP TABLE IF EXISTS $cat.mvd_src"))
          Tables.events(spark, d).select(col("event_id"), col("event_type"), col("user_id"))
            .createOrReplaceTempView("mvd_src_in")
          t("ctas-src")(spark.sql(
            s"""CREATE TABLE $cat.mvd_src AS
               |SELECT event_id, event_type, user_id FROM mvd_src_in WHERE event_id % 3 <> 2""".stripMargin))
          t("create-mv")(spark.sql(s"CALL $cat.create_materialized_view('mv_du', " +
            s"'SELECT event_type, count(DISTINCT user_id) AS du, count(*) AS n " +
            s"FROM $cat.mvd_src GROUP BY event_type', or_replace => true)"))
          t("insert-window")(spark.sql(s"INSERT INTO $cat.mvd_src " +
            "SELECT event_id, event_type, user_id FROM mvd_src_in WHERE event_id % 3 = 2"))
          t("refresh-append")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_du')").collect())
          t("delete-window")(spark.sql(s"DELETE FROM $cat.mvd_src WHERE user_id % 5 = 0"))
          t("refresh-delete")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_du')").collect())
          val agg = t("agg-plan")(spark.sql(s"SELECT event_type, count(DISTINCT user_id) AS du, " +
            s"count(*) AS n FROM $cat.mvd_src GROUP BY event_type"))
          t("readout")(agg.write.format("noop").mode("overwrite").save())
        case "q304" =>
          t("drops") {
            spark.sql(s"DROP TABLE IF EXISTS $cat.mvlo_fact")
            spark.sql(s"DROP TABLE IF EXISTS $cat.mvlo_dim")
          }
          Tables.events(spark, d).select(col("event_id"), col("user_id"), col("value"))
            .createOrReplaceTempView("mvlo_fact_in")
          Tables.customer(spark, d).select(col("c_custkey"), col("c_mktsegment"))
            .createOrReplaceTempView("mvlo_dim_in")
          t("ctas-dim")(spark.sql(s"CREATE TABLE $cat.mvlo_dim AS " +
            "SELECT * FROM mvlo_dim_in WHERE c_custkey % 4 <> 3"))
          t("ctas-fact")(spark.sql(
            s"""CREATE TABLE $cat.mvlo_fact AS
               |SELECT event_id, user_id, value FROM mvlo_fact_in WHERE event_id % 3 <> 2""".stripMargin))
          t("create-mv")(spark.sql(s"CALL $cat.create_materialized_view('mv_lo', " +
            s"'SELECT COALESCE(c_mktsegment, ''none'') AS seg, count(*) AS n, " +
            s"CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv " +
            s"FROM $cat.mvlo_fact LEFT JOIN $cat.mvlo_dim ON user_id = c_custkey " +
            s"GROUP BY COALESCE(c_mktsegment, ''none'')', or_replace => true)"))
          t("fact-window")(spark.sql(s"INSERT INTO $cat.mvlo_fact " +
            "SELECT event_id, user_id, value FROM mvlo_fact_in WHERE event_id % 3 = 2"))
          t("refresh-fact")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_lo')").collect())
          t("fact-delete-window")(spark.sql(s"DELETE FROM $cat.mvlo_fact WHERE event_id % 7 = 0"))
          t("refresh-fact-del")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_lo')").collect())
          t("dim-insert-window")(spark.sql(s"INSERT INTO $cat.mvlo_dim VALUES (3, 'SYNTHETIC')"))
          t("refresh-dim-insert")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_lo')").collect())
          t("dim-delete-window")(spark.sql(s"DELETE FROM $cat.mvlo_dim WHERE c_custkey % 10 = 6"))
          t("refresh-dim-delete")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_lo')").collect())
          val ro = t("readout-build")(spark.sql(
            s"SELECT 'rows' AS phase, seg, n, sv FROM $cat.mv_lo"))
          t("readout")(ro.write.format("noop").mode("overwrite").save())
        case "q300" =>
          t("drop")(spark.sql(s"DROP TABLE IF EXISTS $cat.mva_src"))
          Tables.events(spark, d).select(col("event_id"), col("event_type"), col("value"))
            .createOrReplaceTempView("mva_src_in")
          t("ctas-src")(spark.sql(
            s"""CREATE TABLE $cat.mva_src AS
               |SELECT event_id, event_type, value FROM mva_src_in WHERE event_id % 3 <> 2""".stripMargin))
          t("create-mv")(spark.sql(s"CALL $cat.create_materialized_view('mv_avg', " +
            s"'SELECT event_type, avg(CAST(value AS DECIMAL(18,6))) AS av, count(*) AS n " +
            s"FROM $cat.mva_src GROUP BY event_type', or_replace => true)"))
          t("insert-window")(spark.sql(s"INSERT INTO $cat.mva_src " +
            "SELECT event_id, event_type, value FROM mva_src_in WHERE event_id % 3 = 2"))
          t("delete-window")(spark.sql(s"DELETE FROM $cat.mva_src WHERE event_id % 11 = 0"))
          t("refresh")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_avg')").collect())
          val agg300 = t("agg-plan")(spark.sql(
            s"""SELECT event_type, count(*) AS n,
               |  CAST(CAST(avg(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS DOUBLE) AS av2
               |FROM $cat.mva_src GROUP BY event_type""".stripMargin))
          t("readout")(agg300.write.format("noop").mode("overwrite").save())
        case "q299" =>
          t("drops") {
            spark.sql(s"DROP TABLE IF EXISTS $cat.mvj_fact")
            spark.sql(s"DROP TABLE IF EXISTS $cat.mvj_dim")
          }
          Tables.events(spark, d).select(col("event_id"), col("user_id"), col("value"))
            .createOrReplaceTempView("mvj_fact_in")
          Tables.customer(spark, d).select(col("c_custkey"), col("c_mktsegment"))
            .createOrReplaceTempView("mvj_dim_in")
          t("ctas-dim")(spark.sql(s"CREATE TABLE $cat.mvj_dim AS SELECT * FROM mvj_dim_in"))
          t("ctas-fact")(spark.sql(
            s"""CREATE TABLE $cat.mvj_fact AS
               |SELECT event_id, user_id, value FROM mvj_fact_in WHERE event_id % 3 = 0""".stripMargin))
          t("create-mv")(spark.sql(s"CALL $cat.create_materialized_view('mv_star', " +
            s"'SELECT c_mktsegment AS seg, count(*) AS n, " +
            s"CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum " +
            s"FROM $cat.mvj_fact JOIN $cat.mvj_dim ON user_id = c_custkey " +
            s"GROUP BY c_mktsegment', or_replace => true)"))
          t("fact-append")(spark.sql(s"INSERT INTO $cat.mvj_fact " +
            "SELECT event_id, user_id, value FROM mvj_fact_in WHERE event_id % 3 = 1"))
          t("refresh-append")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_star')").collect())
          t("fact-delete")(spark.sql(s"DELETE FROM $cat.mvj_fact WHERE event_id % 7 = 0"))
          t("refresh-delete")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_star')").collect())
          t("both-move") {
            spark.sql(s"INSERT INTO $cat.mvj_fact " +
              "SELECT event_id, user_id, value FROM mvj_fact_in WHERE event_id % 3 = 2")
            spark.sql(s"INSERT INTO $cat.mvj_dim VALUES (99999991, 'SYNTHETIC')")
          }
          t("refresh-both")(spark.sql(s"CALL $cat.refresh_materialized_view('mv_star')").collect())
          val ro299 = t("readout-build")(spark.sql(
            s"SELECT 'rows' AS phase, seg, n, value_sum FROM $cat.mv_star"))
          t("readout")(ro299.write.format("noop").mode("overwrite").save())
        case other => sys.error(s"unknown profile target $other")
      }
    }
    run(0) // warm-up: fixtures, codegen, page cache
    run(1); run(2)
    spark.stop()
  }
}
