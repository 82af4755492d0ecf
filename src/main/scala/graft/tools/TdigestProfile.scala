package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.Tables

/** Step-level timing of q232's t-digest rollup (r17): pass 1 (daily
  * UDAF digests + weekly merge + driver readout) vs pass 2 (the exact
  * percentile certificate scan), so optimization targets the pass that
  * costs. Mirrors the bench discipline: warm-up pass untimed.
  *
  *   tools/benchrun.sh graft.tools.TdigestProfile /root/testdata/sf0.1
  */
object TdigestProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TDigest

    def run(pass: Int): Unit = {
      def t[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        if (pass > 0) println(f"  [q232 pass$pass] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
      val ord = Tables.orders(spark, d)
        .select(date_trunc("week", $"o_orderdate").cast("date").as("week"),
          $"o_orderdate".as("day"), $"o_totalprice",
          $"o_totalprice".cast("double").as("price"))
      val td = udaf(TDigest.agg)
      val tdm = udaf(TDigest.mergeAgg)
      val daily = ord.groupBy($"week", $"day").agg(td($"price").as("sk"))
      val weekly = daily.groupBy($"week").agg(tdm($"sk").as("sk"))
      val est = t("digests+collect")(weekly.collect()).map { r =>
        val sk = r.getSeq[Double](1)
        (r.getDate(0), TDigest.quantile(sk, 0.5), TDigest.quantile(sk, 0.95))
      }.toSeq.toDF("week", "est50", "est95")
      val checked = ord.join(broadcast(est), "week")
        .groupBy($"week")
        .agg(count(lit(1)).as("n_orders"),
          expr("percentile(o_totalprice, array(0.5D, 0.95D))").as("ex"),
          sum(when($"price" <= $"est50", 1L).otherwise(0L)).as("le50"),
          sum(when($"price" <= $"est95", 1L).otherwise(0L)).as("le95"))
      val out = checked.select($"week", $"n_orders",
        $"ex" (0).as("p50"), $"ex" (1).as("p95"),
        (abs($"le50" / $"n_orders".cast("double") - 0.5) <=
          lit(0.01) + lit(1.0) / $"n_orders").as("digest50_ok"),
        (abs($"le95" / $"n_orders".cast("double") - 0.95) <=
          lit(0.01) + lit(1.0) / $"n_orders").as("digest95_ok"))
        .orderBy($"week")
      t("certificate-scan")(out.write.format("noop").mode("overwrite").save())
      // decomposition probes (untimed output path differences):
      val dailyOnly = ord.groupBy($"week", $"day").agg(td($"price").as("sk"))
      t("daily-udaf-only")(dailyOnly.write.format("noop").mode("overwrite").save())
      val exOnly = ord.groupBy($"week")
        .agg(expr("percentile(o_totalprice, array(0.5D, 0.95D))").as("ex"))
      t("percentile-only")(exOnly.write.format("noop").mode("overwrite").save())
      val scanOnly = ord.groupBy($"week").agg(count(lit(1)).as("n"))
      t("scan+count-only")(scanOnly.write.format("noop").mode("overwrite").save())
    }
    run(0); run(1); run(2)
    spark.stop()
  }
}
