package graft.tools

import org.apache.spark.sql.SparkSession

/** PQ/IVF-PQ recall measurement at honest parameters (VERDICT r7
  * next-round #7): runs [[graft.ext.ClusterTrain.pqRecall]] over an
  * embedding corpus and prints one JSON line per configuration.
  *
  * Usage: runMain graft.tools.PqRecall <sfDir> <m> <k> <rounds> <nQueries> <topK> [rerank...]
  * Each trailing rerank value (0 = raw ADC) measures one variant.
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val m = args(1).toInt; val k = args(2).toInt; val rounds = args(3).toInt
    val nq = args(4).toInt; val topK = args(5).toInt
    val reranks = if (args.length > 6) args.drop(6).map(_.toInt).toSeq else Seq(0)
    val spark = SparkSession.builder()
      .appName("graft-pq-recall").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try reranks.foreach { rr =>
      val t0 = System.nanoTime()
      val row = graft.ext.ClusterTrain.pqRecall(spark, dir, m, k, rounds, nq, topK, rr).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"pq_recall","m":$m,"k":$k,"rounds":$rounds,"n_queries":$nq,"top_k":$topK,"rerank":$rr,"recall_milli":${row.getAs[Long]("recall_milli")},"sec":$sec%.2f,"sf":"$dir"}""")
    } finally spark.stop()
  }
}
