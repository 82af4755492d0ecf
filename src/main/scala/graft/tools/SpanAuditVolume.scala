package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Work-term readout for the two-tier substring audit (q226 vs q200,
  * VERDICT r7 next-round #1): total stride-1 gram positions (what q200
  * shuffles as L-char strings), hash-colliding candidate positions
  * (what q226's tier 2 materializes as strings), and truly duplicated
  * positions (the answer) — the prefilter ratio the SCALING.md row
  * records.
  *
  * Usage: runMain graft.tools.SpanAuditVolume <sfDir>
  */
object SpanAuditVolume {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .appName("graft-span-audit-volume").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    import spark.implicits._
    try {
      graft.functions.GraftFunctions.register(spark)
      val L = graft.ext.SpanDedup.gramLen
      val docs = graft.ingest.Tables.documents(spark, dir)
        .filter(length($"text") >= L)
      val pos = docs.select($"doc_id",
          posexplode(call_function("graft_rolling_hashes", $"text", lit(L))))
        .toDF("doc_id", "p", "h")
        .localCheckpoint()
      val total = pos.count()
      val byHash = pos.groupBy($"h").agg(count(lit(1)).as("c")).localCheckpoint()
      val candidates = byHash.filter($"c" >= 2).agg(sum($"c")).head().getLong(0)
      // exact duplicated positions (string-verified), for the ratio's
      // denominator-of-merit: candidates should track TRUE duplicates,
      // not total positions
      val cand = pos.join(byHash.filter($"c" >= 2).select($"h"), "h")
        .select($"doc_id", $"p")
      val grams = cand.join(docs.select($"doc_id", $"text"), "doc_id")
        .select(expr(s"substr(text, p + 1, $L)").as("g"))
      val dup = grams.groupBy($"g").agg(count(lit(1)).as("c"))
        .filter($"c" >= 2).agg(sum($"c")).head().getLong(0)
      println(s"""{"metric":"span_audit_volume","gram_positions":$total,"hash_candidates":$candidates,"true_duplicates":$dup,"candidate_fraction_milli":${1000 * candidates / total},"sf":"$dir"}""")
    } finally spark.stop()
  }
}
