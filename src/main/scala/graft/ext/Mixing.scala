package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing (SURVEY §2.12 [ext]) — the weighted-interleave pass
  * that turns N cleaned corpora into ONE training stream with target
  * sampling ratios (e.g. 3× en against the tail languages): every
  * pretraining run feeds the trainer a mixed, sharded sequence, and the
  * mixing has to be deterministic so a resumed run sees the same order.
  *
  * Semantics (q104): each source's documents get per-source positions
  * 1,2,3,…; a document's interleave key is `position / weight`, so a
  * weight-3 source emits 3 documents for every 1 of a weight-1 source
  * until it drains (no epoch-repeat here — one pass over the corpus).
  * The merged order is then cut into fixed-size shards; the output is
  * per-shard composition, which is exactly the realized-vs-target
  * mixing-ratio audit a pipeline stores next to the run config.
  *
  * Scale shape: the merged order needs a GLOBAL row number, and the
  * naive `row_number() OVER (ORDER BY …)` is a single-reducer sort — at
  * corpus scale the one window task would process every row. This module
  * instead enumerates in two passes (`withGlobalPosition`), the same
  * scheme Spark's own `zipWithIndex` uses:
  *   1. `repartitionByRange` on the interleave key (the only full
  *      shuffle — parallel range sort, no single task sees the corpus),
  *   2. count rows per range partition (a tiny per-partition aggregate
  *      collected to the driver — one long per partition, NOT data),
  *   3. per-partition local rank + broadcast prefix-sum offset = exact
  *      global position, computed with full parallelism.
  */
object Mixing extends QueryModule {

  private val shardSize = 64
  private val enWeight = 3 // en emitted 3:1 against every other language

  /** Range-partition fan-out for the two-pass enumerations, derived
    * from the PLAN's size estimate (file bytes at the scan) instead of
    * a `count()` action (r16, guide §1.2: the count was a full extra
    * pass over the input thrown away after sizing). The output of every
    * consumer is nPart-INVARIANT by the enumeration laws (offsets adapt
    * to any boundary set), so an estimate is exactly as correct as the
    * row count — ~64 MB per range partition, floor 8. */
  def sizeBasedNPart(df: DataFrame): Int = {
    val bytes = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan.stats.sizeInBytes
    // clamp BEFORE the BigInt→Int conversion (ADVICE r16): a plan
    // reporting the default sizeInBytes (Long.MaxValue) would otherwise
    // truncate to an arbitrary Int — possibly a pathological positive
    // partition count. 4096 × 64 MB ≈ 256 GB per enumeration, plenty.
    math.max(8, (bytes / (64L << 20)).min(BigInt(4096)).toInt)
  }

  /** Exact global 1-based position along `sortCols` without a global
    * single-reducer sort. `nPart` fixes the range-partition fan-out so
    * the enumeration is deterministic run to run. */
  def withGlobalPosition(df: DataFrame, sortCols: Seq[Column], nPart: Int,
                         outCol: String): DataFrame =
    withGlobalPositionAndTotal(df, sortCols, nPart, outCol)._1

  /** [[withGlobalPosition]] plus the EXACT total row count, read off
    * the enumeration's own pass-1 per-partition counts — callers that
    * need both (q225's decile denominator) no longer pay a separate
    * corpus-sized `count()` action (r16, guide §1.2). */
  def withGlobalPositionAndTotal(df: DataFrame, sortCols: Seq[Column], nPart: Int,
                                 outCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    // localCheckpoint pins the range partitioning ONCE (ADVICE r4): the
    // range partitioner samples upstream rows, so evaluating the plan twice
    // (pass-1 counts, pass-2 rank) could re-sample different boundaries
    // under stage retry / speculative execution and make pass-2 partition
    // sizes disagree with pass-1's — duplicate or skipped positions. Both
    // passes below read the same materialized blocks. (On a real cluster
    // prefer checkpoint() to reliable storage — localCheckpoint dies with
    // an executor; semantics are identical.)
    val sorted = df.repartitionByRange(nPart, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: per-partition row counts — |result| = nPart, never data-sized
    val counts = sorted.groupBy($"_pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nPart).scanLeft(0L) {
      (acc, pid) => acc + counts.getOrElse(pid, 0L)
    }
    val offsetDf = spark.createDataFrame(
      (0 until nPart).map(pid => (pid, offsets(pid)))).toDF("_pid", "_offset")
    // pass 2: rank locally within each range partition (window keyed by
    // _pid — parallelism = nPart, no global collapse), add the offset
    val local = Window.partitionBy($"_pid").orderBy(sortCols: _*)
    (sorted
      .join(broadcast(offsetDf), "_pid")
      .withColumn(outCol, row_number().over(local) + $"_offset")
      .drop("_pid", "_offset"),
      offsets(nPart))
  }

  /** q104: weighted source interleave → fixed-size shards → per-shard
    * realized composition. */
  def corpusMixing(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val perSource = Window.partitionBy($"source").orderBy($"doc_id")
    val keyed = Tables.documents(spark, d)
      .withColumn("rn", row_number().over(perSource))
      .withColumn("w", when($"lang" === "en", enWeight).otherwise(1))
      .withColumn("ikey", $"rn".cast("double") / $"w")
    // Fan-out sized to the corpus (~64 MB per range partition, floor 8)
    // from the plan's size estimate rather than a count() action: global
    // positions are exact for ANY boundary set (the offsets adapt), so
    // this is a pure throughput knob — the oracle is unaffected, and the
    // sizing no longer costs a full extra pass over the corpus (r16).
    val nPart = sizeBasedNPart(Tables.documents(spark, d))
    val positioned = withGlobalPosition(
      keyed, Seq($"ikey", $"source", $"doc_id"), nPart, outCol = "gpos")
    positioned
      .groupBy(floor(($"gpos" - 1) / shardSize).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"lang" === "en", 1).otherwise(0)).cast("long").as("n_en"),
        min($"gpos").as("first_pos"),
        max($"gpos").as("last_pos"))
      .orderBy($"shard")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q104_corpus_mixing" -> corpusMixing,
  )

  val oracles = Map(
    "q104_corpus_mixing" ->
      s"""WITH pos AS (
         |  SELECT doc_id, source, lang,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         |    CASE WHEN lang = 'en' THEN $enWeight ELSE 1 END AS w
         |  FROM documents
         |), ordered AS (
         |  SELECT doc_id, source, lang,
         |    ROW_NUMBER() OVER (ORDER BY CAST(rn AS DOUBLE)/w, source, doc_id) AS gpos
         |  FROM pos
         |)
         |SELECT CAST(FLOOR((gpos-1)/$shardSize) AS BIGINT) AS shard,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |  MIN(gpos) AS first_pos, MAX(gpos) AS last_pos
         |FROM ordered GROUP BY shard ORDER BY shard""".stripMargin,
  )
}
