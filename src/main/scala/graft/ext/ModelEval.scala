package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation readouts (SURVEY §2.12 [ext]) — the metric pass a
  * training pipeline runs after the q199-style classifier sweep: score a
  * held-out corpus, then reduce (score, label) pairs to an exact ranking
  * metric. Reference shape: the quality-score gate of
  * `/root/reference/Assets/Jobs/curate_documents.py` emits a scalar score
  * per document; evaluating such a scorer against a binary outcome is the
  * standard ROC-AUC readout.
  *
  * q224 computes EXACT ROC-AUC as the tie-corrected Mann-Whitney U
  * statistic — not a sampled or binned approximation — and reports it as
  * an integer numerator/denominator pair (both ×2 so the ½-credit tie
  * term stays integral): AUC = auc_num_x2 / auc_den_x2. Integer output is
  * deliberate: it hash-compares bit-exactly against the DuckDB oracle
  * with no float-rounding hazard, the same posture as the integer-µ-unit
  * PageRank (q151) and NLL (q149).
  *
  * Scale shape: the textbook formula needs every positive's global rank,
  * and `rank() OVER (ORDER BY score)` is a single-reducer sort. Instead:
  *   1. collapse to one row per DISTINCT score (groupBy — first and only
  *      data-sized shuffle; |groups| ≤ |rows|),
  *   2. exclusive prefix-sum of group sizes along the score order via
  *      range partition + per-partition window + broadcast offsets — the
  *      same two-pass enumeration as [[Mixing.withGlobalPosition]], full
  *      parallelism, no global collapse,
  *   3. one partial-aggregated global reduce of the closed-form sum.
  * At 100 TB every stage is either map-side or keyed-shuffle; the only
  * driver-side data is one long per range partition.
  */
object ModelEval extends QueryModule {

  /** Exclusive running sum of `value` along `sortCols` without a global
    * single-reducer window: range-partition on the sort key, per-partition
    * totals (one long each) → broadcast prefix offsets, then a local
    * window inside each partition. Exact for any boundary placement. */
  def withExclusivePrefixSum(df: DataFrame, sortCols: Seq[Column], value: Column,
                             nPart: Int, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // localCheckpoint pins the sampled range boundaries ONCE (ADVICE r4,
    // same reasoning as Mixing.withGlobalPosition): both passes below must
    // see identical partition contents or offsets disagree with ranks.
    val sorted = df.withColumn("_v", value.cast("long"))
      .repartitionByRange(nPart, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val sums = sorted.groupBy($"_pid").agg(sum($"_v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nPart).scanLeft(0L) {
      (acc, pid) => acc + sums.getOrElse(pid, 0L)
    }
    val offsetDf = spark.createDataFrame(
      (0 until nPart).map(pid => (pid, offsets(pid)))).toDF("_pid", "_offset")
    val local = Window.partitionBy($"_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted
      .join(broadcast(offsetDf), "_pid")
      .withColumn(outCol, coalesce(sum($"_v").over(local), lit(0L)) + $"_offset")
      .drop("_pid", "_offset", "_v")
  }

  /** q224: exact tie-corrected ROC-AUC of o_totalprice as a score for
    * o_orderstatus='F'. Per distinct score s with `pos` positives, `cnt`
    * rows and `below` rows strictly under s, the average 1-based rank of
    * the group is below + (cnt+1)/2, so
    *   2·Σ_pos avgrank = Σ_s pos·(2·below + cnt + 1)
    * and U×2 = that sum − P(P+1); AUC×2-denominator = 2·P·N. */
  def aucReadout(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.orders(spark, d)
      .select($"o_totalprice".as("score"),
        when($"o_orderstatus" === "F", 1L).otherwise(0L).as("y"))
    // Fan-out is a pure throughput knob (offsets adapt to any boundary
    // set); sized from the plan's size estimate — a count() action here
    // was a full extra pass over orders thrown away after sizing (r16).
    val nPart = Mixing.sizeBasedNPart(Tables.orders(spark, d))
    aucFrom(scored, nPart)
  }

  /** Core reduction over a (score, y∈{0,1}) frame — exposed so specs can
    * drive synthetic corpora and the nPart-invariance law directly. */
  def aucFrom(scored: DataFrame, nPart: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val g = scored.groupBy($"score")
      .agg(sum($"y").as("pos"), count(lit(1)).as("cnt"))
    val below = withExclusivePrefixSum(g, Seq($"score"), $"cnt", nPart, "below")
    below.agg(
      sum($"pos").cast("long").as("positives"),
      (sum($"cnt") - sum($"pos")).cast("long").as("negatives"),
      (sum($"pos" * (lit(2L) * $"below" + $"cnt" + lit(1L)))
        - sum($"pos") * (sum($"pos") + lit(1L))).cast("long").as("auc_num_x2"),
      (lit(2L) * sum($"pos") * (sum($"cnt") - sum($"pos")))
        .cast("long").as("auc_den_x2"))
  }

  /** q225: gains/lift table by score decile — the other half of the
    * model-eval readout pair (q224 ranks pairwise, this banks the ranked
    * list into the business-facing "top-10% captures X× the base rate"
    * curve). Decile assignment needs each row's EXACT global rank along
    * (score DESC, key); that is [[Mixing.withGlobalPosition]]'s two-pass
    * range-partitioned enumeration — never a one-reducer ROW_NUMBER.
    * The tiebreak on the unique key is load-bearing: without it, tied
    * scores straddling a decile boundary would land nondeterministically
    * and the hash-compare would be corpus-order-dependent. Cumulative
    * lift is integer milli-units via `div`, mirrored exactly in the
    * oracle (`//`) — the 10-row window after grouping is bounded by the
    * decile count, not the corpus. */
  def liftTable(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.orders(spark, d)
      .select($"o_orderkey".as("k"), $"o_totalprice".as("score"),
        when($"o_orderstatus" === "F", 1L).otherwise(0L).as("y"))
    // the decile denominator needs the EXACT total — read it off the
    // enumeration's own pass-1 counts instead of a separate corpus-sized
    // count() action (r16); fan-out sizing needs only the estimate
    val nPart = Mixing.sizeBasedNPart(Tables.orders(spark, d))
    val (positioned, total) = Mixing.withGlobalPositionAndTotal(
      scored, Seq($"score".desc, $"k"), nPart, outCol = "gpos")
    val g = positioned
      .withColumn("decile", expr(s"((gpos - 1) * 10) div $total"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"), sum($"y").as("positives"))
    val w = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("cum_positives", sum($"positives").over(w))
      .withColumn("_cum_n", sum($"n").over(w))
      .withColumn("_p", sum($"positives").over(all))
      .withColumn("_t", sum($"n").over(all))
      .withColumn("cum_lift_milli",
        expr("(1000 * cum_positives * _t) div (_cum_n * _p)"))
      .select($"decile", $"n", $"positives".cast("long").as("positives"),
        $"cum_positives".cast("long").as("cum_positives"),
        $"cum_lift_milli".cast("long").as("cum_lift_milli"))
      .orderBy($"decile")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q224_auc_readout" -> aucReadout,
    "q225_lift_table" -> liftTable,
  )

  val oracles = Map(
    "q224_auc_readout" ->
      """WITH s AS (
        |  SELECT o_totalprice AS score,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders
        |), g AS (
        |  SELECT score, SUM(y) AS pos, COUNT(*) AS cnt FROM s GROUP BY score
        |), p AS (
        |  SELECT pos, cnt,
        |    COALESCE(SUM(cnt) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM g
        |)
        |SELECT
        |  CAST(SUM(pos) AS BIGINT) AS positives,
        |  CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS negatives,
        |  CAST(SUM(pos*(2*below + cnt + 1)) - SUM(pos)*(SUM(pos)+1) AS BIGINT) AS auc_num_x2,
        |  CAST(2*SUM(pos)*(SUM(cnt) - SUM(pos)) AS BIGINT) AS auc_den_x2
        |FROM p""".stripMargin,
    "q225_lift_table" ->
      """WITH s AS (
        |  SELECT o_orderkey AS k, o_totalprice AS score,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders
        |), r AS (
        |  SELECT y,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, k) AS gpos,
        |    COUNT(*) OVER () AS total
        |  FROM s
        |), g AS (
        |  SELECT ((gpos - 1) * 10) // total AS decile,
        |         COUNT(*) AS n, SUM(y) AS pos
        |  FROM r GROUP BY 1
        |), c AS (
        |  SELECT decile, n, pos,
        |    SUM(pos) OVER (ORDER BY decile) AS cum_pos,
        |    SUM(n) OVER (ORDER BY decile) AS cum_n,
        |    SUM(pos) OVER () AS p_total,
        |    SUM(n) OVER () AS t_total
        |  FROM g
        |)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
        |  CAST(pos AS BIGINT) AS positives,
        |  CAST(cum_pos AS BIGINT) AS cum_positives,
        |  CAST((1000 * cum_pos * t_total) // (cum_n * p_total) AS BIGINT) AS cum_lift_milli
        |FROM c ORDER BY decile""".stripMargin,
  )
}
