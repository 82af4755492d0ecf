package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws of the q224 exact-AUC readout that the row-hash oracle cannot
  * state: hand-computable values (separation, ties, reversal), agreement
  * with the textbook single-window rank formula on the real corpus, and
  * range-partition-fan-out invariance of the prefix-sum enumeration. */
class ModelEvalSpec extends SparkSpec {

  private def auc(pairs: Seq[(Double, Long)], nPart: Int = 3): (Long, Long) = {
    import spark.implicits._
    val r = ext.ModelEval.aucFrom(
      pairs.toDF("score", "y"), nPart).head()
    (r.getAs[Long]("auc_num_x2"), r.getAs[Long]("auc_den_x2"))
  }

  test("q224 AUC: perfect separation = 1, reversal = 0, all-tied = 1/2") {
    assert(auc(Seq(1.0 -> 0L, 2.0 -> 0L, 3.0 -> 1L, 4.0 -> 1L)) === ((8L, 8L)))
    assert(auc(Seq(4.0 -> 0L, 3.0 -> 0L, 2.0 -> 1L, 1.0 -> 1L)) === ((0L, 8L)))
    assert(auc(Seq(5.0 -> 0L, 5.0 -> 1L, 5.0 -> 0L, 5.0 -> 1L)) === ((4L, 8L)))
  }

  test("q224 AUC: mixed ties take exactly half credit") {
    // pos@1 ties neg@1 (½), pos@1 < neg@2 (0), pos@2 > neg@1 (1),
    // pos@2 ties neg@2 (½) -> U = 2 of 4 pair-weights -> AUC = 1/2
    assert(auc(Seq(1.0 -> 0L, 1.0 -> 1L, 2.0 -> 0L, 2.0 -> 1L)) === ((4L, 8L)))
  }

  test("q224 agrees with the single-window textbook rank formula on orders") {
    import spark.implicits._
    val scored = ingest.Tables.orders(spark, sfDir)
      .select($"o_totalprice".as("score"),
        when($"o_orderstatus" === "F", 1L).otherwise(0L).as("y"))
    // textbook: U*2 = 2*sum(avgrank over positives) - P(P+1), avg rank via
    // a global RANK window (fine at spec scale, the exact thing q224's
    // two-pass enumeration avoids at corpus scale)
    val ranked = scored
      .withColumn("r_lo", rank().over(Window.orderBy($"score")).cast("long"))
      .withColumn("cnt_s", count(lit(1)).over(Window.partitionBy($"score")))
    val row = ranked.agg(
      sum($"y").as("p"), (count(lit(1)) - sum($"y")).as("n"),
      (sum(when($"y" === 1L, lit(2L) * $"r_lo" + $"cnt_s" - 1L).otherwise(0L))
        - sum($"y") * (sum($"y") + 1L)).as("num")).head()
    val (p, n, num) = (row.getAs[Long]("p"), row.getAs[Long]("n"), row.getAs[Long]("num"))
    val got = ext.ModelEval.aucReadout(spark, sfDir).head()
    assert(got.getAs[Long]("positives") === p)
    assert(got.getAs[Long]("negatives") === n)
    assert(got.getAs[Long]("auc_num_x2") === num)
    assert(got.getAs[Long]("auc_den_x2") === 2L * p * n)
  }

  test("q225 lift table: balanced deciles, conservation, final lift = exactly 1000") {
    import spark.implicits._
    val lift = ext.ModelEval.liftTable(spark, sfDir).collect()
    assert(lift.length === 10)
    assert(lift.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val sizes = lift.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1, "exact global ranks must balance deciles to within 1")
    val p = ingest.Tables.orders(spark, sfDir).filter($"o_orderstatus" === "F").count()
    assert(lift.last.getAs[Long]("cum_positives") === p, "cumulative positives must conserve")
    assert(lift.last.getAs[Long]("cum_lift_milli") === 1000L,
      "the full population's lift over itself is 1 by identity")
    assert(lift.map(_.getAs[Long]("positives")).sum === p)
  }

  test("prefix-sum enumeration is invariant to range-partition fan-out") {
    val pairs = (1 to 500).map(i => ((i % 37).toDouble, (i % 3 == 0).compareTo(false).toLong))
    assert(auc(pairs, nPart = 2) === auc(pairs, nPart = 11))
  }
}
