package graft

import graft.util.Det
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the determinism helpers: the decimal-sum discipline
  * must make aggregate results independent of row order and partitioning
  * (the whole point — Spark's partial-aggregation tree must not be able
  * to perturb the answer). Plain scalacheck generators with fixed seeds
  * (scalatestplus is not in the offline cache). */
class DetSpec extends SparkSpec {

  // money-like doubles: 2dp values (and small products stay ≤ 6dp true scale)
  private val moneyGen: Gen[List[Double]] =
    Gen.listOfN(60, Gen.chooseNum(-99999L, 999999L).map(_ / 100.0))

  private def sample(i: Long): List[Double] =
    moneyGen.apply(Gen.Parameters.default, Seed(i)).getOrElse(Nil)

  test("msum is invariant under permutation and repartitioning") {
    import spark.implicits._
    (1L to 10L).foreach { seed =>
      val xs = sample(seed)
      assert(xs.nonEmpty)
      val base = xs.toDF("x").agg(Det.msum($"x")).first().getDouble(0)
      val perm = new scala.util.Random(seed).shuffle(xs).toDF("x")
        .repartition(7).agg(Det.msum($"x")).first().getDouble(0)
      val single = xs.reverse.toDF("x")
        .coalesce(1).agg(Det.msum($"x")).first().getDouble(0)
      assert(base === perm, s"seed=$seed permuted")
      assert(base === single, s"seed=$seed single-partition")
    }
  }

  test("table fingerprint: partition/order independent, single-row sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1 to 500).map(i => (i.toLong, s"v$i", if (i % 2 == 0) "A" else "B"))
    val df = rows.toDF("id", "payload", "grp")
    val canon = concat_ws("|", $"id", $"payload", $"grp")
    def fp(d: org.apache.spark.sql.DataFrame) =
      graft.analytics.Scalars.fingerprintOf(d, "grp", canon)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val base = fp(df)
    // invariance: arbitrary repartition/shuffle order yields the same print
    assert(fp(df.repartition(13).sortWithinPartitions($"payload")) === base)
    // sensitivity: one changed row flips exactly its group's fingerprint
    val tampered = rows.updated(9, (10L, "v10-CORRUPT", "A")).toDF("id", "payload", "grp")
    val t = fp(tampered)
    assert(t("A") !== base("A"), "fingerprint missed a changed row")
    assert(t("B") === base("B"), "unrelated group's fingerprint moved")
  }

  test("msum equals exact BigDecimal sum for 2dp inputs") {
    import spark.implicits._
    (11L to 20L).foreach { seed =>
      val xs = sample(seed)
      val got = xs.toDF("x").agg(Det.msum($"x")).first().getDouble(0)
      val expect = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(got === expect, s"seed=$seed")
    }
  }

  test("mavg = exact sum / count") {
    import spark.implicits._
    val xs = Seq(0.1, 0.2, 0.3, 10.01, -5.55)
    val got = xs.toDF("x").agg(Det.mavg($"x")).first().getDouble(0)
    val expect = xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / xs.size
    assert(got === expect)
  }
}
