package graft

import org.apache.spark.SparkThrowable
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ext.SimilarityMath

/** Bit-exactness law for the native decimal vector folds (r16):
  * [[graft.functions.DecVecFold]] must agree with the higher-order
  * `aggregate(zip_with(...))` formulation it replaced — the formulation
  * every similarity/k-means DuckDB oracle mirrors — on EVERY outcome:
  * same double BITS when both produce a value, null together, and under
  * ANSI (the engine default) the same error condition when the decimal
  * chain overflows. The corners where the intermediate model actually
  * bites, all probed against the LIVE HOF (r16 log):
  *
  *   - per-step `changePrecision(38,24)` rounding (Add is typed
  *     DECIMAL(38,24) under allowPrecisionLoss before the lambda casts
  *     back to scale 25) — exercised by magnitudes whose shortest-string
  *     decimal expansion carries >24 scale digits;
  *   - Cast(double → DECIMAL(38,25)) overflow (|term| ≥ 10^13) → ANSI
  *     throw NUMERIC_VALUE_OUT_OF_RANGE, non-ANSI null;
  *   - the (38,24) → (38,25) re-cast overflow (|sum| ≥ 10^13) — same;
  *   - NaN / ±Infinity terms → NULL even under ANSI (the numeric →
  *     decimal cast nulls specials; probed, not assumed);
  *   - null elements / null arrays / zip_with length-mismatch padding
  *     → null; empty arrays → exactly 0.0.
  */
class DecFoldSpec extends SparkSpec {

  private def hofDot(a: Column, b: Column) = SimilarityMath.dotDecHof(a, b)
  private def natDot(a: Column, b: Column) = call_function("graft_dec_dot", a, b)
  private def hofD2(a: Column, b: Column)  = graft.ext.ClusterTrain.dist2Hof(a, b)
  private def natD2(a: Column, b: Column)  = call_function("graft_dec_dist2", a, b)

  /** One row, one expression → "VAL:<raw bits>" | "NULL" | "ERR:<condition>". */
  private def outcome(df: DataFrame, c: Column): String =
    try {
      val r = df.select(c).collect().head
      if (r.isNullAt(0)) "NULL"
      else "VAL:" + java.lang.Double.doubleToRawLongBits(r.getDouble(0))
    } catch {
      case t: Throwable =>
        var root: Throwable = t
        while (root.getCause != null && root.getCause != root) root = root.getCause
        "ERR:" + (root match {
          case st: SparkThrowable if st.getCondition != null => st.getCondition
          case other => other.getClass.getName
        })
    }

  /** Per-row outcome agreement — survives rows that (must) throw. */
  private def assertOutcomes(df: DataFrame, what: String, withD2: Boolean): Unit = {
    val ids = df.select("id").collect().map(_.get(0))
    assert(ids.nonEmpty, s"$what produced no rows")
    ids.foreach { id =>
      val row = df.filter(col("id") === id)
      val (h, nv) = (outcome(row, hofDot(col("a"), col("b"))),
                     outcome(row, natDot(col("a"), col("b"))))
      assert(h == nv, s"$what id=$id: dot HOF=$h native=$nv")
      if (withD2) {
        val (h2, n2) = (outcome(row, hofD2(col("a"), col("b"))),
                        outcome(row, natD2(col("a"), col("b"))))
        assert(h2 == n2, s"$what id=$id: dist2 HOF=$h2 native=$n2")
      }
    }
  }

  /** Bulk bit-agreement for frames guaranteed not to overflow. */
  private def assertAgree(df: DataFrame, what: String, withD2: Boolean = true): Unit = {
    val base = df
      .withColumn("hof_dot", hofDot(col("a"), col("b")))
      .withColumn("nat_dot", natDot(col("a"), col("b")))
    val out = (if (withD2) base
      .withColumn("hof_d2", hofD2(col("a"), col("b")))
      .withColumn("nat_d2", natD2(col("a"), col("b")))
    else base
      .withColumn("hof_d2", lit(null).cast("double"))
      .withColumn("nat_d2", lit(null).cast("double")))
      .select("id", "hof_dot", "nat_dot", "hof_d2", "nat_d2")
      .collect()
    assert(out.nonEmpty, s"$what produced no rows")
    out.foreach { r =>
      def bits(i: Int): Option[Long] =
        if (r.isNullAt(i)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(i)))
      assert(bits(1) == bits(2),
        s"$what id=${r.get(0)}: dot HOF=${bits(1)} native=${bits(2)}")
      assert(bits(3) == bits(4),
        s"$what id=${r.get(0)}: dist2 HOF=${bits(3)} native=${bits(4)}")
    }
  }

  private def floatFrame(rows: Seq[(Int, Seq[java.lang.Float], Seq[java.lang.Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, a, b) => Row(i, a, b) }, 2),
      schema)
  }

  private def doubleFrame(rows: Seq[(Int, Seq[java.lang.Double], Seq[java.lang.Double])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, a, b) => Row(i, a, b) }, 2),
      schema)
  }

  test("float vectors: deterministic pseudo-random sweep across safe magnitudes") {
    val rnd = new scala.util.Random(421687)
    // bands where no partial sum can reach the 10^13 overflow wall
    // (dim ≤ 96, |elem| ≤ 1e5 → |sum| ≤ 96·1e10 < 10^13); tiny bands
    // exercise the scale-25 cast rounding, the O(1) band is what the
    // similarity queries actually run on
    val bands = Seq(1e-30f, 1e-12f, 1e-3f, 1f, 1e3f, 1e5f)
    val rows = (0 until 180).map { i =>
      val scale = bands(i % bands.length)
      val dim = 1 + rnd.nextInt(96)
      def vec() = Seq.fill(dim)(java.lang.Float.valueOf(
        (rnd.nextFloat() - 0.5f) * 2f * scale))
      (i, vec(), vec())
    }
    assertAgree(floatFrame(rows), "float sweep", withD2 = false)
  }

  test("float vectors: overflow bands agree per-row (throw under ANSI)") {
    val rnd = new scala.util.Random(421689)
    val rows = (0 until 12).map { i =>
      val scale = if (i % 2 == 0) 1e6f else 3e6f
      val dim = 1 + rnd.nextInt(96)
      def vec() = Seq.fill(dim)(java.lang.Float.valueOf(
        (rnd.nextFloat() - 0.5f) * 2f * scale))
      (i, vec(), vec())
    }
    assertOutcomes(floatFrame(rows), "float overflow bands", withD2 = false)
  }

  test("float vectors: NaN, infinities, nulls, empty, mismatched lengths, walls") {
    val f = java.lang.Float.valueOf(_: Float)
    val rows: Seq[(Int, Seq[java.lang.Float], Seq[java.lang.Float])] = Seq(
      (0, Seq(f(1f), f(Float.NaN), f(3f)), Seq(f(1f), f(2f), f(3f))),
      (1, Seq(f(1f), f(Float.PositiveInfinity)), Seq(f(1f), f(2f))),
      (2, Seq(f(1f), f(Float.NegativeInfinity)), Seq(f(1f), f(2f))),
      (3, Seq(f(1f), null, f(3f)), Seq(f(1f), f(2f), f(3f))),
      (4, Seq(f(1f), f(2f), f(3f)), Seq(f(1f), null, f(3f))),
      (5, null, Seq(f(1f), f(2f))),
      (6, Seq(f(1f), f(2f)), null),
      (7, Seq.empty, Seq.empty),
      (8, Seq(f(1f), f(2f), f(3f)), Seq(f(1f), f(2f))), // pad poisons → null
      (9, Seq(f(1f)), Seq(f(1f), f(2f), f(3f))),
      (10, Seq(f(-0.0f), f(0.0f)), Seq(f(0.0f), f(-0.0f))),
      (11, Seq(f(Float.MinPositiveValue)), Seq(f(Float.MinPositiveValue))),
      (12, Seq(f(Float.MaxValue)), Seq(f(Float.MaxValue))), // term ~1.16e77 (finite double): overflow
      (13, Seq(f(3e18f)), Seq(f(3e18f))), // term 9e36: decimal overflow
      (14, Seq(f(4e6f)), Seq(f(4e6f))))   // 1.6e13 ≥ 10^13: the cast wall
    assertOutcomes(floatFrame(rows), "float corners", withD2 = false)
  }

  test("double vectors: adversarial scale-24 rounding and overflow walls") {
    val d = java.lang.Double.valueOf(_: Double)
    val rows: Seq[(Int, Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
      // shortest-string expansions with >24 scale digits: the per-step
      // changePrecision(38,24) HALF_UP rounding must match exactly
      (0, Seq(d(1.2345678901234567e-12)), Seq(d(9.87654321098765e-13))),
      (1, Seq(d(7.777777777777777e-13), d(3.333333333333333e-13)),
          Seq(d(1.111111111111111e-13), d(9.999999999999999e-13))),
      (2, Seq(d(1e-25), d(1e-25), d(1e-25)), Seq(d(1.0), d(1.0), d(1.0))),
      (3, Seq(d(4.9e-26)), Seq(d(1.0))),          // rounds to zero at scale 25
      (4, Seq(d(5.1e-26)), Seq(d(1.0))),          // rounds up at 25, then 24 bites
      (5, Seq(d(5.0e-26)), Seq(d(1.0))),          // the exact tie — HALF_UP pin
      // sums that cross 10^13 between consecutive partial sums: ANSI throw
      (6, Seq(d(9.9e12), d(0.2e12)), Seq(d(1.0), d(1.0))),
      (7, Seq(d(9.999999999999e12), d(1.0)), Seq(d(1.0), d(1.0))),
      (8, Seq(d(-9.9e12), d(-0.2e12)), Seq(d(1.0), d(1.0))),
      // negative/positive alternation: running sum stays small but the
      // terms individually round at scale 24/25
      (9, Seq(d(1.23456789012345678e-11), d(-1.23456789012345678e-11)),
          Seq(d(1.0), d(1.0))),
      (10, Seq(d(Double.MinPositiveValue)), Seq(d(1.0))), // 4.9e-324 → 0 at scale 25
      (11, Seq(d(2.5e-25), d(2.5e-25)), Seq(d(1.0), d(1.0))), // per-step tie twice
      (12, Seq(d(1e13)), Seq(d(1.0))),            // exactly at the wall: throw
      (13, Seq(d(9.9999999999995e12)), Seq(d(1.0))), // just under: VALUE (probed)
      // dist2-specific walls: (x−y)² ≥ 10^13 / double-overflow → NaN → null
      (14, Seq(d(3.2e6)), Seq(d(-3.2e6))),
      (15, Seq(d(1.58e6)), Seq(d(-1.58e6))),
      (16, Seq(d(Double.MaxValue)), Seq(d(-Double.MaxValue))))
    assertOutcomes(doubleFrame(rows), "double adversarial", withD2 = true)
  }

  test("mixed float/double arguments resolve and agree") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    val rnd = new scala.util.Random(421688)
    val rows = (0 until 40).map { i =>
      val dim = 1 + rnd.nextInt(64)
      Row(i,
        Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 4f)),
        Seq.fill(dim)(java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 4)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    assertAgree(df, "mixed float/double", withD2 = false)
  }

  test("dist2 rejects float arrays (its HOF twin subtracts in float — a different chain)") {
    val f = java.lang.Float.valueOf(_: Float)
    val df = floatFrame(Seq((0, Seq(f(1f)), Seq(f(2f)))))
    val err = intercept[Exception] {
      df.select(natD2(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("array<double>"), s"unexpected: ${err.getMessage}")
  }

  test("production embeddings: swapped helpers are bit-identical to the HOF twins") {
    import spark.implicits._
    val emb = graft.ingest.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val pairs = emb.as("l").join(emb.as("r"),
        col("l.vec_id") % 7 === col("r.vec_id") % 7 && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id"), col("l.embedding").as("a"), col("r.embedding").as("b"))
      .limit(500)
    assertAgree(pairs, "sf0.001 embeddings", withD2 = false)
    // dist2 on the production shape: embeddings pre-cast to double,
    // exactly as ClusterTrain feeds it
    val dPairs = pairs.select(col("id"),
      expr("transform(a, x -> cast(x as double))").as("a"),
      expr("transform(b, x -> cast(x as double))").as("b"))
    assertAgree(dPairs, "sf0.001 embeddings as double")
    // and the public helpers themselves (dotDec/normDec now route native)
    val viaHelpers = emb.select(
        SimilarityMath.dotDec($"embedding", $"embedding").as("n1"),
        SimilarityMath.dotDecHof($"embedding", $"embedding").as("n2"),
        SimilarityMath.normDec($"embedding").as("m1"),
        SimilarityMath.normDecHof($"embedding").as("m2"))
      .collect()
    viaHelpers.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(1)), "dotDec != dotDecHof")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(3)), "normDec != normDecHof")
    }
  }
}
