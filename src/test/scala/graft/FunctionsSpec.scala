package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native dot-product expression must agree exactly with the
  * higher-order-function formulation (same double op order), in both
  * codegen and interpreted evaluation. */
class FunctionsSpec extends SparkSpec {

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(64, Gen.chooseNum(-1000, 1000).map(_ / 997.0f))

  test("graft_dot == aggregate(zip_with(...)) on random float vectors") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = (1L to 20L).map { s =>
      val a = vecGen(Gen.Parameters.default, Seed(s)).getOrElse(Nil)
      val b = vecGen(Gen.Parameters.default, Seed(s + 100)).getOrElse(Nil)
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", call_function("graft_dot", $"a", $"b"))
      .withColumn("hof",
        aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v))
    assert(df.filter($"native" =!= $"hof").isEmpty)
  }

  test("graft_dot usable from SQL and survives null inputs") {
    GraftFunctions.register(spark)
    val one = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").first().getDouble(0)
    assert(one === 4.0)
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .first()
    assert(n.isNullAt(0))
  }

  test("graft_rolling_hashes: window law, rolling == direct, codepoint positions (r8)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val L = 5
    // pseudo-random strings with repeats, plus multi-byte codepoints
    val strs = (1L to 30L).map { s =>
      val g = Gen.listOfN(40, Gen.oneOf('a', 'b', 'c', 'é', '日'))
      g(Gen.Parameters.default, Seed(s)).getOrElse(Nil).mkString
    } ++ Seq("", "abc", "aaaaa", "aaaaaa")
    val df = strs.toDF("t")
      .withColumn("hs", call_function("graft_rolling_hashes", $"t", lit(L)))
    val rows = df.select($"t", $"hs").collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val hs = r.getSeq[Long](1)
      val n = t.codePointCount(0, t.length)
      assert(hs.length === math.max(0, n - L + 1), s"window count for '$t'")
      // law: equal windows => equal hashes; windows defined by CODEPOINT
      // offsets exactly as substr() would cut them
      val cps = t.codePoints().toArray
      // sliding() yields a partial trailing group on short inputs —
      // only full-length windows are hashed
      val windows = cps.sliding(L).map(_.toSeq).filter(_.length == L).toSeq
      windows.zipWithIndex.foreach { case (w, i) =>
        windows.zipWithIndex.foreach { case (w2, j) =>
          if (w == w2) assert(hs(i) === hs(j), s"equal windows $i/$j of '$t' must collide")
        }
        // rolling result == direct polynomial evaluation at each position
        val direct = w.foldLeft(0L)((h, c) => h * 1000003L + c)
        assert(hs(i) === direct, s"rolling hash drifts from direct at $i of '$t'")
      }
    }
    // the repeated-content guarantee the audit rides on: a string and its
    // verbatim copy produce identical hash arrays
    val pair = Seq("the quick brown fox", "the quick brown fox").toDF("t")
      .withColumn("hs", call_function("graft_rolling_hashes", $"t", lit(L)))
      .select($"hs").collect()
    assert(pair(0).getSeq[Long](0) === pair(1).getSeq[Long](0))
  }

  test("sketch probes: expression == library semantics, no udf barrier in the plan (r8)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // CMS: the expression's estimate must equal CountMinSketch.estimateCount
    // for long AND string keys (the udf semantics it replaced)
    val df = (1L to 500L).map(i => (i % 37, s"w${i % 23}")).toDF("k", "t")
    val skL = df.agg(count_min_sketch($"k", lit(0.01), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]]("s")
    val skS = df.agg(count_min_sketch($"t", lit(0.01), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]]("s")
    val cmsL = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skL))
    val cmsS = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skS))
    val got = df.select($"k", $"t",
        call_function("graft_cms_estimate", $"k", lit(skL)).as("ek"),
        call_function("graft_cms_estimate", $"t", lit(skS)).as("et"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === cmsL.estimateCount(Long.box(r.getLong(0))))
      assert(r.getLong(3) === cmsS.estimateCount(r.getString(1)))
    }
    // Bloom: expression probe == mightContainLong; no false negatives
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (1L to 100L).foreach(bf.putLong)
    val bfBytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    val probed = spark.range(1, 301).select($"id",
        call_function("graft_bloom_contains", $"id", lit(bfBytes)).as("hit"))
      .collect()
    probed.foreach(r => assert(r.getBoolean(1) === bf.mightContainLong(r.getLong(0))))
    assert(probed.filter(_.getLong(0) <= 100).forall(_.getBoolean(1)),
      "bloom probe must have zero false negatives")
    // null keys surface as SQL nulls, not exceptions
    val withNull = Seq(Some(5L), None).toDF("k")
      .select(call_function("graft_cms_estimate", $"k", lit(skL)).as("e")).collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
    // the plan law the expressions exist for: the registered sketch
    // queries carry NO ScalaUDF eval barrier anywhere (was 6 udf sites
    // pre-r8, carried as a finding since r5)
    for ((name, q) <- Seq(
        ("q114", graft.ext.Sketches.cmsHeavyHitters(spark, sfDir)),
        ("q115", graft.ext.Sketches.bloomSemiJoin(spark, sfDir)),
        ("q144", graft.ext.Sketches.cmsJoinEstimate(spark, sfDir)),
        ("q163", graft.ext.Sketches.sketchJoinOrder(spark, sfDir)))) {
      val plan = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        s"$name still carries a udf eval barrier:\n$plan")
    }
  }

  test("KMV sketch laws: exact below K, ~1/sqrt(K) above, merge == whole, set algebra (r8)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.KmvSketch
    val kmv = udaf(KmvSketch.agg)
    // below K the sketch IS the distinct set: estimate exact
    val small = spark.range(500).select(xxhash64($"id").as("h"))
      .agg(kmv($"h")).head().getSeq[Long](0)
    assert(small.size === 500 && KmvSketch.estimate(small) === 500.0)
    // above K: relative error within 5/sqrt(K) (deterministic hash)
    val n = 50000
    val big = spark.range(n).select(xxhash64($"id").as("h"))
      .agg(kmv($"h")).head().getSeq[Long](0)
    assert(big.size === KmvSketch.K)
    assert(big === big.sorted && big.distinct.size === big.size,
      "sketch must be sorted distinct minima")
    val err = math.abs(KmvSketch.estimate(big) - n) / n
    assert(err <= 5.0 / math.sqrt(KmvSketch.K), s"relative error $err")
    // THE mergeability law: sketch(whole) == union(sketch(half1), sketch(half2))
    val halves = spark.range(n).select(($"id" % 2).as("g"), xxhash64($"id").as("h"))
      .groupBy($"g").agg(kmv($"h").as("sk"))
      .collect().map(_.getSeq[Long](1))
    assert(KmvSketch.union(halves(0), halves(1)) === big,
      "K smallest of the union must equal the whole-corpus sketch")
    // duplicates never change a sketch (distinct semantics)
    val dup = spark.range(n).select(xxhash64($"id" % 1000).as("h"))
      .agg(kmv($"h")).head().getSeq[Long](0)
    assert(dup.size === 1000 && KmvSketch.estimate(dup) === 1000.0)
    // set algebra on constructed overlap: A = [0, 30k), B = [20k, 50k)
    // -> |A∪B| = 50k, |A∩B| = 10k
    val skA = spark.range(0, 30000).select(xxhash64($"id").as("h"))
      .agg(kmv($"h")).head().getSeq[Long](0)
    val skB = spark.range(20000, 50000).select(xxhash64($"id").as("h"))
      .agg(kmv($"h")).head().getSeq[Long](0)
    val estU = KmvSketch.estimate(KmvSketch.union(skA, skB))
    val estI = KmvSketch.intersectEstimate(skA, skB)
    assert(math.abs(estU - 50000) <= 5.0 * 50000 / math.sqrt(KmvSketch.K), s"union est $estU")
    assert(math.abs(estI - 10000) <= 5.0 * 50000 / math.sqrt(KmvSketch.K), s"intersect est $estI")
  }

  test("t-digest laws: weight conservation, bounded size, rank accuracy, merge == whole (r8)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TDigest
    val td = udaf(TDigest.agg)
    val tdm = udaf(TDigest.mergeAgg)
    val n = 100000
    // a deterministic non-uniform stream in scrambled order (hash
    // order, not sorted — digests must not rely on sorted ingest):
    // value = (h mod n)^2 / n, a right-skewed distribution with
    // known exact quantiles over a permutation of 0..n-1
    val vals = spark.range(n)
      .select((pmod(xxhash64($"id"), lit(n)).cast("double") *
        pmod(xxhash64($"id"), lit(n)).cast("double") / n).as("v"),
        pmod($"id", lit(10)).as("part"))
    val whole = vals.agg(td($"v")).head().getSeq[Double](0)
    // weight conservation: unit-weight ingest sums to the row count
    assert(math.abs(TDigest.count(whole) - n) < 1e-6)
    // bounded artifact: the k1 bound caps centroids near 2*delta
    assert(whole.size / 2 <= 2 * TDigest.Delta.toInt + 8, s"${whole.size / 2} centroids")
    // rank accuracy: the estimate's exact rank (counted, not assumed)
    // within 1% of target at the head, middle, and both tails
    for (q <- Seq(0.05, 0.5, 0.95, 0.99)) {
      val est = TDigest.quantile(whole, q)
      val rank = vals.filter($"v" <= est).count().toDouble / n
      assert(math.abs(rank - q) <= 0.01, s"q=$q est=$est rank=$rank")
    }
    // merge == whole (within the certificate): partial digests per
    // part, merged, must give the same certified ranks
    val merged = vals.groupBy($"part").agg(td($"v").as("sk"))
      .agg(tdm($"sk")).head().getSeq[Double](0)
    assert(math.abs(TDigest.count(merged) - n) < 1e-6)
    for (q <- Seq(0.5, 0.95)) {
      val est = TDigest.quantile(merged, q)
      val rank = vals.filter($"v" <= est).count().toDouble / n
      assert(math.abs(rank - q) <= 0.01, s"merged q=$q est=$est rank=$rank")
    }
    // quantile monotonicity over the readout grid
    val grid = (1 to 99).map(i => TDigest.quantile(whole, i / 100.0))
    assert(grid.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true })
  }

  test("sketch probes canonicalize: value-equal bytes make semantically equal probes (r8 advice)") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.LongType
    import scala.collection.immutable.ArraySeq
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.01, 0.99, 42)
    (1L to 50L).foreach(i => cms.add(Long.box(i)))
    val bos = new java.io.ByteArrayOutputStream(); cms.writeTo(bos)
    val b1 = bos.toByteArray; val b2 = b1.clone()
    assert(!(b1 eq b2))
    val key = AttributeReference("k", LongType)()
    // DISTINCT backing arrays with equal content: a raw Array[Byte]
    // field would compare by reference and defeat subexpression
    // elimination; the ArraySeq wrapper restores value equality
    val e1 = graft.functions.CmsEstimate(key, ArraySeq.unsafeWrapArray(b1))
    val e2 = graft.functions.CmsEstimate(key, ArraySeq.unsafeWrapArray(b2))
    assert(e1 == e2 && e1.hashCode == e2.hashCode && e1.semanticEquals(e2))
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (1L to 100L).foreach(bf.putLong)
    val bb = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    val f1 = graft.functions.BloomContains(key, ArraySeq.unsafeWrapArray(bb))
    val f2 = graft.functions.BloomContains(key, ArraySeq.unsafeWrapArray(bb.clone()))
    assert(f1 == f2 && f1.semanticEquals(f2))
  }
}
