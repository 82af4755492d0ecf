package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor extrapolation for the heavy-tier scaling protocol
  * (VERDICT r4 "Next round" #2): generates an sfN `documents` +
  * `embeddings` corpus with the SAME statistical shape as the driver's
  * synthetic tables (measured from the sf0.1 originals), at a larger
  * row count — so the sf0.01→sf1 scaling curve in SCALING.md measures
  * the operators, not a distribution shift.
  *
  * Measured generating process of the driver corpus (sf0.01/sf0.1):
  *   - documents: 31-word vocabulary, uniform unigram frequencies
  *     (9182..8829 occurrences of each at sf0.1), doc length uniform
  *     10..100 words, langs ~{en 41%, zh/es/fr/de ~15% each}, 20
  *     sources; ONE near-dup pair per ~20 docs, built by replacing a
  *     single token of the base doc with the marker token `dup`
  *     (255 `dup` occurrences ≈ 256 pairs at sf0.1) — 3-gram Jaccard
  *     of such a pair ≈ (L-3)/(L+3) >> 0.5.
  *   - embeddings: 64-dim float vectors in 10 label clusters
  *     (per-label per-dim mean/std measured from the source table),
  *     ~1 high-cosine near-dup pair per 125 vectors.
  *
  * Everything derives deterministically from (seed, row id) — same
  * output for any partitioning, executor count, or retry — and the
  * generation itself is distributed (spark.range → mapPartitions-style
  * per-row synthesis; only the 10×64 label stats ride the closure).
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <dstDir> <docRows> <embRows> [seed] [mode]
  * The canonical sf1 is docRows=50000 embRows=8000 (10×/4× sf0.1, the
  * same per-step ratios the driver uses between its own SFs).
  *
  * `mode` (default `uniform`) selects the unigram distribution:
  *   - `uniform`: the driver corpus's shape — 31 tokens, flat
  *     frequencies. By sf1 this SATURATES the 3-gram space (mean
  *     shingle df ≈ 82, SCALING.md) — every shingle hot, the
  *     boilerplate-heavy worst case.
  *   - `zipf`: Zipf(s=1) over a [[zipfVocabSize]]-token vocabulary —
  *     the shape real text has (Zipf's law): a few head tokens carry
  *     most mass, the tail has df ≈ 1. This is the regime where
  *     prefix-filtered set-similarity joins (AllPairs/PPJoin) pay off,
  *     and the corpus mode VERDICT r5 asked for to re-adjudicate the
  *     demoted prefix join against MinHash banding on realistic
  *     frequencies. Near-dup injection is identical in both modes
  *     (one marker-token mutation per 20th doc), so true-pair recall
  *     is comparable across modes.
  */
object ScaleGen {

  private val Vocab: Array[String] = Array(
    "spark", "window", "merge", "table", "column", "order", "small",
    "sort", "fast", "value", "scan", "slow", "group", "batch", "agg",
    "filter", "query", "big", "key", "row", "part", "stream", "data",
    "line", "hash", "join", "shard", "plan", "cache", "scale", "a")

  /** 12k tokens — >> the 29.8k possible 3-gram space of the uniform
    * mode's 31 tokens, so the shingle space CANNOT saturate. */
  private val zipfVocabSize = 12000

  /** Zipf(s=1) sampling table: cumulative P(rank ≤ r), r = 0..V−1.
    * ~96 KB of doubles riding the closure — stats, never data. */
  private def zipfCdf(v: Int): Array[Double] = {
    val w = Array.tabulate(v)(r => 1.0 / (r + 1))
    val total = w.sum
    val cdf = new Array[Double](v)
    var acc = 0.0
    var i = 0
    while (i < v) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(v - 1) = 1.0
    cdf
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dstDir = if (args.length > 1) args(1) else "data/sf1"
    val docRows = if (args.length > 2) args(2).toLong else 50000L
    val embRows = if (args.length > 3) args(3).toLong else 8000L
    val seed = if (args.length > 4) args(4).toLong else 42L
    val mode = if (args.length > 5) args(5) else "uniform"
    // detect create-vs-join so this main only stops a session it owns
    // (tests call generate() on their own session and never pass here)
    val preExisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      generate(spark, srcDir, dstDir, docRows, embRows, seed, mode)
      println(s"""{"generated":"$dstDir","documents":$docRows,"embeddings":$embRows,"seed":$seed,"mode":"$mode"}""")
    } finally if (preExisting.isEmpty) spark.stop()
  }

  /** The generation itself, callable on an existing session (tests). */
  def generate(spark: SparkSession, srcDir: String, dstDir: String,
               docRows: Long, embRows: Long, seed: Long,
               mode: String = "uniform"): Unit = {
    import spark.implicits._
    require(mode == "uniform" || mode == "zipf", s"unknown mode '$mode'")

    // ---- documents ------------------------------------------------
    // Per-id deterministic RNG; a doc at id with id%20==19 is a near-dup
    // of id-1: same words, one seeded position replaced by the marker.
    val vocab = Vocab
    def mix(a: Long, b: Long): Long = {
      var x = a * 0x9E3779B97F4A7C15L + b
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    // zipf mode: rank → token name; inverse-CDF sample by binary search
    val zipf = mode == "zipf"
    val cdf = if (zipf) zipfCdf(zipfVocabSize) else Array.empty[Double]
    val nextWord: java.util.Random => String =
      if (zipf) { rng =>
        val p = rng.nextDouble()
        var lo = 0; var hi = cdf.length - 1
        while (lo < hi) { val m = (lo + hi) >>> 1; if (cdf(m) < p) lo = m + 1 else hi = m }
        "w" + lo // "w0" (head, p ≈ 10%) .. "w11999" (tail, df ≈ 1)
      } else { rng => vocab(rng.nextInt(vocab.length)) }
    val genDoc = udf { (id: Long) =>
      val baseId = if (id % 20 == 19) id - 1 else id
      val rng = new java.util.Random(mix(seed, baseId))
      val len = 10 + rng.nextInt(91)
      val words = Array.fill(len)(nextWord(rng))
      if (id != baseId) {
        val r2 = new java.util.Random(mix(seed, id))
        words(r2.nextInt(len)) = "dup"
      }
      val mrng = new java.util.Random(mix(seed + 1, id))
      val lang = {
        val p = mrng.nextDouble()
        if (p < 0.41) "en" else if (p < 0.56) "zh"
        else if (p < 0.71) "es" else if (p < 0.86) "fr" else "de"
      }
      val source = "src" + mrng.nextInt(20)
      (words.mkString(" "), lang, source)
    }
    spark.range(docRows)
      .withColumn("g", genDoc($"id"))
      .select($"id".as("doc_id"), $"g._1".as("text"), $"g._2".as("lang"),
        $"g._3".as("source"), length($"g._1").cast("long").as("n_chars"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/documents.parquet")

    // ---- embeddings ------------------------------------------------
    // Cluster stats measured from the SOURCE table (10 labels × 64 dims
    // of mean/std — a few KB riding the closure, never data).
    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"label", $"dim")
      .agg(avg($"x").as("mu"), stddev_pop($"x").as("sd"))
      .collect()
    val nLabels = src.map(_.getInt(0)).distinct.length
    val dims = src.map(_.getInt(1)).distinct.length
    val mu = Array.ofDim[Double](nLabels, dims)
    val sd = Array.ofDim[Double](nLabels, dims)
    src.foreach { r =>
      mu(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      sd(r.getInt(0))(r.getInt(1)) = r.getDouble(3)
    }
    val genVec = udf { (id: Long) =>
      val baseId = if (id % 125 == 124) id - 1 else id
      val rng = new java.util.Random(mix(seed + 2, baseId))
      val label = rng.nextInt(nLabels)
      val v = Array.tabulate(dims)(d =>
        (mu(label)(d) + sd(label)(d) * rng.nextGaussian()).toFloat)
      if (id != baseId) { // near-clone: tiny perturbation, cosine ≈ 1
        val r2 = new java.util.Random(mix(seed + 3, id))
        var d = 0
        while (d < dims) { v(d) = v(d) + 0.005f * r2.nextGaussian().toFloat; d += 1 }
      }
      (v, label)
    }
    spark.range(embRows)
      .withColumn("g", genVec($"id"))
      .select($"id".as("vec_id"), $"g._1".as("embedding"), $"g._2".cast("int").as("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/embeddings.parquet")
  }
}
