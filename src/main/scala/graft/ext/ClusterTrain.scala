package graft.ext

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SimilarityMath.Dec

/** K-MEANS TRAINING as iterative aggregation (SURVEY.md §2.12 E3 —
  * the training counterpart of q65's IVF probe path: q65 consumes a
  * centroid table; this module TRAINS one, end-to-end inside the
  * engine's determinism discipline, so the full IVF lifecycle
  * (train → assign → probe → rerank) is oracle-checkable).
  *
  * Algorithm (all classical, Lloyd 1957 / Gonzalez 1985):
  *   - Seeding: deterministic farthest-first traversal — seed 0 is
  *     vec_id 0, each next seed is the point maximising distance to
  *     its nearest already-chosen seed (tie-break: lowest vec_id).
  *     The greedy 2-approximation to k-center, and the deterministic
  *     stand-in for k-means|| (which needs RNG): each seeding step is
  *     one broadcast-join pass + a TakeOrderedAndProject, K-1 passes
  *     total. At 100 TB production would swap in k-means||
  *     oversampling (Bahmani 2012) to cut passes; the per-pass
  *     dataflow — broadcast K rows, never shuffle the corpus — is
  *     identical.
  *   - Lloyd iterations: assign = argmin over K broadcast centroids
  *     (tie-break: lowest centroid id); recompute = per-(cluster,dim)
  *     exact DECIMAL(38,25) mean, QUANTIZED to integer micro-units
  *     (round(m·1e6)/1e6) so the next iteration's distance arithmetic
  *     is bit-identical in Spark and DuckDB regardless of aggregation
  *     order. Fixed 2 recompute rounds + a final evaluation
  *     assignment (unrolled in the oracle as CTE chain).
  *
  * Determinism: squared distances are exact decimal sums of
  * per-element double (a−b)² terms (order-free, the q33/q65
  * contract); per-point inertia quantizes to micro-units BEFORE the
  * cluster sum, making the reported inertia an exact integer.
  *
  * Scale shape: each iteration is one broadcast nested-loop over a
  * K-row centroid frame (documented in PlanShapeSpec's bounded-
  * broadcast allowlist) followed by one groupBy shuffle whose reduce
  * side is K×dim rows — the model, not the data. The corpus is never
  * re-partitioned; N·K·dim map-side work per pass is the information-
  * theoretic floor for exact Lloyd.
  *
  * Reference posture: the reference pipeline stores embeddings but
  * ships no trainer (`/root/reference/Assets/Jobs/etl_job.py:31-64`
  * establishes the corpus tables); this is the [ext] LLM-data tier's
  * clustering primitive behind SemDeDup cells (q128) and IVF indexes
  * (q34/q65).
  */
object ClusterTrain extends QueryModule {

  private val K = 4
  /** Lloyd recompute rounds before the evaluation assignment. */
  private val lloydRounds = 2

  /** Exact order-independent squared L2 distance of two double arrays.
    * r16 (guide §4): native [[graft.functions.DecVecFold]] — same
    * decimal chain as [[dist2Hof]] bit-for-bit (DecFoldSpec), minus the
    * per-element interpreted lambda and the intermediate Decimal array;
    * this fold runs N·K·dim times per pass, the trainer's hot loop. */
  private def dist2(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_dec_dist2", a, b)
  }

  /** HOF specification twin of [[dist2]] (see DecFoldSpec). */
  private[graft] def dist2Hof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => ((x - y) * (x - y)).cast(Dec)),
      lit(0).cast(Dec), (acc, v) => (acc + v).cast(Dec)).cast("double")

  /** q195: train K=4 centroids on the embedding corpus; emit the
    * per-cluster training evaluation — sizes, exact integer inertia,
    * and the micro-unit centroid checksum (every moved centroid
    * component moves the checksum; every re-assigned point moves a
    * size and both inertias — the strongest oracle pin a trained
    * model admits). */
  def kmeansTrain(spark: SparkSession, d: String): DataFrame =
    trainEval(spark, d, lloydRounds)

  /** Train with `rounds` Lloyd recomputes, then evaluate — exposed so
    * the spec can assert Lloyd's monotonicity law (total inertia is
    * non-increasing in the round count) on real data. */
  private[graft] def trainEval(spark: SparkSession, d: String, rounds: Int): DataFrame = {
    import spark.implicits._
    val pts = Tables.embeddings(spark, d)
      // array cast, not transform(_.cast): same per-element float→double
      // widening, but Cast(array) stays whole-stage-codegen while the
      // ArrayTransform lambda is interpreted per row per pass (r17, §4)
      .select($"vec_id", $"embedding".cast("array<double>").as("x"))

    // Nearest-centroid argmin as a MAP-SIDE expression (r16, guide
    // §2.4): the old form crossJoined each point with the K broadcast
    // centroid ROWS and took min(struct(d2, cid)) via groupBy(vec_id,
    // x) — a corpus-sized exchange of N 64-double vectors PER PASS
    // (seeding + Lloyd + eval ≈ 6 passes), with the array as a group
    // key. Folding the centroids into ONE broadcast array row and
    // taking array_min over per-centroid (d2, cid) structs computes
    // the identical argmin (same dist2 arithmetic, same lowest-cid
    // tie-break — struct ordering is lexicographic) with ZERO
    // exchange: the only shuffles left are the K×dim model-sized
    // recompute/readout aggregates, which is what the scale-shape
    // note always claimed.
    def centArray(c: DataFrame): DataFrame =
      c.agg(sort_array(collect_list(struct($"cid", $"cvec"))).as("cents"))
    // k is statically known at every call site (the seeding loop's
    // running count, then K), so the per-centroid (d2, cid) structs
    // UNROLL into a CreateArray instead of a transform(cents, ...)
    // lambda (r17, §4): identical elements in identical order — cids
    // are assigned 0..k-1 and sort_array orders the struct by cid — so
    // array_min computes the same argmin, but the whole per-row
    // expression (GetArrayItem/struct/DecVecFold/array_min) now stays
    // inside WholeStageCodegen where ArrayTransform ran interpreted.
    def withBest(c: DataFrame, k: Int): DataFrame =
      pts.crossJoin(broadcast(centArray(c)))
        .withColumn("b", array_min(array((0 until k).map { i =>
          val ct = $"cents" (i)
          struct(dist2($"x", ct.getField("cvec")).as("d2"),
            ct.getField("cid").as("cid"))
        }: _*)))

    // ---- farthest-first seeding: K-1 broadcast passes -------------
    var cents: DataFrame = pts.filter($"vec_id" === 0)
      .select(lit(0).as("cid"), $"x".as("cvec"))
    for (i <- 1 until K) {
      val next = withBest(cents, i)
        .select($"vec_id", $"x", $"b.d2".as("dn"))
        .orderBy($"dn".desc, $"vec_id".asc).limit(1)
        .select(lit(i).as("cid"), $"x".as("cvec"))
      cents = cents.unionByName(next)
    }

    // ---- Lloyd: assign → exact-mean recompute (micro-quantized) ---
    def assign(c: DataFrame): DataFrame =
      withBest(c, K)
        .select($"vec_id", $"x", $"b.cid".as("cid"), $"b.d2".as("d2"))
    def recompute(a: DataFrame): DataFrame =
      a.select($"cid", posexplode($"x").as(Seq("pos", "v")))
        .groupBy($"cid", $"pos")
        .agg((round((sum($"v".cast(Dec)).cast("double") / count(lit(1))) * 1e6) / 1e6).as("m"))
        .groupBy($"cid")
        .agg(transform(sort_array(collect_list(struct($"pos", $"m"))),
          s => s.getField("m")).as("cvec"))
    for (_ <- 1 to rounds)
      cents = recompute(assign(cents))

    // ---- evaluation assignment against the trained model ----------
    val eval = assign(cents)
    val sizes = eval.groupBy($"cid")
      .agg(count(lit(1)).as("n_pts"),
        sum(round($"d2" * 1e6).cast("long")).as("inertia_micro"))
    val checks = cents
      .select($"cid", explode($"cvec").as("m"))
      .groupBy($"cid")
      .agg(sum(round($"m" * 1e6).cast("long")).as("cent_sum_micro"))
    sizes.join(checks, "cid")
      .select($"cid", $"n_pts", $"inertia_micro", $"cent_sum_micro")
      .orderBy($"cid")
  }

  private val powerIters = 3

  /** q202: PCA TOP COMPONENT by covariance aggregation + power
    * iteration — the dimensionality-reduction / whitening primitive an
    * embedding pipeline runs before indexing (and the second
    * "linear algebra as aggregation" exhibit after k-means): the d×d
    * covariance is ONE groupBy producing d² cells (the model, not the
    * data — at 100 TB the corpus is scanned once and 4096 numbers
    * shuffle), and each power-iteration step is a d²-row matrix-vector
    * product — driver-free, broadcast-free, corpus-free.
    *
    * Determinism: per-row centered products are exact-decimal summed
    * (order-free), covariance cells quantize to micro-units; each
    * iterate renormalizes by MAX-ABS (not L2 — no sqrt, no libm) and
    * re-quantizes to micro, so the oracle's unrolled CTE chain is
    * bit-identical at every step. Power iteration from the all-ones
    * vector converges to the dominant eigenvector for PSD covariance
    * (Mises & Pollaczek-Geiringer 1929); 3 fixed rounds are the
    * contract, not a convergence claim. Output = the micro-quantized
    * iterate per dimension — 64 rows, every covariance cell's
    * influence pinned. */
  def pcaPower(spark: SparkSession, d: String): DataFrame =
    pcaIterate(spark, d, powerIters).select(col("k").as("pos"), col("v_micro"))
      .orderBy("pos")

  /** The checkpointed micro-quantized covariance (j, k, c_micro). */
  private[graft] def pcaCov(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val pe = Tables.embeddings(spark, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"vec_id", $"pos", $"xf".cast("double").as("x"))
    val mean = pe.groupBy($"pos")
      .agg((round((sum($"x".cast(Dec)).cast("double") / count(lit(1))) * 1e6) / 1e6).as("m"))
    val centered = pe.join(broadcast(mean), "pos")
      .select($"vec_id", $"pos", ($"x" - $"m").as("xc"))
    val ntab = Tables.embeddings(spark, d)
      .agg(count(lit(1)).as("n")).withColumn("one", lit(1))
    // the covariance IS the trained artifact (d² cells): checkpointed
    // once per corpus — the plan references it every iteration, and
    // recomputing the corpus-sized self-join per reference would
    // triple the one genuinely heavy pass
    Landing.ensureParquetFixture(
      centered.as("a").join(centered.as("b"), "vec_id")
        .groupBy($"a.pos".as("j"), $"b.pos".as("k"))
        .agg(sum(($"a.xc" * $"b.xc").cast(Dec)).as("s"))
        .withColumn("one", lit(1)).join(broadcast(ntab), "one")
        .select($"j", $"k",
          round(($"s".cast("double") / $"n") * 1e6).cast("long").as("c_micro")),
      d, "pca_covariance")
  }

  /** `rounds` max-norm power-iteration steps from the all-ones vector;
    * returns the (k, v_micro) iterate. Exposed so the spec can assert
    * the Rayleigh-quotient growth law across rounds. */
  private[graft] def pcaIterate(spark: SparkSession, d: String, rounds: Int): DataFrame = {
    import spark.implicits._
    val cov = pcaCov(spark, d)
    var v = cov.select($"k").distinct()
      .select($"k", lit(1000000L).as("v_micro"))
    for (_ <- 1 to rounds) {
      val w = cov.join(v, "k")
        .groupBy($"j").agg(sum($"c_micro" * $"v_micro").as("w"))
      val mx = w.agg(max(abs($"w")).as("mx")).withColumn("one", lit(1))
      v = w.withColumn("one", lit(1)).join(broadcast(mx), "one")
        .select($"j".as("k"),
          round($"w".cast("double") / $"mx" * 1e6).cast("long").as("v_micro"))
    }
    v
  }

  private val pqM = 2        // subspaces (dim 64 → two 32-dim halves)
  private val pqK = 4        // centroids per subspace codebook
  private val pqSubDim = 32
  private val pqQueries = 4
  private val pqTopK = 5

  /** q221: PRODUCT QUANTIZATION (Jégou 2011 — FAISS's core
    * compression): the vector splits into M subvectors, each subspace
    * trains its own K-centroid codebook, and a vector's code is M
    * small integers — here 2×2 bits against 64×32 bits of floats, the
    * compression that lets a 100-TB embedding corpus live in RAM as
    * codes. Search is ASYMMETRIC DISTANCE COMPUTATION: per query, ONE
    * M×K distance table is computed against the codebooks (model-sized
    * work), and each candidate's approximate distance is a pure
    * INTEGER TABLE-LOOKUP SUM over its codes — the scan touches codes,
    * never floats.
    *
    * Everything is the engine's determinism discipline end-to-end:
    * codebooks train via one Lloyd round from first-K seeds (test-
    * scale seeding, stated; q195 owns the full seeding story) with
    * exact-decimal means micro-quantized; distance-table cells
    * micro-quantize BEFORE the per-candidate sum, so ADC scores are
    * order-free integer sums and the oracle's CTE chain is
    * bit-identical. Top-k per query lands via a per-query window over
    * candidates. Output = (query, rank, candidate, approx distance) —
    * every codebook component, code assignment, and table cell pinned
    * through the ranking. Recall at these toy parameters is
    * deliberately NOT claimed (2 codes of 4 can't separate 500
    * vectors); the DATAFLOW — train → encode → table → lookup-scan —
    * is the operator under test, and the exact-rerank pattern that
    * restores recall is q121's. */
  def pqAdcScan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pe = Tables.embeddings(spark, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"vec_id", expr(s"pos div $pqSubDim").as("m"),
        expr(s"pos % $pqSubDim").as("sp"), $"xf".cast("double").as("x"))
    // per-subspace codebooks: first-K seeds, one exact-mean Lloyd round
    val cent0 = pe.filter($"vec_id" < pqK)
      .select($"m", $"vec_id".as("cid"), $"sp", $"x".as("c"))
    def assignTo(cent: DataFrame): DataFrame = pe
      .join(broadcast(cent), Seq("m", "sp"))
      .groupBy($"vec_id", $"m", $"cid")
      .agg(sum((($"x" - $"c") * ($"x" - $"c")).cast(Dec)).as("d2dec"))
      .withColumn("d2", $"d2dec".cast("double"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")))
      .filter($"rn" === 1)
      .select($"vec_id", $"m", $"cid".as("code"))
    val cent1 = Landing.ensureParquetFixture(
      pe.join(assignTo(cent0), Seq("vec_id", "m"))
        .groupBy($"m", $"code".as("cid"), $"sp")
        .agg((round((sum($"x".cast(Dec)).cast("double") / count(lit(1))) * 1e6) / 1e6).as("c")),
      d, "pq_codebooks")
    val codes = Landing.ensureParquetFixture(assignTo(cent1), d, "pq_codes")
    // ADC: per-query M×K distance table, micro-quantized per CELL
    val dtab = pe.filter($"vec_id" < pqQueries)
      .select($"vec_id".as("qid"), $"m", $"sp", $"x")
      .join(broadcast(cent1), Seq("m", "sp"))
      .groupBy($"qid", $"m", $"cid")
      .agg(round(sum((($"x" - $"c") * ($"x" - $"c")).cast(Dec)).cast("double") * 1e6)
        .cast("long").as("dq_micro"))
    // the lookup scan: integer sums over codes — floats never touched
    val adc = codes.join(broadcast(dtab),
        codes("m") === dtab("m") && codes("code") === dtab("cid"))
      .groupBy($"qid", $"vec_id")
      .agg(sum($"dq_micro").as("adist_micro"))
    adc.withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"adist_micro", $"vec_id")))
      .filter($"rank" <= pqTopK)
      .select($"qid", $"rank", $"vec_id", $"adist_micro")
      .orderBy($"qid", $"rank")
  }

  /** r8 (VERDICT r7 next-round #7): the PARAMETERIZED PQ recall harness
    * — q221/q222 pin the dataflow at deliberately toy parameters under
    * the exact-decimal oracle; THIS trains honest codebooks (M
    * subspaces × K centroids, `rounds` Lloyd rounds, plain doubles —
    * a measurement harness, not an oracle surface) and reports
    * recall@topK of the ADC scan against the exact L2 ground truth,
    * optionally with the q121-style exact re-rank of the top `rerank`
    * ADC candidates. Self-matches are excluded on both sides (queries
    * are database vectors). Returns ONE summary row:
    * (m, k, rounds, n_queries, top_k, rerank, recall_milli). */
  def pqRecall(spark: SparkSession, d: String, m: Int, k: Int, rounds: Int,
               nQueries: Int, topK: Int, rerank: Int = 0): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, d)
    val dim = emb.select(size($"embedding")).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val pe = emb.select($"vec_id", posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"vec_id", expr(s"pos div $subDim").as("m"),
        expr(s"pos % $subDim").as("sp"), $"xf".cast("double").as("x"))
      .localCheckpoint()
    def assignTo(c: DataFrame): DataFrame = pe
      .join(broadcast(c), Seq("m", "sp"))
      .groupBy($"vec_id", $"m", $"cid")
      .agg(sum(($"x" - $"c") * ($"x" - $"c")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")))
      .filter($"rn" === 1)
      .select($"vec_id", $"m", $"cid".as("code"))
    // first-K seeds per subspace, then Lloyd: broadcast M×K model rows,
    // corpus scanned per round — q195's training shape at PQ granularity
    var cent = pe.filter($"vec_id" < k)
      .select($"m", $"vec_id".as("cid"), $"sp", $"x".as("c")).localCheckpoint()
    for (_ <- 1 to rounds) {
      cent = pe.join(assignTo(cent), Seq("vec_id", "m"))
        .groupBy($"m", $"code".as("cid"), $"sp")
        .agg((sum($"x") / count(lit(1))).as("c"))
        .localCheckpoint() // pin each round: lineage must not re-train
    }
    val codes = assignTo(cent).localCheckpoint()
    // ADC: per-query M×K distance table, approximate dist = table sum
    val dtab = pe.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"m", $"sp", $"x")
      .join(broadcast(cent), Seq("m", "sp"))
      .groupBy($"qid", $"m", $"cid")
      .agg(sum(($"x" - $"c") * ($"x" - $"c")).as("dq"))
    val adc = codes.join(broadcast(dtab),
        codes("m") === dtab("m") && codes("code") === dtab("cid"))
      .filter($"vec_id" =!= $"qid")
      .groupBy($"qid", $"vec_id")
      .agg(sum($"dq").as("adist"))
      .withColumn("arank", row_number().over(
        Window.partitionBy($"qid").orderBy($"adist", $"vec_id")))
    // exact L2 over candidate pairs via the codegen'd dot expression:
    // d2 = |a|^2 + |b|^2 - 2 a.b (ranking harness, plain doubles)
    val dot = SimilarityMath.dotFast(spark) _
    val n2 = emb.select($"vec_id", dot($"embedding", $"embedding").as("n2"))
    val qset = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    def exactRank(pairs: DataFrame): DataFrame = pairs // (qid, vec_id)
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
      .join(broadcast(qset), "qid")
      .select($"qid", $"vec_id",
        (dot($"embedding", $"embedding") + dot($"qe", $"qe")
          - lit(2.0) * dot($"qe", $"embedding")).as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2", $"vec_id")))
    val approx =
      if (rerank > 0)
        exactRank(adc.filter($"arank" <= math.max(rerank, topK)).select($"qid", $"vec_id"))
          .filter($"rank" <= topK).select($"qid", $"vec_id")
      else adc.filter($"arank" <= topK).select($"qid", $"vec_id")
    // ground truth: exact L2 top-k over the FULL corpus per query
    val truth = emb.select($"vec_id", $"embedding")
      .crossJoin(broadcast(qset))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        (dot($"embedding", $"embedding") + dot($"qe", $"qe")
          - lit(2.0) * dot($"qe", $"embedding")).as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2", $"vec_id")))
      .filter($"rank" <= topK)
      .select($"qid", $"vec_id")
    val hits = truth.join(approx, Seq("qid", "vec_id")).groupBy($"qid")
      .agg(count(lit(1)).as("n_hit"))
    truth.groupBy($"qid").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left")
      .agg((sum(coalesce($"n_hit", lit(0L))).cast("double")
        / sum($"n_true").cast("double") * 1000).as("r"))
      .select(lit(m).as("m"), lit(k).as("k"), lit(rounds).as("rounds"),
        lit(nQueries).as("n_queries"), lit(topK).as("top_k"), lit(rerank).as("rerank"),
        round($"r").cast("long").as("recall_milli"))
  }

  private val ivfProbes = 2

  /** q222: IVF-PQ — the COMPOSED production vector index (FAISS
    * IVFPQ): a coarse inverted file restricts the candidate set to the
    * [[ivfProbes]] cells nearest the query, and within those cells the
    * q221 PQ codes are scanned by integer ADC lookups. The two
    * mechanisms multiply: IVF divides the scan by cells/probes, PQ
    * divides bytes-per-candidate by float-width/code-width — together
    * the standard answer to "billions of vectors, one machine". Cells
    * here are the stored label clustering (q34's posture), cell means
    * exact decimal per-dim averages, the probe ranking exact (d², then
    * label) — deterministic end to end; PQ codebooks and codes are the
    * CHECKPOINTED q221 artifacts, so the measured cost is exactly what
    * an online query pays: probe the cell table, ADC the probed cells. */
  def ivfPqScan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, d)
    val pedim = emb
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"vec_id", $"label", $"pos", $"xf".cast("double").as("x"))
    // coarse centroids: per-(cell, dim) exact decimal mean
    val comp = Landing.ensureParquetFixture(
      pedim.groupBy($"label", $"pos")
        .agg((sum($"x".cast(Dec)).cast("double") / count(lit(1))).as("c")),
      d, "ivfpq_cellmeans")
    // probe: top-2 cells per query by exact squared distance
    val probes = pedim.filter($"vec_id" < pqQueries)
      .select($"vec_id".as("qid"), $"pos", $"x")
      .join(broadcast(comp.select($"label".as("cell"), $"pos", $"c")), Seq("pos"))
      .groupBy($"qid", $"cell")
      .agg(sum((($"x" - $"c") * ($"x" - $"c")).cast(Dec)).cast("double").as("d2"))
      .withColumn("prn", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2", $"cell")))
      .filter($"prn" <= ivfProbes)
      .select($"qid", $"cell")
    // the q221 artifacts (codebooks for the distance table, codes for
    // the candidates) join below; only the probed cells' members scan
    ivfPqWithArtifacts(spark, d, probes)
  }

  /** The ADC leg over the probed cells (split out so the fixture-reuse
    * of q221's codebooks/codes is explicit). */
  private def ivfPqWithArtifacts(spark: SparkSession, d: String,
                                 probes: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pe = Tables.embeddings(spark, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"vec_id", expr(s"pos div $pqSubDim").as("m"),
        expr(s"pos % $pqSubDim").as("sp"), $"xf".cast("double").as("x"))
    val cent0 = pe.filter($"vec_id" < pqK)
      .select($"m", $"vec_id".as("cid"), $"sp", $"x".as("c"))
    def assignTo(cent: DataFrame): DataFrame = pe
      .join(broadcast(cent), Seq("m", "sp"))
      .groupBy($"vec_id", $"m", $"cid")
      .agg(sum((($"x" - $"c") * ($"x" - $"c")).cast(Dec)).as("d2dec"))
      .withColumn("d2", $"d2dec".cast("double"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")))
      .filter($"rn" === 1)
      .select($"vec_id", $"m", $"cid".as("code"))
    val cent1 = Landing.ensureParquetFixture(
      pe.join(assignTo(cent0), Seq("vec_id", "m"))
        .groupBy($"m", $"code".as("cid"), $"sp")
        .agg((round((sum($"x".cast(Dec)).cast("double") / count(lit(1))) * 1e6) / 1e6).as("c")),
      d, "pq_codebooks")
    val codes = Landing.ensureParquetFixture(assignTo(cent1), d, "pq_codes")
    val dtab = pe.filter($"vec_id" < pqQueries)
      .select($"vec_id".as("qid"), $"m", $"sp", $"x")
      .join(broadcast(cent1), Seq("m", "sp"))
      .groupBy($"qid", $"m", $"cid")
      .agg(round(sum((($"x" - $"c") * ($"x" - $"c")).cast(Dec)).cast("double") * 1e6)
        .cast("long").as("dq_micro"))
    val members = Tables.embeddings(spark, d).select($"vec_id", $"label".as("cell"))
    val candidates = codes.join(members, "vec_id")
      .join(broadcast(probes), Seq("cell")) // (qid, cell) pairs restrict the scan
    val adc = candidates.join(broadcast(dtab),
        candidates("qid") === dtab("qid") &&
          candidates("m") === dtab("m") && candidates("code") === dtab("cid"))
      .groupBy(candidates("qid"), $"vec_id")
      .agg(sum($"dq_micro").as("adist_micro"))
    adc.withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"adist_micro", $"vec_id")))
      .filter($"rank" <= pqTopK)
      .select($"qid", $"rank", $"vec_id", $"adist_micro")
      .orderBy($"qid", $"rank")
  }

  val queries = Map(
    "q195_kmeans_train" -> kmeansTrain,
    "q202_pca_power" -> pcaPower,
    "q221_pq_adc" -> pqAdcScan,
    "q222_ivfpq_scan" -> ivfPqScan,
  )

  /** The oracle unrolls seeding and both Lloyd rounds as a CTE chain
    * over (vec_id, pos, v) long tables; distance terms and means use
    * the same exact DECIMAL(38,25) sums and micro-unit quantization
    * as the Spark leg, so every intermediate is bit-identical. */
  val oracles = Map(
    "q195_kmeans_train" ->
      """WITH pts AS (
        |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)),
        |c0 AS (SELECT 0 AS cid, pos, v AS c FROM pts WHERE vec_id = 0),
        |d1 AS (SELECT p.vec_id, MIN(dd.d2) AS dn FROM (
        |    SELECT p.vec_id, c.cid,
        |      CAST(SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
        |    FROM pts p JOIN c0 c USING (pos) GROUP BY 1, 2) dd
        |  JOIN pts p ON p.vec_id = dd.vec_id GROUP BY 1),
        |s1 AS (SELECT vec_id FROM d1 ORDER BY dn DESC, vec_id LIMIT 1),
        |cA AS (SELECT * FROM c0 UNION ALL
        |  SELECT 1 AS cid, pos, v AS c FROM pts WHERE vec_id = (SELECT vec_id FROM s1)),
        |d2s AS (SELECT dd.vec_id, MIN(dd.d2) AS dn FROM (
        |    SELECT p.vec_id, c.cid,
        |      CAST(SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
        |    FROM pts p JOIN cA c USING (pos) GROUP BY 1, 2) dd GROUP BY 1),
        |s2 AS (SELECT vec_id FROM d2s ORDER BY dn DESC, vec_id LIMIT 1),
        |cB AS (SELECT * FROM cA UNION ALL
        |  SELECT 2 AS cid, pos, v AS c FROM pts WHERE vec_id = (SELECT vec_id FROM s2)),
        |d3s AS (SELECT dd.vec_id, MIN(dd.d2) AS dn FROM (
        |    SELECT p.vec_id, c.cid,
        |      CAST(SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
        |    FROM pts p JOIN cB c USING (pos) GROUP BY 1, 2) dd GROUP BY 1),
        |s3 AS (SELECT vec_id FROM d3s ORDER BY dn DESC, vec_id LIMIT 1),
        |cents0 AS (SELECT * FROM cB UNION ALL
        |  SELECT 3 AS cid, pos, v AS c FROM pts WHERE vec_id = (SELECT vec_id FROM s3)),
        |a1 AS (SELECT vec_id, cid FROM (
        |    SELECT dd.vec_id, dd.cid,
        |      ROW_NUMBER() OVER (PARTITION BY dd.vec_id ORDER BY dd.d2, dd.cid) AS rn
        |    FROM (SELECT p.vec_id, c.cid,
        |        CAST(SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
        |      FROM pts p JOIN cents0 c USING (pos) GROUP BY 1, 2) dd)
        |  WHERE rn = 1),
        |cents1 AS (SELECT a.cid, p.pos,
        |    round(CAST(SUM(CAST(p.v AS DECIMAL(38,25))) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS c
        |  FROM pts p JOIN a1 a USING (vec_id) GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM (
        |    SELECT dd.vec_id, dd.cid,
        |      ROW_NUMBER() OVER (PARTITION BY dd.vec_id ORDER BY dd.d2, dd.cid) AS rn
        |    FROM (SELECT p.vec_id, c.cid,
        |        CAST(SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
        |      FROM pts p JOIN cents1 c USING (pos) GROUP BY 1, 2) dd)
        |  WHERE rn = 1),
        |cents2 AS (SELECT a.cid, p.pos,
        |    round(CAST(SUM(CAST(p.v AS DECIMAL(38,25))) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS c
        |  FROM pts p JOIN a2 a USING (vec_id) GROUP BY 1, 2),
        |a3 AS (SELECT vec_id, cid, d2 FROM (
        |    SELECT dd.vec_id, dd.cid, dd.d2,
        |      ROW_NUMBER() OVER (PARTITION BY dd.vec_id ORDER BY dd.d2, dd.cid) AS rn
        |    FROM (SELECT p.vec_id, c.cid,
        |        CAST(SUM(CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
        |      FROM pts p JOIN cents2 c USING (pos) GROUP BY 1, 2) dd)
        |  WHERE rn = 1),
        |sizes AS (SELECT cid, COUNT(*) AS n_pts,
        |    CAST(SUM(CAST(round(d2 * 1e6) AS BIGINT)) AS BIGINT) AS inertia_micro
        |  FROM a3 GROUP BY 1),
        |checks AS (SELECT cid,
        |    CAST(SUM(CAST(round(c * 1e6) AS BIGINT)) AS BIGINT) AS cent_sum_micro
        |  FROM cents2 GROUP BY 1)
        |SELECT cid, n_pts, inertia_micro, cent_sum_micro
        |FROM sizes JOIN checks USING (cid)
        |ORDER BY cid""".stripMargin,
    "q202_pca_power" -> {
      def matvec(prev: String, cur: String): String =
        s"""w_$cur AS (SELECT c.j, CAST(SUM(c.c_micro * v.v_micro) AS BIGINT) AS w
           |  FROM cov c JOIN v_$prev v ON v.k = c.k GROUP BY c.j),
           |v_$cur AS (SELECT w.j AS k,
           |    CAST(round(CAST(w.w AS DOUBLE) / mx.mx * 1e6) AS BIGINT) AS v_micro
           |  FROM w_$cur w CROSS JOIN
           |    (SELECT MAX(ABS(w)) AS mx FROM w_$cur) mx)""".stripMargin
      s"""WITH pe AS (
         |  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)),
         |mean AS (SELECT pos,
         |    round(CAST(SUM(CAST(x AS DECIMAL(38,25))) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS m
         |  FROM pe GROUP BY 1),
         |centered AS (SELECT vec_id, pos, x - m AS xc FROM pe JOIN mean USING (pos)),
         |ntab AS (SELECT COUNT(*) AS n FROM embeddings),
         |cov AS (SELECT a.pos AS j, b.pos AS k,
         |    CAST(round(CAST(SUM(CAST(a.xc * b.xc AS DECIMAL(38,25))) AS DOUBLE)
         |      / (SELECT n FROM ntab) * 1e6) AS BIGINT) AS c_micro
         |  FROM centered a JOIN centered b USING (vec_id) GROUP BY 1, 2),
         |v_0 AS (SELECT pos AS k, CAST(1000000 AS BIGINT) AS v_micro FROM mean),
         |${matvec("0", "1")},
         |${matvec("1", "2")},
         |${matvec("2", "3")}
         |SELECT k AS pos, v_micro FROM v_3 ORDER BY pos""".stripMargin
    },
    "q221_pq_adc" ->
      s"""WITH pe AS (
         |  SELECT vec_id, (i - 1) // $pqSubDim AS m, (i - 1) % $pqSubDim AS sp,
         |    CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)),
         |cent0 AS (SELECT m, vec_id AS cid, sp, x AS c FROM pe WHERE vec_id < $pqK),
         |a1 AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT dd.vec_id, dd.m, dd.cid,
         |      ROW_NUMBER() OVER (PARTITION BY dd.vec_id, dd.m ORDER BY dd.d2, dd.cid) AS rn
         |    FROM (SELECT p.vec_id, p.m, c.cid,
         |        CAST(SUM(CAST((p.x - c.c) * (p.x - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
         |      FROM pe p JOIN cent0 c ON c.m = p.m AND c.sp = p.sp
         |      GROUP BY 1, 2, 3) dd)
         |  WHERE rn = 1),
         |cent1 AS (SELECT p.m, a.code AS cid, p.sp,
         |    round(CAST(SUM(CAST(p.x AS DECIMAL(38,25))) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS c
         |  FROM pe p JOIN a1 a ON a.vec_id = p.vec_id AND a.m = p.m
         |  GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT dd.vec_id, dd.m, dd.cid,
         |      ROW_NUMBER() OVER (PARTITION BY dd.vec_id, dd.m ORDER BY dd.d2, dd.cid) AS rn
         |    FROM (SELECT p.vec_id, p.m, c.cid,
         |        CAST(SUM(CAST((p.x - c.c) * (p.x - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
         |      FROM pe p JOIN cent1 c ON c.m = p.m AND c.sp = p.sp
         |      GROUP BY 1, 2, 3) dd)
         |  WHERE rn = 1),
         |dtab AS (SELECT q.vec_id AS qid, q.m, c.cid,
         |    CAST(round(CAST(SUM(CAST((q.x - c.c) * (q.x - c.c) AS DECIMAL(38,25))) AS DOUBLE)
         |      * 1e6) AS BIGINT) AS dq_micro
         |  FROM pe q JOIN cent1 c ON c.m = q.m AND c.sp = q.sp
         |  WHERE q.vec_id < $pqQueries
         |  GROUP BY 1, 2, 3),
         |adc AS (SELECT t.qid, k.vec_id, CAST(SUM(t.dq_micro) AS BIGINT) AS adist_micro
         |  FROM codes k JOIN dtab t ON t.m = k.m AND t.cid = k.code
         |  GROUP BY 1, 2)
         |SELECT qid, rank, vec_id, adist_micro FROM (
         |  SELECT qid, vec_id, adist_micro,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist_micro, vec_id) AS INT) AS rank
         |  FROM adc)
         |WHERE rank <= $pqTopK
         |ORDER BY qid, rank""".stripMargin,
    "q222_ivfpq_scan" ->
      s"""WITH pedim AS (
         |  SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)),
         |comp AS (SELECT label, pos,
         |    CAST(SUM(CAST(x AS DECIMAL(38,25))) AS DOUBLE) / COUNT(*) AS c
         |  FROM pedim GROUP BY 1, 2),
         |probes AS (SELECT qid, cell FROM (
         |    SELECT d.qid, d.cell,
         |      ROW_NUMBER() OVER (PARTITION BY d.qid ORDER BY d.d2, d.cell) AS prn
         |    FROM (SELECT q.vec_id AS qid, cm.label AS cell,
         |        CAST(SUM(CAST((q.x - cm.c) * (q.x - cm.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
         |      FROM pedim q JOIN comp cm ON cm.pos = q.pos
         |      WHERE q.vec_id < $pqQueries
         |      GROUP BY 1, 2) d)
         |  WHERE prn <= $ivfProbes),
         |pe AS (
         |  SELECT vec_id, (i - 1) // $pqSubDim AS m, (i - 1) % $pqSubDim AS sp,
         |    CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)),
         |cent0 AS (SELECT m, vec_id AS cid, sp, x AS c FROM pe WHERE vec_id < $pqK),
         |a1 AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT dd.vec_id, dd.m, dd.cid,
         |      ROW_NUMBER() OVER (PARTITION BY dd.vec_id, dd.m ORDER BY dd.d2, dd.cid) AS rn
         |    FROM (SELECT p.vec_id, p.m, c.cid,
         |        CAST(SUM(CAST((p.x - c.c) * (p.x - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
         |      FROM pe p JOIN cent0 c ON c.m = p.m AND c.sp = p.sp
         |      GROUP BY 1, 2, 3) dd)
         |  WHERE rn = 1),
         |cent1 AS (SELECT p.m, a.code AS cid, p.sp,
         |    round(CAST(SUM(CAST(p.x AS DECIMAL(38,25))) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS c
         |  FROM pe p JOIN a1 a ON a.vec_id = p.vec_id AND a.m = p.m
         |  GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT dd.vec_id, dd.m, dd.cid,
         |      ROW_NUMBER() OVER (PARTITION BY dd.vec_id, dd.m ORDER BY dd.d2, dd.cid) AS rn
         |    FROM (SELECT p.vec_id, p.m, c.cid,
         |        CAST(SUM(CAST((p.x - c.c) * (p.x - c.c) AS DECIMAL(38,25))) AS DOUBLE) AS d2
         |      FROM pe p JOIN cent1 c ON c.m = p.m AND c.sp = p.sp
         |      GROUP BY 1, 2, 3) dd)
         |  WHERE rn = 1),
         |dtab AS (SELECT q.vec_id AS qid, q.m, c.cid,
         |    CAST(round(CAST(SUM(CAST((q.x - c.c) * (q.x - c.c) AS DECIMAL(38,25))) AS DOUBLE)
         |      * 1e6) AS BIGINT) AS dq_micro
         |  FROM pe q JOIN cent1 c ON c.m = q.m AND c.sp = q.sp
         |  WHERE q.vec_id < $pqQueries
         |  GROUP BY 1, 2, 3),
         |adc AS (SELECT t.qid, k.vec_id, CAST(SUM(t.dq_micro) AS BIGINT) AS adist_micro
         |  FROM codes k
         |  JOIN embeddings e ON e.vec_id = k.vec_id
         |  JOIN probes pr ON pr.cell = e.label
         |  JOIN dtab t ON t.qid = pr.qid AND t.m = k.m AND t.cid = k.code
         |  GROUP BY 1, 2)
         |SELECT qid, rank, vec_id, adist_micro FROM (
         |  SELECT qid, vec_id, adist_micro,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist_micro, vec_id) AS INT) AS rank
         |  FROM adc)
         |WHERE rank <= $pqTopK
         |ORDER BY qid, rank""".stripMargin,
  )
}
