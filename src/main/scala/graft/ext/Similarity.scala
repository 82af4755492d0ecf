package graft.ext

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the `embeddings` table (SURVEY.md §2.12 [ext]).
  *
  * Three shapes, ordered by scale ambition:
  *
  *   - exact brute-force top-k for a bounded query set: the query side is
  *     tiny (|Q| = 8) and broadcast; the candidate side streams through a
  *     BroadcastNestedLoopJoin at O(N·|Q|) — the canonical exact-kNN
  *     baseline. NOT an N×N cross join; cost grows linearly in N.
  *   - IVF-style probe: each vector carries a stored cell assignment (the
  *     `label` column — in production the output of an offline k-means);
  *     a query probes its own cell via an equi-join on cell id, so the
  *     work per query is O(cell size) and the whole thing is one hash
  *     join — the 100-TB path.
  *   - near-dup pairs: banded sign-LSH blocking (b bands × r sign bits,
  *     r sized to log2 of the corpus) + exact cosine verification on
  *     candidates; pair generation is a per-band equi-join, never
  *     all-pairs, and expected candidates stay ~linear in N.
  *
  * Determinism: cosine = dot/(‖a‖·‖b‖) where dot and squared norms are
  * exact DECIMAL(38,25) sums of per-element double products (element
  * order cannot perturb them), and the final sqrt/divide is the same
  * scalar double pipeline in Spark and DuckDB — bit-identical results,
  * so ranking and thresholds are oracle-checkable.
  */
object Similarity extends QueryModule {

  private val Dec = DecimalType(38, 25)

  /** Exact order-independent dot product of two float arrays, as double. */
  private def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(0).cast(Dec), (acc, v) => (acc + v).cast(Dec)).cast("double")

  /** Exact L2 norm of a float array, as double. */
  private def normDec(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => (x.cast("double") * x.cast("double")).cast(Dec)),
      lit(0).cast(Dec), (acc, v) => (acc + v).cast(Dec)).cast("double"))

  private val nQueries = 8
  private val topK = 5

  /** E3: exact cosine top-k, bounded broadcast query set vs all vectors. */
  def cosineTopkExact(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qv"), normDec($"embedding").as("qn"))
    val c = emb
      .select($"vec_id".as("vid"), $"embedding".as("cv"), normDec($"embedding").as("cn"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vid")
    c.join(broadcast(q), $"qid" =!= $"vid")
      .withColumn("cosine", dotDec($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= topK)
      .select($"qid", $"vid", round($"cosine", 6).as("cosine"), $"rnk")
      .orderBy($"qid", $"rnk")
  }

  /** E3 scale path: IVF-style probe of the query's stored cell (`label`
    * = cell id). One equi-join on cell, exact rerank within the cell. */
  def annIvfTopk(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qv"),
        normDec($"embedding").as("qn"), $"label".as("cell"))
    val c = emb.select($"vec_id".as("vid"), $"embedding".as("cv"),
      normDec($"embedding").as("cn"), $"label".as("cell"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vid")
    c.join(broadcast(q), Seq("cell"))
      .filter($"qid" =!= $"vid")
      .withColumn("cosine", dotDec($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"qid", $"cell", $"vid", round($"cosine", 6).as("cosine"), $"rnk")
      .orderBy($"qid", $"rnk")
  }

  /** Banded sign-LSH (VERDICT r3: the former FIXED 8-bit key meant 256
    * buckets forever → candidate pairs O(N²/256), quadratic at scale).
    * Now b=4 bands of r sign bits each, r sized to the corpus:
    *
    *   r = clamp(8..16, ceil(log2 N))   (4·r ≤ 64 dims available)
    *
    * A pair is a candidate iff it agrees on AT LEAST ONE band. Expected
    * random collisions ≈ b·N²/2^r; with r ≈ log2 N that is ≈ b·N — the
    * candidate set grows LINEARLY in the corpus, and each band join is
    * an equi-shuffle on (band, key), never all-pairs. Recall: a pair at
    * angle θ agrees on one sign bit w.p. p = 1−θ/π, so it survives with
    * P ≥ 1−(1−p^r)^b — e.g. near-identical pairs (cos ≥ 0.99, p ≈ .955)
    * at r=16: 1−(1−.478)^4 ≈ 0.93, while random pairs (p ≈ .5) collide
    * w.p. ≈ 4·2^-16. The multi-band ANY-match is q71's pigeonhole
    * scheme generalized from Hamming to angular distance. */
  private val lshBands = 4

  /** clamp(8..16, ceil(log2 n)) — integer-exact (bit length), NOT via
    * float log: Math.log(4096)/Math.log(2) = 12.000000000000002 rounds
    * UP while DuckDB's log2 intrinsic gives exactly 12, so a float
    * formula would silently diverge the two legs at any power-of-two
    * corpus size. The oracle mirrors with an integer search (smallest r
    * with 2^r ≥ N). */
  private def lshBits(n: Long): Int =
    math.min(16, math.max(8,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))))

  /** Band j (0-based) key: signs of dims j·r+1 .. j·r+r as array<bool>. */
  private def bandKey(v: Column, j: Int, r: Int): Column =
    transform(slice(v, j * r + 1, r), x => x > 0)

  /** Plain double dot product via the codegen'd native expression
    * (graft.functions.DotProductF32) — NOT order-stable across engines,
    * used only as a pre-filter with a wide safety margin. */
  private def dotFast(spark: SparkSession)(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_dot", a, b)
  }

  /** E2/E3: embedding near-duplicate pairs — banded sign-LSH candidate
    * generation (any-band match, see [[lshBands]]/[[lshBits]]), exact
    * cosine ≥ 0.4 verification on candidates. Candidates are first
    * screened with a cheap double dot at threshold 0.35: double-vs-exact
    * drift is ~1e-10, five orders below the 0.05 margin, so no pair with
    * exact cosine ≥ 0.4 can be screened out — the expensive
    * decimal-exact cosine then runs only on survivors.
    *
    * The corpus count that sizes r is one scalar aggregate — the same
    * "train once per corpus" shape as q65's centroid build. The oracle
    * derives the identical r from COUNT(*) inside SQL, so the blocking
    * predicate is mirrored exactly at any SF. */
  def embeddingNearDup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val embRaw = Tables.embeddings(spark, d)
    val r = lshBits(embRaw.count())
    // LSH table: one row per (vector, band) — the standard banded layout;
    // each band is a separate hash space, joined as an equi-key.
    val bands = embRaw.select($"vec_id", posexplode(
      array((0 until lshBands).map(j => bandKey($"embedding", j, r)): _*))
      .as(Seq("band", "key")))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"))
      .distinct() // a pair may agree on several bands
    val emb = embRaw.select($"vec_id", $"embedding", normDec($"embedding").as("nrm"))
    val ea = emb.select($"vec_id".as("v1"), $"embedding".as("e1"), $"nrm".as("n1"))
    val eb = emb.select($"vec_id".as("v2"), $"embedding".as("e2"), $"nrm".as("n2"))
    cand.join(ea, Seq("v1")).join(eb, Seq("v2"))
      .filter(dotFast(spark)($"e1", $"e2") / ($"n1" * $"n2") >= 0.35)
      .withColumn("cosine", dotDec($"e1", $"e2") / ($"n1" * $"n2"))
      .filter($"cosine" >= 0.4)
      .select($"v1", $"v2", round($"cosine", 6).as("cosine"))
      .orderBy($"v1", $"v2")
  }

  /** E3 full IVF: centroids computed from the data (exact decimal
    * per-dimension means over each stored cell), each query probes its
    * `nprobe`=2 nearest centroids by cosine, exact rerank within the
    * probed cells only. The centroid table is K=10 rows — broadcast —
    * and candidate work per query is O(probed-cell sizes): the complete
    * IVF dataflow (train → assign → probe → rerank) with every stage
    * deterministic and oracle-mirrored. */
  def annCentroidProbe(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    // The trained index IS a stored artifact: centroid build (exact
    // decimal mean per (cell, dim)) is checkpointed once per corpus and
    // the probe path just scans the K-row table.
    val cent = Landing.ensureParquetFixture(
      {
        val comp = emb
          .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
          .groupBy($"label", $"pos")
          .agg((sum($"x".cast("double").cast(Dec)).cast("double") / count(lit(1))).as("c"))
        comp.groupBy($"label")
          .agg(transform(sort_array(collect_list(struct($"pos", $"c"))),
            s => s.getField("c")).as("cvec"))
          .withColumn("cnrm", normDec($"cvec"))
      },
      d, "ivf_centroids")
    val q = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qv"), normDec($"embedding").as("qn"))
    // probe: rank centroids per query, keep nprobe = 2
    val probeW = Window.partitionBy($"qid").orderBy($"ccos".desc, $"label")
    val probes = q.join(broadcast(cent), lit(true))
      .withColumn("ccos", dotDec($"qv", $"cvec") / ($"qn" * $"cnrm"))
      .withColumn("prn", row_number().over(probeW))
      .filter($"prn" <= 2)
      .select($"qid", $"qv", $"qn", $"label".as("cell"))
    // exact rerank within probed cells
    val c = emb.select($"vec_id".as("vid"), $"embedding".as("cv"),
      normDec($"embedding").as("cn"), $"label".as("cell"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vid")
    c.join(broadcast(probes), Seq("cell"))
      .filter($"qid" =!= $"vid")
      .withColumn("cosine", dotDec($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"qid", $"vid", $"cell", round($"cosine", 6).as("cosine"), $"rnk")
      .orderBy($"qid", $"rnk")
  }

  /** Candidates kept per query by the compressed-code scan before the
    * exact rerank (4× the final k — the standard SQ over-retrieve). */
  private val sqReserve = 4 * topK

  /** E3 compressed-index path: int8 scalar quantization of the
    * L2-NORMALIZED vectors with one global absmax scale (the
    * inference-engine int8 layout; FAISS's SQ family). Train = the
    * single scalar s = max|x̂ᵢ| over the normalized corpus (one
    * aggregate, stored as a 1-row artifact); encode =
    * `floor(x̂/s·127 + 0.5)` ∈ [−127, 127] (stored once — the
    * compressed index, 1 byte/dim vs 4); search = INTEGER dot products
    * over the codes — for unit vectors, code-dot ≈ cosine·(127/s)², a
    * monotone proxy — rank candidates, and the exact decimal cosine
    * reranks only the top [[sqReserve]] survivors.
    *
    * Normalize-then-quantize is what makes the integer dot a faithful
    * cosine surrogate: an affine per-dim map of UNnormalized vectors
    * leaves offset and per-dim-scale terms inside the code dot that
    * swamp the signal (measured: recall@5 collapses to ~10%; with
    * absmax-on-normalized it is 100% on this corpus — asserted in
    * ExtSpec).
    *
    * Why this is the 100-TB shape: the scan side touches a 4× narrower
    * column than q33's float vectors (1 B vs 4 B per dim — 16× vs the
    * doubles a naive pipeline materializes), the int MAC loop is
    * codegen-friendly, and full-precision vectors are fetched for only
    * ~[[sqReserve]] rows per query. Determinism: x̂ comes off the
    * decimal-exact norm, the encode is the same double op-tree in both
    * engines (explicit half-up, no rounding-mode ambiguity), and the
    * candidate ranking is pure integer arithmetic — the candidate SET
    * is bit-reproducible, and the rerank reuses the q33 decimal-exact
    * cosine. */
  def annSq8Topk(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val xhat = emb
      .select($"vec_id", $"embedding", normDec($"embedding").as("nrm"))
      .select($"vec_id",
        transform($"embedding", x => x.cast("double") / $"nrm").as("xhat"))
    // trained quantizer: ONE scalar — the global absmax of x̂ elements
    val quant = Landing.ensureParquetFixture(
      xhat.select(explode($"xhat").as("v")).agg(max(abs($"v")).as("s")),
      d, "sq8_quantizer")
    // the compressed index: int8 codes persisted once per corpus
    val codes = Landing.ensureParquetFixture(
      xhat.join(broadcast(quant), lit(true))
        .select($"vec_id",
          transform($"xhat", v =>
            least(lit(127.0), greatest(lit(-127.0),
              floor(v / $"s" * lit(127.0) + lit(0.5)))).cast("int")
          ).as("code")),
      d, "sq8_codes")
    val qc = codes.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"code".as("qcode"))
    // asymmetric-distance scan entirely in integer space on the codes
    val cw = Window.partitionBy($"qid").orderBy($"qdot".desc, $"vid")
    val cand = codes.select($"vec_id".as("vid"), $"code")
      .join(broadcast(qc), $"qid" =!= $"vid")
      .withColumn("qdot", aggregate(
        zip_with($"qcode", $"code", (a, b) => (a * b).cast("long")),
        lit(0L), (acc, v) => acc + v))
      .withColumn("crn", row_number().over(cw))
      .filter($"crn" <= sqReserve)
      .select($"qid", $"vid")
    // exact decimal rerank on the surviving candidates only (q33's math)
    val embN = emb.select($"vec_id", $"embedding", normDec($"embedding").as("nrm"))
    val qv = embN.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qv"), $"nrm".as("qn"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vid")
    cand
      .join(embN.select($"vec_id".as("vid"), $"embedding".as("cv"), $"nrm".as("cn")), Seq("vid"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("cosine", dotDec($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= topK)
      .select($"qid", $"vid", round($"cosine", 6).as("cosine"), $"rnk")
      .orderBy($"qid", $"rnk")
  }

  /** Semantic-dedup cosine threshold: pairs at or above it are "the same
    * content restated" for curation purposes (q43 uses the same bar for
    * its near-dup pair report). */
  private val semTau = 0.4

  /** E2 semantic dedup (SemDeDup: cluster-then-prune, after Abbas et al.
    * 2023, arXiv:2303.09540): pairwise similarity is computed WITHIN each
    * embedding cluster only (the stored `label` = offline k-means cell,
    * the same artifact q34/q65 probe), and every vector with exact cosine
    * ≥ τ to ANY lower-id vector in its cell is dropped. Returns the KEPT
    * set (the curated corpus membership).
    *
    * Deliberate variant of the paper's keep-one-representative rule: the
    * witness need not itself be kept, so a chain a–b–c (cos(a,b) ≥ τ,
    * cos(b,c) ≥ τ, cos(a,c) < τ) keeps only `a` — transitive-chain
    * pruning, i.e. one representative per CONNECTED COMPONENT of the
    * τ-graph rather than per mutual-duplicate clique. Chosen because it
    * is order-free and embarrassingly parallel (one self-join, no
    * sequential greedy pass within a cell — the greedy kept-witness rule
    * is inherently serial per cell, which is the wrong shape at 100 TB);
    * it prunes at least as aggressively as the paper's rule, which for
    * near-duplicate REMOVAL errs on the correct side. The DuckDB oracle
    * mirrors the same rule.
    *
    * Scale shape: the only shuffle is the equi-join on cell id, and pair
    * work is O(Σ cell²) — bounded by the clustering fan-out (cells are
    * ~N/K and K grows with the corpus), never the corpus square. The
    * cheap codegen'd double dot screens candidates at τ−0.05 (drift
    * ~1e-10, five orders below the margin) so the exact decimal cosine
    * runs only on survivors — the q43 two-tier verification reused. */
  def semanticDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
      .select($"vec_id", $"label".as("cell"), $"embedding",
        normDec($"embedding").as("nrm"))
    val a = emb.select($"cell", $"vec_id".as("v1"), $"embedding".as("e1"), $"nrm".as("n1"))
    val b = emb.select($"cell", $"vec_id".as("v2"), $"embedding".as("e2"), $"nrm".as("n2"))
    val dropped = a.join(b, Seq("cell"))
      .filter($"v1" < $"v2")
      .filter(dotFast(spark)($"e1", $"e2") / ($"n1" * $"n2") >= semTau - 0.05)
      .withColumn("cosine", dotDec($"e1", $"e2") / ($"n1" * $"n2"))
      .filter($"cosine" >= semTau)
      .select($"v2".as("vec_id")).distinct()
    emb.join(dropped, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cell")
      .orderBy($"vec_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q33_cosine_topk_exact"  -> cosineTopkExact,
    "q34_ann_ivf_topk"       -> annIvfTopk,
    "q43_embedding_neardup"  -> embeddingNearDup,
    "q65_ann_centroid_probe" -> annCentroidProbe,
    "q121_ann_sq8"           -> annSq8Topk,
    "q128_semantic_dedup"    -> semanticDedup,
  )

  /** DuckDB mirror of dot/norm: unnest + exact DECIMAL(38,25) sums. */
  private val normsCte =
    """norms AS (
      |  SELECT vec_id,
      |    sqrt(CAST(SUM(CAST(CAST(e AS DOUBLE) * CAST(e AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE)) AS nrm
      |  FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings)
      |  GROUP BY vec_id
      |)""".stripMargin

  val oracles = Map(
    "q33_cosine_topk_exact" ->
      s"""WITH $normsCte,
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vid, q.embedding AS qv, c.embedding AS cv
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < $nQueries
         |), dots AS (
         |  SELECT qid, vid,
         |    CAST(SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE) AS dot
         |  FROM (SELECT qid, vid, qv, cv, unnest(generate_series(1, len(qv))) AS i FROM pairs)
         |  GROUP BY qid, vid
         |), cosv AS (
         |  SELECT qid, vid, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON vid = nc.vec_id)
         |SELECT qid, vid, ROUND(cosine, 6) AS cosine, rnk FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rnk
         |  FROM cosv)
         |WHERE rnk <= $topK
         |ORDER BY qid, rnk""".stripMargin,
    "q34_ann_ivf_topk" ->
      s"""WITH $normsCte,
         |pairs AS (
         |  SELECT q.vec_id AS qid, q.label AS cell, c.vec_id AS vid,
         |         q.embedding AS qv, c.embedding AS cv
         |  FROM embeddings q JOIN embeddings c
         |    ON q.label = c.label AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < $nQueries
         |), dots AS (
         |  SELECT qid, cell, vid,
         |    CAST(SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE) AS dot
         |  FROM (SELECT qid, cell, vid, qv, cv, unnest(generate_series(1, len(qv))) AS i FROM pairs)
         |  GROUP BY qid, cell, vid
         |), cosv AS (
         |  SELECT qid, cell, vid, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON vid = nc.vec_id)
         |SELECT qid, cell, vid, ROUND(cosine, 6) AS cosine, rnk FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rnk
         |  FROM cosv)
         |WHERE rnk <= 3
         |ORDER BY qid, rnk""".stripMargin,
    "q65_ann_centroid_probe" ->
      s"""WITH $normsCte,
         |dims AS (
         |  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
         |  FROM (SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings)
         |), comp AS (
         |  SELECT label, pos,
         |    CAST(SUM(CAST(x AS DECIMAL(38,25))) AS DOUBLE) / COUNT(*) AS c
         |  FROM dims GROUP BY label, pos
         |), cent AS (
         |  SELECT label, list(c ORDER BY pos) AS cvec FROM comp GROUP BY label
         |), cnorms AS (
         |  SELECT label, sqrt(CAST(SUM(CAST(c * c AS DECIMAL(38,25))) AS DOUBLE)) AS cnrm
         |  FROM comp GROUP BY label
         |), qcpairs AS (
         |  SELECT q.vec_id AS qid, ct.label AS cell, q.embedding AS qv, ct.cvec AS cvec
         |  FROM embeddings q CROSS JOIN cent ct
         |  WHERE q.vec_id < $nQueries
         |), qc AS (
         |  SELECT qid, cell,
         |    CAST(SUM(CAST(CAST(qv[i] AS DOUBLE) * cvec[i] AS DECIMAL(38,25))) AS DOUBLE) AS dot
         |  FROM (SELECT qid, cell, qv, cvec, unnest(generate_series(1, len(cvec))) AS i FROM qcpairs)
         |  GROUP BY qid, cell
         |), probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT qid, cell, ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY dot / (qn.nrm * cn.cnrm) DESC, cell) AS prn
         |    FROM qc JOIN norms qn ON qid = qn.vec_id JOIN cnorms cn ON cell = cn.label)
         |  WHERE prn <= 2
         |), pairs AS (
         |  SELECT p.qid, c.vec_id AS vid, c.label AS cell, qe.embedding AS qv, c.embedding AS cv
         |  FROM probes p
         |  JOIN embeddings c ON c.label = p.cell
         |  JOIN embeddings qe ON qe.vec_id = p.qid
         |  WHERE c.vec_id <> p.qid
         |), dots AS (
         |  SELECT qid, vid, cell,
         |    CAST(SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE) AS dot
         |  FROM (SELECT qid, vid, cell, qv, cv, unnest(generate_series(1, len(qv))) AS i FROM pairs)
         |  GROUP BY qid, vid, cell
         |), cosv AS (
         |  SELECT qid, vid, cell, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON vid = nc.vec_id)
         |SELECT qid, vid, cell, ROUND(cosine, 6) AS cosine, rnk FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rnk
         |  FROM cosv)
         |WHERE rnk <= 3
         |ORDER BY qid, rnk""".stripMargin,
    "q121_ann_sq8" ->
      s"""WITH $normsCte,
         |xhat AS (
         |  -- elements of the L2-normalized vectors, same double op-tree
         |  -- as the engine: cast-to-double / decimal-exact norm
         |  SELECT d.vec_id, d.pos, d.x / n.nrm AS v
         |  FROM (SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
         |        FROM (SELECT vec_id, embedding,
         |                     unnest(generate_series(1, len(embedding))) AS i
         |              FROM embeddings)) d
         |  JOIN norms n ON d.vec_id = n.vec_id
         |), quant AS (
         |  SELECT MAX(ABS(v)) AS s FROM xhat
         |), codes AS (
         |  -- engine encode mirrored: floor(v / s * 127 + 0.5), clamped
         |  SELECT vec_id, pos,
         |    CAST(LEAST(127.0, GREATEST(-127.0,
         |           FLOOR(v / s * 127.0 + 0.5))) AS INT) AS code
         |  FROM xhat, quant
         |), qdots AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vid,
         |         SUM(CAST(q.code AS BIGINT) * c.code) AS qdot
         |  FROM codes q JOIN codes c ON q.pos = c.pos AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $nQueries
         |  GROUP BY 1, 2
         |), cand AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qdot DESC, vid) AS crn
         |    FROM qdots)
         |  WHERE crn <= $sqReserve
         |), pairs AS (
         |  SELECT cand.qid, cand.vid, qe.embedding AS qv, ce.embedding AS cv
         |  FROM cand
         |  JOIN embeddings qe ON cand.qid = qe.vec_id
         |  JOIN embeddings ce ON cand.vid = ce.vec_id
         |), dots AS (
         |  SELECT qid, vid,
         |    CAST(SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE) AS dot
         |  FROM (SELECT qid, vid, qv, cv, unnest(generate_series(1, len(qv))) AS i FROM pairs)
         |  GROUP BY qid, vid
         |), cosv AS (
         |  SELECT qid, vid, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON vid = nc.vec_id)
         |SELECT qid, vid, ROUND(cosine, 6) AS cosine, rnk FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rnk
         |  FROM cosv)
         |WHERE rnk <= $topK
         |ORDER BY qid, rnk""".stripMargin,
    "q43_embedding_neardup" ->
      s"""WITH $normsCte,
         |params AS (
         |  -- integer-exact ceil(log2 N): smallest r with 2^r >= N
         |  -- (2^r and N are both exact in doubles here, so the compare
         |  -- is exact; a float LOG2 would misround at powers of two)
         |  SELECT LEAST(16, GREATEST(8, MIN(rr))) AS r
         |  FROM (SELECT unnest(generate_series(0, 62)) AS rr),
         |       (SELECT COUNT(*) AS n FROM embeddings)
         |  WHERE POWER(2, rr) >= n
         |), bands AS (
         |  SELECT e.vec_id, j.band,
         |    [x > 0 FOR x IN e.embedding[j.band*p.r+1 : (j.band+1)*p.r]] AS key
         |  FROM embeddings e, params p,
         |    (SELECT unnest(generate_series(0, ${lshBands - 1})) AS band) j
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
         |), pairs AS (
         |  SELECT v1, v2, ea.embedding AS e1, eb.embedding AS e2
         |  FROM cand
         |  JOIN embeddings ea ON v1 = ea.vec_id
         |  JOIN embeddings eb ON v2 = eb.vec_id
         |), dots AS (
         |  SELECT v1, v2,
         |    CAST(SUM(CAST(CAST(e1[i] AS DOUBLE) * CAST(e2[i] AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE) AS dot
         |  FROM (SELECT v1, v2, e1, e2, unnest(generate_series(1, len(e1))) AS i FROM pairs)
         |  GROUP BY v1, v2
         |), cosv AS (
         |  SELECT v1, v2, dot / (na.nrm * nb.nrm) AS cosine
         |  FROM dots JOIN norms na ON v1 = na.vec_id JOIN norms nb ON v2 = nb.vec_id)
         |SELECT v1, v2, ROUND(cosine, 6) AS cosine
         |FROM cosv WHERE cosine >= 0.4
         |ORDER BY v1, v2""".stripMargin,
    "q128_semantic_dedup" ->
      s"""WITH $normsCte,
         |pairs AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2, a.embedding AS e1, b.embedding AS e2
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |), dots AS (
         |  SELECT v1, v2,
         |    CAST(SUM(CAST(CAST(e1[i] AS DOUBLE) * CAST(e2[i] AS DOUBLE) AS DECIMAL(38,25))) AS DOUBLE) AS dot
         |  FROM (SELECT v1, v2, e1, e2, unnest(generate_series(1, len(e1))) AS i FROM pairs)
         |  GROUP BY v1, v2
         |), cosv AS (
         |  SELECT v1, v2, dot / (na.nrm * nb.nrm) AS cosine
         |  FROM dots JOIN norms na ON v1 = na.vec_id JOIN norms nb ON v2 = nb.vec_id
         |), dropped AS (
         |  SELECT DISTINCT v2 FROM cosv WHERE cosine >= $semTau)
         |SELECT vec_id, label AS cell
         |FROM embeddings
         |WHERE vec_id NOT IN (SELECT v2 FROM dropped)
         |ORDER BY vec_id""".stripMargin,
  )
}
