package graft.ext

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SimilarityMath._

/** Index-backed approximate-nearest-neighbor paths (SURVEY.md §2.12 E3):
  * every query here probes a TRAINED, persisted artifact instead of
  * scanning full-precision vectors —
  *
  *   - q34: IVF-style probe of the query's own stored cell (one
  *     equi-join on cell id; work per query is O(cell size));
  *   - q65: full IVF dataflow — train centroids (exact decimal means),
  *     probe the nprobe=2 nearest, exact rerank within probed cells;
  *   - q121: int8 scalar quantization (absmax over the L2-normalized
  *     corpus) — integer-dot candidate scan over 4×-narrower codes,
  *     exact decimal rerank on the survivors.
  *
  * Exact cosine math and the broadcast query-set bounds come from
  * [[SimilarityMath]]; the exact/brute-force baseline and the LSH pair
  * finder live in [[Similarity]].
  */
object SimilarityAnn extends QueryModule {

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

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q34_ann_ivf_topk"       -> annIvfTopk,
    "q65_ann_centroid_probe" -> annCentroidProbe,
    "q121_ann_sq8"           -> annSq8Topk,
  )

  val oracles = Map(
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
  )
}
