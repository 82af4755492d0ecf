package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SimilarityMath._

/** Similarity search over the `embeddings` table (SURVEY.md §2.12 [ext])
  * — the exact tier:
  *
  *   - exact brute-force top-k for a bounded query set: the query side is
  *     tiny (|Q| = 8) and broadcast; the candidate side streams through a
  *     BroadcastNestedLoopJoin at O(N·|Q|) — the canonical exact-kNN
  *     baseline. NOT an N×N cross join; cost grows linearly in N.
  *   - near-dup pairs: banded sign-LSH blocking (b bands × r sign bits,
  *     r sized to log2 of the corpus) + exact cosine verification on
  *     candidates; pair generation is a per-band equi-join, never
  *     all-pairs, and expected candidates stay ~linear in N.
  *
  * The index-backed ANN paths (IVF probe, trained centroids, int8 SQ8)
  * are [[SimilarityAnn]]; SemDeDup is [[SemanticDedup]]; the shared
  * decimal-exact cosine contract is [[SimilarityMath]].
  */
object Similarity extends QueryModule {

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

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q33_cosine_topk_exact"  -> cosineTopkExact,
    "q43_embedding_neardup"  -> embeddingNearDup,
  )

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
  )
}
