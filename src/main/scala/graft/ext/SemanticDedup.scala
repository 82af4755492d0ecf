package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SimilarityMath._

/** Embedding-space deduplication (SURVEY.md §2.12 E2) — SemDeDup, split
  * from the similarity-search tier it shares its math with. */
object SemanticDedup extends QueryModule {

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
    "q128_semantic_dedup" -> semanticDedup,
  )

  val oracles = Map(
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
