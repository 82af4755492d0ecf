package graft.ext

import graft.QueryModule
import graft.ingest.Landing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Dedup cluster resolution (SURVEY §2.12 [ext]) — the step after pair
  * finding that every dedup pipeline needs and pair lists alone can't
  * give: near-duplication is transitive in effect (A≈B, B≈C ⇒ keep one
  * of {A,B,C}), so the pair graph must be resolved into CONNECTED
  * COMPONENTS and one canonical representative kept per component.
  * Dropping one doc per PAIR instead would over-delete chains.
  *
  * Algorithm (q106): iterative min-label propagation — every node
  * starts labeled with itself; each round every node takes the min of
  * its own and its neighbors' labels; converged when no label changes.
  * This is the standard distributed CC scheme (the Pregel/GraphX
  * formulation; Kiveris et al. 2014 "Connected Components in MapReduce"
  * refine it with small-star/large-star to cut rounds on high-diameter
  * graphs — near-dup clusters are shallow, so plain propagation
  * converges in a handful of rounds). Each round is one equi-join +
  * one min-aggregate: all shuffles are keyed, nothing global.
  *
  * Driver involvement is one COUNT per round (the convergence test) —
  * a scalar, never data. Intermediate labels are persisted per round
  * and explicitly unpersisted when the next round lands (no JVM-life
  * cache leak); the converged labeling is checkpointed to a parquet
  * fixture so re-runs (and the lazy consumers of the returned plan)
  * read the artifact instead of replaying the iteration — the same
  * pattern a production pipeline uses, since the cluster map is
  * exactly what it stores to drive the actual delete pass.
  *
  * Edges are the verified near-dup pairs of q42 (exact n-gram Jaccard
  * >= 0.5), so the oracle can rebuild the identical graph in SQL and
  * resolve it with a recursive min-reachability CTE.
  */
object DedupClusters extends QueryModule {

  private val maxRounds = 20

  /** Converged (node, lbl) labeling of the near-dup pair graph,
    * computed once per fixture dir and checkpointed. Shared with the
    * composite curation pipeline (q108). */
  private[ext] def ccLabels(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dir = Landing.fixtureDir(d, "dedup_cc_labels")
    val marker = Paths.get(dir + "__cc_ok")
    if (!Files.exists(marker)) {
      val pairs = Dedup.ngramJaccardPairs(spark, d).select($"d1", $"d2")
      val edges = pairs.union(pairs.select($"d2", $"d1"))
        .toDF("src", "dst").persist()
      var labels = edges.select($"src".as("node")).distinct()
        .withColumn("lbl", $"node").persist()
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        val prop = edges.join(labels, edges("src") === labels("node"))
          .select(edges("dst").as("node"), labels("lbl"))
        val next = labels.select($"node", $"lbl").union(prop)
          .groupBy($"node").agg(min($"lbl").as("lbl")).persist()
        val changed = next.as("n")
          .join(labels.as("o"), "node")
          .filter(col("n.lbl") =!= col("o.lbl")).count()
        labels.unpersist()
        labels = next
        converged = changed == 0
        round += 1
      }
      require(converged, s"label propagation did not converge in $maxRounds rounds")
      labels.write.mode("overwrite").parquet(dir)
      labels.unpersist()
      edges.unpersist()
      Files.write(marker, Array.emptyByteArray)
    }
    spark.read.parquet(dir)
  }

  /** q106: one row per near-dup cluster (size >= 2 by construction —
    * singletons have no edge and need no resolution). */
  def dedupClusters(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    ccLabels(spark, d)
      .groupBy($"lbl".as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"),
        min($"node").as("min_doc"),
        max($"node").as("max_doc"))
      .orderBy($"cluster_rep")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q106_dedup_clusters" -> dedupClusters,
  )

  val oracles = Map(
    "q106_dedup_clusters" ->
      """SELECT cluster_rep, COUNT(*) AS n_members,
        |  MIN(node) AS min_doc, MAX(node) AS max_doc
        |FROM (
        |WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM tok)
        |), pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |edges0 AS (
        |  SELECT d1, d2
        |  FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        |  WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= 0.5
        |), edges AS (
        |  SELECT d1 AS src, d2 AS dst FROM edges0
        |  UNION ALL SELECT d2, d1 FROM edges0
        |), reach(node, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
        |)
        |SELECT MIN(lbl) AS cluster_rep, node FROM reach GROUP BY node
        |) GROUP BY cluster_rep ORDER BY cluster_rep""".stripMargin,
  )
}
