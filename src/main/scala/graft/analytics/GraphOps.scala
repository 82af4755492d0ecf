package graft.analytics

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a relational edge list (SURVEY.md
  * §2 beyond-reference tier, sibling of the q106 connected-components
  * resolver): PageRank over the part co-purchase graph — the
  * link-graph centrality signal a crawl-scale corpus pipeline uses as
  * a document-quality prior (pages/parts that the graph "votes" for).
  *
  * Determinism discipline: ranks live in integer micro-units and every
  * per-iteration step is integer arithmetic — contributions are
  * `rank div outdeg`, damping is ×17/20 (= 0.85 exactly) — so the
  * per-node inbound sum is an order-free integer sum and both engines
  * agree bit-for-bit after any number of iterations (floating-point
  * PageRank would diverge across aggregation orders).
  *
  * Scale shape: the edge list is a checkpointed artifact (built once
  * from a self-join that is per-order bounded — TPC-H orders hold ~4
  * parts, so edges grow linearly in orders, never quadratically in
  * parts). Each iteration is one co-partitioned join (edges and the
  * outdeg table both hash-partitioned on src — the exchange is reused,
  * PlanShapeSpec-style) plus one groupBy(dst) shuffle: O(E) per
  * iteration, the textbook distributed-PageRank cost. At cluster scale
  * the rank relation would be checkpointed every few iterations to cut
  * lineage; three fixed iterations need no checkpoint.
  */
object GraphOps extends QueryModule {

  private val iters = 3
  private val rankScale = 1000000L // initial rank per node, micro-units
  private val topN = 20

  /** Distinct directed co-purchase edges (both directions — the graph
    * is symmetric by construction): parts appearing in the same order.
    * Checkpointed per (sf): the build-once graph artifact. */
  def copurchaseEdges(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, d)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    Landing.ensureParquetFixture(
      li.as("a").join(li.as("b"),
          $"a.ok" === $"b.ok" && $"a.pk" =!= $"b.pk")
        .select($"a.pk".as("src"), $"b.pk".as("dst"))
        .distinct(),
      d, "copurchase_edges")
  }

  /** Beyond-reference: 3-iteration damped PageRank (d = 0.85) in exact
    * integer micro-units, top-[[topN]] parts by final rank. Nodes are
    * the parts that appear in at least one co-purchase pair; the
    * symmetric edge set means every node has both in- and out-degree,
    * so no dangling-mass term is needed. */
  def pagerankParts(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val edges = copurchaseEdges(spark, d)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    // deg is derived from edges by a groupBy on src, so both sides of
    // this join are hash-partitioned on src — no extra shuffle.
    val ed = edges.join(deg, "src")
    var ranks = deg.select($"src".as("node"), lit(rankScale).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .select($"dst", expr("rank_micro div outdeg").as("contrib"))
      ranks = contrib.groupBy($"dst").agg(sum($"contrib").as("s"))
        .select($"dst".as("node"),
          expr(s"${rankScale * 15L / 100L} + (17 * s) div 20").as("rank_micro"))
    }
    // orderBy+limit plans as TakeOrderedAndProject; the trailing sort
    // re-asserts the contract ordering on the 20 survivors (free) so
    // the dump order never depends on the limit operator's internals.
    ranks.orderBy($"rank_micro".desc, $"node")
      .limit(topN)
      .select($"node".as("part_id"), $"rank_micro")
      .orderBy($"rank_micro".desc, $"part_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q151_pagerank_parts" -> pagerankParts,
  )

  val oracles = Map(
    "q151_pagerank_parts" -> {
      val base = rankScale * 15L / 100L
      def iter(prev: String, cur: String): String =
        s"""$cur AS (SELECT e.dst AS node,
           |  $base + (17 * CAST(SUM($prev.r // deg.outdeg) AS BIGINT)) // 20 AS r
           |  FROM e JOIN deg USING (src) JOIN $prev ON $prev.node = e.src
           |  GROUP BY e.dst)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT src AS node, CAST($rankScale AS BIGINT) AS r FROM deg),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node AS part_id, r AS rank_micro
         |FROM r3 ORDER BY rank_micro DESC, part_id LIMIT $topN""".stripMargin
    },
  )
}
