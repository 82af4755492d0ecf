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
    // MEASURED, deliberately unchanged (r17, VERDICT r16 #3): a
    // localCheckpoint of this join (the ClusterTrain pattern, + ranks0
    // derived from the cached adjacency) was tried and is SLOWER —
    // isolated 5-rep medians 2.83 s → 3.69 s at sf0.1. The plan dump
    // (plans/r17/q151_pagerank_parts.txt) shows why: each iteration
    // BROADCASTS the node-grain ranks into a codegen re-scan of the
    // edge fixture, so the per-iteration edge side never shuffles at
    // all — the checkpoint added a full materialization of the
    // edge-grain join output without removing any exchange. Same
    // verdict as q140's r16 attempt: recompute under codegen beats
    // pinning edge-grain state. (At cluster scale the ranks side
    // outgrows the broadcast threshold and the planner degrades to
    // SMJ per iteration — the point where re-introducing the pinned
    // co-partitioned adjacency pays; the local measurement cannot see
    // that regime, so the code stays in the measured-faster shape.)
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

  private val triTopN = 20

  /** q198: TRIANGLE COUNTING by degree orientation (Suri &
    * Vassilvitskii 2011, "the curse of the last reducer") — the
    * clustering-coefficient numerator, the second classical graph
    * primitive after centrality (q151): how embedded each part is in
    * tightly-knit co-purchase neighborhoods.
    *
    * Each undirected edge is ORIENTED from its lower-(degree, id)
    * endpoint to the higher one; every triangle then has exactly one
    * wedge a→b→c with a closing edge a→c, so no triangle is counted
    * twice and — the scale point — wedge fan-out is bounded by
    * Σ out-deg², with out-degree ≤ O(√E) under this orientation: the
    * hub that would generate deg² wedges as a center generates almost
    * none, because its edges all point AWAY from lower-degree
    * neighbors into it. Plan: two equi-joins + a semi-join, all
    * shuffle-partitioned on node ids, never an all-pairs product.
    * Output: top-[[triTopN]] parts by triangles-containing-the-part
    * (each found triangle explodes to its 3 members). */
  def triangleParts(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // The oriented adjacency is a stored graph-index artifact (like the
    // edge list itself): the plan references it THREE times (e1/e2/e3),
    // and without the checkpoint each reference re-derives degrees +
    // two joins — 3x the work for byte-identical output.
    val oriented = Landing.ensureParquetFixture(
      {
        // the symmetric distinct edge set, one row per undirected edge
        val und = copurchaseEdges(spark, d).filter($"src" < $"dst")
        val deg = und.select(explode(array($"src", $"dst")).as("n"))
          .groupBy($"n").agg(count(lit(1)).as("dg"))
        val withDeg = und
          .join(deg.select($"n".as("src"), $"dg".as("ds")), "src")
          .join(deg.select($"n".as("dst"), $"dg".as("dt")), "dst")
        withDeg.select(
          when($"ds" < $"dt" || ($"ds" === $"dt" && $"src" < $"dst"),
            struct($"src".as("u"), $"dst".as("v")))
            .otherwise(struct($"dst".as("u"), $"src".as("v"))).as("e"))
          .select($"e.u", $"e.v")
      },
      d, "copurchase_oriented")
    // Adjacency-intersection rather than wedge materialization: the
    // orientation is acyclic (a total order by (degree, id)), so every
    // triangle x→y, x→z, y→z is found EXACTLY once — at its base edge
    // (x, y), as z ∈ N⁺(x) ∩ N⁺(y). The wedge-join formulation
    // shuffles one row per wedge (49M at sf0.1 for 1.2M edges); here
    // the shuffled volume is the adjacency lists themselves (Σ out-deg
    // = E) and the intersection runs as an array expression inside the
    // join task — the same asymptotic work, ~40x less shuffle.
    val adj = oriented.groupBy($"u").agg(sort_array(collect_list($"v")).as("ns"))
    val tris = oriented
      .join(adj.select($"u", $"ns".as("nu")), Seq("u"))
      .join(adj.select($"u".as("v"), $"ns".as("nv")), Seq("v"))
      .select($"u", $"v", explode(array_intersect($"nu", $"nv")).as("w"))
    tris.select(explode(array($"u", $"v", $"w")).as("part_id"))
      .groupBy($"part_id").agg(count(lit(1)).as("n_tri"))
      .orderBy($"n_tri".desc, $"part_id")
      .limit(triTopN)
      .orderBy($"n_tri".desc, $"part_id")
  }

  private val minSupport = 2
  private val rulesTopN = 20

  /** q211: ASSOCIATION-RULE MINING over order baskets (Agrawal 1993 —
    * support/confidence/lift, the market-basket primitive): rules
    * A→B ranked by lift = P(AB)/(P(A)·P(B)), min-support-floored
    * against the 1-co-occurrence noise floor. All three measures in
    * EXACT INTEGER arithmetic (lift_micro = 1e6·supp(AB)·N div
    * (supp(A)·supp(B))) — no floating ratios to drift. Pair supports
    * are the q151 co-purchase self-join COUNTED PER ORDER (bounded by
    * basket size², linear in orders); item supports one groupBy; the
    * rule table joins pair→item supports via broadcast (item supports
    * are catalog-sized). Top-N via TakeOrderedAndProject. */
  def associationRules(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val items = Tables.lineitem(spark, d)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val nOrders = items.select($"ok").distinct()
      .agg(count(lit(1)).as("n")).withColumn("one", lit(1))
    val itemSupp = items.groupBy($"pk").agg(count(lit(1)).as("supp"))
    // supp is SYMMETRIC (items are distinct per order, so cnt(a,b) =
    // #orders containing both = cnt(b,a)): count each unordered pair
    // once (a < b — half the join fan-out and half the pair-grain
    // aggregate) and mirror after the support floor (r16, guide §2.3).
    // Measured r17 (the r16 close landed this without numbers):
    // isolated 5-rep medians 2.27 s (ordered =!=) -> 1.86 s (x1.22).
    // Hot-key question (guide §2.5) closed by a CONSTRUCTION bound,
    // not salting: the join key is the order id, and TPC-H orders hold
    // at most 7 lineitems (<= 7 distinct parts), so one order fans out
    // to at most C(7,2) = 21 pairs — there is no hot key to split at
    // any scale factor.
    val half = items.as("a").join(items.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .groupBy($"a.pk".as("x"), $"b.pk".as("y"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter($"supp_ab" >= minSupport)
    val pairSupp = half.select($"x".as("ante"), $"y".as("cons"), $"supp_ab")
      .unionAll(half.select($"y".as("ante"), $"x".as("cons"), $"supp_ab"))
    pairSupp
      .join(broadcast(itemSupp.select($"pk".as("ante"), $"supp".as("supp_a"))), "ante")
      .join(broadcast(itemSupp.select($"pk".as("cons"), $"supp".as("supp_b"))), "cons")
      .withColumn("one", lit(1)).join(broadcast(nOrders), "one")
      .select($"ante", $"cons", $"supp_ab",
        expr("(1000 * supp_ab) div supp_a").as("conf_milli"),
        expr("(1000000 * supp_ab * n) div (supp_a * supp_b)").as("lift_micro"))
      .orderBy($"lift_micro".desc, $"ante", $"cons")
      .limit(rulesTopN)
      .orderBy($"lift_micro".desc, $"ante", $"cons")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q151_pagerank_parts" -> pagerankParts,
    "q198_triangle_parts" -> triangleParts,
    "q211_association_rules" -> associationRules,
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
    "q198_triangle_parts" ->
      s"""WITH und AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |deg AS (SELECT n, count(*) AS dg FROM (
         |    SELECT src AS n FROM und UNION ALL SELECT dst FROM und) GROUP BY 1),
         |o AS (SELECT
         |    CASE WHEN (d1.dg, und.src) < (d2.dg, und.dst) THEN und.src ELSE und.dst END AS u,
         |    CASE WHEN (d1.dg, und.src) < (d2.dg, und.dst) THEN und.dst ELSE und.src END AS v
         |  FROM und JOIN deg d1 ON d1.n = und.src JOIN deg d2 ON d2.n = und.dst),
         |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM o e1 JOIN o e2 ON e1.v = e2.u
         |  WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.u = e1.u AND e3.v = e2.v))
         |SELECT node AS part_id, count(*) AS n_tri FROM (
         |  SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
         |GROUP BY 1 ORDER BY n_tri DESC, part_id LIMIT $triTopN""".stripMargin,
    "q211_association_rules" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |n AS (SELECT COUNT(DISTINCT ok) AS n FROM items),
         |isupp AS (SELECT pk, count(*) AS supp FROM items GROUP BY 1),
         |psupp AS (
         |  SELECT a.pk AS ante, b.pk AS cons, count(*) AS supp_ab
         |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk <> b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= $minSupport)
         |SELECT p.ante, p.cons, p.supp_ab,
         |  (1000 * p.supp_ab) // sa.supp AS conf_milli,
         |  (1000000 * p.supp_ab * (SELECT n FROM n)) // (sa.supp * sb.supp) AS lift_micro
         |FROM psupp p
         |JOIN isupp sa ON sa.pk = p.ante
         |JOIN isupp sb ON sb.pk = p.cons
         |ORDER BY lift_micro DESC, ante, cons
         |LIMIT $rulesTopN""".stripMargin,
  )
}
