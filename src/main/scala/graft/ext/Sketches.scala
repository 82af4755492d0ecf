package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import graft.util.Det.msum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic-sketch tier (SURVEY §2.12 [ext]) beyond the HLL
  * distinct family (q63/q110): the two other sketches a 100-TB pipeline
  * leans on, each with its error bound CERTIFIED in the output the same
  * way q63/q93/q110 certify theirs.
  *
  *   - q114 Count-Min heavy hitters (Cormode & Muthukrishnan 2005): the
  *     corpus term-frequency sketch. One map-side-combinable aggregate
  *     builds a fixed-size (eps, confidence) sketch — the artifact a
  *     production pipeline stores per shard and MERGES, never a full
  *     term dictionary. CMS never undercounts, and overcounts by at
  *     most eps·N w.h.p.; both sides of that envelope are checked
  *     against the exact counts for the top terms.
  *   - q115 Bloom-filter semi-join pruning: the membership artifact
  *     behind runtime join filters — build a filter on the dimension's
  *     key set, probe the fact side map-only. No false negatives (no
  *     qualifying row is ever dropped — the property that makes the
  *     pruning SAFE), false positives bounded by the configured fpp
  *     (checked with 5× headroom).
  *
  * Only the sketch BINARIES reach the driver (a few KB each) — never
  * data. Both sketches are deterministic for fixed input and seed, so
  * the certified flags are hash-stable.
  *
  * NOTE on the hardcoded-TRUE oracle flags (ADVICE r4): the eps·N /
  * fpp envelopes hold with probability ~1-δ per query, not certainly.
  * For a FIXED seed and dataset the flags are deterministic and the
  * envelopes were verified to hold at sf0.001/0.01/0.1; a regenerated
  * corpus or new SF can legitimately flip one, which would surface as
  * a hash mismatch on this query. That means "re-check the envelope at
  * this SF" (see the [sketch-envelope] stderr diagnostics printed per
  * run, which carry the raw margins), NOT a query bug.
  */
object Sketches extends QueryModule {

  private val cmsEps = 0.001
  private val cmsConf = 0.99
  private val cmsSeed = 42
  private val topK = 20
  private val bloomFpp = 0.01

  /** ONE pass builds the mergeable sketch over `key`; the binary (w·d
    * counters, here 2719×5 longs) is the only thing collected. Shared
    * by every CMS consumer so sketch parameters live in one place.
    * Returns (driver-side sketch for totalCount arithmetic, raw bytes
    * for the codegen'd `graft_cms_estimate` probe expression). */
  private def buildCms(df: DataFrame, key: org.apache.spark.sql.Column) = {
    val skBytes = df
      .agg(count_min_sketch(key, lit(cmsEps), lit(cmsConf), lit(cmsSeed)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    (org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes)), skBytes)
  }

  /** q114: exact top-K corpus terms, each certified inside the CMS
    * error envelope. */
  def cmsHeavyHitters(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, d)
      .select(explode(split($"text", " ")).as("term"))
    graft.functions.GraftFunctions.register(spark)
    val (cms, skBytes) = buildCms(words, $"term")
    val total = cms.totalCount()
    val maxOver = math.ceil(cmsEps * total).toLong
    // exact top-K (deterministic tiebreak) — the small reference set the
    // sketch is judged against
    val topTerms = words.groupBy($"term").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"term").limit(topK)
    // codegen'd probe (r8): the sketch rides the plan as a reference
    // object, the per-row work is the d hash probes — no udf barrier
    def estimate(c: org.apache.spark.sql.Column) =
      call_function("graft_cms_estimate", c, lit(skBytes))
    // the top-K is topK rows by contract — collect it ONCE and derive
    // both the stderr envelope diagnostic and the result from the same
    // pass (computing the diagnostic from a second evaluation of the
    // aggregation would double-run the corpus scan inside the bench's
    // timed region — review r5)
    val topRows = topTerms.withColumn("est", estimate($"term"))
      .select($"term", $"n_exact", $"est").collect()
    // raw envelope margin to stderr: if cms_ok ever flips at a new SF the
    // overcounts say by how much the eps·N bound was exceeded (the oracle
    // cannot carry est — it is sketch-internal — so the flag alone rides
    // in the hash-compared output)
    val worst = topRows.map(r => r.getLong(2) - r.getLong(1)).max
    System.err.println(
      s"[sketch-envelope] cms max overcount=$worst budget=$maxOver (eps*N)")
    topRows.toSeq
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2) >= r.getLong(1) && r.getLong(2) <= r.getLong(1) + maxOver))
      .toDF("term", "n_exact", "cms_ok")
      .orderBy($"n_exact".desc, $"term")
  }

  /** q115: Bloom semi-join pruning of events against the customer key
    * set, certified: zero false negatives, false positives within 5×
    * the configured fpp. */
  def bloomSemiJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cust = Tables.customer(spark, d)
    val nKeys = cust.count()
    val bf = cust.stat.bloomFilter("c_custkey", nKeys, bloomFpp)
    val bfBytes = { val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray }
    def probe(c: org.apache.spark.sql.Column) =
      call_function("graft_bloom_contains", c.cast("long"), lit(bfBytes))
    val ev = Tables.events(spark, d).select($"event_id", $"user_id")
    val exact = ev.join(cust.select($"c_custkey"),
        ev("user_id") === cust("c_custkey"), "left_semi")
      .count()
    val agg = ev
      .withColumn("hit", probe($"user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when($"hit", 1).otherwise(0)).cast("long").as("n_pass"))
      .head()
    val nEvents = agg.getAs[Long]("n_events")
    val nPass = agg.getAs[Long]("n_pass")
    val fpBudget = math.ceil(5 * bloomFpp * (nEvents - exact)).toLong
    System.err.println(
      s"[sketch-envelope] bloom false positives=${nPass - exact} budget=$fpBudget (5*fpp*nonmatching)")
    Seq((nEvents, exact,
        nPass >= exact,                 // no false negatives: pruning is safe
        nPass - exact <= fpBudget))     // false positives within budget
      .toDF("n_events", "n_matching", "no_false_negatives", "fp_within_budget")
  }

  /** q144: sketch-based JOIN-SIZE estimation — the cost-based-planning
    * primitive: |A ⋈_k B| = Σ_k n_A(k)·n_B(k), estimated WITHOUT
    * scanning A per candidate plan. A (all events keyed by user) is
    * summarized once into a CMS; B's side (purchase events per user) is
    * exact and small. The planner's estimate Σ_k n_B(k)·ĉ_A(k) — one
    * sketch probe per distinct B key — can never undercount (CMS
    * one-sided error), and overshoots by at most Σn_B·eps·N_A w.h.p.;
    * both sides of that envelope are certified in the output next to
    * the exact join size, q114-style. At 100 TB this is why a planner
    * can cost a join order in milliseconds: the fact table's key
    * histogram is a few KB of counters, not a scan. */
  def cmsJoinEstimate(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d).select($"user_id", $"event_type")
    graft.functions.GraftFunctions.register(spark)
    val (cms, skBytes) = buildCms(ev, $"user_id")
    val nA = cms.totalCount()
    def estimate(c: org.apache.spark.sql.Column) =
      call_function("graft_cms_estimate", c.cast("long"), lit(skBytes))
    // B side: per-user purchase counts (exact, dimension-sized) + the
    // true per-key fact multiplicities for the ground-truth join size
    val perKey = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n_a"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_b"))
      .filter($"n_b" > 0)
      .withColumn("est_a", estimate($"user_id"))
    // coalesce(sum, 0): a corpus with zero purchase events must yield
    // the (0, 0, TRUE, TRUE) row the oracle produces, not a driver NPE
    val agg = perKey.agg(
      count(lit(1)).as("n_keys"),
      coalesce(sum($"n_a" * $"n_b"), lit(0L)).cast("long").as("exact_join_size"),
      coalesce(sum($"est_a" * $"n_b"), lit(0L)).cast("long").as("est_join_size"),
      coalesce(sum($"n_b"), lit(0L)).cast("long").as("sum_nb")).head()
    val (nKeys, exact, est, sumNb) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    val budget = math.ceil(cmsEps * nA).toLong * sumNb
    System.err.println(
      s"[sketch-envelope] cms join-size overcount=${est - exact} budget=$budget (sum_nB*eps*N_A)")
    Seq((nKeys, exact, est >= exact, est - exact <= budget))
      .toDF("n_keys", "exact_join_size", "never_undercounts", "within_budget")
  }

  /** q163: the q144 estimator PUT TO WORK — sketch-driven join-order
    * selection. Two candidate dims restrict the orders fact: the
    * BUILDING market segment (on o_custkey) and the 1995-Q1 calendar
    * (on o_orderdate). A Selinger-style planner joins the dim with the
    * SMALLER estimated fact-match first, so the cheaper intermediate
    * flows into the second join. The estimates are Σ_k ĉ(k) over each
    * dim's keys — one CMS probe per dim key against per-FK sketches
    * built in a SINGLE pass over the fact (two `count_min_sketch`
    * aggregates in one `agg`), probes distributed over the dim sides
    * (q144's contract: sketches broadcast, never data collected).
    *
    * The DECISION is the oracle-checked output: `first_join` must match
    * the order DuckDB derives from the EXACT intermediate sizes — the
    * sketch planner provably agrees with ground-truth costing, verified
    * stable at sf0.001/0.01/0.1. The agreement rests on the ~5x
    * selectivity separation, not on tie semantics: the engine compares
    * estimates and the oracle exact counts, so a corpus engineered to a
    * near-tie could legitimately flip one side — the same
    * regenerated-corpus caveat the sketch-envelope flags carry (see the
    * object scaladoc). The CMS overshoot grows with the number of
    * probed keys (each probe pays ~N/w expected collision mass once the
    * key space exceeds the counter width — at sf0.1 the 15k-key
    * customer estimate runs ~6x over exact while the 90-key calendar
    * estimate stays tight), and that asymmetry is the SAFE direction
    * for ordering: it can only make a high-cardinality dim look more
    * expensive, never cheaper. At this SF both dim joins are
    * broadcasts that fuse into one codegen stage, so the physical win
    * is probe-count only; at 100 TB the same Σ n_B(k)·ĉ_A(k) numbers
    * order N-way SHUFFLE joins where each intermediate is a
    * materialized exchange — that is where KB of counters replace a
    * scan per candidate order (why CBO keeps sketch stats at all). */
  def sketchJoinOrder(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").as("order_date"),
        $"o_totalprice")
    // ONE fact pass builds both FK sketches (mergeable map-side aggregate)
    val skRow = o.agg(
      count_min_sketch($"o_custkey".cast("long"), lit(cmsEps), lit(cmsConf), lit(cmsSeed)).as("sk_cust"),
      count_min_sketch(unix_date($"order_date").cast("long"), lit(cmsEps), lit(cmsConf), lit(cmsSeed)).as("sk_date"))
      .head()
    graft.functions.GraftFunctions.register(spark)
    def probeCust(c: org.apache.spark.sql.Column) =
      call_function("graft_cms_estimate", c, lit(skRow.getAs[Array[Byte]]("sk_cust")))
    def probeDate(c: org.apache.spark.sql.Column) =
      call_function("graft_cms_estimate", c, lit(skRow.getAs[Array[Byte]]("sk_date")))
    val custDim = Tables.customer(spark, d)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val dateDim = spark.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("1995-01-01")),
        lit(java.sql.Date.valueOf("1995-03-31")))).as("cal_date"))
    val estCust = custDim
      .agg(coalesce(sum(probeCust($"c_custkey".cast("long"))), lit(0L)).cast("long")).head().getLong(0)
    val estDate = dateDim
      .agg(coalesce(sum(probeDate(unix_date($"cal_date").cast("long"))), lit(0L)).cast("long")).head().getLong(0)
    val custFirst = estCust <= estDate
    System.err.println(
      s"[sketch-planner] est |orders⋈cust|=$estCust est |orders⋈date|=$estDate -> first_join=${if (custFirst) "customer" else "date"}")
    val joined =
      if (custFirst)
        o.join(broadcast(custDim), o("o_custkey") === custDim("c_custkey"))
          .join(broadcast(dateDim), o("order_date") === dateDim("cal_date"))
      else
        o.join(broadcast(dateDim), o("order_date") === dateDim("cal_date"))
          .join(broadcast(custDim), o("o_custkey") === custDim("c_custkey"))
    joined.agg(
        count(lit(1)).as("n_rows"),
        msum($"o_totalprice").as("revenue"))
      .select(lit(if (custFirst) "customer" else "date").as("first_join"),
        $"n_rows", $"revenue")
  }

  /** q230 (r8): KMV/THETA DISTINCT-INTERSECTION — the set-algebra
    * sketch the HLL tier cannot provide (HLL registers merge under
    * union ONLY; "how many distinct users did BOTH click and purchase"
    * needs an intersectable sketch — the Druid/DataSketches theta
    * workhorse). One pass over the fact builds a per-segment K-minimum-
    * values sample via the typed [[graft.functions.KmvSketch]]
    * Aggregator (map-side combinable, bounded 2K-slot buffer, keys
    * hashed by the codegen'd `xxhash64` — no RNG, q101 discipline);
    * the driver then answers |A|, |B|, |A∪B|, |A∩B| from ≤3K longs of
    * sketch algebra. Certification is the q114 pattern: the output
    * carries the EXACT distinct counts (oracle-recomputable) plus
    * flags that every estimate landed inside a ~5/√K relative
    * envelope of truth — deterministic for a fixed corpus, raw
    * margins on stderr. At 100 TB the sketches are per-shard KB
    * artifacts merged associatively; the exact legs here exist only
    * to certify them. */
  def kmvSetSketch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.KmvSketch
    val ev = Tables.events(spark, d)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", xxhash64($"user_id").as("h"))
    val kmv = udaf(KmvSketch.agg)
    // ONE pass, both segment sketches (map-side combined per segment)
    val sketches = ev.groupBy($"event_type").agg(kmv($"h").as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val a = sketches.getOrElse("click", Seq.empty)
    val b = sketches.getOrElse("purchase", Seq.empty)
    val estA = KmvSketch.estimate(a)
    val estB = KmvSketch.estimate(b)
    val estU = KmvSketch.estimate(KmvSketch.union(a, b))
    val estI = KmvSketch.intersectEstimate(a, b)
    // exact legs (what the oracle recomputes) — dimension-sized outputs
    val users = Tables.events(spark, d)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", $"user_id").distinct()
      .groupBy($"user_id").agg(collect_set($"event_type").as("ts"))
      .agg(
        sum(when(array_contains($"ts", "click"), 1L).otherwise(0L)).as("n_a"),
        sum(when(array_contains($"ts", "purchase"), 1L).otherwise(0L)).as("n_b"),
        count(lit(1)).as("n_union"),
        sum(when(size($"ts") === 2, 1L).otherwise(0L)).as("n_inter"))
      .head()
    val (nA, nB, nU, nI) = (users.getLong(0), users.getLong(1),
      users.getLong(2), users.getLong(3))
    // ~5/√K relative envelopes (K=1024 → 15.6%), intersection scaled by
    // the union magnitude (the theta-rule error term); floors absorb
    // tiny-corpus integer effects
    def ok(est: Double, exact: Long, scale: Long): Boolean =
      math.abs(est - exact) <= math.max(5.0 * scale / math.sqrt(KmvSketch.K), 2.0)
    System.err.println(
      s"[sketch-envelope] kmv |A| est=$estA exact=$nA |B| est=$estB exact=$nB " +
        s"|A∪B| est=$estU exact=$nU |A∩B| est=$estI exact=$nI " +
        s"(budget ±${5.0 * nU / math.sqrt(KmvSketch.K)})")
    Seq((nA, nB, nU, nI,
        ok(estA, nA, nA) && ok(estB, nB, nB),
        ok(estU, nU, nU),
        ok(estI, nI, nU)))
      .toDF("n_click_users", "n_purchase_users", "n_union", "n_inter",
        "segments_ok", "union_ok", "inter_ok")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q114_cms_heavy_hitters" -> cmsHeavyHitters,
    "q115_bloom_semijoin"    -> bloomSemiJoin,
    "q144_cms_join_estimate" -> cmsJoinEstimate,
    "q163_sketch_join_order" -> sketchJoinOrder,
    "q230_kmv_set_sketch"    -> kmvSetSketch,
  )

  val oracles = Map(
    "q114_cms_heavy_hitters" ->
      s"""SELECT term, COUNT(*) AS n_exact, TRUE AS cms_ok
         |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         |GROUP BY term
         |ORDER BY n_exact DESC, term
         |LIMIT $topK""".stripMargin,
    "q115_bloom_semijoin" ->
      """SELECT COUNT(*) AS n_events,
        |  (SELECT COUNT(*) FROM events e
        |   WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
        |    AS n_matching,
        |  TRUE AS no_false_negatives,
        |  TRUE AS fp_within_budget
        |FROM events""".stripMargin,
    "q163_sketch_join_order" ->
      """WITH cj AS (
        |  SELECT COUNT(*) AS n FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'),
        |dj AS (
        |  SELECT COUNT(*) AS n FROM orders
        |  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'),
        |res AS (
        |  SELECT COUNT(*) AS n_rows,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-03-31')
        |SELECT CASE WHEN cj.n <= dj.n THEN 'customer' ELSE 'date' END AS first_join,
        |  res.n_rows, res.revenue
        |FROM cj, dj, res""".stripMargin,
    "q230_kmv_set_sketch" ->
      """WITH du AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |  WHERE event_type IN ('click', 'purchase')
        |), per_user AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM du GROUP BY user_id
        |)
        |SELECT CAST(SUM(a) AS BIGINT) AS n_click_users,
        |  CAST(SUM(b) AS BIGINT) AS n_purchase_users,
        |  COUNT(*) AS n_union,
        |  CAST(SUM(a * b) AS BIGINT) AS n_inter,
        |  TRUE AS segments_ok, TRUE AS union_ok, TRUE AS inter_ok
        |FROM per_user""".stripMargin,
    "q144_cms_join_estimate" ->
      """WITH per_key AS (
        |  SELECT user_id, COUNT(*) AS n_a,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_b
        |  FROM events GROUP BY user_id
        |)
        |SELECT COUNT(*) AS n_keys,
        |  CAST(COALESCE(SUM(n_a * n_b), 0) AS BIGINT) AS exact_join_size,
        |  TRUE AS never_undercounts,
        |  TRUE AS within_budget
        |FROM per_key WHERE n_b > 0""".stripMargin,
  )
}
