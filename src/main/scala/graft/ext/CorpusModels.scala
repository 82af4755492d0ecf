package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-statistics MODEL TRAINING as aggregation (SURVEY.md §2.12
  * [ext]): the two classical text models whose training IS a groupBy —
  * a multinomial Naive Bayes classifier (the fastText-class supervised
  * baseline every corpus pipeline trains for language/quality routing)
  * and PMI collocation extraction (the phrase-mining primitive behind
  * tokenizer merge seeds and stopword-free keyphrase lists).
  *
  * Both follow the reference pipeline's text-analysis posture
  * (`/root/reference/Assets/Jobs/etl_job.py:31-64` establishes the
  * corpus tables; the [ext] tier extends them to LLM-data ops) and the
  * engine's determinism discipline: every transcendental collapses to
  * integer micro-units (`round(ln(x) * 1e6) → long`) at the innermost
  * per-term level, so all downstream aggregation is order-free integer
  * arithmetic — bit-identical between Spark's unordered partial
  * aggregates and DuckDB's sequential ones (the q129/q149 trick).
  *
  * Scale shape: training is one explode→groupBy shuffle producing
  * DICTIONARY-sized artifacts (per-class token tables, vocabulary
  * counts); scoring is broadcast joins against the corpus-sized side,
  * which never moves. At 100 TB the class-token table is bounded by
  * |vocab| × |classes|, not by corpus size — the whole point of
  * count-based models: the reduce side is the model.
  */
object CorpusModels extends QueryModule {

  /** The shared tokenization law (split on single space, lowercased)
    * every text oracle mirrors. */
  private def tok(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", $"lang",
        explode(split(lower($"text"), " ")).as("w"))
  }

  /** q193: NAIVE BAYES language classifier — trained AND applied in one
    * declarative plan. Training is counting: per-class token counts
    * n(c,w), per-class totals N(c), document priors D(c)/D, vocabulary
    * size V. Laplace-smoothed log-likelihoods ln((n+1)/(N+V)) and the
    * unseen-token floor ln(1/(N+V)) are quantized to micro-nats, so a
    * document's class score = prior + Σ m(w)·ll(c,w) is an exact
    * integer sum. Prediction = argmax with a deterministic tie-break
    * (highest score, then lexicographically first class — `min` over
    * the (−score, class) struct). The registered result is the
    * CONFUSION MATRIX (actual lang × predicted, doc counts): the
    * training-eval artifact, and the strongest oracle pin — every
    * misrouted document moves a cell. */
  def naiveBayesLang(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // MEASURED, deliberately unchanged (r17): localCheckpoint of the
    // token frame ("tokenize once for the four consumers") was tried
    // and is SLOWER — isolated 5-rep medians 2.07 s → 2.73 s at sf0.1.
    // Same verdict as the r16 count-table derivation below: the
    // tokenize recompute runs inside whole-stage codegen and is cheaper
    // than materializing + re-reading the exploded token frame.
    val t = tok(spark, d)
    val docTok = t.groupBy($"doc_id", $"lang", $"w").agg(count(lit(1)).as("m"))
    // NOTE (r16 measured): deriving classTok/classTot/vocab from docTok
    // ("scan once, re-aggregate") was tried and is WRONG here, locally
    // AND at scale — docTok's (doc, lang, w) grain is corpus-sized, so
    // the derivation chains a corpus-grain exchange where these direct
    // passes shuffle only DICTIONARY-sized bytes after map-side partial
    // aggregation (re-scans are cheap; shuffles are not). Measured
    // q193 2.09 → 2.44 s before reverting.
    val classTok = t.groupBy($"lang".as("cand"), $"w").agg(count(lit(1)).as("n"))
    val classTot = t.groupBy($"lang".as("cand")).agg(count(lit(1)).as("nc"))
    val docsPerClass = Tables.documents(spark, d)
      .groupBy($"lang".as("cand")).agg(count(lit(1)).as("dcnt"))
    val totals = Tables.documents(spark, d)
      .agg(count(lit(1)).as("dtot")).withColumn("one", lit(1))
    val vocab = t.agg(countDistinct($"w").as("v")).withColumn("one", lit(1))
    // |classes| rows: per-class constants incl. prior and unseen floor
    val classes = classTot.join(docsPerClass, "cand")
      .withColumn("one", lit(1))
      .join(broadcast(totals), "one").join(broadcast(vocab), "one")
      .select($"cand", $"nc", $"v",
        round(log($"dcnt".cast("double") / $"dtot".cast("double")) * 1000000.0)
          .cast("long").as("prior_micro"),
        round(log(lit(1.0) / ($"nc" + $"v").cast("double")) * 1000000.0)
          .cast("long").as("ll0_micro"))
    // |vocab|×|classes| rows: the trained model
    val model = classTok.join(broadcast(classes.select($"cand", $"nc", $"v")), "cand")
      .select($"cand", $"w",
        round(log(($"n" + 1).cast("double") / ($"nc" + $"v").cast("double")) * 1000000.0)
          .cast("long").as("ll_micro"))
    val scores = docTok
      .crossJoin(broadcast(classes.select($"cand", $"prior_micro", $"ll0_micro")))
      .join(broadcast(model), Seq("cand", "w"), "left")
      .groupBy($"doc_id", $"lang", $"cand")
      .agg((max($"prior_micro") +
        sum($"m" * coalesce($"ll_micro", $"ll0_micro"))).as("score"))
    val pred = scores.groupBy($"doc_id", $"lang")
      .agg(min(struct((-$"score").as("ns"), $"cand")).as("best"))
      .select($"doc_id", $"lang", $"best.cand".as("predicted"))
    pred.groupBy($"lang", $"predicted").agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"predicted")
  }

  private val pmiMinCount = 5
  private val pmiTopK = 20

  /** q194: PMI COLLOCATIONS — pointwise mutual information of adjacent
    * token pairs, ln(p(ab) / (p(a)·p(b))), the classical collocation /
    * phrase-mining statistic (Church & Hanks 1990). Bigram and unigram
    * counts are two groupBys; corpus totals ride a broadcast 1-row
    * frame; the PMI quantizes to micro-nats and the top-K lands via
    * TakeOrderedAndProject (never a global sort). The min-count floor
    * is the standard guard against PMI's low-frequency bias (a pair
    * seen once with rare words scores arbitrarily high). */
  def pmiCollocations(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val t = tok(spark, d)
    val bg = Tables.documents(spark, d)
      .select($"doc_id", split(lower($"text"), " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select(explode(transform(sequence(lit(1), size($"ws") - 1),
        i => struct(element_at($"ws", i).as("w1"),
          element_at($"ws", i + 1).as("w2")))).as("bg"))
      .select($"bg.w1", $"bg.w2")
    val pairs = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("cab"))
    val uni = t.groupBy($"w").agg(count(lit(1)).as("c"))
    // corpus totals derive from the count tables (r16, guide §2.3):
    // ntok = Σ c, btot = Σ cab BEFORE the min-count filter — two more
    // corpus passes removed, identical integer totals by associativity
    val stats = uni.agg(sum($"c").as("ntok")).withColumn("one", lit(1))
      .join(pairs.agg(sum($"cab").as("btot")).withColumn("one", lit(1)), "one")
    pairs.filter($"cab" >= pmiMinCount)
      .join(broadcast(uni.select($"w".as("w1"), $"c".as("ca"))), "w1")
      .join(broadcast(uni.select($"w".as("w2"), $"c".as("cb"))), "w2")
      .withColumn("one", lit(1)).join(broadcast(stats), "one")
      .withColumn("pmi_micro",
        round(log(($"cab".cast("double") / $"btot") /
          (($"ca".cast("double") / $"ntok") * ($"cb".cast("double") / $"ntok")))
          * 1000000.0).cast("long"))
      .select($"w1", $"w2", $"cab", $"pmi_micro")
      .orderBy($"pmi_micro".desc, $"w1", $"w2")
      .limit(pmiTopK)
  }

  private val gdIters = 3

  /** q199: GRADIENT-DESCENT TRAINING as aggregation — a linear
    * classifier (is this document English?) fit by `gdIters` rounds of
    * full-batch gradient descent, each round ONE crossJoin(broadcast
    * 1-row weight frame) + ONE aggregate producing the next weights.
    * The link is the HARD sigmoid clamp(z/4 + 1/2, 0, 1) (Courbariaux
    * 2015's piecewise-linear surrogate): unlike exp/ln it needs no
    * libm call, so every quantity here — micro-unit z, link output,
    * integer error, gradient sum, weight update — is exact IEEE/integer
    * arithmetic and the oracle's unrolled CTE chain is bit-identical
    * BY CONSTRUCTION, not by hoping two libms round alike. (Division
    * by 4 and the /1e6 scalings are exact in doubles; the only rounds
    * are explicit round() calls both engines define identically.)
    *
    * Features are integer token-group counts (bias + two curated word
    * lists whose corpus frequency tilts en vs non-en — the measured
    * signal on this near-uniform synthetic corpus is weak, ~1.1x
    * ratios, stated honestly: what the spec pins is the OPTIMIZATION,
    * a strictly decreasing integer squared loss across rounds at both
    * driver SFs, not a vanity accuracy). The gradient
    * Σ(y·1e6 − p_micro)·x_j is an order-free integer sum (the q193
    * trick), so partial aggregation cannot perturb training.
    * Registered result = the trained evaluation (confusion counts +
    * per-cell z mass — moves when ANY weight changes). Scale: each
    * round shuffles THREE numbers (the gradient partials) — the
    * corpus is scanned, never moved; 100 TB of documents trains at
    * scan speed × iterations. */
  /** Token groups whose corpus frequency tilts en vs non-en (measured
    * on the driver corpus; the oracle names the identical lists). */
  private val enTokens = Seq("order", "window", "table", "hash", "big", "group", "sort", "spark")
  private val otherTokens = Seq("customer", "scan", "slow", "query", "join", "small", "the", "column")

  private def tokenCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _))).cast("long")

  private[graft] def gdFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(when($"lang" === "en", 1L).otherwise(0L).as("y"),
        split(lower($"text"), " ").as("toks"))
      .select($"y", lit(1L).as("x0"),
        tokenCount($"toks", enTokens).as("x1"),
        tokenCount($"toks", otherTokens).as("x2"))
  }

  private[graft] def gdScore(feat: DataFrame, w: DataFrame): DataFrame =
    feat.crossJoin(broadcast(w))
      .withColumn("z", col("w0") * col("x0") + col("w1") * col("x1") + col("w2") * col("x2"))
      .withColumn("p", round(least(lit(1000000.0),
        greatest(lit(0.0), lit(500000.0) + col("z") / lit(4.0)))).cast("long"))
      .withColumn("err", col("y") * 1000000L - col("p"))

  private[graft] def gdTrain(spark: SparkSession, d: String, rounds: Int): DataFrame =
    gdTrainOn(spark, gdFeatures(spark, d), rounds)

  private def gdTrainOn(spark: SparkSession, feat: DataFrame, rounds: Int): DataFrame = {
    import spark.implicits._
    var w = spark.range(1).select(
      lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"))
    for (_ <- 1 to rounds) {
      // per-feature learning rates (bias moves 1e2x faster than the
      // ~35-scaled token counts); loss-monotone at both driver SFs,
      // measured before the constants were frozen
      w = gdScore(feat, w).agg(
        (max($"w0") + round(sum($"err" * $"x0") / (lit(20.0) * count(lit(1)))).cast("long")).as("w0"),
        (max($"w1") + round(sum($"err" * $"x1") / (lit(2000.0) * count(lit(1)))).cast("long")).as("w1"),
        (max($"w2") + round(sum($"err" * $"x2") / (lit(2000.0) * count(lit(1)))).cast("long")).as("w2"))
    }
    w
  }

  def gdLinearClassifier(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // tokenize ONCE (r17, guide §2.4/§5): the 3 training rounds + the
    // eval each re-scanned documents and re-ran the split/filter HOF
    // chain — 4 corpus passes for a feature frame of 4 longs per doc.
    // localCheckpoint materializes it once (the ClusterTrain iterative
    // pattern); integer features, so results are bit-identical.
    val feat = gdFeatures(spark, d).localCheckpoint()
    val w = gdTrainOn(spark, feat, gdIters)
    // the evaluation pins the whole trajectory: counts move when any
    // prediction flips, z_sum moves when ANY weight changes at all
    gdScore(feat, w)
      .select($"y", when($"z" > 0L, 1L).otherwise(0L).as("pred"), $"z")
      .groupBy($"y", $"pred").agg(count(lit(1)).as("n_docs"), sum($"z").as("z_sum"))
      .orderBy($"y", $"pred")
  }

  /** Learning-rate grid: divisors for the token-feature update (the
    * bias divisor stays 20). Code and oracle share the list. */
  private val gridDivisors = Seq(500L, 2000L, 8000L)

  /** q209: HYPERPARAMETER GRID SEARCH as ONE training sweep — G
    * configurations of q199's classifier trained SIMULTANEOUSLY: the
    * weight state is a G-row (config, w0, w1, w2) relation, each round
    * crossJoins the corpus against the broadcast G-row state and one
    * groupBy(config) aggregate produces every config's gradient at
    * once. The corpus is scanned `rounds` times TOTAL — not per
    * config: at 100 TB, searching G learning rates costs the same
    * scans as training one model (the amortization that makes grid
    * search affordable as a data job; model-parallel training in its
    * simplest honest form). Output = per-config final integer squared
    * loss + weight checksum — the model-selection table (argmin row is
    * the winner), every config's full trajectory pinned. */
  def gdGridSearch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // same single-tokenize discipline as q199 (r17): 3 rounds + final
    // loss pass re-derived the features 4x before
    val feat = gdFeatures(spark, d).localCheckpoint()
    var w = gridDivisors.map(g => (g, 0L, 0L, 0L))
      .toDF("cfg", "w0", "w1", "w2")
    for (_ <- 1 to gdIters) {
      w = feat.crossJoin(broadcast(w))
        .withColumn("z", $"w0" * $"x0" + $"w1" * $"x1" + $"w2" * $"x2")
        .withColumn("p", round(least(lit(1000000.0),
          greatest(lit(0.0), lit(500000.0) + $"z" / lit(4.0)))).cast("long"))
        .withColumn("err", $"y" * 1000000L - $"p")
        .groupBy($"cfg")
        .agg(
          (max($"w0") + round(sum($"err" * $"x0") / (lit(20.0) * count(lit(1)))).cast("long")).as("w0"),
          (max($"w1") + round(sum($"err" * $"x1") / (max($"cfg").cast("double") * count(lit(1)))).cast("long")).as("w1"),
          (max($"w2") + round(sum($"err" * $"x2") / (max($"cfg").cast("double") * count(lit(1)))).cast("long")).as("w2"))
    }
    feat.crossJoin(broadcast(w))
      .withColumn("z", $"w0" * $"x0" + $"w1" * $"x1" + $"w2" * $"x2")
      .withColumn("p", round(least(lit(1000000.0),
        greatest(lit(0.0), lit(500000.0) + $"z" / lit(4.0)))).cast("long"))
      .withColumn("err", $"y" * 1000000L - $"p")
      .groupBy($"cfg")
      .agg(sum($"err" * $"err").as("loss"),
        (max($"w0") + max($"w1") + max($"w2")).as("w_sum"))
      .select($"cfg", $"loss", $"w_sum")
      .orderBy($"cfg")
  }

  val queries = Map(
    "q193_naive_bayes_lang" -> naiveBayesLang,
    "q194_pmi_collocations" -> pmiCollocations,
    "q199_gd_classifier" -> gdLinearClassifier,
    "q209_gd_grid_search" -> gdGridSearch,
  )

  val oracles = Map(
    "q193_naive_bayes_lang" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
        |            FROM documents),
        |doctok AS (SELECT doc_id, lang, w, count(*) AS m FROM tok GROUP BY 1, 2, 3),
        |classtok AS (SELECT lang AS cand, w, count(*) AS n FROM tok GROUP BY 1, 2),
        |classtot AS (SELECT lang AS cand, count(*) AS nc FROM tok GROUP BY 1),
        |dc AS (SELECT lang AS cand, count(*) AS dcnt FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS dtot FROM documents),
        |v AS (SELECT count(DISTINCT w) AS v FROM tok),
        |classes AS (
        |  SELECT cand, nc, v,
        |    CAST(round(ln(CAST(dcnt AS DOUBLE) / CAST(dtot AS DOUBLE)) * 1000000.0) AS BIGINT) AS prior_micro,
        |    CAST(round(ln(1.0 / CAST(nc + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS ll0_micro
        |  FROM classtot JOIN dc USING (cand) CROSS JOIN tot CROSS JOIN v),
        |model AS (
        |  SELECT t.cand, t.w,
        |    CAST(round(ln(CAST(t.n + 1 AS DOUBLE) / CAST(c.nc + c.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS ll_micro
        |  FROM classtok t JOIN classes c USING (cand)),
        |scores AS (
        |  SELECT d.doc_id, d.lang, c.cand,
        |    MAX(c.prior_micro) + SUM(d.m * COALESCE(m2.ll_micro, c.ll0_micro)) AS score
        |  FROM doctok d CROSS JOIN classes c
        |  LEFT JOIN model m2 ON m2.cand = c.cand AND m2.w = d.w
        |  GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT doc_id, lang, cand AS predicted
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY score DESC, cand) AS rn FROM scores)
        |  WHERE rn = 1)
        |SELECT lang, predicted, count(*) AS n_docs
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q194_pmi_collocations" ->
      s"""WITH toksrc AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS w FROM toksrc),
         |big AS (
         |  SELECT ws[i] AS w1, ws[i + 1] AS w2
         |  FROM toksrc, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g
         |  WHERE len(ws) >= 2),
         |pairs AS (SELECT w1, w2, count(*) AS cab FROM big GROUP BY 1, 2),
         |uni AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM tok) AS ntok,
         |                 (SELECT count(*) FROM big) AS btot)
         |SELECT w1, w2, cab,
         |  CAST(round(ln((CAST(cab AS DOUBLE) / btot) /
         |    ((CAST(ua.c AS DOUBLE) / ntok) * (CAST(ub.c AS DOUBLE) / ntok)))
         |    * 1000000.0) AS BIGINT) AS pmi_micro
         |FROM pairs
         |JOIN uni ua ON ua.w = pairs.w1
         |JOIN uni ub ON ub.w = pairs.w2
         |CROSS JOIN stats
         |WHERE cab >= $pmiMinCount
         |ORDER BY pmi_micro DESC, w1, w2
         |LIMIT $pmiTopK""".stripMargin,
    "q199_gd_classifier" -> {
      val enList = enTokens.map(t => s"'$t'").mkString(", ")
      val otherList = otherTokens.map(t => s"'$t'").mkString(", ")
      def round1(prev: String, cur: String): String =
        s"""s_$cur AS (
           |  SELECT f.y, f.x0, f.x1, f.x2,
           |    CAST(f.y * 1000000 AS BIGINT) -
           |      CAST(round(least(1000000.0, greatest(0.0,
           |        500000.0 + (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2) / 4.0))) AS BIGINT) AS err
           |  FROM feat f CROSS JOIN w_$prev w),
           |w_$cur AS (
           |  SELECT
           |    (SELECT w0 FROM w_$prev) + CAST(round(SUM(err*x0) / (20.0*COUNT(*))) AS BIGINT) AS w0,
           |    (SELECT w1 FROM w_$prev) + CAST(round(SUM(err*x1) / (2000.0*COUNT(*))) AS BIGINT) AS w1,
           |    (SELECT w2 FROM w_$prev) + CAST(round(SUM(err*x2) / (2000.0*COUNT(*))) AS BIGINT) AS w2
           |  FROM s_$cur)""".stripMargin
      s"""WITH feat AS (
         |  SELECT CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE 0 END AS y,
         |    CAST(1 AS BIGINT) AS x0,
         |    CAST(len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ($enList))) AS BIGINT) AS x1,
         |    CAST(len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ($otherList))) AS BIGINT) AS x2
         |  FROM documents),
         |w_0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2),
         |${round1("0", "1")},
         |${round1("1", "2")},
         |${round1("2", "3")}
         |SELECT y, pred, count(*) AS n_docs, CAST(SUM(z) AS BIGINT) AS z_sum FROM (
         |  SELECT f.y,
         |    CASE WHEN w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 > 0
         |      THEN CAST(1 AS BIGINT) ELSE 0 END AS pred,
         |    w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 AS z
         |  FROM feat f CROSS JOIN w_3 w)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "q209_gd_grid_search" -> {
      val enList = enTokens.map(t => s"'$t'").mkString(", ")
      val otherList = otherTokens.map(t => s"'$t'").mkString(", ")
      val cfgs = gridDivisors.map(g => s"($g)").mkString(", ")
      def round1(prev: String, cur: String): String =
        s"""s_$cur AS (
           |  SELECT w.cfg, f.y, f.x0, f.x1, f.x2,
           |    CAST(f.y * 1000000 AS BIGINT) -
           |      CAST(round(least(1000000.0, greatest(0.0,
           |        500000.0 + (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2) / 4.0))) AS BIGINT) AS err
           |  FROM feat f CROSS JOIN w_$prev w),
           |w_$cur AS (
           |  SELECT s.cfg,
           |    MAX(p.w0) + CAST(round(SUM(s.err*s.x0) / (20.0*COUNT(*))) AS BIGINT) AS w0,
           |    MAX(p.w1) + CAST(round(SUM(s.err*s.x1) / (CAST(s.cfg AS DOUBLE)*COUNT(*))) AS BIGINT) AS w1,
           |    MAX(p.w2) + CAST(round(SUM(s.err*s.x2) / (CAST(s.cfg AS DOUBLE)*COUNT(*))) AS BIGINT) AS w2
           |  FROM s_$cur s JOIN w_$prev p ON p.cfg = s.cfg
           |  GROUP BY s.cfg)""".stripMargin
      s"""WITH feat AS (
         |  SELECT CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE 0 END AS y,
         |    CAST(1 AS BIGINT) AS x0,
         |    CAST(len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ($enList))) AS BIGINT) AS x1,
         |    CAST(len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ($otherList))) AS BIGINT) AS x2
         |  FROM documents),
         |w_0(cfg, w0, w1, w2) AS (
         |  SELECT cfg, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  FROM (VALUES $cfgs) g(cfg)),
         |${round1("0", "1")},
         |${round1("1", "2")},
         |${round1("2", "3")}
         |SELECT w.cfg, CAST(SUM(e.err * e.err) AS BIGINT) AS loss,
         |  MAX(w.w0) + MAX(w.w1) + MAX(w.w2) AS w_sum
         |FROM (
         |  SELECT w.cfg,
         |    CAST(f.y * 1000000 AS BIGINT) -
         |      CAST(round(least(1000000.0, greatest(0.0,
         |        500000.0 + (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2) / 4.0))) AS BIGINT) AS err
         |  FROM feat f CROSS JOIN w_3 w) e
         |JOIN w_3 w ON w.cfg = e.cfg
         |GROUP BY w.cfg
         |ORDER BY w.cfg""".stripMargin
    },
  )
}
