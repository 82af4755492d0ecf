package graft.ext

import graft.QueryModule
import graft.ingest.{Landing, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis tier (SURVEY.md §2.12 [ext]): tokenization + term
  * statistics, TF-IDF, n-gram language-ID heuristic, quality scoring,
  * token counting, and rolling-hash document fingerprinting — the text
  * half of a training-data pipeline.
  *
  * Scale shape: every query is explode → groupBy (one shuffle keyed on
  * term/doc) or pure per-row scalar expressions inside whole-stage
  * codegen. No collect, no crossJoin; the only broadcast is the 1-row
  * corpus-size scalar for IDF. All arithmetic is integer or
  * identical-op-order double, so every query is DuckDB-oracle-checked.
  */
object TextOps extends QueryModule {

  /** (doc_id, term) exploded token rows, lowercased. */
  private def tokens(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
  }

  /** E4: corpus term statistics — occurrences + document frequency. */
  def termCounts(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    tokens(spark, d)
      .groupBy($"term")
      .agg(count(lit(1)).as("n_occurrences"),
           countDistinct($"doc_id").as("n_docs"))
      .orderBy($"term")
  }

  /** E4: TF-IDF, top-3 terms per document. IDF's corpus size N is a
    * 1-row aggregate broadcast-joined on a constant key — no collect.
    * score = tf · ln(N/df) evaluated in the same op order in both legs. */
  def tfidfTopTerms(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // MEASURED both ways (r17, guide §2.4): pre-repartitioning the
    // doc-grain text by doc_id lets ONE exchange satisfy both the
    // (doc_id, term) aggregate (subset partitioning qualifies) and the
    // per-doc window — plan drops 16 → 14 exchanges
    // (plans/r17/q32_repartition_rejected.txt) and at sf1 it wins
    // ×1.40 (3.06 → 2.19 s) — but at the bench SF it LOSES ×0.82
    // (1.22 → 1.48 s): the explicit repartition stage costs more than
    // the two AQE-coalesced micro-shuffles it replaces. The crossover
    // sits between the driver's SFs, so the code stays in the
    // measured-faster-at-bench shape; at true cluster scale the
    // one-exchange form is the right plan and the sf1 numbers are the
    // evidence (SCALING.md r17 section).
    val tf = tokens(spark, d).groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, d).agg(count(lit(1)).as("n_docs_total"))
      .withColumn("one", lit(1))
    // df is the term DICTIONARY — vocabulary-sized, orders of magnitude
    // smaller than the (doc, term) matrix — so broadcast it instead of
    // re-shuffling tf on term: tf keeps its (doc_id, term) partitioning
    // and flows map-side into the per-doc window. (A beyond-memory
    // vocabulary would fall back to the shuffle join.)
    val scored = tf.join(broadcast(df), "term")
      .withColumn("one", lit(1))
      .join(broadcast(n), "one")
      .withColumn("score", $"tf" * log($"n_docs_total".cast("double") / $"df"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"term", $"tf", $"df", round($"score", 6).as("score"), $"rnk")
      .orderBy($"doc_id", $"rnk")
  }

  /** E4: language-ID heuristic — character-trigram profiles per labeled
    * language (top-40 trigrams by frequency), score = |doc trigrams ∩
    * profile|, predict argmax. Output is the confusion matrix. All
    * integer arithmetic. */
  def langId(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    def tri = docs.select($"doc_id", $"lang",
      explode(transform(sequence(lit(1), length($"text") - 2),
        i => $"text".substr(i, lit(3)))).as("tg"))
    // Two checkpointed artifacts (not persist()ed — that leaked cache
    // blocks for the JVM lifetime with no unpersist hook): the trained
    // per-language profile (the MODEL a production lang-id ships) and
    // the per-doc distinct-trigram table; the raw trigram explode is
    // paid once at build, never in the scoring path.
    val profW = Window.partitionBy($"plang").orderBy($"cnt".desc, $"tg")
    val profile = Landing.ensureParquetFixture(
      tri.groupBy($"lang".as("plang"), $"tg")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prnk", row_number().over(profW))
        .filter($"prnk" <= 40)
        .select($"plang", $"tg"),
      d, "langid_profile")
    val docTri = Landing.ensureParquetFixture(
      tri.select($"doc_id", $"tg").distinct(), d, "langid_doctri")
    val scores = docTri.join(broadcast(profile), "tg")
      .groupBy($"doc_id", $"plang").agg(count(lit(1)).as("score"))
    val predW = Window.partitionBy($"doc_id").orderBy($"score".desc, $"plang")
    val pred = scores.withColumn("rn", row_number().over(predW))
      .filter($"rn" === 1)
      .select($"doc_id", $"plang".as("lang_pred"))
    docs.select($"doc_id", $"lang".as("lang_actual"))
      .join(pred, "doc_id")
      .groupBy($"lang_actual", $"lang_pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang_actual", $"lang_pred")
  }

  private val stopwords = Seq("the", "a", "of", "to", "in", "and")

  /** E4: per-document quality scoring — token counts, stopword/unique
    * ratios, mean token length, and a quality bucket. Pure per-row
    * scalar pipeline (whole-stage codegen, no shuffle at all). */
  def qualityScore(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .withColumn("toks", split(lower($"text"), " "))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("n_uniq", size(array_distinct($"toks")).cast("long"))
      .withColumn("n_stop",
        size(filter($"toks", t => t.isInCollection(stopwords))).cast("long"))
      .withColumn("sum_len",
        aggregate($"toks", lit(0L), (a, t) => a + length(t)))
      .withColumn("stop_ratio", $"n_stop".cast("double") / $"n_tokens")
      .withColumn("uniq_ratio", $"n_uniq".cast("double") / $"n_tokens")
      .withColumn("avg_token_len", $"sum_len".cast("double") / $"n_tokens")
      .withColumn("quality",
        when($"n_tokens" < 10, "short")
          .when($"uniq_ratio" > 0.3, "good")
          .otherwise("flagged"))
      .select($"doc_id", $"n_tokens", $"n_uniq", $"n_stop", $"sum_len",
        $"stop_ratio", $"uniq_ratio", $"avg_token_len", $"quality")
      .orderBy($"doc_id")
  }

  /** E4: token counting per source — whitespace tokens and a BPE-ish
    * greedy-chunk regex tokenizer (≤3-letter chunks / digit runs /
    * other), aggregated per source. */
  def tokenStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val bpePattern = "[a-z]{1,3}|[0-9]+|\\S"
    Tables.documents(spark, d)
      .withColumn("n_ws", size(split($"text", " ")).cast("long"))
      .withColumn("n_bpe", size(regexp_extract_all($"text", lit(bpePattern), lit(0))).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_ws").as("ws_tokens"),
           sum($"n_bpe").as("bpe_tokens"))
      .withColumn("avg_ws_tokens", $"ws_tokens".cast("double") / $"n_docs")
      .orderBy($"source")
  }

  private val P = 1000000007L

  /** Char-fold token hash (base 31 mod [[P]]) — shared by the q40
    * fingerprint and the q129 classifier; both oracles mirror this
    * exact formula, so there is ONE copy to keep in lockstep. */
  private def tokCode(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1))).cast("long")),
      lit(0L), (a, c) => (a * 31L + c) % P)

  /** E4: polynomial rolling-hash fingerprint — chars fold into a token
    * code (base 31 mod p), token codes fold into the document
    * fingerprint (base 131 mod p). Nested array folds, all inside
    * codegen; no shuffle. */
  def rollingFingerprint(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .withColumn("toks", split(lower($"text"), " "))
      .withColumn("fingerprint",
        aggregate(transform($"toks", t => tokCode(t)), lit(0L), (a, c) => (a * 131L + c) % P))
      .select($"doc_id", $"fingerprint")
      .orderBy($"doc_id")
  }

  /** Hashed-feature space size and weight-table modulus for the linear
    * classifier: 2^12 buckets, weights in milli-units −1000..1000 via a
    * Knuth multiplicative scramble of the bucket id. */
  private val clsBuckets = 4096L
  private val clsScramble = 2654435761L
  private val clsMod = 2001L

  /** E4: hashed linear text classifier — the fastText-style quality
    * model shape (bag of hashed tokens → frozen linear weights → logit
    * → keep/drop). In production the weight table is the output of
    * offline training and arrives broadcast; here it is a deterministic
    * pseudo-weight function of the bucket id (a Knuth multiplicative
    * scramble) so the oracle can mirror it exactly, and the logit is
    * kept in integer milli-units — no float path anywhere, bit-exact on
    * both engines.
    *
    * Scale shape: pure per-row scalar work (char-fold hash → bucket →
    * weight → sum) entirely inside whole-stage codegen; zero shuffles,
    * zero joins — a map-only corpus pass, the cheapest possible 100-TB
    * plan. A real weight table swaps the weight lambda for a broadcast
    * map lookup; nothing else changes. */
  def qualityClassifier(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tokWeight = (t: org.apache.spark.sql.Column) =>
      ((tokCode(t) % clsBuckets) * clsScramble) % clsMod - (clsMod - 1L) / 2L
    Tables.documents(spark, d)
      .withColumn("toks", split(lower($"text"), " "))
      .withColumn("logit_milli",
        aggregate(transform($"toks", tokWeight), lit(0L), (a, c) => a + c))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        $"logit_milli",
        ($"logit_milli" > 0L).as("keep"))
      .orderBy($"doc_id")
  }

  private val vocabSize = 1000
  private val encodeLen = 16 // positions encoded per doc (prefix)

  /** Frequency-ranked vocabulary: top-[[vocabSize]] tokens by corpus
    * count (ties broken lexically), id 1..V — trained once per corpus
    * and checkpointed, the tokenizer-artifact pattern.
    *
    * The heavy step — selecting the top V of the full term relation —
    * is `orderBy(...).limit(V)`, which Spark plans as a distributed
    * TakeOrderedAndProject (per-partition top-V, then a V-sized merge),
    * NOT a full-relation single-partition sort. Only the V surviving
    * rows pass through the id-assigning window, so the single partition
    * it funnels through is bounded by [[vocabSize]], not the corpus. */
  def vocab(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Landing.ensureParquetFixture(
      tokens(spark, d).groupBy($"term").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"term").limit(vocabSize)
        .withColumn("id", row_number().over(
          Window.orderBy($"cnt".desc, $"term")).cast("long"))
        .select($"term", $"id"),
      d, "vocab_top1000")
  }

  /** E4: vocabulary encoding — text to token-id sequences, the final
    * text→ints step before training. The vocabulary is the stored
    * artifact above (broadcast at encode time: V rows, never a
    * corpus-sized shuffle); out-of-vocabulary tokens map to 0. Only the
    * first [[encodeLen]] positions are emitted here to keep the result
    * relation bounded — the full encode is the same plan with the
    * slice removed. One broadcast hash join inside codegen; cost is a
    * single corpus pass. */
  def vocabEncode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val v = vocab(spark, d)
    Tables.documents(spark, d)
      .select($"doc_id",
        posexplode(slice(split(lower($"text"), " "), 1, encodeLen))
          .as(Seq("pos0", "term")))
      .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"term")
      .join(broadcast(v), Seq("term"), "left")
      .select($"doc_id", $"pos", coalesce($"id", lit(0L)).as("token_id"))
      .orderBy($"doc_id", $"pos")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q23_term_counts"         -> termCounts,
    "q32_tfidf_top_terms"     -> tfidfTopTerms,
    "q35_lang_id"             -> langId,
    "q36_quality_score"       -> qualityScore,
    "q37_token_stats"         -> tokenStats,
    "q40_rolling_fingerprint" -> rollingFingerprint,
    "q129_quality_classifier" -> qualityClassifier,
    "q139_vocab_encode"       -> vocabEncode,
  )

  val oracles = Map(
    "q23_term_counts" ->
      """SELECT w AS term, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |GROUP BY term
        |ORDER BY term""".stripMargin,
    "q32_tfidf_top_terms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df, tf * ln(CAST(nd AS DOUBLE) / df) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, ROUND(score, 6) AS score, rnk
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |      FROM scored)
        |WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "q35_lang_id" ->
      """WITH tri AS (
        |  SELECT doc_id, lang, substr(text, i, 3) AS tg
        |  FROM (SELECT doc_id, lang, text, unnest(generate_series(1, length(text) - 2)) AS i
        |        FROM documents)
        |), profile AS (
        |  SELECT plang, tg FROM (
        |    SELECT lang AS plang, tg, count(*) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY count(*) DESC, tg) AS prnk
        |    FROM tri GROUP BY lang, tg)
        |  WHERE prnk <= 40
        |), doctri AS (SELECT DISTINCT doc_id, tg FROM tri),
        |scores AS (
        |  SELECT doc_id, plang, count(*) AS score
        |  FROM doctri JOIN profile USING (tg) GROUP BY 1, 2
        |), pred AS (
        |  SELECT doc_id, plang AS lang_pred FROM (
        |    SELECT doc_id, plang,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
        |    FROM scores)
        |  WHERE rn = 1)
        |SELECT d.lang AS lang_actual, p.lang_pred, count(*) AS n_docs
        |FROM documents d JOIN pred p USING (doc_id)
        |GROUP BY 1, 2
        |ORDER BY lang_actual, lang_pred""".stripMargin,
    "q36_quality_score" ->
      """SELECT doc_id,
        |  len(ws) AS n_tokens,
        |  len(list_distinct(ws)) AS n_uniq,
        |  len(list_filter(ws, t -> t IN ('the','a','of','to','in','and'))) AS n_stop,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(ws, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS sum_len,
        |  CAST(len(list_filter(ws, t -> t IN ('the','a','of','to','in','and'))) AS DOUBLE) / len(ws) AS stop_ratio,
        |  CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS uniq_ratio,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(ws, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS DOUBLE) / len(ws) AS avg_token_len,
        |  CASE WHEN len(ws) < 10 THEN 'short'
        |       WHEN CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) > 0.3 THEN 'good'
        |       ELSE 'flagged' END AS quality
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q37_token_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-z]{1,3}|[0-9]+|\S'))) AS BIGINT) AS bpe_tokens,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_ws_tokens
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q40_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
        |    string_split(lower(text), ' '),
        |    t -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
        |           generate_series(1, length(t)),
        |           i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
        |         (a, c) -> (a * 31 + c) % 1000000007))),
        |  (a, c) -> (a * 131 + c) % 1000000007) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q129_quality_classifier" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
         |      string_split(lower(text), ' '),
         |      t -> ((list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
         |              generate_series(1, length(t)),
         |              i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
         |            (a, c) -> (a * 31 + c) % 1000000007)
         |            % $clsBuckets) * $clsScramble) % $clsMod - ${(clsMod - 1L) / 2L})),
         |    (a, c) -> a + c) AS logit_milli
         |  FROM documents)
         |SELECT doc_id, n_tokens, logit_milli, logit_milli > 0 AS keep
         |FROM scored
         |ORDER BY doc_id""".stripMargin,
    "q139_vocab_encode" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
         |), vocab AS (
         |  SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY count(*) DESC, term) AS BIGINT) AS id
         |  FROM tok GROUP BY term
         |  QUALIFY id <= $vocabSize
         |), pref AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS term
         |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
         |       LATERAL (SELECT unnest(generate_series(1, least($encodeLen, len(ws)))) AS i) g
         |)
         |SELECT doc_id, pos, COALESCE(id, 0) AS token_id
         |FROM pref LEFT JOIN vocab USING (term)
         |ORDER BY doc_id, pos""".stripMargin,
  )
}
