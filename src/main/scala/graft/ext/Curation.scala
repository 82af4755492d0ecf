package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation tier (SURVEY.md §2.12 [ext]) — the text-quality
  * passes a 100-TB pretraining pipeline runs between raw ingest and
  * train-prep (the compliance/representation ops are
  * [[CurationGovernance]]; sub-document dedup is [[SpanDedup]]):
  *
  *   - q99 boilerplate detection: 5-gram document frequency across the
  *     corpus — the header/footer/template text that near-dedup misses
  *     because it rides inside otherwise-distinct documents. One
  *     explode + one map-side-combinable groupBy; the df counter
  *     shuffles (gram, partial-count) pairs, never document text.
  *   - q100 eval-contamination check: which training documents share a
  *     4-gram with the held-out eval set. The eval side of the join is
  *     tiny by nature (benchmark suites are MBs against a 100-TB
  *     corpus), so it is broadcast — the corpus side stays map-only,
  *     no shuffle of the big table at any scale.
  *   - q101 stratified sampling: per-language keep rates (down-weight
  *     the dominant language, keep the tail) via the same deterministic
  *     md5-bucket device as q91's split — no RNG, stable under re-runs
  *     and repartitioning, exactly mirrorable in SQL.
  *   - q102 intra-document repetition: Rae et al. (Gopher, 2021)-style
  *     quality signal — the fraction of a document's trigrams that are
  *     repeats. Per-document explode + groupBy on doc_id: one narrow
  *     shuffle keyed by the table's own primary key.
  *   - q108: the composite funnel over the stages above.
  */
object Curation extends QueryModule {

  private val boilerplateMinDf = 3
  private val enKeepBuckets = 128 // en kept at 128/256 = 50%, other langs 100%

  /** All n-grams of a pre-split token array, as a per-row array column. */
  private def grams(ws: Column, n: Int): Column =
    transform(sequence(lit(0), size(ws) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))

  /** DuckDB CTE producing the same DISTINCT (doc_id, gram) rows. */
  private def gramCte(n: Int): String = {
    val parts = (0 until n).map(j => s"ws[i+$j]").mkString("||' '||")
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE len(string_split(text, ' ')) >= $n
       |), sh AS (
       |  SELECT DISTINCT doc_id, $parts AS gram
       |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-${n - 1})) AS i FROM tok)
       |)""".stripMargin
  }

  /** q100's held-out eval set: every 53rd document. */
  private def isEval(docId: Column): Column = docId % 53 === 0

  /** Distinct (doc_id, gram) pairs for the whole corpus. Distinctness is
    * established PER ROW (`array_distinct` before the explode) — a
    * global `.distinct()` would shuffle every gram string a second time
    * for something each document can decide locally. */
  private def docGrams(spark: SparkSession, d: String, n: Int): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= n)
      .select($"doc_id", explode(array_distinct(grams($"toks", n))).as("gram"))
  }

  /** q99: 5-grams appearing in >= boilerplateMinDf distinct documents.
    * In production the threshold is a corpus FRACTION (a gram is
    * boilerplate when ~0.1–1% of documents carry it), derived from
    * COUNT(*) the way q43 sizes its LSH bits; on the synthetic corpus
    * the df distribution tops out at ~4 regardless of SF (word soup has
    * no real templates), so a relative cutoff would return the empty
    * set at larger SFs and demonstrate nothing — the fixed absolute
    * threshold keeps the operator observable. */
  def boilerplateNgrams(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    docGrams(spark, d, 5)
      .groupBy($"gram").agg(count(lit(1)).as("df"))
      .filter($"df" >= boilerplateMinDf)
      .orderBy($"df".desc, $"gram")
  }

  /** q100: training docs sharing any 4-gram with the eval set. The eval
    * gram table is broadcast — the corpus side never shuffles. */
  def contaminationCheck(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val g = docGrams(spark, d, 4)
    val evalGrams = g.filter(isEval($"doc_id")).select($"gram").distinct()
    g.filter(!isEval($"doc_id"))
      .join(broadcast(evalGrams), "gram")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hit"))
      .orderBy($"doc_id")
  }

  /** Deterministic bucket in [0, 256): first two hex chars of md5. */
  private def md5Bucket(c: Column): Column =
    conv(substring(md5(c), 1, 2), 16, 10).cast("int")

  /** q101: language-stratified deterministic sample, summarized. */
  def stratifiedSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val keep = md5Bucket($"doc_id".cast("string")) <
      when($"lang" === "en", enKeepBuckets).otherwise(256)
    Tables.documents(spark, d)
      .withColumn("kept", keep)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"kept", 1).otherwise(0)).cast("long").as("n_kept"),
        sum(when($"kept", $"n_chars").otherwise(0L)).cast("long").as("kept_chars"))
      .orderBy($"lang", $"source")
  }

  /** q102: per-document repeated-trigram fraction (Gopher-style).
    * Entirely per-row — total trigrams is `tokens - 2` and the distinct
    * count is `array_distinct` on the row's own gram array, so the only
    * shuffle in the plan is the output's contract ORDER BY. The oracle
    * derives the identical numbers the relational way (explode +
    * COUNT/COUNT DISTINCT per doc). */
  def docRepetition(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id",
        (size($"toks") - 2).cast("long").as("n_grams"),
        size(array_distinct(grams($"toks", 3))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        lit(1.0) - $"n_distinct".cast("double") / $"n_grams")
      .orderBy($"doc_id")
  }

  private val repMax = 0.03 // drop docs with > 3% repeated trigrams

  /** q108: the composite curation funnel — near-dup drop (keep each
    * cluster's canonical doc), repetition-quality filter, then the
    * stratified sample, reported as a per-language funnel audit (the
    * stage-by-stage retention table a corpus release ships with).
    *
    * Plan shape: every stage is a per-row predicate except the cluster
    * membership, which is a LEFT join against the checkpointed label
    * table — small (only docs that have a near-dup pair) and keyed by
    * the corpus primary key, so at 100 TB it is a broadcast or a
    * co-partitioned join, never a second pass over the text. */
  def curationPipeline(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val labels = DedupClusters.ccLabels(spark, d)
      .select($"node".as("doc_id"), $"lbl")
    val keepDedup = $"lbl".isNull || ($"lbl" === $"doc_id")
    val keepQual = keepDedup &&
      (lit(1.0) - $"n_distinct".cast("double") / $"n_grams") <= repMax
    val keepSample = keepQual && (md5Bucket($"doc_id".cast("string")) <
      when($"lang" === "en", enKeepBuckets).otherwise(256))
    Tables.documents(spark, d)
      .select($"doc_id", $"lang", $"n_chars", split($"text", " ").as("toks"))
      .select($"doc_id", $"lang", $"n_chars",
        greatest(size($"toks") - 2, lit(1)).cast("long").as("n_grams"),
        // < 3 tokens: no trigrams exist — score such docs as repetition 0
        // (n_distinct = n_grams), and never hand `sequence` a negative
        // bound (it would run backwards)
        when(size($"toks") >= 3,
            size(array_distinct(grams($"toks", 3))).cast("long"))
          .otherwise(greatest(size($"toks") - 2, lit(1)).cast("long"))
          .as("n_distinct"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(keepDedup, 1).otherwise(0)).cast("long").as("n_dedup"),
        sum(when(keepQual, 1).otherwise(0)).cast("long").as("n_quality"),
        sum(when(keepSample, 1).otherwise(0)).cast("long").as("n_final"),
        sum(when(keepSample, $"n_chars").otherwise(0L)).cast("long").as("final_chars"))
      .orderBy($"lang")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q108_curation_pipeline" -> curationPipeline,
    "q99_boilerplate_ngrams" -> boilerplateNgrams,
    "q100_contamination_check" -> contaminationCheck,
    "q101_stratified_sample" -> stratifiedSample,
    "q102_doc_repetition"    -> docRepetition,
    "q217_weighted_sample"   -> weightedSample,
  )

  private val wsTopK = 20

  /** q217: WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis 2006 order sampling — THE distributed weighted-sample
    * algorithm, because it turns "sample k by weight" into "top-k by
    * key", which Spark executes as a map-side-capped
    * TakeOrderedAndProject with no RNG coordination): each document
    * draws u ∈ (0,1] DETERMINISTICALLY from its content hash (md5 →
    * 24-bit rational — the q101 no-RNG discipline: stable under
    * re-runs and repartitioning) and ranks by ln(u)/w, the monotone
    * equivalent of u^(1/w), with w = n_chars (longer docs
    * proportionally likelier — the length-weighted corpus subsample).
    * The RANKING key is the nano-quantized ln value (both engines
    * round the same grid), doc_id tie-break, so the top-k frontier is
    * engine-independent. */
  def weightedSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val u24 = conv(substring(md5($"doc_id".cast("string")), 1, 6), 16, 10)
      .cast("long") + 1L // (0, 2^24] — never ln(0)
    Tables.documents(spark, d)
      .select($"doc_id", $"n_chars",
        round(log(u24.cast("double") / 16777216.0) / $"n_chars".cast("double") * 1e9)
          .cast("long").as("key_nano"))
      .orderBy($"key_nano".desc, $"doc_id")
      .limit(wsTopK)
      .orderBy($"key_nano".desc, $"doc_id")
  }

  val oracles = Map(
    "q108_curation_pipeline" ->
      s"""WITH RECURSIVE tok AS (
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
         |), lblmap AS (
         |  SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node
         |), tg AS (
         |  SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct
         |  FROM (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i FROM tok))
         |  GROUP BY doc_id
         |), flags AS (
         |  SELECT d.lang, d.n_chars,
         |    (l.node IS NULL OR l.lbl = d.doc_id) AS keep_dedup,
         |    (l.node IS NULL OR l.lbl = d.doc_id) AND
         |      1.0 - CAST(COALESCE(t.n_distinct, 1) AS DOUBLE)
         |          / COALESCE(t.n_grams, 1) <= $repMax AS keep_qual,
         |    (l.node IS NULL OR l.lbl = d.doc_id) AND
         |      1.0 - CAST(COALESCE(t.n_distinct, 1) AS DOUBLE)
         |          / COALESCE(t.n_grams, 1) <= $repMax AND
         |      (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |    + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1)
         |      < CASE WHEN d.lang = 'en' THEN $enKeepBuckets ELSE 256 END AS keep_sample
         |  FROM documents d
         |  LEFT JOIN tg t ON t.doc_id = d.doc_id
         |  LEFT JOIN lblmap l ON l.node = d.doc_id
         |)
         |SELECT lang, COUNT(*) AS n_raw,
         |  CAST(SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
         |  CAST(SUM(CASE WHEN keep_qual THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(SUM(CASE WHEN keep_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
         |  CAST(SUM(CASE WHEN keep_sample THEN n_chars ELSE 0 END) AS BIGINT) AS final_chars
         |FROM flags GROUP BY lang ORDER BY lang""".stripMargin,
    "q99_boilerplate_ngrams" ->
      s"""${gramCte(5)}
         |SELECT gram, COUNT(*) AS df FROM sh
         |GROUP BY gram HAVING COUNT(*) >= $boilerplateMinDf
         |ORDER BY df DESC, gram""".stripMargin,
    "q100_contamination_check" ->
      s"""${gramCte(4)},
         |ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 53 = 0),
         |tr AS (SELECT doc_id, gram FROM sh WHERE doc_id % 53 <> 0)
         |SELECT doc_id, COUNT(*) AS n_hit
         |FROM tr JOIN ev USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q101_stratified_sample" ->
      s"""WITH rated AS (
         |  SELECT lang, source, n_chars,
         |    CASE WHEN lang = 'en' THEN $enKeepBuckets ELSE 256 END AS keep_buckets,
         |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
         |  FROM documents
         |)
         |SELECT lang, source, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN bucket < keep_buckets THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN bucket < keep_buckets THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM rated GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q217_weighted_sample" -> {
      val hexSum = (0 until 6).map { i =>
        s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * ${math.pow(16, 5 - i).toLong}"
      }.mkString(" + ")
      s"""WITH hashed AS (
         |  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |keyed AS (
         |  SELECT doc_id, n_chars,
         |    CAST(round(ln((CAST($hexSum AS BIGINT) + 1) / 16777216.0)
         |      / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
         |  FROM hashed)
         |SELECT doc_id, n_chars, key_nano
         |FROM keyed
         |ORDER BY key_nano DESC, doc_id
         |LIMIT $wsTopK""".stripMargin
    },
    "q102_doc_repetition" ->
      s"""WITH tg AS (
         |  SELECT doc_id, ws[i]||' '||ws[i+1]||' '||ws[i+2] AS gram
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i
         |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |              WHERE len(string_split(text, ' ')) >= 3))
         |)
         |SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct,
         |  1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*) AS rep_ratio
         |FROM tg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
