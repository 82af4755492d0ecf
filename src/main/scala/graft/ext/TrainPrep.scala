package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation tier (SURVEY.md §2.12 [ext] — the
  * operations a 100-TB LLM corpus pipeline needs between cleaning and
  * the trainer):
  *
  *   - q91 leakage-safe train/test split: the unit of assignment is the
  *     document's SOURCE, not the document — every document of a source
  *     lands in the same split, so near-duplicate documents within a
  *     source can never straddle the train/test boundary (the classic
  *     eval-contamination leak). Assignment is a pure deterministic
  *     hash of the source key: no shuffle at all for the split itself,
  *     stable under re-runs and re-partitioning, and any desired ratio
  *     is a threshold on the 256-bucket space (205/256 ≈ 80/20).
  *   - q92 token-budget shard packing: the concat-and-chunk layout —
  *     documents are packed in deterministic order into shards of
  *     ≤ budget tokens by cumulative token offset. Packing is PER
  *     SOURCE (window partitioned by source, ordered by doc_id): each
  *     group packs sequentially, groups pack in parallel — the
  *     scale-correct form; a single global ordered cumsum would
  *     serialize the corpus through one partition at 100 TB.
  *
  * md5 is the one hash both engines compute identically (lowercase
  * hex), so the split is oracle-mirrored bucket for bucket.
  */
object TrainPrep extends QueryModule {

  /** Deterministic bucket in [0, 256): first two hex chars of md5. */
  private def md5Bucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 2), 16, 10).cast("int")

  private val trainBuckets = 205 // of 256 ≈ 80/20
  private val shardBudget = 512  // tokens per packed shard

  /** The assignment itself: adds the `split` column keyed on source. */
  def assignSplit(docs: DataFrame): DataFrame =
    docs.withColumn("split",
      when(md5Bucket(col("source")) < trainBuckets, "train").otherwise("test"))

  /** q91: group-aware 80/20 split, summarized per (split, lang). */
  def trainTestSplit(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    assignSplit(Tables.documents(spark, d))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct($"source").as("n_sources"),
           sum($"n_chars").as("total_chars"))
      .orderBy($"split", $"lang")
  }

  /** q92: per-source token-budget packing, one row per packed shard. */
  def tokenPacking(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, d)
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .withColumn("off", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("shard_idx", floor($"off" / shardBudget))
      .groupBy($"source", $"shard_idx")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").as("shard_tokens"),
           min($"doc_id").as("first_doc"),
           max($"doc_id").as("last_doc"))
      .orderBy($"source", $"shard_idx")
  }

  private val chunkLen = 64    // tokens per chunk
  private val chunkStride = 48 // overlap = chunkLen - chunkStride = 16

  /** q138: overlapping document chunking — the split-before-tokenize
    * step for context-window-bounded training: each document becomes
    * ⌊(n−1)/stride⌋+1 chunks of ≤ [[chunkLen]] tokens starting every
    * [[chunkStride]] (16-token overlap so no span is ever cut without
    * a chunk that contains it whole). Pure per-row explode inside
    * codegen — map-only, no shuffle, chunk count ∝ corpus tokens.
    * Chunks are reported content-exact as md5 so the dump stays
    * metadata-sized; every token position is covered by ≥1 chunk
    * (coverage law in TrainPrepSpec). */
  def docChunking(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("n", size($"toks"))
      .withColumn("k", explode(sequence(lit(0L), expr(s"(n - 1) div $chunkStride"))))
      .withColumn("chunk",
        slice($"toks", ($"k" * chunkStride + 1).cast("int"), lit(chunkLen)))
      .select($"doc_id", $"k".cast("long").as("chunk_idx"),
        size($"chunk").cast("long").as("n_tokens_chunk"),
        md5(concat_ws(" ", $"chunk")).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** q153: content-defined chunking — boundaries chosen by a rolling
    * content hash (FastCDC's idea at token granularity), not by offset.
    * A position starts a new chunk iff the md5 of its adjacent token
    * PAIR ends in nibble '0' (p = 1/16 → expected ~16-token chunks).
    * Because the predicate sees only local content, an edit near the
    * start of a document re-chunks ONLY up to the first surviving
    * boundary; every later chunk is byte-identical — the property that
    * lets chunk-level dedup recognize a re-crawled page with a changed
    * header, where q138's fixed-stride chunks all shift and nothing
    * matches (edit-locality law + the stride contrast in TrainPrepSpec).
    *
    * Scale shape: boundary positions, chunk spans and chunk hashes are
    * all computed INSIDE array land (filter/slice HOFs over the token
    * array) — a pure map-only explode, no window, no shuffle; the known
    * caveat of plain pair-hash CDC (no min/max chunk-size clamp, so a
    * run of identical pairs can fragment) is accepted for determinism
    * and documented rather than patched with the sequential clamp. */
  def cdcChunks(docs: DataFrame): DataFrame = {
    // Formulation note (measured, zipf corpus, 50k docs): the "pure
    // array-land" version (filter/slice HOFs computing boundary
    // positions inside the token array) is shuffle-free but 4-5x
    // slower wall-clock — Spark's higher-order functions are
    // CodegenFallback, so the per-position md5 lambda runs interpreted.
    // This explode -> window -> group form pays one doc_id shuffle and
    // keeps every per-position expression inside whole-stage codegen;
    // the window partitions by document, so no global sort exists.
    val wSeq = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val wCum = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("i0", "tok")))
      .withColumn("i", col("i0") + 1)
      .withColumn("prev", lag(col("tok"), 1).over(wSeq))
      .withColumn("b",
        when(col("i") === 1, 1)
          .when(substring(md5(concat(col("prev"), lit(" "), col("tok"))), 32, 1) === "0", 1)
          .otherwise(0))
      .withColumn("chunk_idx", (sum(col("b")).over(wCum) - 1).cast("long"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        min(col("i")).cast("long").as("start_pos"),
        count(lit(1)).as("n_tokens_chunk"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("i"), col("tok")))),
            x => x.getField("tok")))).as("chunk_md5"))
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"),
        col("n_tokens_chunk"), col("chunk_md5"))
  }

  /** q153 over the corpus table, contract-ordered. */
  def cdcChunking(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    cdcChunks(Tables.documents(spark, d).select($"doc_id", $"text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  private val currShards = 8

  /** q156: curriculum-ordered global shuffle — the deterministic
    * training order a trainer consumes: every document gets a shard
    * (content-hash of doc_id, so assignment is reproducible and
    * independent of input layout) and a position within its shard
    * ordered by curriculum phase (clean high-diversity docs first,
    * flagged docs second, short fragments last — coarse-to-hard), with
    * an md5 scramble WITHIN each phase so the order is a seeded shuffle,
    * not an accidental corpus order (adjacent crawl docs correlate; a
    * trainer must never see them adjacent).
    *
    * Scale shape: shard assignment and phase scoring are map-only; the
    * within-shard position is a per-shard sort, so parallelism = shard
    * count. 8 shards matches the fixture; a 100-TB run sets shards ≈
    * output-file count (tens of thousands), keeping each sort
    * executor-sized. No global sort exists at any shard count. */
  def curriculumShards(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"shard").orderBy($"phase", $"scramble", $"doc_id")
    Tables.documents(spark, d)
      .withColumn("toks", split(lower($"text"), " "))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("uniq_micro",
        expr("(size(array_distinct(toks)) * 1000000L) div size(toks)"))
      .withColumn("phase",
        when($"n_tokens" < 10, 2L).when($"uniq_micro" > 300000L, 0L).otherwise(1L))
      .withColumn("shard",
        (md5Bucket($"doc_id".cast("string")) % currShards).cast("long"))
      .withColumn("scramble",
        substring(md5(concat($"doc_id".cast("string"), lit(":curriculum"))), 1, 8))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"shard", $"phase", $"pos")
      .orderBy($"shard", $"pos")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q91_train_test_split" -> trainTestSplit,
    "q92_token_packing"    -> tokenPacking,
    "q138_doc_chunking"    -> docChunking,
    "q153_cdc_chunking"    -> cdcChunking,
    "q156_curriculum_shards" -> curriculumShards,
  )

  val oracles = Map(
    "q91_train_test_split" ->
      s"""WITH split_docs AS (
         |  SELECT *, CASE WHEN
         |      (strpos('0123456789abcdef', substr(md5(source), 1, 1)) - 1) * 16
         |    + (strpos('0123456789abcdef', substr(md5(source), 2, 1)) - 1)
         |      < $trainBuckets
         |    THEN 'train' ELSE 'test' END AS split
         |  FROM documents
         |)
         |SELECT split, lang, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT source) AS n_sources,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM split_docs
         |GROUP BY split, lang
         |ORDER BY split, lang""".stripMargin,
    "q92_token_packing" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents
         |), packed AS (
         |  SELECT doc_id, source, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM toks
         |)
         |SELECT source, CAST(FLOOR(off / $shardBudget) AS BIGINT) AS shard_idx,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM packed
         |GROUP BY source, shard_idx
         |ORDER BY source, shard_idx""".stripMargin,
    "q138_doc_chunking" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |    len(string_split(text, ' ')) AS n
         |  FROM documents
         |), ks AS (
         |  SELECT doc_id, toks, n,
         |    unnest(generate_series(0, (n - 1) // $chunkStride)) AS k
         |  FROM t
         |)
         |SELECT doc_id, k AS chunk_idx,
         |  CAST(len(toks[k*$chunkStride+1 : least(k*$chunkStride+$chunkLen, n)]) AS BIGINT) AS n_tokens_chunk,
         |  md5(array_to_string(toks[k*$chunkStride+1 : least(k*$chunkStride+$chunkLen, n)], ' ')) AS chunk_md5
         |FROM ks
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q153_cdc_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, toks, n,
        |    list_prepend(1, CASE WHEN n >= 2 THEN
        |      list_filter(generate_series(2, n),
        |        i -> substr(md5(toks[i-1] || ' ' || toks[i]), 32, 1) = '0')
        |      ELSE [] END) AS bpos
        |  FROM t),
        |c AS (
        |  SELECT doc_id, toks, n, bpos, g.i AS ki, bpos[g.i] AS start_pos
        |  FROM b, LATERAL (SELECT unnest(generate_series(1, len(bpos))) AS i) g)
        |SELECT doc_id,
        |  CAST(ki - 1 AS BIGINT) AS chunk_idx,
        |  CAST(start_pos AS BIGINT) AS start_pos,
        |  CAST(COALESCE(bpos[ki + 1], n + 1) - start_pos AS BIGINT) AS n_tokens_chunk,
        |  md5(array_to_string(
        |    toks[start_pos : COALESCE(bpos[ki + 1], n + 1) - 1], ' ')) AS chunk_md5
        |FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q156_curriculum_shards" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    len(string_split(lower(text), ' ')) AS n_tokens,
         |    (len(list_distinct(string_split(lower(text), ' '))) * 1000000)
         |      // len(string_split(lower(text), ' ')) AS uniq_micro,
         |    ( (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |    + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
         |    ) % $currShards AS shard,
         |    substr(md5(CAST(doc_id AS VARCHAR) || ':curriculum'), 1, 8) AS scramble
         |  FROM documents),
         |phased AS (
         |  SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |    CAST(CASE WHEN n_tokens < 10 THEN 2
         |              WHEN uniq_micro > 300000 THEN 0
         |              ELSE 1 END AS BIGINT) AS phase,
         |    scramble
         |  FROM scored)
         |SELECT doc_id, shard, phase,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
         |    ORDER BY phase, scramble, doc_id) AS BIGINT) AS pos
         |FROM phased
         |ORDER BY shard, pos""".stripMargin,
  )
}
