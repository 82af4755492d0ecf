package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-corpus SPAN dedup (SURVEY.md §2.12 E1+) — the C4 rule at
  * sub-document granularity, between whole-doc dedup (q22) and intra-doc
  * repetition scoring (q102). */
object SpanDedup extends QueryModule {

  private[graft] val spanLen = 8 // tokens per dedup span

  /** (doc_id, span_idx, span) rows: each document cut into
    * non-overlapping [[spanLen]]-token spans — shared by q145 and its
    * spec so they can never extract differently. */
  private[graft] def spansOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("k", explode(sequence(lit(0L), expr(s"(size(toks) - 1) div $spanLen"))))
      .select($"doc_id", $"k".as("span_idx"),
        concat_ws(" ", slice($"toks", ($"k" * spanLen + 1).cast("int"), lit(spanLen)))
          .as("span"))
  }

  /** E1+/E+: cross-corpus SPAN dedup with document reassembly — the C4
    * rule ("any span occurring more than once in the corpus is removed
    * from every document but the first") at 8-token granularity. Documents
    * are cut into non-overlapping spans, the FIRST occurrence of each
    * span content (in (doc_id, span_idx) order) is kept, and each
    * document is reassembled from its surviving spans in order.
    *
    * Scale shape: the first occurrence per span is a `min(struct)`
    * AGGREGATE — partial-aggregated map-side, so a hot span (a blank or
    * boilerplate line, precisely what span dedup exists to remove in a
    * real corpus) costs one combiner cell per task, never a one-reducer
    * sort of its full occurrence list (a row_number window partitioned
    * by span would do exactly that — review r5). Two content-keyed
    * shuffles (dedup join, doc-keyed reassembly); per-doc reassembly
    * state is bounded by document length. The cleaned text rides as
    * md5 so the relation stays metadata-sized. */
  def spanDedup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val spans = spansOf(Tables.documents(spark, d))
    val first = spans.groupBy($"span")
      .agg(min(struct($"doc_id", $"span_idx")).as("first_occ"))
    spans.join(first, "span")
      .withColumn("keep", struct($"doc_id", $"span_idx") === $"first_occ")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(when($"keep", struct($"span_idx", $"span")))),
            x => x.getField("span")),
          " ")).as("clean_md5"))
      .orderBy($"doc_id")
  }

  private[graft] val gramLen = 30 // chars per overlapping audit gram

  /** q200: EXACT-SUBSTRING duplication audit — the character-level,
    * stride-1 counterpart of q145's token spans, and the measurement
    * primitive behind suffix-array training-data dedup (Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better":
    * duplicated length-L substrings, not whole docs, are what inflate
    * memorization). Every overlapping [[gramLen]]-char substring is a
    * position; a position is DUPLICATED iff its exact string occurs at
    * ≥2 positions anywhere in the corpus (other docs or elsewhere in
    * the same doc — both matter for memorization). Per document:
    * gram positions, duplicated positions, and the integer milli
    * duplication fraction — the per-doc signal a curation pass
    * thresholds on.
    *
    * Scale shape: one groupBy(gram) + one join-back — q145's exact
    * min-struct/aggregate posture at stride 1 (the aggregate is
    * map-side combinable, so the blank-line-everywhere hot gram costs
    * one combiner cell per task). Stride-1 grams multiply the corpus
    * by L bytes; at 100 TB the production variant groups 8-byte
    * rolling hashes first and exact-verifies only colliding buckets
    * (two-tier, same result by construction since verification is
    * exact) — stated rather than silently assumed, the q30/q42
    * finder-vs-evidence split at substring granularity. */
  def substringAudit(spark: SparkSession, d: String): DataFrame =
    auditOf(Tables.documents(spark, d))

  /** The audit over an arbitrary (doc_id, text) frame — exposed so the
    * spec can plant a verbatim copy and assert it audits at 1000‰. */
  private[graft] def auditOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .filter(length($"text") >= gramLen)
      .select($"doc_id", $"text",
        explode(sequence(lit(1), length($"text") - (gramLen - 1))).as("i"))
      .select($"doc_id", expr(s"substr(text, i, $gramLen)").as("g"))
    // One pass instead of two (r16, guide §2.3/§2.4): the old
    // groupBy(g) + join-back referenced `grams` from two subtrees, so
    // the stride-1 explode (1.3M 30-char substrings at sf0.1)
    // materialized TWICE and raw positions shuffled TWICE (once
    // partial-aggregated, once raw for the join). Pre-aggregating to
    // (g, doc_id) grain — map-side combinable, and a doc's grams
    // originate in its own input partition so within-doc repeats
    // combine before the exchange — then a window-sum over g serves
    // the global count without re-reading positions: one explode, two
    // exchanges, and the per-doc readout sums k instead of counting
    // rows. Identical arithmetic: c = Σ_doc k is the gram's global
    // occurrence count; n_grams = Σ_g k; n_dup = Σ_{g: c≥2} k.
    // (The window partitions by gram CONTENT — a corpus-hot gram is a
    // hot partition, which AQE cannot split for windows; that regime
    // is exactly what the two-tier q226 production variant bounds.)
    val dgc = grams.groupBy($"g", $"doc_id").agg(count(lit(1)).as("k"))
    dgc.withColumn("c", sum($"k").over(Window.partitionBy($"g")))
      .groupBy($"doc_id")
      .agg(sum($"k").as("n_grams"),
        sum(when($"c" >= 2, $"k").otherwise(0L)).as("n_dup"))
      .withColumn("dup_milli", expr("(1000 * n_dup) div n_grams"))
      .orderBy($"doc_id")
  }

  /** q226 (r8): the TWO-TIER production formulation of the q200 audit —
    * the 100-TB path that q200's Scaladoc promised ("group 8-byte
    * rolling hashes first, exact-verify only colliding buckets"), now
    * registered and oracle-checked against the same exact SQL.
    *
    * Tier 1 shuffles one 8-byte polynomial rolling hash per position
    * (codegen'd [[graft.functions.SubstrRollingHash]]) instead of the
    * L-char gram string — the corpus-wide shuffle shrinks from ~L
    * bytes/position to 8, and the groupBy is map-side combinable.
    * Tier 2 re-derives gram STRINGS only for positions whose hash
    * bucket holds ≥2 members (one doc-keyed join back to text — a
    * second corpus scan, but the gram shuffle is now candidate-bounded:
    * duplicated positions plus the hash-collision noise floor, vs
    * EVERY position in q200's stride-1 form).
    *
    * Identical output by construction: equal strings ⇒ equal hashes,
    * so every truly-duplicated position is a candidate; tier 2's exact
    * string groupBy counts each candidate gram's GLOBAL occurrence
    * count (all occurrences of a colliding string are candidates) and
    * rejects hash-collision false positives. SCALING.md carries the
    * measured candidate-volume-vs-gram-volume ratio on the Zipf corpus. */
  def substringAuditTwoTier(spark: SparkSession, d: String): DataFrame =
    twoTierAuditOf(Tables.documents(spark, d))

  private[graft] def twoTierAuditOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val eligible = docs.filter(length($"text") >= gramLen)
    // tier 1: (doc_id, position, 8-byte hash) — no gram strings yet.
    // Bucket sizes come from a count-window over the SAME shuffled rows
    // (r16, guide §2.4): the old groupBy(h) + join-back referenced
    // `pos` from two subtrees, so the rolling-hash explode ran TWICE
    // and positions crossed two exchanges; the window form explodes
    // once and shuffles once (the window's by-h exchange is the join's
    // by-h exchange, minus the second pipeline).
    val pos = eligible
      .select($"doc_id",
        posexplode(call_function("graft_rolling_hashes", $"text", lit(gramLen))))
      .toDF("doc_id", "p", "h")
    val cand = pos
      .withColumn("hc", count(lit(1)).over(Window.partitionBy($"h")))
      .filter($"hc" >= 2).select($"doc_id", $"p")
    // tier 2: materialize candidate grams only; exact counts are global
    // counts for these grams (all occurrences of a colliding string are
    // candidates), so c >= 2 is exactly q200's duplication predicate.
    // Same single-pass shape as tier 1 (and as q200's r16 form): the
    // candidate grams pre-aggregate to (g, doc_id) grain, the global
    // count is a window-sum over g, and the per-doc dup count sums k —
    // one candidate-gram materialization instead of two.
    val grams = cand.join(eligible.select($"doc_id", $"text"), "doc_id")
      .select($"doc_id", expr(s"substr(text, p + 1, $gramLen)").as("g"))
    val dgc = grams.groupBy($"g", $"doc_id").agg(count(lit(1)).as("k"))
    val dup = dgc.withColumn("c", sum($"k").over(Window.partitionBy($"g")))
      .filter($"c" >= 2)
      .groupBy($"doc_id").agg(sum($"k").as("dup0"))
    // n_grams needs no explode at all: positions = length - (L-1)
    eligible
      .select($"doc_id", (length($"text") - (gramLen - 1)).cast("long").as("n_grams"))
      .join(dup, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams", coalesce($"dup0", lit(0L)).as("n_dup"))
      .withColumn("dup_milli", expr("(1000 * n_dup) div n_grams"))
      .orderBy($"doc_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q145_span_dedup" -> spanDedup,
    "q200_substring_audit" -> substringAudit,
    "q226_substring_audit_2tier" -> substringAuditTwoTier,
  )

  val oracles = Map(
    "q145_span_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |), b AS (
         |  SELECT doc_id, k AS span_idx,
         |    array_to_string(ws[k*$spanLen+1 : least(k*$spanLen+$spanLen, len(ws))], ' ') AS span
         |  FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws)-1)//$spanLen)) AS k FROM t)
         |), flag AS (
         |  SELECT doc_id, span_idx, span,
         |    ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, span_idx) = 1 AS keep
         |  FROM b
         |)
         |SELECT doc_id, COUNT(*) AS n_spans,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  md5(COALESCE(string_agg(CASE WHEN keep THEN span END, ' ' ORDER BY span_idx), '')) AS clean_md5
         |FROM flag
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "q200_substring_audit" ->
      s"""WITH g AS (
         |  SELECT doc_id, substr(text, i, $gramLen) AS g
         |  FROM documents,
         |    LATERAL (SELECT unnest(generate_series(1, len(text) - ${gramLen - 1})) AS i)
         |  WHERE len(text) >= $gramLen
         |), c AS (SELECT g, count(*) AS c FROM g GROUP BY 1)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  (1000 * CAST(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS dup_milli
         |FROM g JOIN c USING (g)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    // q226 ≡ q200 by construction: the oracle IS the exact audit — the
    // two-tier prefilter must change nothing but the plan
    "q226_substring_audit_2tier" ->
      s"""WITH g AS (
         |  SELECT doc_id, substr(text, i, $gramLen) AS g
         |  FROM documents,
         |    LATERAL (SELECT unnest(generate_series(1, len(text) - ${gramLen - 1})) AS i)
         |  WHERE len(text) >= $gramLen
         |), c AS (SELECT g, count(*) AS c FROM g GROUP BY 1)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  (1000 * CAST(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS dup_milli
         |FROM g JOIN c USING (g)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
  )
}
