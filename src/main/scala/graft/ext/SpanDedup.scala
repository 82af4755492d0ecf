package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q145_span_dedup" -> spanDedup,
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
  )
}
