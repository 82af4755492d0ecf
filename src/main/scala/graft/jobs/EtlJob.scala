package graft.jobs

import graft.ingest.{Landing, Sinks}
import graft.schemas.Schemas
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's transformation job, re-expressed as a Spark-native
  * Scala entry point (etl_job.py end to end, SURVEY.md §3.2): landing
  * JSONL glob → per-entity routing → explicit-schema read → flatten →
  * gold CSV, with per-entity graceful degradation.
  *
  * A user of the reference runs
  *   `spark-submit etl_job.py --input_path <landing glob> --output_path <gold>`
  * here the same contract is
  *   `runMain graft.jobs.EtlJob --input_path <landing> --output_path <gold>`
  *
  * Differences by design (SURVEY.md §1.3, §4): explicit StructTypes
  * instead of inference (one scan saved per entity), no Py4J boundary,
  * and counts come from the same pass that writes (no triple plan
  * recompute — the reference re-executes its plan for count→write→head,
  * etl_job.py:66-76).
  */
object EtlJob {

  /** Flatten the nested transaction docs — the 23-column projection of
    * etl_job.py:31-64: transaction scalars + exploded line item +
    * billing/shipping address fields. */
  def flattenTransactions(df: DataFrame): DataFrame =
    df.withColumn("item", explode(col("line_items")))
      .select(
        col("transaction_id"), col("user_id"), col("transaction_type"),
        col("timestamp"), col("status"), col("payment_method"), col("currency"),
        col("subtotal"), col("tax"), col("total"), col("original_transaction_id"),
        col("item.product_id").as("item_product_id"),
        col("item.product_name").as("item_product_name"),
        col("item.category").as("item_category"),
        col("item.brand").as("item_brand"),
        col("item.quantity").as("item_quantity"),
        col("item.unit_price").as("item_unit_price"),
        col("billing_address.street").as("billing_street"),
        col("billing_address.city").as("billing_city"),
        col("billing_address.state").as("billing_state"),
        col("billing_address.zip_code").as("billing_zip_code"),
        col("billing_address.country").as("billing_country"),
        col("shipping_address.city").as("shipping_city"))

  /** The 13-column wide projection of the sparse user events
    * (etl_job.py:99-113) — absent subtype fields surface as nulls. */
  def projectUserEvents(df: DataFrame): DataFrame =
    df.select("event_id", "user_id", "session_id", "event_type", "timestamp",
      "page", "device", "browser", "country", "search_query", "element_id",
      "product_id", "quantity")

  /** Run both entity branches; returns entity → row count (−1 = skipped).
    * Per-entity failure skips that branch, never the job
    * (etl_job.py:78-81,126-129). */
  def run(spark: SparkSession, inputPath: String, outputPath: String): Map[String, Long] = {

    def branch(globPrefix: String, outName: String,
               schema: org.apache.spark.sql.types.StructType,
               requiredCol: String, transform: DataFrame => DataFrame): Long =
      try {
        val raw = Landing.readJsonl(spark, Landing.entityGlob(inputPath, globPrefix), schema)
        if (!raw.columns.contains(requiredCol)) {
          println(s"[etl] $outName: required column '$requiredCol' missing — skipped"); -1L
        } else {
          // Row count and the null-key DQ counter ride the WRITE action
          // via the Observation API — no separate count() pass over the
          // data (the reference re-executes its plan for count→write→head,
          // etl_job.py:66-76; a 100-TB job cannot afford a second scan
          // just to learn how many rows it wrote).
          val obs = new org.apache.spark.sql.Observation(s"etl_$outName")
          val flat = transform(raw).observe(obs,
            count(lit(1)).as("n_rows"),
            sum(when(col(requiredCol).isNull, 1).otherwise(0)).as("null_keys"))
          // cache: write + preview are two actions over one plan (the
          // caching policy the reference spec'd but never implemented,
          // Stream_Analytics_Platform.md:91)
          flat.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          Sinks.csvSink(flat, s"$outputPath/$outName")
          val metrics = obs.get
          val n = metrics("n_rows").asInstanceOf[Long]
          val nullKeys = Option(metrics("null_keys")).fold(0L)(_.asInstanceOf[Long])
          // O1: head preview, reference etl_job.py:76
          flat.take(10).foreach(r => println(s"[etl] $outName preview: $r"))
          flat.unpersist()
          println(s"[etl] $outName: $n rows ($nullKeys null $requiredCol) → $outputPath/$outName")
          n
        }
      } catch {
        case e: AnalysisException =>
          println(s"[etl] $outName: skipped (${e.getMessage.linesIterator.next()})"); -1L
      }

    Map(
      "transaction" -> branch("transaction", "transaction", Schemas.transactionEvents,
        "transaction_type", flattenTransactions),
      "user_events" -> branch("user", "user_events", Schemas.userEvents,
        "event_type", projectUserEvents))
  }

  /** Gold-zone validation gate — the reference DAG's `validate_outputs`
    * task (dag_streamflow.py:27-40, wired after the ETL at :85-92): the
    * run FAILS when the gold zone holds no CSV data file (searched
    * recursively, like the reference's rglob). Returns the relative
    * paths found; throws otherwise — an empty gold zone must fail the
    * pipeline run, not pass silently. */
  def validateOutputs(goldDir: String): Seq[String] = {
    val root = java.nio.file.Paths.get(goldDir)
    val files =
      if (!java.nio.file.Files.isDirectory(root)) Seq.empty[String]
      else graft.util.Fs.walkClosed(root)
        .filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".csv"))
        .map(root.relativize(_).toString).sorted.toSeq
    if (files.isEmpty)
      throw new IllegalStateException(
        s"gold validation failed: no CSV files found in $goldDir or its subfolders")
    println(s"[etl] validation successful, ${files.size} gold files:")
    files.foreach(f => println(s"[etl]  - $f"))
    files
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = opts.getOrElse("--input_path",
      sys.error("--input_path <landing dir> required"))
    val output = opts.getOrElse("--output_path",
      sys.error("--output_path <gold dir> required"))
    val spark = SparkSession.builder()
      .master(opts.getOrElse("--master", "local[*]"))
      .appName("graft-etl")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // DAG chain: etl_job >> validate_outputs (dag_streamflow.py:92)
    try { run(spark, input, output); validateOutputs(output) }
    finally spark.stop()
  }
}
