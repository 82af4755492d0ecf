package graft.ext

import graft.QueryModule
import graft.ingest.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.12 [ext]).
  *
  * Media (image/audio/video) is carried as an opaque `binary` payload
  * column plus a typed metadata struct — the schema/partitioning/plumbing
  * are real and tested; only the codec itself is stubbed (no media
  * libraries in this container, see [[decodeStub]]).
  *
  * Here the payload is the UTF-8 encoding of the document text joined
  * with its embedding vector — a faithful stand-in for {bytes, embedding,
  * meta} training-data rows. Feature extraction is expression-level
  * (hashes/lengths over the payload bytes), so the whole pipeline stays
  * inside whole-stage codegen and is DuckDB-oracle-checked byte-exactly.
  *
  * Scale notes: payloads travel as column values — never collected; a
  * real deployment would partition by a content-hash prefix so media
  * blobs spread evenly, and run decode as a mapPartitions stage (the
  * Scala analogue of `mapInPandas`) with batch-sized Arrow buffers.
  */
object Multimodal extends QueryModule {

  /** Extension point for real media decoding. In production this is a
    * per-partition batch decode (`Dataset[MediaRow].mapPartitions`)
    * calling into an image/audio codec; the sandbox has no media libs,
    * so the engine ships the plumbing with this stub and the
    * deterministic expression-level featureizer used by the query. */
  def decodeStub(payload: Array[Byte]): Array[Float] =
    throw new UnsupportedOperationException(
      "media codec not available in this environment; wire a real decoder here")

  /** E5: multimodal row assembly + deterministic feature extraction.
    * Binary payload + metadata struct + embedding, flattened features. */
  def multimodalFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .withColumn("payload", encode($"text", "UTF-8"))
      .withColumn("meta", struct($"lang", $"source", $"n_chars"))
      .select(
        $"doc_id",
        octet_length($"payload").cast("long").as("byte_len"),
        md5($"payload").as("content_md5"),
        md5(substring($"text", 1, 8)).as("prefix_md5"),
        size($"embedding").cast("long").as("emb_dim"),
        $"meta.lang".as("lang"),
        $"meta.source".as("source"))
      .orderBy($"doc_id")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q41_multimodal_features" -> multimodalFeatures,
  )

  val oracles = Map(
    "q41_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  md5(substr(text, 1, 8)) AS prefix_md5,
        |  CAST(len(embedding) AS BIGINT) AS emb_dim,
        |  lang, source
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
  )
}
