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

  /** Typed row for the batch-decode stage. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String, source: String)
  case class MediaFeatures(doc_id: Long, lang: String, source: String,
                           byte_len: Long, f_mod: Long, f_mix: Long)

  /** Deterministic fake codec standing in for [[decodeStub]]: derives
    * features from payload length only, so the DuckDB oracle reproduces
    * it from `octet_length` regardless of text encoding. A real decoder
    * drops in with the same batch signature. */
  def fakeDecodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Long]] =
    payloads.map { p =>
      val n = p.length.toLong
      Array(n, n % 251L, (n * 31L + 7L) % 1000L)
    }

  private val decodeBatchSize = 64

  /** E5: the real batch-decode plumbing — typed Dataset, repartition by
    * a content-hash prefix (spreads hot media uniformly; no partition
    * ever keys on source/size skew), then `mapPartitions` feeding the
    * codec fixed-size batches (the Scala analogue of `mapInPandas`
    * Arrow batches). Only the codec body is fake; schema, partitioning,
    * batch shape and row accounting are production-real. */
  def mediaBatchDecode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, d)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"), $"lang", $"source")
      .repartition(crc32(md5($"payload")))
      .as[MediaRow]
    rows.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        val feats = fakeDecodeBatch(batch.map(_.payload))
        batch.lazyZip(feats).map { (r, f) =>
          MediaFeatures(r.doc_id, r.lang, r.source, f(0), f(1), f(2))
        }
      }
    }.toDF()
      .orderBy($"doc_id")
  }

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

  private val framesPerDoc = 3
  private val frameLen = 64

  /** E5: frame sampling — the every-k-th-frame decode shape for video
    * payloads: three evenly-spaced fixed-length frames per payload
    * (stride derived from payload size), fingerprinted per frame. Pure
    * codegen expressions, one output row per sampled frame. Frames are
    * character-indexed so the DuckDB oracle is byte-exact regardless of
    * encoding (md5 of a string hashes its UTF-8 bytes in both engines). */
  def mediaFrameSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .withColumn("stride",
        greatest(lit(1), floor(length($"text") / framesPerDoc).cast("int")))
      .select($"doc_id", $"text", $"stride",
        explode(sequence(lit(0), lit(framesPerDoc - 1))).as("frame_idx"))
      .withColumn("frame", $"text".substr($"frame_idx" * $"stride" + 1, lit(frameLen)))
      .filter(length($"frame") > 0)
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        length($"frame").cast("long").as("frame_chars"),
        md5($"frame").as("frame_md5"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** q120: near-duplicate MEDIA detection — payloads sharing any
    * sampled-frame fingerprint (re-encodes, trims, and mirrors of the
    * same underlying asset share frames even when whole-payload hashes
    * differ; exact-dup detection q22-style catches only bit-identical
    * copies). Same inverted-index shape as the text near-dup tier:
    * fingerprints are the blocking key, the join touches only payloads
    * that collide on a frame, never all pairs — and the per-fingerprint
    * group size is bounded by how many variants an asset has, the same
    * df argument that bounds q42's shingle buckets. */
  def mediaNearDup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val fp = mediaFrameSample(spark, d)
      .select($"doc_id", $"frame_md5").distinct()
    fp.as("a").join(fp.as("b"),
        col("a.frame_md5") === col("b.frame_md5") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy($"d1", $"d2")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q41_multimodal_features" -> multimodalFeatures,
    "q75_media_batch_decode"  -> mediaBatchDecode,
    "q78_media_frame_sample"  -> mediaFrameSample,
    "q120_media_neardup"      -> mediaNearDup,
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
    "q78_media_frame_sample" ->
      """WITH strided AS (
        |  SELECT doc_id, text,
        |    GREATEST(1, CAST(FLOOR(length(text) / 3) AS INT)) AS stride
        |  FROM documents
        |), frames AS (
        |  SELECT doc_id, i AS frame_idx,
        |    substr(text, i * stride + 1, 64) AS frame
        |  FROM strided, (SELECT unnest(range(3)) AS i)
        |)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(length(frame) AS BIGINT) AS frame_chars,
        |  md5(frame) AS frame_md5
        |FROM frames
        |WHERE length(frame) > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q120_media_neardup" ->
      """WITH strided AS (
        |  SELECT doc_id, text,
        |    GREATEST(1, CAST(FLOOR(length(text) / 3) AS INT)) AS stride
        |  FROM documents
        |), fp AS (
        |  SELECT DISTINCT doc_id, md5(substr(text, i * stride + 1, 64)) AS f
        |  FROM strided, (SELECT unnest(range(3)) AS i)
        |  WHERE length(substr(text, i * stride + 1, 64)) > 0
        |)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared
        |FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
        |GROUP BY d1, d2
        |ORDER BY d1, d2""".stripMargin,
    "q75_media_batch_decode" ->
      """SELECT doc_id, lang, source,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(octet_length(encode(text)) % 251 AS BIGINT) AS f_mod,
        |  CAST((octet_length(encode(text)) * 31 + 7) % 1000 AS BIGINT) AS f_mix
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
  )
}
