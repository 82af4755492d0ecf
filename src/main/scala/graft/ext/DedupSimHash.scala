package graft.ext

import graft.QueryModule
import graft.ingest.Landing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (SURVEY.md §2.12 E2): a 32-bit
  * per-doc fingerprint (sign of per-bit vote over shingle hashes) — a
  * single groupBy(doc), no pairs at all; pair search then bands the
  * fingerprint bits. The same no-O(n²) shape as the MinHash path but
  * with a 64× smaller signature (one long vs 18 md5s). */
object DedupSimHash extends QueryModule {

  /** Hex nibble value of char `idx` (1-based) of md5 column `h`. */
  private def nib(h: Column, idx: Int): Column =
    conv(substring(h, idx, 1), 16, 10).cast("int")

  /** E2/E4: 32-bit SimHash fingerprint per document — per-bit majority
    * vote over shingle hashes. One groupBy(doc_id); no pair joins. */
  def simhashFingerprint(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val withHash = Dedup.shingles(spark, d).withColumn("h", md5($"shingle"))
    val votes = (0 until 32).map { b =>
      val bit = shiftright(nib($"h", b / 4 + 1), b % 4).bitwiseAND(lit(1))
      sum(bit * 2 - 1).as(s"v$b")
    }
    val agged = withHash.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until 32).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agged.select($"doc_id", fp.as("simhash")).orderBy($"doc_id")
  }

  /** E2: SimHash near-dup PAIR SEARCH — bands the 32-bit fingerprint
    * into 4 byte-bands; only docs sharing a band ever meet (pigeonhole:
    * hamming ≤ 3 over 4 bands guarantees ≥1 identical band, so recall
    * at the ≤3 threshold is exact, not approximate). Candidates verify
    * with `bit_count(xor)`. Fingerprints come from the one-shuffle
    * simhash aggregation, checkpointed once and reused by both the band
    * and verify legs. */
  def simhashNearDupPairs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val fps = Landing.ensureParquetFixture(
      simhashFingerprint(spark, d), d, "simhash_fps")
    val bandCols = (0 until 4).map(j =>
      struct(lit(j).as("bidx"),
        shiftright($"simhash", 8 * j).bitwiseAND(lit(255L)).as("bval")))
    val bands = fps.select($"doc_id", explode(array(bandCols: _*)).as("b"))
      .select($"doc_id", $"b.bidx", $"b.bval")
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val f1 = fps.select($"doc_id".as("d1"), $"simhash".as("fp1"))
    val f2 = fps.select($"doc_id".as("d2"), $"simhash".as("fp2"))
    cand.join(f1, "d1").join(f2, "d2")
      .withColumn("hamming", bit_count($"fp1".bitwiseXOR($"fp2")).cast("long"))
      .filter($"hamming" <= 3)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q31_simhash_fingerprint"   -> simhashFingerprint,
    "q71_simhash_neardup_pairs" -> simhashNearDupPairs,
  )

  private[ext] val simhashOracle = {
    val votes = (0 until 32).map { b =>
      s"SUM(((strpos('0123456789abcdef', substr(h, ${b / 4 + 1}, 1)) - 1) >> ${b % 4} & 1) * 2 - 1) AS v$b"
    }.mkString(",\n    ")
    val fp = (0 until 32).map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""${Dedup.shingleCte}, hashed AS (
       |  SELECT doc_id, md5(shingle) AS h FROM sh
       |), voted AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM voted ORDER BY doc_id""".stripMargin
  }

  val oracles = Map(
    "q31_simhash_fingerprint" -> simhashOracle,
    "q71_simhash_neardup_pairs" ->
      s"""WITH fps AS ($simhashOracle),
         |bands AS (
         |  SELECT doc_id, b.bidx, (simhash >> (8 * b.bidx)) & 255 AS bval
         |  FROM fps, (SELECT unnest(range(4)) AS bidx) b
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM bands x JOIN bands y
         |    ON x.bidx = y.bidx AND x.bval = y.bval AND x.doc_id < y.doc_id
         |)
         |SELECT d1, d2, CAST(bit_count(xor(f1.simhash, f2.simhash)) AS BIGINT) AS hamming
         |FROM cand JOIN fps f1 ON d1 = f1.doc_id JOIN fps f2 ON d2 = f2.doc_id
         |WHERE bit_count(xor(f1.simhash, f2.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin,
  )
}
