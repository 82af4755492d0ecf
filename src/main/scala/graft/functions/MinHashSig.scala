package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Typed `Aggregator` (SURVEY.md §2.11): per-document MinHash signature
  * as a single-pass UDAF — for each of the k salted hash functions,
  * fold the group's shingles to the minimum md5 hex digest.
  *
  * This is the custom-Aggregator path the survey reserved for the [ext]
  * tier: one buffer of k strings per group, merged associatively —
  * map-side partial aggregation works exactly like any built-in agg, so
  * the shuffle carries one k-slot signature per (partition, doc), never
  * the shingles. Hex-string md5 matches Spark's `md5()` and DuckDB's
  * `md5()` byte-for-byte, which keeps the whole thing oracle-checkable
  * against the expression-derived signature (q30's fixture build).
  */
object MinHashSig {

  val numHashes = 18

  // Hot path runs numHashes digests per shingle over the whole corpus:
  // thread-local digest (no per-call instance), byte-level salt+payload
  // updates (no 18 concat strings per shingle), table-driven hex (the
  // f-interpolator was ~10x slower here).
  private val hexChars = "0123456789abcdef".toCharArray
  private val salts: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i:".getBytes(StandardCharsets.UTF_8))
  private val tlMd = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private def md5hex(salt: Array[Byte], payload: Array[Byte]): String = {
    val d = tlMd.get()
    d.reset()
    d.update(salt)
    d.update(payload)
    val out = d.digest()
    val cs = new Array[Char](32)
    var i = 0
    while (i < 16) {
      cs(2 * i) = hexChars((out(i) >> 4) & 0xf)
      cs(2 * i + 1) = hexChars(out(i) & 0xf)
      i += 1
    }
    new String(cs)
  }

  /** IN = shingle, BUF/OUT = k current-minimum digests ("" = empty). */
  val agg: Aggregator[String, Array[String], Seq[String]] =
    new Aggregator[String, Array[String], Seq[String]] {
      override def zero: Array[String] = Array.fill(numHashes)("")
      override def reduce(b: Array[String], shingle: String): Array[String] = {
        val payload = shingle.getBytes(StandardCharsets.UTF_8)
        var i = 0
        while (i < numHashes) {
          val h = md5hex(salts(i), payload)
          if (b(i).isEmpty || h < b(i)) b(i) = h
          i += 1
        }
        b
      }
      override def merge(a: Array[String], b: Array[String]): Array[String] = {
        var i = 0
        while (i < numHashes) {
          if (a(i).isEmpty || (b(i).nonEmpty && b(i) < a(i))) a(i) = b(i)
          i += 1
        }
        a
      }
      override def finish(b: Array[String]): Seq[String] = b.toSeq
      override def bufferEncoder: Encoder[Array[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
      override def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
}
