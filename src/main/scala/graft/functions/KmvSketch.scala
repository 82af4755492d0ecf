package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-MINIMUM-VALUES distinct sketch (Bar-Yossef et al. 2002; the
  * Druid/DataSketches "theta sketch" family) as a typed `Aggregator` —
  * the sketch the HLL tier (q63/q110) cannot replace: HLL registers
  * merge under UNION only, while a KMV sample supports set ALGEBRA —
  * distinct-intersection ("how many users did BOTH X and Y") from
  * per-segment sketches built in one pass, no re-scan per question.
  *
  * Mechanics: keep the K smallest DISTINCT values of a uniform 64-bit
  * key hash (the hash arrives pre-computed from the codegen'd
  * `xxhash64`; this aggregator never hashes). The k-th smallest
  * normalized value θ estimates density: n̂ = (K−1)/θ. Two sketches'
  * arrays merge (union = K smallest of the concatenation — the same
  * estimator), and intersection uses the theta rule: among the union's
  * K minima, the fraction present in BOTH operands times the union
  * estimate. Relative error ~1/√K per estimate; K=1024 → ~3%.
  *
  * Buffer: one fixed Array[Long] per group — slot 0 the fill count,
  * slots 1..2K unsorted UNSIGNED-VIEW values (`h ^ Long.MinValue`
  * makes signed order = unsigned order). Appends are O(1); when the
  * scratch half fills, one sort+dedup+truncate compacts to the K
  * smallest distinct — O(log K) amortized per row, bounded memory, and
  * map-side partial aggregation works like any built-in agg (the
  * shuffle carries one ≤2K-slot buffer per partition per group, never
  * the keys). Dropping a value at compaction is safe forever: it was
  * outside the K smallest distinct then, so it stays outside.
  * Deterministic for fixed input (no RNG — the q101 discipline), so
  * the certified flags downstream are hash-stable. */
object KmvSketch {

  val K = 1024
  private val Cap = 2 * K

  /** Compact slots 1..n(b) to the ≤K smallest distinct; updates n. */
  private def compact(b: Array[Long]): Unit = {
    val n = b(0).toInt
    val vs = java.util.Arrays.copyOfRange(b, 1, n + 1)
    java.util.Arrays.sort(vs)
    var m = 0
    var i = 0
    while (i < vs.length && m < K) {
      if (m == 0 || vs(i) != b(m)) { b(m + 1) = vs(i); m += 1 }
      i += 1
    }
    b(0) = m
  }

  private def append(b: Array[Long], u: Long): Unit = {
    val n = b(0).toInt
    b(n + 1) = u
    b(0) = n + 1
    if (n + 1 == Cap) compact(b)
  }

  /** IN = xxhash64 of the key; BUF = bounded scratch; OUT = the sorted
    * ≤K smallest distinct unsigned-view values. */
  val agg: Aggregator[Long, Array[Long], Seq[Long]] =
    new Aggregator[Long, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](Cap + 1)
      override def reduce(b: Array[Long], h: Long): Array[Long] = {
        append(b, h ^ Long.MinValue)
        b
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        val nb = b(0).toInt
        var i = 1
        while (i <= nb) { append(a, b(i)); i += 1 }
        a
      }
      override def finish(b: Array[Long]): Seq[Long] = {
        compact(b)
        b.slice(1, b(0).toInt + 1).toSeq
      }
      override def bufferEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] =
        ExpressionEncoder[Seq[Long]]()
    }

  // ------------------------------------------------------ driver algebra
  // Sketches are ≤K-element sorted arrays; everything below is
  // driver-side arithmetic over at most 3K longs.

  /** Distinct estimate of one sketch. Fewer than K survivors means the
    * sketch SAW fewer than K distinct hashes — the count is exact. */
  def estimate(s: Seq[Long]): Double =
    if (s.size < K) s.size.toDouble
    else {
      // θ = normalized k-th minimum in (0,1]; n̂ = (K−1)/θ
      val theta = (s.last.toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)
      (K - 1).toDouble / theta
    }

  /** The union sketch: K smallest distinct of the concatenation. */
  def union(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(K)

  /** Theta-rule intersection estimate: among the union's minima, the
    * fraction present in BOTH operands, times the union estimate. */
  def intersectEstimate(a: Seq[Long], b: Seq[Long]): Double = {
    val u = union(a, b)
    if (u.isEmpty) return 0.0
    val sa = a.toSet
    val sb = b.toSet
    val both = u.count(v => sa.contains(v) && sb.contains(v))
    both.toDouble / u.size * estimate(u)
  }
}
