package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** MERGEABLE t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", arXiv:1902.04023 — the merging-digest
  * variant) as a typed `Aggregator` — the quantile member of the
  * stored-sketch tier: HLL answers distincts from per-day artifacts
  * (q110), KMV answers set algebra (q230), the t-digest answers
  * QUANTILES from per-day artifacts without re-scanning history —
  * `approx_percentile` (q93) estimates one scan's quantiles but its
  * GK sketch is not exposed as a mergeable artifact; the t-digest IS
  * the artifact, so p50/p95 over any window is a merge of day
  * digests, never a re-read of the raw corpus.
  *
  * Mechanics: a digest is a mean-sorted list of (mean, weight)
  * centroids whose sizes obey the k1 scale bound — a centroid spanning
  * quantile range [q₀, q₁] must satisfy k(q₁) − k(q₀) ≤ 1 with
  * k(q) = (δ/2π)·asin(2q−1), which squeezes centroids toward the
  * tails (small q(1−q)) and caps the centroid count near 2δ. The
  * merging variant is RNG-free (the q101 discipline): ingest buffers
  * raw points in a bounded scratch region and one sort-and-greedy-
  * merge pass compacts them against the existing centroids; merging
  * two digests is the same pass over their concatenated centroids.
  * Per-group memory is one fixed Array[Double]; map-side partial
  * aggregation works like any built-in agg. Estimates depend mildly
  * on merge order (floating-point means), so readouts are certified
  * by an EXACT rank envelope downstream, never hash-compared raw. */
object TDigest {

  /** Compression. Rank error concentrates near ~1/(2δ) mid-range and
    * shrinks toward the tails — at δ=100 the p50/p95/p99 errors are
    * well inside the ±(0.01 + 1/n) certificate q232 checks. */
  val Delta = 100.0

  /** Scratch pairs buffered before an ingest compaction. */
  private val Pending = 768

  /** Compressed digests stay under ~2δ centroids; cap = scratch +
    * compressed headroom. Buffer layout: [0] = pair count, then
    * (mean, weight) pairs unsorted. */
  private val MaxPairs = Pending + 2 * Delta.toInt + 8
  private val Cap = 1 + 2 * MaxPairs

  /** Buffers START small and grow by doubling toward [[Cap]] (r17,
    * guide §2.3 "shuffle fewer bytes"): the buffer encoder serializes
    * the array's full CAPACITY, and a fixed Cap-sized zero() made every
    * partial-aggregate group ship ~16 KB of mostly-zero padding — at
    * day grain each map task holds thousands of 2-3-row groups, ~1 GB
    * of shuffled zeros at sf0.1. Growth only changes capacity, never
    * the append/compaction cadence (driven by pair COUNT), so the
    * resulting centroids — and the query output — are bit-identical. */
  private val InitPairs = 8

  private def grown(b: Array[Double], needPairs: Int): Array[Double] =
    if (1 + 2 * needPairs <= b.length) b
    else {
      val cap = math.min(Cap, math.max(b.length * 2, 1 + 2 * needPairs))
      val nb = new Array[Double](cap)
      Array.copy(b, 0, nb, 0, 1 + 2 * b(0).toInt)
      nb
    }

  private def kOf(q: Double): Double =
    Delta / (2 * math.Pi) * math.asin(math.max(-1.0, math.min(1.0, 2 * q - 1)))
  private def kInv(k: Double): Double =
    (math.sin(math.max(-Delta / 4, math.min(Delta / 4, k)) * 2 * math.Pi / Delta) + 1) / 2

  /** One merging pass: sort pairs by mean, then greedily absorb each
    * next centroid into the current one unless the merged centroid
    * would span more than one k-unit. In-place on the buffer. */
  private def compact(b: Array[Double]): Unit = {
    val n = b(0).toInt
    if (n <= 1) return
    val idx = Array.range(0, n).sortBy(i => b(1 + 2 * i))
    val ms = idx.map(i => b(1 + 2 * i))
    val ws = idx.map(i => b(2 + 2 * i))
    val total = ws.sum
    var out = 0
    var cm = ms(0); var cw = ws(0); var wSoFar = 0.0
    var j = 1
    while (j < n) {
      val qRight = (wSoFar + cw + ws(j)) / total
      if (qRight <= kInv(kOf(wSoFar / total) + 1.0)) {
        // weighted-mean absorb
        cw += ws(j); cm += (ms(j) - cm) * ws(j) / cw
      } else {
        b(1 + 2 * out) = cm; b(2 + 2 * out) = cw; out += 1
        wSoFar += cw; cm = ms(j); cw = ws(j)
      }
      j += 1
    }
    b(1 + 2 * out) = cm; b(2 + 2 * out) = cw
    b(0) = out + 1.0
  }

  /** Append one (mean, weight) pair, compacting at the scratch bound
    * and growing capacity on demand — returns the (possibly replaced)
    * buffer, which callers must rebind. */
  private def append(b: Array[Double], m: Double, w: Double): Array[Double] = {
    var buf = b
    var n = buf(0).toInt
    if (n == MaxPairs) { compact(buf); n = buf(0).toInt }
    buf = grown(buf, n + 1)
    buf(1 + 2 * n) = m; buf(2 + 2 * n) = w
    buf(0) = n + 1.0
    buf
  }

  /** IN = the value; OUT = the digest as a flat mean-sorted
    * (mean, weight, mean, weight, …) sequence. */
  val agg: Aggregator[Double, Array[Double], Seq[Double]] =
    new Aggregator[Double, Array[Double], Seq[Double]] {
      override def zero: Array[Double] = new Array[Double](1 + 2 * InitPairs)
      override def reduce(b: Array[Double], x: Double): Array[Double] =
        append(b, x, 1.0)
      override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
        val nb = b(0).toInt
        var acc = a
        var i = 0
        while (i < nb) { acc = append(acc, b(1 + 2 * i), b(2 + 2 * i)); i += 1 }
        acc
      }
      override def finish(b: Array[Double]): Seq[Double] = {
        compact(b)
        flat(b)
      }
      override def bufferEncoder: Encoder[Array[Double]] =
        ExpressionEncoder[Array[Double]]()
      override def outputEncoder: Encoder[Seq[Double]] =
        ExpressionEncoder[Seq[Double]]()
    }

  /** IN = a finished digest artifact; OUT = the merged digest — the
    * rollup aggregator (q110's `hll_union_agg` counterpart): weekly =
    * merge of the seven day artifacts, no raw value re-read. */
  val mergeAgg: Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      override def zero: Array[Double] = new Array[Double](1 + 2 * InitPairs)
      override def reduce(b: Array[Double], sk: Seq[Double]): Array[Double] = {
        var acc = b
        var i = 0
        while (i + 1 < sk.size) { acc = append(acc, sk(i), sk(i + 1)); i += 2 }
        acc
      }
      override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
        agg.merge(a, b)
      override def finish(b: Array[Double]): Seq[Double] = {
        compact(b)
        flat(b)
      }
      override def bufferEncoder: Encoder[Array[Double]] =
        ExpressionEncoder[Array[Double]]()
      override def outputEncoder: Encoder[Seq[Double]] =
        ExpressionEncoder[Seq[Double]]()
    }

  private def flat(b: Array[Double]): Seq[Double] = {
    val n = b(0).toInt
    val idx = Array.range(0, n).sortBy(i => b(1 + 2 * i))
    idx.flatMap(i => Seq(b(1 + 2 * i), b(2 + 2 * i))).toSeq
  }

  // ------------------------------------------------------ driver readout
  // A digest is ≤~2δ pairs; readouts are arithmetic over ≤400 doubles.

  /** Total weight (= row count — unit-weight ingest conserves it). */
  def count(sk: Seq[Double]): Double =
    sk.grouped(2).map(_.last).sum

  /** Quantile estimate: centroid i is centered at cumulative weight
    * W(i−1) + w(i)/2; interpolate linearly between adjacent centers,
    * clamped to the extreme means at the tails. */
  def quantile(sk: Seq[Double], q: Double): Double = {
    val ms = sk.grouped(2).map(_.head).toArray
    val ws = sk.grouped(2).map(_.last).toArray
    val n = ms.length
    if (n == 0) return Double.NaN
    if (n == 1) return ms(0)
    val total = ws.sum
    val t = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val center = cum + ws(i) / 2
      if (t < center) {
        if (i == 0) return ms(0)
        val prevCenter = center - ws(i) / 2 - ws(i - 1) / 2
        val f = (t - prevCenter) / (center - prevCenter)
        return ms(i - 1) + f * (ms(i) - ms(i - 1))
      }
      cum += ws(i)
      i += 1
    }
    ms(n - 1)
  }
}
