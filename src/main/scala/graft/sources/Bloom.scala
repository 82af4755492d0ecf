package graft.sources

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Per-file Bloom filters for the connector — equality skipping on a
  * column whose values the manifest's single [min, max] interval can't
  * discriminate (a value-ranged layout tells you nothing about
  * `user_id = 42`). The design follows Parquet's row-group blooms, not
  * a bloom-in-manifest: the filter lives in a SIDECAR next to its data
  * file (`<file>.jsonl.bloom`) and is consulted by the TASK, never the
  * driver — planning stays manifest-only (metadata-sized), while a
  * task whose bloom proves the probed key absent skips the expensive
  * JSON parse of its entire range. At 100 TB this turns a needle
  * lookup from a full-corpus parse into task launches that each read a
  * few KB and exit. (Driver-side bloom pruning would mean reading
  * every surviving file's sidecar on one machine — the exact
  * O(files)-on-the-driver step the manifest exists to avoid.)
  *
  * Sizing: 12 bits per DISTINCT key, k = 6 probes → ~0.3% false
  * positives; false positives only cost a redundant parse (the
  * residual filter re-checks rows), false negatives cannot happen for
  * inserted keys. The bit array is a power of two so probe indexing is
  * a mask, and hashing is engine-internal (splitmix64 / FNV-1a): the
  * only contract is writer/reader agreement, which shipping both in
  * one engine guarantees.
  */
object Bloom {

  val K = 6
  private val Magic = 0x47424c4d // "GBLM"

  def sidecarOf(dataFile: Path): Path =
    dataFile.resolveSibling(dataFile.getFileName.toString + ".bloom")

  def sidecarName(dataFile: String): String = dataFile + ".bloom"

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashLong(v: Long): Long = mix64(v)
  def hashDouble(v: Double): Long = mix64(java.lang.Double.doubleToLongBits(v))
  def hashString(s: String): Long = {
    // FNV-1a 64 over UTF-8 bytes, then finalized for avalanche
    var h = 0xcbf29ce484222325L
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      h ^= (b & 0xffL); h *= 0x100000001b3L
    }
    mix64(h)
  }

  /** Double hashing: probe i hits bit (h1 + i·h2) mod m, h2 forced odd
    * so the probe sequence walks the whole power-of-two ring. */
  private def bitIndex(hash: Long, i: Int, mBits: Int): Int = {
    val h2 = (hash >>> 33) | 1L
    (((hash + i * h2) % mBits + mBits) % mBits).toInt
  }

  private def nextPow2(n: Int): Int = Integer.highestOneBit(math.max(1, n - 1)) << 1

  /** Build the bit array for a file's distinct key hashes. */
  def build(hashes: Array[Long]): (Array[Long], Int) = {
    val distinct = hashes.distinct
    val mBits = math.max(8192, nextPow2(12 * math.max(1, distinct.length)))
    val words = new Array[Long](mBits / 64)
    distinct.foreach { h =>
      var i = 0
      while (i < K) {
        val b = bitIndex(h, i, mBits)
        words(b >>> 6) |= 1L << (b & 63)
        i += 1
      }
    }
    (words, mBits)
  }

  def mightContain(words: Array[Long], mBits: Int, hash: Long): Boolean = {
    var i = 0
    while (i < K) {
      val b = bitIndex(hash, i, mBits)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** ONE binary codec for both sidecar kinds (value bloom + gram
    * index — r9 review: two byte-identical copies would have to evolve
    * in lockstep): magic, version, mBits, then the bit words. */
  private def writeSidecarWords(target: Path, words: Array[Long], mBits: Int): Unit = {
    val buf = java.nio.ByteBuffer.allocate(12 + words.length * 8)
    buf.putInt(Magic); buf.putInt(1); buf.putInt(mBits)
    words.foreach(buf.putLong)
    Files.write(target, buf.array(),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def readSidecarWords(p: Path): Option[(Array[Long], Int)] = {
    if (!Files.exists(p)) return None
    try {
      val bytes = Files.readAllBytes(p)
      val buf = java.nio.ByteBuffer.wrap(bytes)
      if (buf.getInt() != Magic || buf.getInt() != 1) return None
      val mBits = buf.getInt()
      if (mBits <= 0 || bytes.length != 12 + mBits / 8) return None
      val words = new Array[Long](mBits / 64)
      var i = 0
      while (i < words.length) { words(i) = buf.getLong(); i += 1 }
      Some((words, mBits))
    } catch { case _: Throwable => None }
  }

  def writeSidecar(dataFile: Path, hashes: Array[Long]): Unit = {
    val (words, mBits) = build(hashes)
    writeSidecarWords(sidecarOf(dataFile), words, mBits)
  }

  /** None when the sidecar is absent or unreadable — skipping is an
    * optimization, so a missing/corrupt filter means "read the file". */
  def readSidecar(dataFile: Path): Option[(Array[Long], Int)] =
    readSidecarWords(sidecarOf(dataFile))

  /** Process-local diagnostic: files whose parse a bloom probe skipped
    * (meaningful under local mode / tests; on a cluster each executor
    * counts its own). */
  val skippedFiles = new java.util.concurrent.atomic.LongAdder

  // ---- substring GRAM index (r9) -----------------------------------------
  //
  // A second sidecar kind (`<file>.jsonl.grams`, same binary layout as
  // the value bloom) holding a Bloom filter over every LENGTH-5
  // CHARACTER WINDOW of the indexed string column's values. The law it
  // serves: if a file contains needle `s` (|s| >= 5) as a substring of
  // some row value, the file's gram set contains EVERY 5-gram of `s` —
  // so a single absent gram proves the needle absent and the task skips
  // the parse of its whole range. This is what turns
  // `content LIKE '%needle%'` over 100 TB of text from a full-corpus
  // parse into task launches that each read a ~KB sidecar and exit; a
  // false positive only costs the redundant parse (the residual filter
  // re-checks rows), and a false NEGATIVE is impossible because the
  // writer inserts every window unconditionally. Matching is
  // case-sensitive over exact characters — precisely SQL LIKE
  // semantics. Needles shorter than 5 chars simply never probe
  // (cannot prune, still correct).

  /** Character window length. 5 balances selectivity (4-grams are too
    * common in natural text to prune) against the shortest
    * still-probeable needle. */
  val GramLen = 5

  /** Spill threshold for the adaptive tracker: below this many distinct
    * grams the sidecar is an exactly-sized bloom (12 bits/gram, small
    * files get KB sidecars); above it the tracker switches to one fixed
    * 2^23-bit (1 MiB) array inserted on the fly — bounded memory for
    * arbitrarily large files, with the honest degradation that a file
    * whose distinct-gram count saturates the array stops pruning but
    * never misprunes. */
  val GramSpillDistinct = 1 << 18
  val GramFixedBits = 1 << 23

  def gramSidecarOf(dataFile: Path): Path =
    dataFile.resolveSibling(dataFile.getFileName.toString + ".grams")

  def gramSidecarName(dataFile: String): String = dataFile + ".grams"

  /** Hash of the 5-char window starting at `from` — FNV-1a over UTF-16
    * code units, splitmix-finalized. Writer and prober share this one
    * definition; that agreement is the whole contract. */
  def gramHash(s: CharSequence, from: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < GramLen) {
      val c = s.charAt(from + i)
      h ^= (c & 0xffL);        h *= 0x100000001b3L
      h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** All distinct gram hashes of a probe needle (|needle|-4 windows).
    * Empty when the needle is too short to probe. */
  def gramHashes(needle: String): Array[Long] = {
    if (needle == null || needle.length < GramLen) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Long](needle.length - GramLen + 1)
    var i = 0
    while (i + GramLen <= needle.length) { out += gramHash(needle, i); i += 1 }
    out.distinct.toArray
  }

  /** Set every probe bit of `hash` in a caller-owned array. */
  def insertHash(words: Array[Long], mBits: Int, hash: Long): Unit = {
    var i = 0
    while (i < K) {
      val b = bitIndex(hash, i, mBits)
      words(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  /** Per-open-file gram accumulator: exact distinct set until
    * `spillDistinct`, then one fixed `fixedBits` array. Defaults are
    * the single-resident-sink budget ([[GramSpillDistinct]] /
    * [[GramFixedBits]]); a BUCKET-routed writer task holds one tracker
    * per resident sink (up to N=4096), so it divides the budget by the
    * bucket count ([[budgeted]]) — total tracker memory per task stays
    * at the one-sink ceiling, and since the bucket hash spreads rows
    * uniformly each sink sees ~1/N of the distinct grams, so
    * bits-per-gram (the false-positive rate) is preserved (r9 review:
    * unbudgeted routed trackers could hold multi-GB per task). */
  /** A tracker sized for one of `share` sinks co-resident in a task
    * (bucket-routed writers): budget divided by the share, with MINIMAL
    * floors (64 exact grams / 512 spill bits) so the worst case — every
    * sink floor-sized — never exceeds the one-sink ceiling regardless
    * of the bucket count (r11, ADVICE r10 low: the old 4k/16 KiB floors
    * let a 4096-bucket task hold 64 MiB of fixed arrays alone). The
    * floors only bind past share = 64; below that the division itself
    * yields ≥ 4k grams / 16 KiB per sink. */
  def budgetedGramTracker(share: Int): GramTracker = {
    val s = math.max(1, share)
    new GramTracker(
      math.max(64, GramSpillDistinct / s),
      math.max(512, Integer.highestOneBit(math.max(512, GramFixedBits / s))))
  }

  final class GramTracker(spillDistinct: Int = GramSpillDistinct,
                          fixedBits: Int = GramFixedBits) {
    require(Integer.bitCount(fixedBits) == 1, s"fixedBits must be a power of two: $fixedBits")
    private var set: java.util.HashSet[java.lang.Long] = new java.util.HashSet[java.lang.Long]()
    private var words: Array[Long] = null

    def add(value: String): Unit = {
      if (value == null || value.length < GramLen) return
      var i = 0
      while (i + GramLen <= value.length) {
        val h = gramHash(value, i)
        if (words != null) insertHash(words, fixedBits, h)
        else {
          set.add(h)
          if (set.size > spillDistinct) {
            words = new Array[Long](fixedBits / 64)
            val it = set.iterator()
            while (it.hasNext) insertHash(words, fixedBits, it.next())
            set = null
          }
        }
        i += 1
      }
    }

    /** Write the sidecar for `dataFile`; no-op tracker (zero grams)
      * still writes one, so an indexed file with no indexable text
      * prunes every probe. */
    def writeSidecar(dataFile: Path): Unit = {
      val (w, mBits) =
        if (words != null) (words, fixedBits)
        else {
          val hs = new Array[Long](set.size)
          val it = set.iterator(); var i = 0
          while (it.hasNext) { hs(i) = it.next(); i += 1 }
          build(hs)
        }
      writeSidecarWords(gramSidecarOf(dataFile), w, mBits)
    }
  }

  /** Same layout as the value-bloom sidecar (the extension carries the
    * semantics); absent/corrupt means "read the file". */
  def readGramSidecar(dataFile: Path): Option[(Array[Long], Int)] =
    readSidecarWords(gramSidecarOf(dataFile))

  /** Process-local diagnostic twin of [[skippedFiles]] for gram probes. */
  val gramSkippedFiles = new java.util.concurrent.atomic.LongAdder
}
