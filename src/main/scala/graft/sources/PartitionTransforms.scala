package graft.sources

import org.apache.spark.sql.sources._

/** HIDDEN PARTITIONING (r9) — Iceberg-style partition transforms on the
  * manifest protocol. A table may be `PARTITIONED BY (bucket(N, col))`
  * or `(truncate(W, col))`: the writer derives each row's partition
  * key from the SOURCE column, files are keyed by the DERIVED value in
  * the manifest (`pkey`), and the scan prunes files from predicates on
  * the source column alone — queries never name, or even know about,
  * the partition value. That is the feature's whole point at 100 TB:
  * with explicit partition columns every analyst must remember to add
  * `AND p_bucket = ...` or the engine scans everything; a hidden
  * transform makes pruning a property of the TABLE, not of query
  * discipline (the Iceberg hidden-partitioning argument).
  *
  * Encoding: the transform rides IN the `partitionColumn` string —
  * `"bucket(8,user_id)"` / `"truncate(100,event_id)"` — so every
  * signature that already threads `partitionCol: Option[String]`
  * (write builders, row-level ops, catalog, procedures) carries hidden
  * layouts unchanged; a bare column name stays the identity transform,
  * byte-compatible with every pre-r9 table. Only the three points that
  * INTERPRET the key — writer derivation, scan pruning, catalog DDL —
  * parse the encoding.
  *
  * Derivations (writer and pruner share these single definitions; the
  * agreement is the contract, exactly like the sidecar hash functions):
  *   - bucket(N, long|string): `mix64/FNV hash mod N` — stable
  *     engine-internal hashing ([[Bloom.hashLong]]/[[Bloom.hashString]]).
  *   - truncate(W, long): `v - (((v % W) + W) % W)` — floor to the
  *     W-aligned boundary, negative-safe (Iceberg's definition).
  *   - truncate(W, string): first W chars (whole string when shorter).
  *   The writer picks a truncate derivation from the SCHEMA type; the
  *   pruner picks it from the predicate's VALUE type — both total, so
  *   the encoding itself needs no type tag.
  *
  * Scale shape: a bucketed layout bounds every writer task at N open
  * sinks and gives point lookups exact 1-of-N file pruning with no
  * clustering discipline at all; a truncated layout gives RANGE pruning
  * over the derived boundary/prefix. Bucketed scans additionally report
  * their layout as a KeyGroupedPartitioning over the bucket transform
  * ([[JsonlStatsRead]] `bucketGrouped`), and the catalog exposes
  * `bucket` as a V2 ReducibleFunction ([[GraftCatalog.BucketFn]]), so
  * two tables bucketed on the join key — even with different bucket
  * counts, via reduction to the coarser count — storage-partition-join
  * with ZERO shuffle on either side (q242/q244 assert the shuffle-free
  * plan). Identity layouts keep the classic one-file-per-key SPJ. */
object PartitionTransforms {

  sealed trait Spec {
    /** Source column the key derives from. */
    def col: String
    /** Encoded form stored as the `partitionColumn`. */
    def encoded: String
  }
  /** Pre-r9 behavior: the partition key IS the (string) column value. */
  final case class Identity(col: String) extends Spec {
    def encoded: String = col
  }
  final case class Bucket(n: Int, col: String) extends Spec {
    def encoded: String = s"bucket($n,$col)"
  }
  final case class Trunc(w: Long, col: String) extends Spec {
    def encoded: String = s"truncate($w,$col)"
  }
  /** Temporal layouts share one pruning law: a file's single pkey
    * names a contiguous DAY RANGE, and predicates on the source column
    * test against it (micros for timestamp values, epoch days for date
    * values). Days/Months/Years differ only in the range a key names —
    * Iceberg's transform family, indices since epoch (1970-01-01). */
  sealed trait TimeSpec extends Spec {
    /** The row's pkey from its epoch day. */
    def keyOfDay(day: Long): Long
    /** Inclusive [firstDay, lastDay] a pkey covers. */
    def dayRange(key: Long): (Long, Long)
  }
  /** Daily layout over a timestamp/date source (r11, the Iceberg
    * `days(ts)` classic): pkey = epoch day, so the reference's daily
    * event feed lands one-key-per-day with hidden pruning for
    * time-window predicates — the 100-TB nightly slice reads one
    * day's files with no partition column in any query. */
  final case class Days(col: String) extends TimeSpec {
    def encoded: String = s"days($col)"
    def keyOfDay(day: Long): Long = day
    def dayRange(key: Long): (Long, Long) = (key, key)
  }
  /** Monthly layout (r12): pkey = months since 1970-01 — the
    * reference's MTD/rollup tier as a coarser hidden layout for
    * tables whose natural slice is a month, not a day. */
  final case class Months(col: String) extends TimeSpec {
    def encoded: String = s"months($col)"
    def keyOfDay(day: Long): Long = monthOfDay(day)
    def dayRange(key: Long): (Long, Long) =
      (monthStartDay(key), monthStartDay(key + 1) - 1)
  }
  /** Yearly layout (r12): pkey = years since 1970 (the YoY tier). */
  final case class Years(col: String) extends TimeSpec {
    def encoded: String = s"years($col)"
    def keyOfDay(day: Long): Long = yearOfDay(day)
    def dayRange(key: Long): (Long, Long) =
      (yearStartDay(key), yearStartDay(key + 1) - 1)
  }

  private val BucketRe = """bucket\((\d+),([^)]+)\)""".r
  private val TruncRe = """truncate\((\d+),([^)]+)\)""".r
  private val DaysRe = """days\(([^)]+)\)""".r
  private val MonthsRe = """months\(([^)]+)\)""".r
  private val YearsRe = """years\(([^)]+)\)""".r

  /** Decode an encoded partition column; a bare name is identity. */
  def parse(encoded: String): Spec = encoded match {
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case TruncRe(w, c)  => Trunc(w.toLong, c)
    case DaysRe(c)      => Days(c)
    case MonthsRe(c)    => Months(c)
    case YearsRe(c)     => Years(c)
    case c              => Identity(c)
  }

  def isHidden(spec: Spec): Boolean = !spec.isInstanceOf[Identity]

  // ---- multi-transform specs (r12) --------------------------------------
  // `PARTITIONED BY (days(ts), bucket(16, user_id))` — the classic
  // 100-TB layout: a time unit for window pruning × a bucket for point
  // lookups and SPJ-shaped clustering. Encoding: component encodings
  // joined with "," in DECLARED order; the composite pkey is the
  // components' derived keys joined with "|". Composites are restricted
  // to exactly ONE time transform (days/months/years) plus ONE bucket:
  // both derive NUMERIC key strings (no separator collisions — identity
  // and truncate-on-string keys are raw text and stay single-spec), and
  // the writer's resident-sink bound stays provable (≤ N bucket sinks
  // inside one time-key run; time keys arrive monotone under the
  // write's required ordering by the time source).

  /** Split an encoded multi spec on top-level commas (commas inside
    * `bucket(8,col)` parens stay put). */
  def parseMulti(encoded: String): Seq[Spec] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    encoded.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => parts += sb.result().trim; sb.clear()
      case c => sb += c
    }
    parts += sb.result().trim
    val specs = parts.filter(_.nonEmpty).map(parse).toSeq
    if (specs.size > 1) requireValidMulti(specs)
    specs
  }

  def encodedMulti(specs: Seq[Spec]): String = specs.map(_.encoded).mkString(",")

  /** The composite contract: exactly one TimeSpec + one Bucket. */
  def requireValidMulti(specs: Seq[Spec]): Unit = {
    require(specs.size == 2 &&
        specs.count(_.isInstanceOf[TimeSpec]) == 1 &&
        specs.count(_.isInstanceOf[Bucket]) == 1,
      s"multi-transform layouts are exactly one of days/months/years(col) plus one " +
        s"bucket(n, col) (any order), got ${encodedMulti(specs)}")
    val cols = specs.map(_.col)
    require(cols.distinct.size == cols.size,
      s"multi-transform components must name distinct source columns, got ${encodedMulti(specs)}")
  }

  /** Conjunctive pruning over a composite pkey: every component gets
    * its own derived key; a file survives only if EVERY component may
    * match. A component-count mismatch (evolution debris) keeps the
    * file — conservative, like every other skipping tier. */
  def pkeyMayMatchMulti(specs: Seq[Spec], f: Filter, pkey: String): Boolean =
    if (specs.size <= 1) specs.forall(pkeyMayMatch(_, f, pkey))
    else {
      val parts = pkey.split("\\|", -1)
      parts.length != specs.size ||
        specs.zip(parts).forall { case (s, p) => pkeyMayMatch(s, f, p) }
    }

  val MicrosPerDay: Long = 86400000000L

  def bucketLong(n: Int, v: Long): Int = (((Bloom.hashLong(v) % n) + n) % n).toInt
  def bucketString(n: Int, s: String): Int = (((Bloom.hashString(s) % n) + n) % n).toInt
  def truncLong(w: Long, v: Long): Long = v - (((v % w) + w) % w)
  def truncString(w: Long, s: String): String =
    if (s.length <= w) s else s.substring(0, w.toInt)
  def dayOfMicros(us: Long): Long = Math.floorDiv(us, MicrosPerDay)
  /** Months since 1970-01 of an epoch day (proleptic Gregorian, UTC —
    * `LocalDate` is exactly that calendar; Iceberg's `months()`). */
  def monthOfDay(day: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(day)
    (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
  }
  /** Years since 1970 of an epoch day (Iceberg's `years()`). */
  def yearOfDay(day: Long): Long = java.time.LocalDate.ofEpochDay(day).getYear - 1970L
  /** Epoch day of the first day of month index `m`. */
  def monthStartDay(m: Long): Long =
    java.time.LocalDate.of((1970 + Math.floorDiv(m, 12)).toInt,
      Math.floorMod(m, 12).toInt + 1, 1).toEpochDay
  /** Epoch day of Jan 1 of year index `y`. */
  def yearStartDay(y: Long): Long =
    java.time.LocalDate.of((1970 + y).toInt, 1, 1).toEpochDay

  /** May a file whose single derived partition key is `pkey` contain a
    * row matching `f`? Conservative: an unrecognized predicate shape
    * keeps the file (pruning proves absence, never presence — the same
    * stance as every other skipping tier). */
  def pkeyMayMatch(spec: Spec, f: Filter, pkey: String): Boolean = spec match {
    case Identity(_) => true // identity pkeys prune via string bounds already
    case Bucket(n, c) => f match {
      case EqualTo(`c`, v: Number) => bucketLong(n, v.longValue()).toString == pkey
      case EqualTo(`c`, v: String) => bucketString(n, v).toString == pkey
      case In(`c`, vs) if vs.nonEmpty && vs.forall(_ != null) =>
        vs.exists {
          case v: Number => bucketLong(n, v.longValue()).toString == pkey
          case v: String => bucketString(n, v).toString == pkey
          case _         => true
        }
      case _ => true
    }
    case Trunc(w, c) => f match {
      case EqualTo(`c`, v: String) => truncString(w, v) == pkey
      case StringStartsWith(`c`, v) if v != null =>
        if (v.length >= w) v.substring(0, w.toInt) == pkey else pkey.startsWith(v)
      case In(`c`, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        vs.exists(v => truncString(w, v.asInstanceOf[String]) == pkey)
      // numeric range/equality: rows of this file live in
      // [pkey, pkey + w - 1] — reuse the numeric interval law
      case _ if JsonlStats.skipColumn(f).contains(c) =>
        pkey.toLongOption.forall(p =>
          JsonlStats.intervalMayMatch(f, p.toDouble, (p + w - 1).toDouble))
      case _ => true
    }
    // days/months/years(ts): the file's rows live inside ONE calendar
    // unit — the key names an inclusive day range [d0, d1]; a
    // timestamp predicate tests against [d0·µs, (d1+1)·µs − 1], a
    // date predicate against [d0, d1] (filterDouble maps both value
    // families onto the matching epoch unit). Mixed-type value lists
    // keep the file — the unit would be ambiguous.
    case t: TimeSpec =>
      val c = t.col
      val vals: Seq[Any] = f match {
        case GreaterThan(`c`, v)        => Seq(v)
        case GreaterThanOrEqual(`c`, v) => Seq(v)
        case LessThan(`c`, v)           => Seq(v)
        case LessThanOrEqual(`c`, v)    => Seq(v)
        case EqualTo(`c`, v)            => Seq(v)
        case In(`c`, vs) if vs.nonEmpty && vs.forall(_ != null) => vs.toSeq
        case _ => Nil
      }
      def isTs(v: Any) =
        v.isInstanceOf[java.time.Instant] || v.isInstanceOf[java.sql.Timestamp] ||
          v.isInstanceOf[java.time.LocalDateTime] // TimestampNTZ (r12)
      def isDate(v: Any) =
        v.isInstanceOf[java.time.LocalDate] || v.isInstanceOf[java.sql.Date]
      if (vals.isEmpty) true
      else if (vals.forall(isTs))
        pkey.toLongOption.forall { key =>
          val (d0, d1) = t.dayRange(key)
          JsonlStats.intervalMayMatch(f,
            (d0 * MicrosPerDay).toDouble, (d1 * MicrosPerDay + MicrosPerDay - 1).toDouble)
        }
      else if (vals.forall(isDate))
        pkey.toLongOption.forall { key =>
          val (d0, d1) = t.dayRange(key)
          JsonlStats.intervalMayMatch(f, d0.toDouble, d1.toDouble)
        }
      else true
  }
}
