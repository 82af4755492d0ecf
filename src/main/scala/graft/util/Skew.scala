package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join (SURVEY.md §7.4 "salted keys for skewed
  * user_ids").
  *
  * For a fact⋈fact equi-join where a handful of hot keys overload single
  * reducers and AQE's skew-join split isn't available (e.g. custom
  * partitioners, pre-AQE engines, or deliberate static plans): salt the
  * skewed (left) side with a random-free deterministic salt derived from
  * a spread column, and explode the right side once per salt bucket.
  * Result is row-identical to the plain join; the hot key's rows spread
  * over `buckets` reducers.
  *
  * At 100 TB you apply this only to keys above a frequency threshold
  * (two-pass: count keys, broadcast the hot-key set, salt only those);
  * this helper is the uniform variant used when the whole key space is
  * moderately hot.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a spread column (an id or
    * hash — must be stable, NOT rand(), so retries/speculative tasks
    * agree). */
  def saltCol(spread: Column, buckets: Int): Column =
    pmod(hash(spread), lit(buckets))

  /** Equi-join `left ⋈ right` on `key`, salted into `buckets`.
    * `leftSpread` must be a column of `left` with per-row variation
    * (e.g. a row id) so the hot key's rows distribute. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     leftSpread: Column, buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt", saltCol(leftSpread, buckets))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** The 100-TB variant the header promises: two-pass HOT-KEY-ONLY
    * salting. Pass 1 counts left-side keys and keeps those at or above
    * `hotThreshold` — a set that is small BY DEFINITION (a key is hot
    * because it owns a large share of the rows, so there can only be a
    * few). Pass 2 splits both sides on broadcast semi/anti joins against
    * that set: hot rows take the salted join (right side replicated
    * `buckets`× for hot keys ONLY), cold rows take the plain equi-join
    * untouched. Result ≡ plain join, row for row — the cold path pays
    * zero replication, which is what makes this affordable where
    * [[saltedEquiJoin]]'s uniform `buckets`× dim explosion is not. */
  def hotKeySaltedJoin(left: DataFrame, right: DataFrame, key: String,
                       leftSpread: Column, buckets: Int,
                       hotThreshold: Long): DataFrame = {
    val hot = broadcast(
      left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= hotThreshold)
        .select(col(key)))
    val leftHot   = left.join(hot, Seq(key), "left_semi")
    val leftCold  = left.join(hot, Seq(key), "left_anti")
    val rightHot  = right.join(hot, Seq(key), "left_semi")
    val rightCold = right.join(hot, Seq(key), "left_anti")
    saltedEquiJoin(leftHot, rightHot, key, leftSpread, buckets)
      .unionByName(leftCold.join(rightCold, Seq(key)))
  }
}
