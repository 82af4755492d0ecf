package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for oracle-differential testing.
  *
  * The driver hash-compares our Parquet output against DuckDB running the
  * same ANSI SQL. Floating-point SUMs are order-dependent (Spark's partial
  * aggregation tree vs DuckDB's parallel scan associate differently), so any
  * aggregate over doubles would differ in the last ulps and fail an exact
  * hash. The fix used across every money-ish aggregate:
  *
  *   1. evaluate the per-row expression in IEEE double (bit-identical in
  *      both engines — scalar expressions are not reassociated),
  *   2. cast to DECIMAL(18,6) per row. Scale 6 ≥ the true decimal scale of
  *      every money expression in the engine (2dp inputs, products of up
  *      to three 2dp factors → ≤6dp), so the double sits within ~1e-10 of
  *      a representable grid point and BOTH engines round to that exact
  *      point — tie-breaking rules (Spark HALF_UP vs DuckDB) never engage.
  *      (Scale 2 is NOT safe: a 4dp-true product rounds at a non-grid
  *      point, where the engines' tie rules diverge — observed as ±0.01
  *      per-row drift.)
  *   3. SUM the decimals — decimal addition is exact and order-independent,
  *   4. cast the final decimal back to DOUBLE (deterministic nearest-even).
  *
  * DuckDB leg spells the same thing: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS
  * DOUBLE). At 100 TB the decimal sum is still a single-word-per-row hash
  * aggregate with map-side partial aggregation — no perf cliff vs double.
  */
object Det {
  val Money: DecimalType = DecimalType(18, 6)

  /** Order-independent exact sum of a money-like double expression. */
  def msum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Decimal-typed sum (keep as decimal, e.g. to feed a window sum). */
  def msumDec(c: Column): Column = sum(c.cast(Money))

  /** Exact average = exact decimal sum / count, divided in double. */
  def mavg(c: Column): Column =
    sum(c.cast(Money)).cast(DoubleType) / count(c)
}
