package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native replacement for the similarity tier's exact-decimal vector
  * folds (r16, guide §4 "eliminate non-codegen expressions in the hot
  * path"): the `aggregate(zip_with(...))` formulation of
  * [[graft.ext.SimilarityMath.dotDec]] / k-means `dist2` is a
  * CodegenFallback LAMBDA per element — every one of the N·K·64
  * distance terms pays interpreted lambda dispatch plus an intermediate
  * Decimal ARRAY materialized per row. This expression runs the same
  * fold as a tight loop over the input arrays: no intermediate array,
  * no per-element expression-tree evaluation.
  *
  * Exactness contract: the result must be BIT-IDENTICAL to the HOF
  * pipeline (the DuckDB oracles mirror that pipeline's decimal chain),
  * so each step replicates the analyzed Catalyst semantics exactly:
  *
  *   - per-element term: plain IEEE double arithmetic ((x−y)² or x·y,
  *     floats widened first) — identical to the zip_with lambda;
  *   - `CAST(term AS DECIMAL(38,25))`: `Decimal(double)` (shortest-
  *     string BigDecimal) + `changePrecision(38,25)` (HALF_UP, null on
  *     overflow; NaN/Inf → null) — Spark's Cast path verbatim;
  *   - the fold's `(acc + v) CAST DECIMAL(38,25)`: Spark types the Add
  *     as DECIMAL(38,24) under allowPrecisionLoss (p=39,s=25 adjusted),
  *     wraps it in CheckOverflow, then the lambda's cast scales back to
  *     25 — so each partial sum passes through `changePrecision(38,24)`
  *     then `changePrecision(38,25)` ([[graft.DecFoldSpec]] pins this
  *     model against the live HOF on adversarial magnitudes, where the
  *     scale-24 rounding actually bites);
  *   - final `CAST(... AS DOUBLE)`: `Decimal.toDouble`.
  *
  * Null/error semantics replicated (probed empirically against the live
  * HOF, see DecFoldSpec + the r16 log): null array → null; length
  * mismatch → the zip_with null-padding poisons the sum → null; null
  * element → null; NaN/Inf element term → null (the numeric→decimal
  * cast nulls specials EVEN under ANSI); decimal overflow → under ANSI
  * (the engine default) the same SparkArithmeticException
  * NUMERIC_VALUE_OUT_OF_RANGE that Cast/CheckOverflow raise, else null.
  */
case class DecVecFold(left: Expression, right: Expression, squaredDiff: Boolean)
  extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    // the dist2 flavor is double-only: the HOF it replicates subtracts
    // IN THE ELEMENT TYPE, so float arrays would diff in float precision
    // — a different chain than this loop's widen-first. Production dist2
    // only ever feeds arrays pre-cast to double (ClusterTrain), so the
    // float case is rejected rather than silently mis-modeled.
    case ArrayType(FloatType, _) => !squaredDiff
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${if (squaredDiff) "array<double>" else "array<float|double>"} arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = if (squaredDiff) "graft_dec_dist2" else "graft_dec_dot"

  // ADVICE r16: the fold returns NULL even for non-null, non-nullable
  // inputs (NaN/Inf terms, null elements, length mismatch, non-ANSI
  // overflow) — BinaryExpression's default (left.nullable ||
  // right.nullable) would let the optimizer fold IsNull(...) to false
  // over constrained schemas and miscompile non-nullable writes.
  override def nullable: Boolean = true

  private val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  // captured at construction (= analysis time, like CheckOverflow's
  // nullOnOverflow) and serialized with the expression
  private val ansi =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  private def overflow(value: Decimal, precision: Int, scale: Int): java.lang.Double =
    if (ansi) throw org.apache.spark.sql.graftops.Bridge
      .decimalOverflowError(value, precision, scale)
    else null

  override protected def nullSafeEval(a: Any, b: Any): Any =
    foldEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** The fold loop, shared by interpreted and generated evaluation
    * (r17, guide §4 / VERDICT r16 #5: the CodegenFallback broke the
    * ENCLOSING WholeStageCodegen span — every other expression in the
    * same Project fell back to interpreted dispatch with it). Boxed
    * Double-or-null so generated code can branch on the null result. */
  def foldEval(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    // zip_with pads the shorter side with nulls; a null term then
    // poisons the whole fold — the HOF yields null, so do we
    if (y.numElements() != n) return null
    var acc = Decimal(0L, 38, 25)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xd = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yd = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val term = if (squaredDiff) { val d = xd - yd; d * d } else xd * yd
      // Cast(double → DECIMAL(38,25)): NaN/Inf → null even under ANSI
      if (java.lang.Double.isNaN(term) || java.lang.Double.isInfinite(term)) return null
      val t = Decimal(term)
      if (!t.changePrecision(38, 25)) return overflow(Decimal(term), 38, 25)
      // the fold's Add is typed DECIMAL(38,24) (CheckOverflow), then the
      // lambda's cast returns to scale 25; a failed changePrecision
      // leaves the value unmodified, so the error carries the same
      // decimal the HOF chain reports at each stage
      val s = acc + t
      if (!s.changePrecision(38, 24)) return overflow(s, 38, 24)
      if (!s.changePrecision(38, 25)) return overflow(s, 38, 25)
      acc = s
      i += 1
    }
    java.lang.Double.valueOf(acc.toDouble)
  }

  // keep the whole-stage span alive: generated code calls the same
  // fold loop through an expression reference — no per-row interpreted
  // Expression.eval dispatch, and sibling expressions stay compiled
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("decVecFold", this, classOf[DecVecFold].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val tmp = ctx.freshName("decFoldRes")
      s"""
         |java.lang.Double $tmp = $self.foldEval($x, $y);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
