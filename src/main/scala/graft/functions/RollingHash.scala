package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: one 64-bit polynomial rolling hash per
  * overlapping `gramLen`-codepoint window of a string, as `array<long>`
  * (empty when the string is shorter than `gramLen`).
  *
  * This is tier 1 of the two-tier exact-substring audit (q226): the
  * corpus-wide shuffle carries 8-byte hashes instead of L-char gram
  * strings, and only COLLIDING hash buckets are ever materialized as
  * strings for exact verification. The law the audit rides on is
  * one-sided: equal windows ⇒ equal hashes (polynomial in the window's
  * codepoints over the 2^64 ring — position-independent by
  * construction), so a window whose exact string occurs ≥2 times
  * ALWAYS collides; hash collisions of distinct strings merely add
  * candidates that tier 2 rejects exactly.
  *
  * Codepoint windows match Spark's `substr`/`length` character
  * semantics, so position i here is exactly `substr(text, i+1, L)`.
  * The O(n) rolling loop lives in [[SubstrRollingHash.hashesOf]] and is
  * invoked from generated code — the expression stays inside
  * whole-stage codegen (no CodegenFallback boundary) without asking
  * Janino to compile the loop.
  */
case class SubstrRollingHash(child: Expression, gramLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hashes requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_hashes"

  override protected def nullSafeEval(s: Any): Any =
    SubstrRollingHash.hashesOf(s.asInstanceOf[UTF8String], gramLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SubstrRollingHash.hashesOf($c, $gramLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubstrRollingHash {
  /** Polynomial base: a prime far from any power of two, so low bits mix. */
  private val B = 1000003L

  /** Entry point shared by interpreted eval and generated code. */
  def hashesOf(s: UTF8String, gramLen: Int): ArrayData = {
    val str = s.toString
    // codepoint array: window positions must agree with Spark substr()
    val n = str.codePointCount(0, str.length)
    if (n < gramLen) return new GenericArrayData(Array.emptyLongArray)
    val cp = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val c = str.codePointAt(off)
      cp(ci) = c
      ci += 1
      off += Character.charCount(c)
    }
    val out = new Array[Long](n - gramLen + 1)
    // B^(L-1) in the 2^64 ring, for the subtract-leading-term step
    var bPow = 1L
    var j = 0
    while (j < gramLen - 1) { bPow *= B; j += 1 }
    var h = 0L
    j = 0
    while (j < gramLen) { h = h * B + cp(j); j += 1 }
    out(0) = h
    var i = 1
    while (i < out.length) {
      h = (h - cp(i - 1) * bPow) * B + cp(i + gramLen - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
