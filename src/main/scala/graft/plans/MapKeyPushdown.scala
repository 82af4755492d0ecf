package graft.plans

import graft.sources.{GraftCatalog, JsonlStats, JsonlStatsTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ApplyFunctionExpression, AttributeReference, AttributeSet, GetMapValue, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Makes map-key predicates PRUNABLE (r13). Spark's V2ExpressionBuilder
  * does not translate `GetMapValue`, so `WHERE props['lang'] = 'de'`
  * never reaches a DSv2 scan builder — the per-key file statistics the
  * writer records ([[graft.sources.JsonlStatsWrite]] `<map>.<key>`
  * bounds + the `<map>#mk` completeness marker) would sit unread, and
  * a map-key slice would scan every file.
  *
  * The fix keeps the r12 predicate-derived contract (no side-channel
  * options): this injected rule rewrites `GetMapValue(<graft map
  * column>, <literal key>)` occurrences INSIDE FILTER CONDITIONS into
  * the V2 catalog function `graft_map_get(map, key)` —
  * value-identical by construction (Spark 3.4+ map access is null on a
  * missing key under ANSI and non-ANSI alike; the function replays
  * exactly that: null map/key → null, missing key → null, null value →
  * null). An `ApplyFunctionExpression` over a `ScalarFunction` IS
  * translatable, so the predicate arrives at the scan builder as a
  * `UserDefinedScalarFunc` with [[GraftCatalog.MapGetCanonical]], the
  * planner derives per-key interval constraints FROM it, and Spark
  * still evaluates the same function over surviving rows — pruning can
  * never under-cover the filter because both are one expression.
  *
  * Scope is deliberately narrow: filter conditions only (a projection
  * rewrite would trade codegen'd map access for an interpreted
  * function call with no pruning to show for it), attribute-rooted map
  * columns of a graft relation in the filter's subtree, foldable
  * string keys the statistics can actually carry
  * ([[JsonlStats.mapStatKeyOk]]), and value types the stats track.
  * Everything else keeps its original node — semantics never depend on
  * this rule firing. */
class MapKeyPushdown(spark: SparkSession) extends Rule[LogicalPlan] {

  private def eligible(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    // r14: string-valued maps carry truncated per-key bounds in scols
    case MapType(StringType, StringType, _) => true
    case MapType(StringType, vt, _) => JsonlStats.numericStatType(vt)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if cond.exists(_.isInstanceOf[GetMapValue]) =>
      val graftAttrs = child.collect {
        case r: DataSourceV2Relation if r.table.isInstanceOf[JsonlStatsTable] =>
          r.outputSet
      }.foldLeft(AttributeSet.empty)(_ ++ _)
      if (graftAttrs.isEmpty) f
      else {
        val rewritten = cond.transformUp {
          case GetMapValue(a: AttributeReference, lit @ Literal(k: UTF8String, StringType))
              if graftAttrs.contains(a) && eligible(a.dataType) &&
                JsonlStats.mapStatKeyOk(k.toString) =>
            val vt = a.dataType.asInstanceOf[MapType].valueType
            ApplyFunctionExpression(GraftCatalog.MapGetBound(vt), Seq(a, lit))
        }
        if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
      }
  }
}
