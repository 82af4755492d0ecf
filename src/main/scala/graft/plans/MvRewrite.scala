package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

/** MATERIALIZED-VIEW QUERY REWRITE — the warehouse feature that makes
  * q96's incrementally-maintained gold table transparent: a query
  * written against the RAW event feed is answered from the
  * pre-aggregated MV whenever the MV's grain covers it, without the
  * query author knowing the MV exists (Oracle/Calcite "aggregate
  * rewrite"; Databricks MV rewrite). At 100 TB this turns a daily-
  * dashboard aggregate from a full fact scan into a read of a
  * day×type-sized table the q96/q201 machinery keeps fresh.
  *
  * Soundness model — the rewrite fires only on EXACTLY the shapes it
  * can prove:
  *   - plan = `Aggregate(gs, res, Project(p, Relation))` where the
  *     Relation is the REGISTERED raw parquet (matched by root path —
  *     the CacheManager-style structural identity), with no Filter in
  *     between (a predicate could cut rows the MV already merged);
  *   - every grouping expression is one of the MV's grain columns:
  *     the `event_type` attribute, or a cast-chain from `ts` ending in
  *     DATE (the optimizer extracts `to_date(ts)` into the Project as
  *     a `_groupingexpression` alias — matched by stripping casts);
  *     COARSER grains (a subset of the MV grain) re-aggregate
  *     correctly by construction;
  *   - every aggregate is `count(1)` → `sum(mv.n_events)` (wrapped in
  *     `coalesce(..,0)` to preserve count's non-nullability) or
  *     `sum(cast(value as decimal(18,6)))` → `sum(mv.total_dec)`
  *     (types align because the MV stores the per-grain total cast
  *     back to decimal(18,6));
  *   - `gs.nonEmpty`: a GLOBAL aggregate over an empty relation
  *     returns one row (count=0) while an empty MV sum returns null —
  *     the one shape where re-aggregation is not value-identical, so
  *     it is excluded rather than special-cased.
  * Anything else leaves the plan untouched. Output attribute
  * EXPR-IDS are preserved (each rewritten result keeps its alias id),
  * so parent operators never notice the substitution. AQE re-planning
  * re-runs the rule but the rewritten aggregate's child is the MV
  * relation — unregistered, so the rewrite is idempotent.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registration: raw-table parquet path → MV parquet path. The
    * MV layout contract: columns (event_date DATE, event_type STRING,
    * n_events LONG, total_dec DECIMAL(18,6)) at (day, type) grain. */
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(rawPath: String, mvPath: String): Unit = registry.put(rawPath, mvPath)
  def clear(): Unit = registry.clear()

  /** Scheme-free path (rootPaths render as `file:/...`; registrations
    * arrive as plain filesystem paths). */
  private def pathOf(rel: LogicalRelation): Option[String] = rel.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toUri.getPath)
    case _ => None
  }

  /** Strip any cast chain; the underlying attribute if that's all there is. */
  @annotation.tailrec
  private def stripCasts(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCasts(c)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(gs, res, Project(projList, rel: LogicalRelation), _)
        if gs.nonEmpty && !registry.isEmpty &&
          pathOf(rel).exists(p => registry.containsKey(p)) =>
      tryRewrite(agg, gs, res, projList, rel).getOrElse(agg)
  }

  private def tryRewrite(agg: Aggregate, gs: Seq[Expression], res: Seq[NamedExpression],
                         projList: Seq[NamedExpression],
                         rel: LogicalRelation): Option[LogicalPlan] = {
    val mvPath = registry.get(pathOf(rel).get)
    def relAttr(n: String): Option[Attribute] = rel.output.find(_.name == n)

    // classify each Project output: Some("event_type") / Some("event_date")
    // for grain columns, Some("value") for the measure input, None = unknown
    val roles: Map[ExprId, String] = projList.flatMap { ne =>
      val (target, out) = ne match {
        case a: Attribute => (a: Expression, a)
        case al @ Alias(e, _) => (e, al.toAttribute)
        case other => (other, other.toAttribute)
      }
      target match {
        case a: Attribute if relAttr("event_type").exists(_.semanticEquals(a)) =>
          Some(out.exprId -> "event_type")
        case a: Attribute if relAttr("value").exists(_.semanticEquals(a)) =>
          Some(out.exprId -> "value")
        case e if e.dataType == DateType =>
          stripCasts(e) match {
            case a: Attribute if relAttr("ts").exists(_.semanticEquals(a)) =>
              Some(out.exprId -> "event_date")
            case _ => None
          }
        case _ => None
      }
    }.toMap

    // the MV relation, resolved fresh (attribute ids are new each time —
    // they only need to be consistent within this rewritten subtree)
    val mvPlan = SparkSession.active.read.parquet(mvPath)
      .queryExecution.analyzed
    def mvAttr(n: String): Option[Attribute] = mvPlan.output.find(_.name == n)

    def grain(e: Expression): Option[Attribute] = e match {
      case a: Attribute => roles.get(a.exprId) match {
        case Some("event_type") => mvAttr("event_type")
        case Some("event_date") => mvAttr("event_date")
        case _ => None
      }
      case _ => None
    }

    def measure(ae: AggregateExpression): Option[Expression] =
      if (ae.isDistinct || ae.filter.isDefined) None
      else ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) =>
          mvAttr("n_events").map(n =>
            Coalesce(Seq(ae.copy(aggregateFunction = Sum(n)), Literal(0L, LongType))))
        case Sum(c @ Cast(a: Attribute, dt: DecimalType, _, _), _)
            if dt == DecimalType(18, 6) && roles.get(a.exprId).contains("value") =>
          mvAttr("total_dec").map(t => ae.copy(aggregateFunction = Sum(t)))
        case _ => None
      }

    val newGs: Option[Seq[Expression]] = sequence(gs.map(grain(_).map(a => a: Expression)))
    val newRes: Option[Seq[NamedExpression]] = sequence(res.map {
      case al @ Alias(ae: AggregateExpression, name) =>
        measure(ae).map(m => Alias(m, name)(al.exprId, al.qualifier, al.explicitMetadata))
      // a presentation cast riding on the aggregate (e.g. sum(dec) cast
      // to double) carries over the substituted measure unchanged
      case al @ Alias(Cast(ae: AggregateExpression, dt, tz, mode), name) =>
        measure(ae).map(m => Alias(Cast(m, dt, tz, mode), name)(
          al.exprId, al.qualifier, al.explicitMetadata))
      case al @ Alias(e, name) =>
        grain(e).map(a => Alias(a, name)(al.exprId, al.qualifier, al.explicitMetadata))
      case a: Attribute =>
        grain(a).map(m => Alias(m, a.name)(a.exprId, a.qualifier))
      case _ => None
    })
    for (g2 <- newGs; r2 <- newRes) yield Aggregate(g2, r2, mvPlan, agg.hint)
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}

/** Programmatic registration (same pattern as [[WindowTopKRewriteOps]]). */
object MvRewriteOps {
  def ensureRule(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.exists(_ eq MvRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ MvRewrite
  }
}
