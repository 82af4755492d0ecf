package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
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
  *     the CacheManager-style structural identity). A Filter may ride
  *     between (either side of the Project) ONLY when its condition is
  *     a function of the MV's GRAIN columns — `event_type`, a
  *     date-cast chain of `ts`, or the inferred `isnotnull(ts)` (which
  *     maps to `isnotnull(event_date)`: a timestamp is null iff its
  *     date is). Such a predicate keeps or drops whole grain groups,
  *     so it commutes with the MV's merge and is PUSHED TO THE MV SCAN
  *     (the dashboard date-range-over-`agg_daily_revenue` pattern — at
  *     100 TB the rewrite turns a raw scan into a few MV files). Any
  *     predicate mentioning a non-grain column (it could cut rows the
  *     MV already merged) declines;
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
    case agg @ Aggregate(gs, res, child, _) if gs.nonEmpty && !registry.isEmpty =>
      // accept the four optimized shapes under the aggregate; a Filter's
      // condition is carried to tryRewrite, which only fires when it
      // translates wholly into MV grain columns
      val shape: Option[(Seq[NamedExpression], Option[Expression], LogicalRelation)] =
        child match {
          case Project(p, rel: LogicalRelation) => Some((p, None, rel))
          case Project(p, Filter(c, rel: LogicalRelation)) => Some((p, Some(c), rel))
          case Filter(c, Project(p, rel: LogicalRelation)) =>
            // inline the project's aliases so the condition speaks in
            // raw-relation columns like the pushed-filter shape does
            val defs = p.collect { case al @ Alias(e, _) => al.exprId -> e }.toMap
            Some((p, Some(c.transform {
              case a: Attribute if defs.contains(a.exprId) => defs(a.exprId)
            }), rel))
          case Filter(c, rel: LogicalRelation) =>
            Some((rel.output, Some(c), rel))
          case _ => None
        }
      shape match {
        case Some((p, c, rel)) if pathOf(rel).exists(registry.containsKey) =>
          tryRewrite(agg, gs, res, p, rel, c).getOrElse(agg)
        case _ => agg
      }
  }

  private def tryRewrite(agg: Aggregate, gs: Seq[Expression], res: Seq[NamedExpression],
                         projList: Seq[NamedExpression],
                         rel: LogicalRelation,
                         cond: Option[Expression]): Option[LogicalPlan] = {
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

    /** Grain-column filter translation (r8): rewrite the condition over
      * MV columns — `event_type` maps to the MV attribute, a date-cast
      * chain of `ts` maps to `event_date`, and the optimizer-inferred
      * `isnotnull(ts)` maps to `isnotnull(event_date)` (a non-null
      * timestamp always casts to a non-null date, so the null sets
      * coincide). Sound because such a predicate is a function of the
      * grain VALUE: it keeps or drops whole MV groups, commuting with
      * the merge. Any surviving raw-relation reference (a `value`
      * comparison, a raw-timestamp cut finer than a day) means the
      * predicate is NOT grain-functional — decline. */
    def translateCond(c: Expression): Option[Expression] = {
      if (!c.deterministic) return None
      val (mvType, mvDate) = (mvAttr("event_type"), mvAttr("event_date")) match {
        case (Some(t), Some(d)) => (t, d)
        case _ => return None
      }
      def isTs(a: Attribute): Boolean = relAttr("ts").exists(_.semanticEquals(a))
      // Spark's UnwrapCastInBinaryComparison has ALREADY rewritten
      // `cast(ts as date) >= date D` into the raw-timestamp range
      // `ts >= timestamp 'D 00:00:00'` by the time extraOptimizations
      // run — so the grain-functional shape to recognize is a ts
      // comparison whose literal is EXACTLY midnight in the session
      // zone: `ts >= D₀₀` ⟺ `event_date >= D` and `ts < D₀₀` ⟺
      // `event_date < D` (both sides of each, for literal-first
      // normalizations). A non-midnight literal is a genuine sub-day
      // cut — not a function of the date grain — and falls through to
      // the reference check, which declines it.
      def midnightDate(v: Any): Option[Literal] = v match {
        case micros: java.lang.Long =>
          val zone = java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          val zdt = org.apache.spark.sql.catalyst.util.DateTimeUtils
            .microsToInstant(micros.longValue).atZone(zone)
          if (zdt.toLocalTime == java.time.LocalTime.MIDNIGHT)
            Some(Literal(zdt.toLocalDate.toEpochDay.toInt, DateType))
          else None
        case _ => None
      }
      val t = c.transformUp {
        case a: Attribute if relAttr("event_type").exists(_.semanticEquals(a)) => mvType
        case IsNotNull(a: Attribute) if isTs(a) => IsNotNull(mvDate)
        case GreaterThanOrEqual(a: Attribute, Literal(v, org.apache.spark.sql.types.TimestampType))
            if isTs(a) && midnightDate(v).isDefined =>
          GreaterThanOrEqual(mvDate, midnightDate(v).get)
        case LessThan(a: Attribute, Literal(v, org.apache.spark.sql.types.TimestampType))
            if isTs(a) && midnightDate(v).isDefined =>
          LessThan(mvDate, midnightDate(v).get)
        case LessThanOrEqual(Literal(v, org.apache.spark.sql.types.TimestampType), a: Attribute)
            if isTs(a) && midnightDate(v).isDefined =>
          LessThanOrEqual(midnightDate(v).get, mvDate)
        case GreaterThan(Literal(v, org.apache.spark.sql.types.TimestampType), a: Attribute)
            if isTs(a) && midnightDate(v).isDefined =>
          GreaterThan(midnightDate(v).get, mvDate)
        case e if e.dataType == DateType && (stripCasts(e) match {
              case a: Attribute => isTs(a)
              case _ => false
            }) => mvDate
      }
      if (t.references.subsetOf(mvPlan.outputSet)) Some(t) else None
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
    // None = no filter to carry; Some(Some(c)) = translated grain
    // filter, pushed to the MV scan; a condition that doesn't translate
    // vetoes the whole rewrite
    val newCond: Option[Option[Expression]] = cond match {
      case None => Some(None)
      case Some(c) => translateCond(c).map(Some(_))
    }
    for (g2 <- newGs; r2 <- newRes; c2 <- newCond)
      yield Aggregate(g2, r2, c2.map(Filter(_, mvPlan)).getOrElse(mvPlan), agg.hint)
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
