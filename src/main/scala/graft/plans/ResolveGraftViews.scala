package graft.plans

import graft.sources.{GraftCatalog, GraftViews}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, FunctionRegistry, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Analyzer rule that resolves SELECTs over [[GraftCatalog]]'s stored
  * views ([[GraftViews]]).
  *
  * Spark 4.1 ships the V2 `ViewCatalog` INTERFACE but wires none of it
  * into the analyzer — `grep ViewCatalog` over spark-sql/spark-catalyst
  * bytecode hits only the interface itself, and `CREATE VIEW cat.v`
  * fails with MISSING_CATALOG_ABILITY before the catalog is consulted.
  * Engines that persist views (Iceberg's Spark extensions are the
  * public reference for the approach) therefore resolve them with an
  * injected rule. This rule is that seam, registered by
  * [[graft.functions.GraftExtensions]] (`injectResolutionRule`).
  *
  * Expansion is a MACRO expansion, done eagerly and completely in one
  * rule invocation:
  *
  *   1. an `UnresolvedRelation` whose identifier names a stored view in
  *      a registered GraftCatalog (head-is-catalog, or the session's
  *      current catalog for shorter names) is looked up;
  *   2. the stored SQL is parsed, its own WITH clauses substituted
  *      ([[CTESubstitution]] — the body never sees the outer query's
  *      CTE names, and vice versa);
  *   3. every remaining table reference in the body is QUALIFIED
  *      against the view's stored definition-time context
  *      (`currentCatalog`/`currentNamespace`), including inside
  *      subquery expressions — so the body resolves exactly as written
  *      no matter which catalog the READING session has current; bare
  *      non-builtin function names are qualified the same way (the V2
  *      FunctionCatalog's `graft_cell` et al.);
  *   4. nested graft views expand recursively THROUGH the same path
  *      with an explicit ancestor set — a definition cycle (possible
  *      via CREATE OR REPLACE after definition) fails loudly naming
  *      the cycle, never an analyzer fixed-point overrun;
  *   5. the stored output contract is re-applied: the body's columns
  *      are projected by the stored `queryColumnNames` and re-aliased
  *      to the stored `columnAliases` — a view whose underlying table
  *      dropped a referenced column fails naming that column, and a
  *      table that GAINED columns leaks nothing through a `SELECT *`
  *      view (the projection pins the definition-time column list).
  *
  * Because the result is ordinary analyzed relations, every scan-side
  * capability — filter/column pushdown, manifest file pruning, runtime
  * filtering, SPJ — applies through a view unchanged; `q289` pins the
  * planned-file fraction of a predicate THROUGH a view equal to the
  * direct scan's. Streaming reads (`readStream.table`) are left
  * untouched: a view is a batch macro, and expanding one under a
  * streaming relation would silently change micro-batch semantics.
  */
class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private val MaxDepth = 32

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedRelation(parts, _, false) =>
      lookupView(parts).map { case (catName, cat, ident, d) =>
        expand(catName, cat, ident, d, Set(viewKey(catName, ident)))
      }.getOrElse(u)
  }

  /** The MATERIALIZED-VIEW body, expanded exactly as a stale read would
    * see it (materialization ignored) — the refresh procedure builds
    * the backing table from this plan, so the precomputed rows and the
    * stale-path rows are the same derivation by construction. */
  def bodyPlan(catName: String, cat: GraftCatalog, ident: Identifier,
               d: GraftViews.ViewDef): LogicalPlan =
    expand(catName, cat, ident,
      d.copy(properties = d.properties - GraftViews.MvTableProp),
      Set(viewKey(catName, ident)))

  private def viewKey(catName: String, ident: Identifier): String =
    (catName +: ident.namespace() :+ ident.name()).mkString(".")

  /** A registered GraftCatalog by name, or None — never throws (this
    * probe runs for EVERY unresolved relation in every query). */
  private def graftCatalog(name: String): Option[(String, GraftCatalog)] = {
    val cm = spark.sessionState.catalogManager
    if (!cm.isCatalogRegistered(name)) return None
    cm.catalog(name) match {
      case g: GraftCatalog => Some((name, g))
      case _ => None
    }
  }

  /** Resolve `parts` to a stored view, mirroring Spark's name rules:
    * a leading registered catalog name is the catalog and the rest the
    * namespace-qualified view; otherwise the session's CURRENT catalog
    * is tried. A single-part name resolves relative to the CURRENT
    * namespace first, catalog-root-absolute second — Spark's own
    * precedence for tables (a bare name means "here", the root form is
    * the fallback), so a view named `v` both at root and in the current
    * namespace reads the near one, never silently the far one. */
  private def lookupView(parts: Seq[String])
      : Option[(String, GraftCatalog, Identifier, GraftViews.ViewDef)] = {
    def tryIdent(catName: String, cat: GraftCatalog, ns: Seq[String], name: String) = {
      val ident = Identifier.of(ns.toArray, name)
      if (cat.viewExists(ident))
        GraftViews.read(cat.namespaceDir(ident.namespace()), name).map((catName, cat, ident, _))
      else None
    }
    val headCat = if (parts.size >= 2) graftCatalog(parts.head).flatMap { case (n, c) =>
      tryIdent(n, c, parts.tail.init, parts.last)
    } else None
    headCat.orElse {
      val cm = spark.sessionState.catalogManager
      graftCatalog(cm.currentCatalog.name()).flatMap { case (n, c) =>
        if (parts.size == 1)
          tryIdent(n, c, cm.currentNamespace.toSeq, parts.head)
            .orElse(tryIdent(n, c, Seq.empty, parts.head))
        else tryIdent(n, c, parts.init, parts.last)
      }
    }
  }

  private def expand(catName: String, cat: GraftCatalog, ident: Identifier,
                     d: GraftViews.ViewDef, seen: Set[String]): LogicalPlan = {
    if (seen.size > MaxDepth)
      throw new IllegalArgumentException(
        s"view nesting deeper than $MaxDepth at ${viewKey(catName, ident)} — " +
          "flatten the definition chain")
    // MATERIALIZED view, FRESH (r12b): every recorded source table still
    // sits at its refresh-time version, so the backing table IS the
    // body's result — serve it and skip the recomputation entirely. Any
    // source that moved makes the view STALE and the body expands below
    // instead: reads are correct by construction in both states, the
    // materialization only decides which plan computes them. The
    // freshness probe is one manifest-version read per source — cheap,
    // and raced commits merely flip a fresh read into a (correct)
    // stale one.
    // The backing-existence probe guards the crash window of a rename
    // (backing moved, sidecar not yet): a fresh-looking sidecar whose
    // backing is gone expands the body instead — correct, just uncached.
    d.properties.get(GraftViews.MvTableProp) match {
      case Some(backing) if GraftViews.mvFresh(cat.warehouseRoot, d) &&
          GraftViews.mvBackingExists(cat.namespaceDir(ident.namespace()), d) =>
        val rel = UnresolvedRelation(
          (catName +: ident.namespace() :+ backing).toSeq,
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(), false)
        // a HAVING body's backing stores ALL groups (r15) — state
        // maintenance is HAVING-blind — so the fresh path re-applies
        // the stored predicate over the backing's visible columns; the
        // body path computes the same filter by construction
        val filtered = d.properties.get(GraftViews.MvHavingProp) match {
          case Some(h) => org.apache.spark.sql.catalyst.plans.logical.Filter(
            spark.sessionState.sqlParser.parseExpression(h), rel)
          case None => rel
        }
        // same output contract as the body path: projection by the
        // stored column list, loud failure on a drifted backing table
        val projected =
          if (d.queryColumnNames.nonEmpty)
            Project(d.queryColumnNames.map(q =>
              Alias(UnresolvedAttribute.quoted(q), q)()), filtered)
          else filtered
        return SubqueryAlias((catName +: ident.namespace()).mkString("."),
          SubqueryAlias(ident.name(), projected))
      case _ => ()
    }
    val parsed = spark.sessionState.sqlParser.parsePlan(d.sql)
    val substituted = CTESubstitution.apply(parsed)
    val ctx = d.currentCatalog +: d.currentNamespace
    val qualified = qualifyIdentifiers(substituted, ctx, seen)
    val projected =
      if (d.queryColumnNames.nonEmpty) {
        val aliases =
          if (d.columnAliases.size == d.queryColumnNames.size) d.columnAliases
          else d.queryColumnNames
        Project(d.queryColumnNames.zip(aliases).map { case (q, a) =>
          Alias(UnresolvedAttribute.quoted(q), a)()
        }, qualified)
      } else qualified
    SubqueryAlias((catName +: ident.namespace()).mkString("."), // Spark collapses the qualifier
      SubqueryAlias(ident.name(), projected))
  }

  /** Qualify every table/function identifier in a view body against the
    * view's definition-time context, expanding nested graft views as
    * they surface (cycle-guarded by `seen`). */
  private def qualifyIdentifiers(plan: LogicalPlan, ctx: Seq[String],
                                 seen: Set[String]): LogicalPlan = {
    val qualifiedRels = plan.transformUp {
      case u @ UnresolvedRelation(parts, _, false) =>
        val full =
          if (parts.size == 1) ctx ++ parts
          else if (graftCatalog(parts.head).isDefined ||
            spark.sessionState.catalogManager.isCatalogRegistered(parts.head)) parts
          else ctx.head +: parts
        lookupView(full) match {
          case Some((catName, cat, ident, d)) =>
            val key = viewKey(catName, ident)
            if (seen.contains(key))
              throw new IllegalArgumentException(
                s"cyclic view definition: $key expands through itself " +
                  s"(chain: ${seen.mkString(" -> ")} -> $key)")
            expand(catName, cat, ident, d, seen + key)
          case None => u.copy(multipartIdentifier = full)
        }
    }
    qualifiedRels.transformAllExpressions {
      case sq: SubqueryExpression =>
        sq.withNewPlan(qualifyIdentifiers(sq.plan, ctx, seen))
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.size == 1 && !isKnownSessionFunction(f.nameParts.head) =>
        f.copy(nameParts = ctx.head +: f.nameParts)
    }
  }

  /** Builtin or session-registered (injected/temp) function names stay
    * bare; anything else written bare in a view body can only have
    * meant the defining catalog's FunctionCatalog. */
  private def isKnownSessionFunction(name: String): Boolean =
    FunctionRegistry.builtin.functionExists(FunctionIdentifier(name)) ||
      spark.sessionState.catalog.isRegisteredFunction(FunctionIdentifier(name))
}
