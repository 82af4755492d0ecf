package graft.plans

import graft.sources.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for persistent-view DDL on graft catalogs (r13).
  *
  * Spark 4.1 ships the V2 `ViewCatalog` interface with no parser/
  * analyzer wiring: `CREATE VIEW cat.v AS ...` dies on
  * MISSING_CATALOG_ABILITY before the catalog is consulted
  * ([[ResolveGraftViews]] documents the wall), which left SQL users on
  * the `CALL create_view(...)` procedures. This injected parser closes
  * that gap the cheapest sound way: it recognizes exactly the three
  * statement shapes Spark cannot route —
  *
  *   - `CREATE [OR REPLACE] VIEW <name> [(col, ...)] [COMMENT '...']
  *     AS <body>` (r14: column lists and the view comment map onto the
  *     CALL's `columns`/`comment` parameters)
  *   - `DROP VIEW [IF EXISTS] <name>`
  *   - `SHOW VIEWS [IN <namespace>]`
  *
  * — and, ONLY when the target resolves to a registered
  * [[GraftCatalog]], rewrites the statement into the equivalent CALL
  * and hands that to the delegate parser. TEMPORARY views and any
  * statement over a non-graft catalog pass through verbatim, as does a
  * single-part `DROP VIEW` whose name is a session temp view (Spark's
  * documented precedence: the temp view drops, not the stored one —
  * ADVICE r13). A CREATE VIEW over a graft catalog carrying a clause
  * with no CALL mapping (TBLPROPERTIES, per-column COMMENT) fails
  * HELPFULLY, naming `CALL create_view`, instead of falling through to
  * Spark's opaque MISSING_CATALOG_ABILITY wall (r14). Rewriting to the
  * CALL keeps ONE implementation of the verbs: analysis-at-create,
  * the shared-identifier-space refusals, and the drop-side dependency
  * check all live in the procedures.
  *
  * Name resolution mirrors the read side: a leading registered graft
  * catalog name is explicit; otherwise the statement targets the
  * session's CURRENT catalog (when it is a graft catalog), with a
  * single-part name resolving into the current namespace. */
class GraftViewDdlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val Create =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.`]+)\s*""" +
      """(?:\(([^)]*)\)\s*)?(?:COMMENT\s+'((?:[^']|'')*)'\s*)?AS\s+(.+?)\s*;?\s*$""").r
  /** A CREATE VIEW that targets a graft catalog but carries a clause
    * [[Create]] does not recognize (TBLPROPERTIES, per-column COMMENT,
    * ...) — intercepted to fail HELPFULLY instead of falling through to
    * Spark's opaque MISSING_CATALOG_ABILITY wall. */
  private val CreateHead =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+([\w.`]+)[\s(].*$""".r
  private val Drop =
    """(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*$""".r
  private val Show =
    """(?is)^\s*SHOW\s+VIEWS(?:\s+(?:IN|FROM)\s+([\w.`]+))?\s*;?\s*$""".r

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(sqlText) match {
      case Some(call) => delegate.parsePlan(call)
      case None => delegate.parsePlan(sqlText)
    }

  private def cm = spark.sessionState.catalogManager

  /** Registered AND resolves to a GraftCatalog. `cm.catalog(name)`
    * deliberately FORCES initialization (r14): gating on the
    * initialized-roots snapshot first meant the very first view DDL of
    * a fresh session — before anything had touched the catalog —
    * passed through to Spark's MISSING_CATALOG_ABILITY wall. Spark
    * would initialize the registered catalog during that statement's
    * analysis anyway, so eager initialization here changes nothing but
    * the first statement's outcome. */
  private def isGraftCat(name: String): Boolean =
    cm.isCatalogRegistered(name) &&
      (try cm.catalog(name).isInstanceOf[GraftCatalog] catch { case _: Exception => false })

  /** An identifier whose head names a DIFFERENT registered catalog is
    * never ours — `CREATE VIEW spark_catalog.db.v` from a graft-current
    * session must reach Spark's own (working) v1 path, not be read as
    * a warehouse-relative namespace. */
  private def foreignCatalogHead(parts: Seq[String]): Boolean =
    parts.size > 1 && !isGraftCat(parts.head) &&
      (parts.head == "spark_catalog" || cm.isCatalogRegistered(parts.head))

  /** (catalog, warehouse-relative dotted name) for a view identifier,
    * or None when the target is not a graft catalog. */
  private def target(ident: String): Option[(String, String)] = {
    val parts = try delegate.parseMultipartIdentifier(ident)
      catch { case _: Exception => return None }
    if (parts.size > 1 && isGraftCat(parts.head))
      Some((parts.head, parts.tail.mkString(".")))
    else if (!foreignCatalogHead(parts) && isGraftCat(cm.currentCatalog.name())) {
      val rel = if (parts.size == 1) (cm.currentNamespace :+ parts.head).toSeq else parts
      Some((cm.currentCatalog.name(), rel.mkString(".")))
    } else None
  }

  /** Namespace target of SHOW VIEWS — like [[target]] but the whole
    * identifier is the namespace. */
  private def nsTarget(ident: Option[String]): Option[(String, String)] = ident match {
    case None =>
      val cur = cm.currentCatalog.name()
      if (isGraftCat(cur)) Some((cur, cm.currentNamespace.mkString("."))) else None
    case Some(id) =>
      val parts = try delegate.parseMultipartIdentifier(id)
        catch { case _: Exception => return None }
      if (isGraftCat(parts.head)) Some((parts.head, parts.tail.mkString(".")))
      else if (parts.size == 1 && parts.head == "spark_catalog") None
      else if (!foreignCatalogHead(parts) && isGraftCat(cm.currentCatalog.name()))
        Some((cm.currentCatalog.name(), parts.mkString(".")))
      else None
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** A session TEMP view of this name exists — single-part DROP VIEW
    * must reach Spark's own path (which drops the temp view, Spark's
    * documented precedence), never the stored view of the same name.
    * CREATE VIEW needs no such guard: Spark's non-temporary CREATE
    * always targets the catalog even when a temp view shadows the name.
    * Known gap: SHOW VIEWS over a graft namespace lists stored views
    * only — session temp views don't surface through the CALL. */
  private def hasTempView(name: String): Boolean =
    try spark.sessionState.catalog.getTempView(name).isDefined
    catch { case _: Exception => false }

  /** The parenthesised column list of a CREATE VIEW: plain names only
    * (backticks stripped). A decorated entry (COMMENT, types, ...) has
    * no CALL mapping — fail naming the supported surface. */
  private def columnList(raw: String, ident: String): Seq[String] = {
    // split on TOP-LEVEL commas only — a comma inside backticks is part
    // of a quoted identifier, not a separator, so `a,b` must surface as
    // ONE entry (and then be rejected below: the CALL's columns
    // parameter is itself comma-joined, so such a name cannot round-
    // trip) rather than silently mis-aliasing as two names (ADVICE r14)
    val cols = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inTick = false
      raw.foreach {
        case '`' => inTick = !inTick; sb += '`'
        case ',' if !inTick => out += sb.toString; sb.clear()
        case ch => sb += ch
      }
      out += sb.toString
      out.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    cols.map { c =>
      val bare = c.stripPrefix("`").stripSuffix("`")
      if (bare.isEmpty || bare.exists(ch => ch.isWhitespace || ch == '`' ||
          ch == '\'' || ch == ','))
        throw new IllegalArgumentException(
          s"unsupported column-list entry '$c' in CREATE VIEW $ident over a graft " +
            "catalog — plain column names only (per-column COMMENT and types are " +
            s"not supported here; use CALL <catalog>.create_view(...) for the full surface)")
      bare
    }
  }

  private def rewrite(sqlText: String): Option[String] = sqlText match {
    case Create(orReplace, ident, colList, comment, body) =>
      target(ident).map { case (cat, rel) =>
        val colsArg = Option(colList).map(cl =>
          s", columns => ${lit(columnList(cl, ident).mkString(","))}").getOrElse("")
        val commentArg = Option(comment).map(c =>
          s", comment => ${lit(c.replace("''", "'"))}").getOrElse("")
        s"CALL `$cat`.create_view(${lit(rel)}, ${lit(body)}, " +
          s"or_replace => ${orReplace != null}$colsArg$commentArg)"
      }
    case CreateHead(ident) if target(ident).isDefined =>
      throw new IllegalArgumentException(
        s"unsupported CREATE VIEW clause for graft-catalog view $ident — the SQL " +
          "surface supports CREATE [OR REPLACE] VIEW <name> [(col, ...)] " +
          "[COMMENT '...'] AS <query>; for anything else (TBLPROPERTIES, " +
          "per-column COMMENT, ...) use CALL <catalog>.create_view(...)")
    case Drop(ifExists, ident) =>
      val parts = try delegate.parseMultipartIdentifier(ident)
        catch { case _: Exception => Seq.empty }
      if (parts.size == 1 && hasTempView(parts.head)) None
      else target(ident).map { case (cat, rel) =>
        s"CALL `$cat`.drop_view(${lit(rel)}, if_exists => ${ifExists != null})"
      }
    case Show(ident) =>
      nsTarget(Option(ident)).map { case (cat, ns) =>
        s"CALL `$cat`.list_views(${lit(ns)})"
      }
    case _ => None
  }

  // ---- pure delegation ------------------------------------------------------
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
