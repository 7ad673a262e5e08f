package graft.catalog

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog}

/** Session extensions for graft: v2 view resolution.
  *
  * Stock Spark ships the `ViewCatalog` connector API but no analyzer
  * support for it — `SELECT` against a view in a non-session catalog
  * would fail to resolve. This rule substitutes a relation that names
  * a view in any registered `ViewCatalog` with the parsed view SQL
  * (the same substitution the reference's clients get when their
  * engine loads a view definition from the REST catalog,
  * denali logic/view.go).
  *
  * Register with:
  * `spark.sql.extensions=graft.catalog.GraftExtensions`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(spark => new ResolveGraftViews(spark))
    // C88: rewrite eligible aggregates onto fresh materialized views
    // (operator-optimization batch — pre-pushdown, so the substituted
    // MV relation flows through the normal scan-planning pipeline)
    ext.injectOptimizerRule(spark => new RewriteToMaterializedView(spark))
    // View DDL must be rewritten BEFORE analysis: Spark's own
    // ResolveSessionCatalog hard-rejects v2 CreateView/DropView for
    // any non-session catalog (no exec nodes exist), and analyzer
    // batches would reach that rejection before an injected
    // resolution rule. The parser hook post-processes the parsed plan.
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    ext.injectFunction(GraftExtensions.cosineFn)
    ext.injectFunction(GraftExtensions.simhashFn)
    ext.injectFunction(GraftExtensions.minhashFn)
  }
}

/** Delegating parser that rewrites v2 view DDL (`CREATE [OR REPLACE]
  * VIEW`, `DROP VIEW`) naming a ViewCatalog into graft runnable
  * commands — everything else passes through untouched. */
class GraftSqlParser(
    spark: SparkSession,
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
  import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView}

  private def viewTarget(child: LogicalPlan): Option[(String, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    child match {
      case UnresolvedIdentifier(parts, _) if parts.length >= 2 =>
        Try(cm.catalog(parts.head)).toOption.collect { case _: ViewCatalog =>
          (parts.head, Identifier.of(parts.tail.dropRight(1).toArray, parts.last))
        }
      case _ => None
    }
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(child, _, comment, _, props, originalText, _, allowExisting, replace, _) =>
      viewTarget(child).flatMap { case (cat, ident) =>
        originalText.map(sql =>
          CreateGraftViewCommand(cat, ident, sql, props, comment, allowExisting, replace)
            : LogicalPlan)
      }.getOrElse(cv)
    case dv @ DropView(child, ifExists) =>
      viewTarget(child).map { case (cat, ident) =>
        DropGraftViewCommand(cat, ident, ifExists): LogicalPlan
      }.getOrElse(dv)
    case other => other
  }

  override def parsePlan(sqlText: String): LogicalPlan = rewrite(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  /** `graft_cosine(a, b)` — codegen'd cosine similarity (see
    * [[graft.functions.CosineSimilarity]]). */
  val cosineFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) =>
      graft.functions.CosineSimilarity(children(0), children(1)))

  /** `graft_simhash(words)` — codegen'd 64-bit SimHash. */
  val simhashFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "graft_simhash"),
    (children: Seq[Expression]) => graft.functions.SimHash64(children.head))

  /** `graft_minhash(shingles)` — codegen'd 64-perm MinHash signature. */
  val minhashFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
    (children: Seq[Expression]) => graft.functions.MinHashSig(children.head))
}

/** CREATE [OR REPLACE] VIEW against a ViewCatalog: analyzes the view
  * SQL for its schema, then drives the connector API (the same
  * create/replace ops the reference's REST clients invoke). */
final case class CreateGraftViewCommand(
    catalogName: String,
    ident: Identifier,
    sql: String,
    properties: Map[String, String],
    comment: Option[String],
    allowExisting: Boolean,
    replace: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override def run(spark: org.apache.spark.sql.SparkSession): Seq[org.apache.spark.sql.Row] = {
    val cm = spark.sessionState.catalogManager
    val vc = cm.catalog(catalogName).asInstanceOf[ViewCatalog]
    if (!replace && allowExisting && vc.viewExists(ident)) return Seq.empty
    val analyzed = spark.sessionState
      .executePlan(spark.sessionState.sqlParser.parsePlan(sql)).analyzed
    val props = comment.map(c => properties + (ViewCatalog.PROP_COMMENT -> c))
      .getOrElse(properties)
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, sql, cm.currentCatalog.name(), cm.currentNamespace,
      analyzed.schema, Array.empty, Array.empty, Array.empty,
      scala.jdk.CollectionConverters.MapHasAsJava(props).asJava)
    if (replace) vc.replaceView(info, true) else vc.createView(info)
    Seq.empty
  }
}

/** DROP VIEW [IF EXISTS] against a ViewCatalog. */
final case class DropGraftViewCommand(
    catalogName: String, ident: Identifier, ifExists: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override def run(spark: org.apache.spark.sql.SparkSession): Seq[org.apache.spark.sql.Row] = {
    val vc = spark.sessionState.catalogManager.catalog(catalogName).asInstanceOf[ViewCatalog]
    if (!vc.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Seq.empty
  }
}

class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      resolveView(u.multipartIdentifier).getOrElse(u)
  }

  private def resolveView(parts: Seq[String]): Option[LogicalPlan] = {
    val cm = spark.sessionState.catalogManager
    val candidates: Seq[(String, Seq[String])] =
      if (parts.length >= 2) Seq(
        (parts.head, parts.tail), // explicit catalog.ns...name
        (cm.currentCatalog.name(), parts)) // relative to current catalog
      else Seq.empty
    candidates.view.flatMap { case (catalogName, rest) =>
      for {
        vc <- Try(cm.catalog(catalogName)).toOption.collect { case v: ViewCatalog => v }
        ident = Identifier.of(rest.dropRight(1).toArray, rest.last)
        if vc.viewExists(ident)
        view = vc.loadView(ident)
      } yield SubqueryAlias(
        rest.last,
        spark.sessionState.sqlParser.parsePlan(view.query))
    }.headOption
  }
}
