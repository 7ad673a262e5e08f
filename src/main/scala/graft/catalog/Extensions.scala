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
    ext.injectFunction(GraftExtensions.cosineFn)
    ext.injectFunction(GraftExtensions.simhashFn)
    ext.injectFunction(GraftExtensions.minhashFn)
  }
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
