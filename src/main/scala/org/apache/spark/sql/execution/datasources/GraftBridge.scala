package org.apache.spark.sql.execution.datasources

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.sources.Filter

/** Package-located bridge exposing Spark's catalyst→sources filter
  * translation (`protected[sql]`) to graft's scan planner. Pinned to
  * the Spark version on the classpath (4.1.2); no behavior of its
  * own. */
object GraftBridge {
  def translateFilter(predicate: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(predicate, supportNestedPredicatePushdown = true)

  /** Column over a raw catalyst Expression (`ExpressionUtils` is
    * `private[sql]`). */
  def column(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The catalyst Expression behind a classic Column. */
  def expression(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** DataFrame over a DSv2 Table without catalog registration
    * (`Dataset.ofRows` + `DataSourceV2Relation` are `private[sql]`).
    * Metadata columns the table declares resolve by name. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      table: org.apache.spark.sql.connector.catalog.Table,
      options: Map[String, String] = Map.empty): org.apache.spark.sql.DataFrame = {
    val rel = v2.DataSourceV2Relation.create(
      table, None, None,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(options).asJava))
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], rel)
  }
}
