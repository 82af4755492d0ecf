package org.apache.spark.sql.graftops

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the custom-operator API needs:
  * constructing a DataFrame from a custom LogicalPlan
  * (`Dataset.ofRows` has no public equivalent). Lives under
  * `org.apache.spark.sql` for scope access only — no Spark internals are
  * copied or overridden here. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
