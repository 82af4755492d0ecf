package org.apache.spark.sql.graftops

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `private[sql]` doorways the custom-operator API needs:
  * constructing a DataFrame from a custom LogicalPlan (`Dataset.ofRows`
  * has no public equivalent), and raising the SAME decimal-overflow
  * error Cast/CheckOverflow raise (so the native decimal folds are
  * indistinguishable from the HOF chain under ANSI, error class
  * included). Lives under `org.apache.spark.sql` for scope access only —
  * no Spark internals are copied or overridden here. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `DataTypeErrors.cannotChangeDecimalPrecisionError` — what ANSI
    * Cast(decimal) and CheckOverflow throw on overflow
    * (NUMERIC_VALUE_OUT_OF_RANGE.WITH_SUGGESTION). */
  def decimalOverflowError(value: org.apache.spark.sql.types.Decimal,
                           precision: Int, scale: Int): ArithmeticException =
    org.apache.spark.sql.errors.DataTypeErrors.cannotChangeDecimalPrecisionError(
      value, precision, scale, null)
}
