package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one private[sql] constructor a planner-extension
  * library genuinely needs: building a DataFrame from a custom
  * LogicalPlan node (the same shim pattern used by public Spark
  * extension libraries, e.g. Delta Lake and Sedona, since Dataset.ofRows
  * is not public API).
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
