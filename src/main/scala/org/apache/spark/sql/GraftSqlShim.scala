package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's `private[sql]` surface:
  * wrapping a custom [[LogicalPlan]] (graft.plans.AsofJoin) in a
  * DataFrame requires `Dataset.ofRows`, which Spark scopes to the
  * `org.apache.spark.sql` package — the same doorway every
  * planner-extending library (Delta, Sedona, Iceberg runtime) uses.
  * Nothing else may live in this package: keeping the shim to one
  * five-line forwarder makes the internal-API exposure auditable.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
