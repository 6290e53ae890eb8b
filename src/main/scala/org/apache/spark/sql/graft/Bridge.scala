package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge: build a DataFrame from a raw
  * `LogicalPlan`. Spark exposes no public constructor for this, so —
  * like every library that contributes custom logical operators (Delta,
  * Iceberg, Sedona all ship the same shim) — we place one object inside
  * the `org.apache.spark.sql` package tree to reach
  * `classic.Dataset.ofRows`. This is the ONLY member of the repo outside
  * the `graft` namespace.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
