package org.apache.spark.graft

import org.apache.spark.sql.SparkSession

/** Test-only bridge into `private[spark]` listener-bus internals: the
  * QueryExecutionListener events PlanSpec's driver-collect guard records
  * are delivered ASYNCHRONOUSLY on the shared LiveListenerBus, so the
  * guard must drain the bus before reading its event log — otherwise a
  * key's actions could be attributed to the next key (or lost at
  * assertion time). Lives under `org.apache.spark` purely for package
  * access; no Spark behavior is modified.
  */
object TestBusHook {
  def waitUntilEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(60000L)
}
