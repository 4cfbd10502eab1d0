package org.apache.spark

/** Private-API bridge (the graftbridge pattern — see
  * sql/graftbridge/DatasetBridge): expose the listener-bus flush so
  * Bench's per-query shuffle tally can attribute every async task-end
  * event to the query that produced it before snapshotting. */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
