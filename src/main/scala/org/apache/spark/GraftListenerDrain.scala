package org.apache.spark

/** Access shim for [[graft.Bench]]: `LiveListenerBus.waitUntilEmpty` is
  * `private[spark]`, but the bench needs a deterministic "all task-end
  * events delivered" barrier to read complete task-metric deltas per
  * timed trial (the listener bus is async — snapshotting right after an
  * action returns can miss the tail of the job's TaskEnd events).
  * Settle-sleeps would add ~0.3 s × trials × queries to the bench run;
  * this drain costs only what is actually queued.
  */
object GraftListenerDrain {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
