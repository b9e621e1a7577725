package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for [[graft.plans.AsOfJoin]]: wrapping a custom logical
  * node into a user-facing DataFrame needs `Dataset.ofRows`, which is
  * `private[sql]` (the classic-Spark internal constructor). Same pattern
  * as [[org.apache.spark.GraftListenerDrain]] — one narrow, documented
  * crossing into the Spark package, no behavior.
  */
object GraftPlanBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a batch DataFrame as STREAMING for a v1 `Source.getBatch`
    * return value — the `FileStreamSource` pattern
    * (`internalCreateDataFrame(rdd, schema, isStreaming = true)`),
    * which is `private[sql]`. Used by
    * [[graft.sources.SnapshotChangefeedSource]].
    */
  def streamingFrame(s: SparkSession, df: DataFrame): DataFrame = {
    val cs = s.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The reverse crossing, for a v1 `Sink.addBatch` input: the
    * micro-batch arrives as a streaming-tagged DataFrame that batch
    * writers refuse; re-wrap its physical rows as a plain batch frame
    * (the pattern every v1 sink uses around its write path). Used by
    * [[graft.sources.SnapshotSink]].
    */
  def batchFrame(s: SparkSession, df: DataFrame): DataFrame = {
    val cs = s.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
