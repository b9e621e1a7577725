package graft.core

import org.apache.spark.sql.DataFrame

/** Shared-subtree checkpoint with a guaranteed single materialization.
  *
  * Multi-consumer object-operator subtrees (typed kernels, iterative
  * rounds) don't canonicalize for exchange reuse, so they are
  * `localCheckpoint`ed. EAGER is the default: a lazy checkpoint's first
  * materialization can race across concurrently-submitted stages and
  * compute the subtree more than once, which is exactly what these
  * checkpoints exist to prevent. Plan-inspection tools
  * (`graft.Explain`, Bench's `SPARK_GRAFT_EXPLAIN`) set
  * `spark.graft.lazyCheckpoint=true` so that merely CONSTRUCTING a
  * DataFrame doesn't execute its workload.
  */
object Checkpoint {
  val LazyConf = "spark.graft.lazyCheckpoint"

  def apply(df: DataFrame): DataFrame =
    df.localCheckpoint(eager =
      !df.sparkSession.conf.get(LazyConf, "false").toBoolean)

  /** `.sharedCheckpoint()` chain syntax for the same policy. */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def sharedCheckpoint(): DataFrame = Checkpoint(df)
  }
}
