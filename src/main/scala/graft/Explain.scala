package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan of the named
  * catalog queries (all queries when none named). Used to audit pushdown
  * (`PushedFilters`), pruning (`ReadSchema`), join strategy (broadcast vs
  * SMJ), exchange reuse, and WholeStageCodegen coverage.
  *
  * Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)
    // plan inspection must not execute workloads: shared-subtree
    // checkpoints become lazy under this conf (graft.core.Checkpoint)
    spark.conf.set(graft.core.Checkpoint.LazyConf, "true")
    for (n <- names) {
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
