package graft.mr

import org.apache.spark.sql.SparkSession

/** CLI entry point for the MapReduce engine — the analog of the
  * reference's two binaries collapsed into one spark-submit main
  * (main/mrcoordinator.go:23 `mrcoordinator pg-*.txt` starts the
  * coordinator; main/mrworker.go:25-49 `mrworker wc.so` loads the app
  * plugin and joins). On Spark the cluster manager plays the
  * coordinator, executors play the workers, so the one remaining user
  * action is: name an application, point at input files, name an output
  * directory.
  *
  * Usage: {{{
  *   spark-submit --class graft.mr.Main graft.jar <app-name> <input-glob...> <out-dir>
  * }}}
  *
  * `<app-name>` resolves through the ServiceLoader registry
  * ([[MrApplications.discover]] — the `.so` plugin analog), inputs go
  * through the reference's one-file-one-split whole-file scan, and the
  * result is written in the reference's own `mr-out-<N>` "key value"
  * format via the `mrout` DataSource V2 connector (temp + rename commit,
  * mr/worker.go:108-121), so `spark.read.format("mrout").load(outDir)`
  * — or the reference's own `cat mr-out-* | sort` check
  * (main/test-mr.sh:103-104) — reads it back.
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.mr.Main <app-name> <input-glob...> <out-dir>\n" +
          s"apps: ${MrApplications.discover().keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val appName = args.head
    val outDir  = args.last
    val inputs  = args.toSeq.slice(1, args.length - 1)
    // Under spark-submit the master comes from the launcher; standalone
    // invocation (tests, sbt runMain) falls back to all local cores.
    val spark = SparkSession.builder()
      .appName(s"graft-mr-$appName")
      .master(sys.props.getOrElse("spark.master",
        s"local[${Runtime.getRuntime.availableProcessors}]"))
      .getOrCreate()
    run(spark, appName, inputs, outDir)
  }

  /** The job body, separated so tests can drive it on a shared session:
    * whole-file scan → registry lookup → map/shuffle/reduce → mrout sink
    * with the reference's nReduce=10 output layout
    * (main/mrcoordinator.go:23) — the sink's required distribution and
    * ordering produce exactly 10 key-clustered, key-sorted
    * `mr-out-<N>` files.
    */
  def run(spark: SparkSession, appName: String, inputs: Seq[String],
          outDir: String, nReduce: Int = 10): Unit =
    MrApplications.run(appName, MapReduceJob.wholeFiles(spark, inputs))
      .toDF()
      .write.format("mrout").option("nReduce", nReduce)
      .mode("overwrite").save(outDir)
}
