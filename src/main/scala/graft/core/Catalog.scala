package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.GraftExtensions

/** SQL surface: registers every harness table as a temp view (plus the
  * native graft functions) so the whole engine is drivable from
  * `spark.sql(...)` — the user-facing equivalent of the reference's
  * "submit a job over named inputs" entry point, with ANSI SQL instead
  * of Go plugins.
  */
object Catalog {

  /** Register all `/root/testdata`-style parquet tables of `dir` as temp
    * views named after the table, and the graft native functions.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    GraftExtensions.register(spark)
    Tables.all.foreach { name =>
      // events needs its ts-vintage normalization (normalizeEventTs), so go
      // through the typed loaders, not the raw parquet read
      val df = name match {
        case "events" => Tables.events(spark, dir)
        case other    => Tables.load(spark, dir, other)
      }
      df.createOrReplaceTempView(name)
    }
  }

  /** Convenience: register + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
