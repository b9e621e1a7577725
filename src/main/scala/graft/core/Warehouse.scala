package graft.core

import org.apache.spark.sql.SparkSession

/** Fingerprint-keyed session-catalog tables (bucketed layouts, persisted
  * indexes). Table names embed a content fingerprint of their source
  * data, so a dataset regenerated in place (same dir, new bytes) can
  * never be served from a stale layout — the old name simply misses and
  * the current generation is built fresh. Shared by the bucketed-join
  * layout ([[graft.operators.RelationalQueries.bucketedJoinRevenue]])
  * and the persisted IVF index
  * ([[graft.operators.EmbeddingQueries.annIvfPersisted]]).
  */
object Warehouse {

  /** Bucket/layout count CHOSEN FOR THE TARGET SCALE, not fixed: the
    * next power of two of max(cluster parallelism, input bytes/256 MB),
    * clamped to [8, 4096]. Parallelism is the floor because a bucketed
    * scan runs one task per bucket — fewer buckets than cores caps the
    * whole downstream pipeline; bytes/256 MB is the scale term — at
    * 100 TB it dominates and buckets stay scan-sized; the 4096 clamp
    * bounds small-file and metadata pressure, trading bucket size
    * upward instead (25 GB buckets at 100 TB, read by multiple row
    * groups per task).
    */
  def bucketCount(s: SparkSession, inputBytes: Long): Int = {
    val target = math.max(s.sparkContext.defaultParallelism.toLong,
      inputBytes / (256L << 20) + 1)
    val p2 = java.lang.Long.highestOneBit(math.max(1L, target))
    (if (p2 < target) p2 * 2 else p2).max(8L).min(4096L).toInt
  }

  /** If any of `tables` is missing from the session catalog, sweep
    * EVERY generation with the given `prefixes` — registrations from
    * this session (stale fingerprints, half-created sets) and warehouse
    * directories left by earlier JVMs (the directory outlives the
    * in-memory catalog and CTAS refuses with LOCATION_ALREADY_EXISTS) —
    * then run `build` to create the current generation. ALL tables must
    * exist to skip the build: checking one would wedge the session if a
    * previous attempt died between writes.
    */
  def ensure(s: SparkSession, prefixes: Seq[String], tables: Seq[String])
            (build: => Unit): Unit = {
    if (!tables.forall(s.catalog.tableExists(_))) {
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sessionState.newHadoopConf())
      s.catalog.listTables().collect().map(_.name)
        .filter(n => prefixes.exists(n.startsWith))
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      if (fs.exists(wh))
        fs.listStatus(wh)
          .filter(st => prefixes.exists(st.getPath.getName.startsWith))
          .foreach(st => fs.delete(st.getPath, true))
      build
    }
  }
}
