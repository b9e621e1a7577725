package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the two halves of the point-lookup index contract:
  *
  *  1. pruning is real — the signature join selects a strict subset of
  *     the layout's files (the files are clustered by (source,
  *     n_chars), so doc_id min/max stats could never do this);
  *  2. false positives never surface — the lookup's rows are exactly
  *     the direct scan's rows for the same predicate.
  */
class BloomIndexSpec extends SparkSpec {

  test("signature join prunes files; lookup rows exactly match direct scan") {
    val root = SourceQueries.bloomIndexLayout(spark, sf001)
    val totalFiles = spark.read.parquet(s"$root/index").count()

    // mirror the catalog entry's file-pruning join for an observable
    // matched count
    val keyBuckets = graft.core.Tables.documents(spark, sf001)
      .filter(col("doc_id") % 97 === 0)
      .select(pmod(hash(col("doc_id")), lit(1 << 20)).as("bucket"))
      .distinct()
    val matchedFiles = spark.read.parquet(s"$root/index")
      .select(col("file"), explode(col("sig")).as("bucket"))
      .join(broadcast(keyBuckets), "bucket")
      .select(col("file")).distinct().count()
    assert(matchedFiles > 0, "lookup matched no files")
    assert(matchedFiles < totalFiles,
      s"no pruning: $matchedFiles of $totalFiles files matched")

    val got = SourceQueries.bloomIndexLookup(spark, sf001)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = graft.core.Tables.documents(spark, sf001)
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === want)
  }

  test("past the file-list cap the lookup falls back to a full scan, same rows") {
    val want = SourceQueries.bloomIndexLookup(spark, sf001)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // cap 0 forces every matched list over the cap: the driver holds at
    // most cap+1 paths (the limit bounds the collect) and the plan is
    // the plain clustered-layout scan with the exact predicate
    spark.conf.set("spark.graft.bloom.fileListCap", "0")
    try {
      val fallback = SourceQueries.bloomIndexLookup(spark, sf001)
      val scanned = fallback.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec
          => f.relation.location.inputFiles.length }.sum
      val totalFiles = spark.read.parquet(
        s"${SourceQueries.bloomIndexLayout(spark, sf001)}/index").count()
      assert(scanned.toLong === totalFiles,
        "fallback arm must scan the full clustered layout")
      val got = fallback.orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === want)
    } finally spark.conf.unset("spark.graft.bloom.fileListCap")
  }
}
