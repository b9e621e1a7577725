package graft.operators

import graft.{PlanScans, SparkSpec}

/** Pins `doc_lm_score`'s one-corpus-pass contract: the per-(doc,
  * bigram) aggregate is checkpointed, and the model build + scoring
  * join both read the materialization — so exactly one executed plan
  * scans the documents parquet (the r9 audit measured the prior
  * per-occurrence shape at 3 scans: model c12, model c1, scoring).
  */
class DocLmLineageSpec extends SparkSpec {
  test("LM model build + scoring scan the corpus exactly once") {
    val scans = PlanScans.during(spark, "documents.parquet") {
      val out = TextQueries.docLmScore(spark, sf0001).collect()
      assert(out.length === 20)
    }
    assert(scans === 1,
      s"expected exactly 1 corpus scan for model + scoring, got $scans")
  }
}
